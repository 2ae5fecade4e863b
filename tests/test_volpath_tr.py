"""Boundary-crossing transmittance (VisibilityTester::Tr, light.cpp:47-67;
Scene::IntersectTr, scene.cpp:57-71): shadow and BSDF-MIS rays must cross
material-less medium boundaries, attenuated by the enclosed medium, instead
of treating the boundary shell as an occluder."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu import scene as sc, film as fm
from pbrt_tpu.core import transform as tf
from pbrt_tpu.cameras import make_perspective_camera
from pbrt_tpu.integrators import volpath as vp
from pbrt_tpu.integrators.path import PathConfig
from pbrt_tpu.samplers.samplers import SamplerConfig


def _smoke_shell_scene(sigma_a):
    """Matte sphere r=0.2 at origin, inside a material-less boundary sphere
    r=1 filled with an absorbing-only homogeneous medium; point light on +z
    outside the shell."""
    b = sc.SceneBuilder()
    med = b.media.add_homogeneous((sigma_a,) * 3, (0.0, 0.0, 0.0), 0.0)
    kd = 0.6
    m = b.add_material(sc.MAT_MATTE, kd=(kd,) * 3)
    b.add_sphere(tf.identity(), 0.2, material=m,
                 medium_outside=med, medium_inside=med)
    # Null-material boundary shell owning the medium interface.
    b.add_sphere(tf.identity(), 1.0, material=-1,
                 medium_inside=med, medium_outside=-1)
    intensity = 10.0
    b.add_point_light(tf.translate(0.0, 0.0, 5.0), (intensity,) * 3)
    return b, kd, intensity


def _render(b, spp=32, max_depth=3):
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]), (5, 5), fov_deg=8.0
    )
    img = np.asarray(
        vp.render(
            scene, cam, fm.FilmConfig(full_resolution=(5, 5)),
            SamplerConfig("sobol", spp, (5, 5)),
            PathConfig(max_depth=max_depth),
        )
    )
    return img


def test_shadow_tr_crosses_null_boundary():
    """Direct light on the inner sphere ~ kd/pi * I/d^2 * cos * Tr(medium).

    Center pixel: hit at (0,0,0.2), normal +z, light straight above at
    d=4.8; the shadow segment crosses 0.8 of medium.  The camera segment
    from the shell (z=1) to the hit also crosses 0.8 of medium.
    """
    sigma_a = 0.5
    b, kd, intensity = _smoke_shell_scene(sigma_a)
    img = _render(b)
    center = img[2, 2].mean()
    d = 4.8
    tr = np.exp(-sigma_a * 0.8)
    expected = (kd / np.pi) * (intensity / d**2) * 1.0 * tr * tr
    # Loose bound: oblique pixels and absorbed-lane noise; the key claim is
    # that the signal is present (old code: boundary occludes -> ~0) and
    # attenuated (no walk at all would give no exp(-0.8 sigma) factors).
    assert center > 0.5 * expected, (center, expected)
    np.testing.assert_allclose(center, expected, rtol=0.35)


def test_shadow_tr_attenuates_vs_vacuum():
    """Same scene with sigma_a=0 must be brighter by ~exp(2*0.8*sigma)."""
    b0, kd, intensity = _smoke_shell_scene(0.0)
    b1, _, _ = _smoke_shell_scene(0.5)
    c0 = _render(b0)[2, 2].mean()
    c1 = _render(b1)[2, 2].mean()
    ratio = c0 / max(c1, 1e-9)
    np.testing.assert_allclose(ratio, np.exp(0.5 * 1.6), rtol=0.25)
