"""Infinite (environment) light tests (lights/infinite.cpp analog)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu import scene as sc, film as fm
from pbrt_tpu.core import transform as tf
from pbrt_tpu.cameras import make_perspective_camera
from pbrt_tpu.integrators import path as pt
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.lights import lights as lt
from pbrt_tpu.statics import scene_statics


def test_constant_env_furnace_plane():
    """Matte plane (kd=0.6) under constant env L=1: L_out = 0.6."""
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.6, 0.6, 0.6))
    b.add_triangle_mesh(
        [[0, 1, 2], [2, 3, 0]],
        [[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]],
        material=m,
    )
    b.add_infinite_light(L=(1.0, 1.0, 1.0))
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0, 5, 0.01], [0, 0, 0], [0, 1, 0]), (8, 8), fov_deg=30.0
    )
    img = np.asarray(
        pt.render(
            scene, cam, fm.FilmConfig(full_resolution=(8, 8)),
            SamplerConfig("sobol", 64, (8, 8)), pt.PathConfig(max_depth=3),
        )
    )
    # Plane sees env both directly (bounce) and its own reflection is
    # minimal; dominant term = 0.6 with small GI correction from the
    # plane's own occlusion of downward env at grazing bounces.
    np.testing.assert_allclose(img.mean(), 0.6, atol=0.03)


def test_env_map_sampling_integral():
    """E[Li/pdf] over sample_li draws == integral of the map over the
    sphere (importance-sampling identity)."""
    rs = np.random.RandomState(0)
    h, w = 16, 32
    img = rs.rand(h, w, 3).astype(np.float32) * np.array([1.0, 2.0, 0.5])
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE)
    b.add_sphere(tf.translate(100, 100, 100), 0.1, material=m)  # dummy geo
    b.add_infinite_light(image=img)
    scene = b.build()
    st = scene_statics(scene)

    n = 20000
    u = jnp.asarray(rs.rand(n, 2), jnp.float32)
    ref = jnp.zeros((n, 3), jnp.float32)
    light_idx = jnp.zeros((n,), jnp.int32)
    s = lt.sample_li(scene, light_idx, ref, u, st.light_types)
    li = np.asarray(s["li"])
    pdf = np.asarray(s["pdf"])
    ok = pdf > 0
    est = (li[ok] / pdf[ok, None]).mean(0)

    # Ground truth: integral over sphere of the equirect map.
    theta = (np.arange(h) + 0.5) / h * np.pi
    w_solid = np.sin(theta)[:, None, None] * (np.pi / h) * (2 * np.pi / w)
    truth = (img * w_solid).sum((0, 1))
    np.testing.assert_allclose(est, truth, rtol=0.05)

    # pdf_li must match the sampling pdf for the same directions (up to
    # f32 uv-inversion landing in a neighboring texel at cell boundaries).
    pdf2 = np.asarray(
        lt.pdf_li(scene, light_idx, ref, s["wi"], st.light_types)
    )
    close = np.isclose(pdf2[ok], pdf[ok], rtol=2e-2)
    assert close.mean() > 0.97, close.mean()


def test_escaped_radiance_lookup():
    img = np.zeros((8, 16, 3), np.float32)
    img[0, :, :] = 5.0  # top row = +z pole (theta ~ 0)
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE)
    b.add_sphere(tf.translate(100, 0, 0), 0.1, material=m)
    b.add_infinite_light(image=img)
    scene = b.build()
    st = scene_statics(scene)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    le = np.asarray(lt.escaped_radiance(scene, d, st.light_types))
    assert le[0, 0] > 2.0  # toward +z pole: bright
    assert le[1, 0] < 0.5  # -z pole: dark
