"""Finite-difference vs AD gradient tests (SURVEY.md §7 differentiability).

The render at a fixed sample sequence is a deterministic function of the
scene/camera parameters; parallel/diff.py's gradients must be the exact
derivative of that function wherever it is smooth.  These tests check AD
against central finite differences on analytic 1-surface scenes built so the
loss is smooth in the tested parameter (no silhouette flips inside the FD
stencil): a matte/plastic ground plane lit by an out-of-frame emissive
sphere.  The reference has no AD; the north star (BASELINE.json: pixel
gradients w.r.t. materials / lights / camera) sets the contract.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu import scene as sc
from pbrt_tpu import film as fm
from pbrt_tpu.core import transform as tf
from pbrt_tpu.cameras import make_perspective_camera
from pbrt_tpu.cameras.cameras import perspective_raster_to_camera
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.integrators.path import PathConfig, make_pixel_grid
from pbrt_tpu.statics import scene_statics
from pbrt_tpu.parallel import diff

RES = (24, 24)


def _plane_scene(plastic=False):
    """Ground plane + emissive sphere well outside the camera frustum."""
    b = sc.SceneBuilder()
    if plastic:
        mat = b.add_material(
            sc.MAT_PLASTIC, kd=(0.4, 0.3, 0.2), ks=(0.6, 0.6, 0.6),
            roughness=0.3,
        )
    else:
        mat = b.add_material(sc.MAT_MATTE, kd=(0.6, 0.4, 0.3))
    b.add_triangle_mesh(
        [[0, 1, 2], [2, 3, 0]],
        [[-50, -50, 0], [50, -50, 0], [50, 50, 0], [-50, 50, 0]],
        material=mat,
    )
    # Light above and BEHIND the camera: lights the plane, never in frame,
    # and never hit by the plastic lobe's MIS rays (they reflect forward).
    lightmat = b.add_material(sc.MAT_MATTE, kd=(0.0, 0.0, 0.0))
    b.add_emissive_sphere(
        tf.translate(0, -14, 10), 1.5, L=(60.0, 60.0, 60.0), material=lightmat
    )
    return b.build()


def _camera():
    # Looking down-forward at the plane; the light sits behind the camera.
    return make_perspective_camera(
        tf.look_at([0, -10, 6], [0, 4, 0], [0, 0, 1]), RES, fov_deg=40.0
    )


@functools.lru_cache(maxsize=None)
def _setup(plastic=False, depth=1):
    scene = _plane_scene(plastic)
    camera = _camera()
    pixels = jnp.asarray(make_pixel_grid(fm.FilmConfig(full_resolution=RES)))
    scfg = SamplerConfig("sobol", 4, RES)
    pcfg = PathConfig(max_depth=depth)
    statics = scene_statics(scene)
    rng = np.random.RandomState(7)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (pixels.shape[0], 3)), jnp.float32)

    @jax.jit
    def loss(scene, camera):
        L = diff.render_batch_radiance(
            scene, camera, pixels, jnp.uint32(0), scfg, pcfg, statics
        )
        return jnp.sum(L * w)

    grad_step = jax.jit(
        functools.partial(
            diff.render_grad_step, sampler_cfg=scfg, path_cfg=pcfg,
            statics=statics,
        ),
        static_argnames=("param_names", "remat"),
    )
    return scene, camera, pixels, w, loss, grad_step


def _add(arr, idx, e):
    """Perturb one entry of a (host numpy) scene leaf."""
    out = np.array(arr, copy=True)
    out[idx] += e
    return out


def _fd(loss, scene, camera, set_eps, eps):
    s_p, c_p = set_eps(scene, camera, +eps)
    s_m, c_m = set_eps(scene, camera, -eps)
    return (float(loss(s_p, c_p)) - float(loss(s_m, c_m))) / (2 * eps)


def _check(ad, fd, rtol=0.02):
    denom = max(abs(ad), abs(fd), 1e-6)
    assert abs(ad - fd) / denom < rtol, f"AD {ad:.6g} vs FD {fd:.6g}"


def _grads(plastic=False, depth=1, **kw):
    scene, camera, pixels, w, loss, grad_step = _setup(plastic, depth)
    L, g = grad_step(scene, camera, pixels, jnp.uint32(0), w, **kw)
    assert np.isfinite(float(jnp.sum(L)))
    return scene, camera, loss, g


def test_grad_kd_matches_fd():
    scene, camera, loss, g = _grads()
    ad = float(g["kd"][0, 0])

    def set_eps(s, c, e):
        kd = _add(s.materials.kd, (0, 0), e)
        return s.replace(materials=s.materials.replace(kd=kd)), c

    fd = _fd(loss, scene, camera, set_eps, 5e-3)
    assert abs(ad) > 1e-3  # non-degenerate
    _check(ad, fd)


def test_grad_light_L_matches_fd():
    scene, camera, loss, g = _grads()
    ad = float(g["light_L"][0, 1])

    def set_eps(s, c, e):
        L = _add(s.lights.L, (0, 1), e)
        return s.replace(lights=s.lights.replace(L=L)), c

    fd = _fd(loss, scene, camera, set_eps, 0.5)
    assert abs(ad) > 1e-3
    _check(ad, fd)


def test_grad_roughness_matches_fd():
    scene, camera, loss, g = _grads(plastic=True)
    ad = float(g["roughness"][0])

    def set_eps(s, c, e):
        r = _add(s.materials.roughness, (0,), e)
        return s.replace(materials=s.materials.replace(roughness=r)), c

    fd = _fd(loss, scene, camera, set_eps, 5e-3)
    assert abs(ad) > 1e-3
    _check(ad, fd, rtol=0.05)


def test_grad_camera_pose_matches_fd():
    scene, camera, loss, g = _grads()
    # d(loss)/d(camera x translation): the image slides across the plane.
    ad = float(g["camera"]["camera_to_world"][0, 3])

    def set_eps(s, c, e):
        m = c.camera_to_world.at[0, 3].add(e)  # camera leaves are jnp
        return s, c.replace(camera_to_world=m)

    # eps must clear the loss's f32 quantization: the summed loss is ~128,
    # so a 2e-3 step changes it by ~1 ulp and the FD quotient is noise
    # (measured: FD converges to AD within 2% at eps 0.05, see NOTES r4).
    fd = _fd(loss, scene, camera, set_eps, 5e-2)
    assert abs(ad) > 1e-3
    _check(ad, fd, rtol=0.05)


def test_grad_fov_matches_fd():
    scene, camera, loss, _ = _grads()

    def loss_of_fov(fov):
        cam2 = camera.replace(
            raster_to_camera=perspective_raster_to_camera(fov, RES)
        )
        return loss(scene, cam2)

    ad = float(jax.grad(loss_of_fov)(jnp.float32(40.0)))
    e = 0.05
    fd = (float(loss_of_fov(jnp.float32(40.0 + e)))
          - float(loss_of_fov(jnp.float32(40.0 - e)))) / (2 * e)
    assert abs(ad) > 1e-3
    _check(ad, fd, rtol=0.05)


def test_remat_grads_match_no_remat():
    """Path-replay (per-bounce jax.checkpoint) must not change gradients."""
    scene, camera, pixels, w, loss, grad_step = _setup(True, 3)
    L1, g1 = grad_step(scene, camera, pixels, jnp.uint32(0), w, remat=True)
    L2, g2 = grad_step(scene, camera, pixels, jnp.uint32(0), w, remat=False)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L2), atol=1e-6)
    for k in ("kd", "ks", "roughness", "light_L"):
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(g1["camera"]["camera_to_world"]),
        np.asarray(g2["camera"]["camera_to_world"]),
        rtol=1e-4, atol=1e-6,
    )


def test_grad_deeper_bounces_finite():
    """Depth-3 plastic scene: all parameter gradients finite and non-zero."""
    scene, camera, loss, g = _grads(plastic=True, depth=3)
    flat, _ = jax.tree_util.tree_flatten(g)
    for leaf in flat:
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.sum(jnp.abs(g["kd"]))) > 1e-4
    assert float(jnp.sum(jnp.abs(g["camera"]["camera_to_world"]))) > 1e-4
