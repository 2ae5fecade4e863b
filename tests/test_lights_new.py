"""Projection/gonio lights + spatial light distribution.

Mirrors the reference behavior: projection lights only illuminate inside the
fov window with texture modulation (lights/projection.cpp:87-115); gonio
lights modulate by an equirect angular map (goniometric.cpp:65-92); the
spatial strategy must agree with uniform in expectation
(lightdistrib.cpp:91-300 — it is only an importance reweighting).
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu import scene as sc, film as fm
from pbrt_tpu.core import transform as tf
from pbrt_tpu.lights import lights as lt


def _scene_with(light_fn):
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE)
    b.add_triangle_mesh(
        [[0, 1, 2]], [[-5, -5, 0], [5, -5, 0], [0, 5, 0]], material=m
    )
    light_fn(b)
    return b.build()


def test_projection_window():
    """Points outside the projection frustum receive zero Li."""
    img = np.full((4, 4, 3), 2.0, np.float32)
    scene = _scene_with(
        lambda b: b.add_projection_light(
            tf.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0]), (10, 10, 10),
            fov_deg=30.0, image=img,
        )
    )
    types = (sc.LIGHT_PROJECTION,)
    # Directly below the light: inside the cone.  Far to the side: outside.
    ref = jnp.asarray([[0.0, 0.0, 0.0], [50.0, 0.0, 0.0]], jnp.float32)
    u = jnp.zeros((2, 2), jnp.float32)
    s = lt.sample_li(scene, jnp.zeros((2,), jnp.int32), ref, u, types)
    li = np.asarray(s["li"])
    assert li[0].sum() > 0.0, "point under the projector must be lit"
    assert li[1].sum() == 0.0, "point outside the frustum must be dark"
    assert bool(s["is_delta"][0])


def test_gonio_hemispheres():
    """Equirect map with bright upper hemisphere: points above the light lit,
    points below dark."""
    img = np.zeros((8, 8, 3), np.float32)
    img[:4] = 3.0  # theta < pi/2 (light-space +z)
    scene = _scene_with(
        lambda b: b.add_gonio_light(tf.translate(0, 0, 2), (5, 5, 5), image=img)
    )
    types = (sc.LIGHT_GONIO,)
    ref = jnp.asarray([[0.0, 0.0, 10.0], [0.0, 0.0, -10.0]], jnp.float32)
    u = jnp.zeros((2, 2), jnp.float32)
    s = lt.sample_li(scene, jnp.zeros((2,), jnp.int32), ref, u, types)
    li = np.asarray(s["li"])
    # -wi from ref above points DOWN from light... w_world = -wi points from
    # light toward ref: above -> +z -> bright half.
    assert li[0].sum() > 0.0
    assert li[1].sum() == 0.0


def test_spatial_matches_uniform():
    """Spatial reweighting is unbiased: same expected image as uniform."""
    from pbrt_tpu.integrators import path as pt
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.cameras import make_perspective_camera

    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.6, 0.6, 0.6))
    b.add_triangle_mesh(
        [[0, 1, 2], [2, 3, 0]],
        [[-6, -6, 0], [6, -6, 0], [6, 6, 0], [-6, 6, 0]],
        material=m,
    )
    b.add_point_light(tf.translate(-3, 0, 3), (20, 4, 4))
    b.add_point_light(tf.translate(3, 0, 3), (4, 4, 20))
    scene = b.build()
    res = (24, 24)
    cam = make_perspective_camera(
        tf.look_at([0, -8, 4], [0, 0, 0], [0, 0, 1]), res, fov_deg=50.0
    )
    film_cfg = fm.FilmConfig(full_resolution=res)
    s_cfg = SamplerConfig("sobol", 16, res)
    out = {}
    for strat in ("uniform", "spatial"):
        img = pt.render(
            scene, cam, film_cfg, s_cfg,
            pt.PathConfig(max_depth=2, light_strategy=strat),
        )
        out[strat] = np.asarray(img)
    rel = np.abs(out["uniform"] - out["spatial"]).mean() / max(
        out["uniform"].mean(), 1e-9
    )
    assert rel < 0.08, f"spatial diverges from uniform: rel {rel}"
