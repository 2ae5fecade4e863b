"""End-to-end integration tests with analytic expected values.

Clones the strategy of src/tests/analytic_scenes.cpp:255-410: build scenes
in-memory (no parser), render, assert the mean image value within tolerance
of a closed-form expectation (CheckSceneAverage, analytic_scenes.cpp:93-103).
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu import scene as sc
from pbrt_tpu import film as fm
from pbrt_tpu.cameras import make_perspective_camera
from pbrt_tpu.core import transform as tf
from pbrt_tpu.integrators import path as pt
from pbrt_tpu.samplers.samplers import SamplerConfig

RES = (16, 16)


def _interior_camera():
    # Camera at origin looking +z, inside the test sphere.
    return make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), RES, fov_deg=45.0
    )


def _render(builder, spp=16, max_depth=8, sampler="sobol"):
    scene = builder.build()
    cam = _interior_camera()
    film_cfg = fm.FilmConfig(full_resolution=RES)
    img = pt.render(
        scene,
        cam,
        film_cfg,
        SamplerConfig(sampler, spp, RES),
        pt.PathConfig(max_depth=max_depth),
    )
    return np.asarray(img)


def test_point_light_furnace():
    """Kd=0.5 unit sphere interior, point light I=pi at center =>
    L = sum_k 0.5^k = 1 at infinite depth (analytic_scenes.cpp:58-92)."""
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5), sigma=0.0)
    b.add_sphere(tf.identity(), 1.0, material=m)
    b.add_point_light(tf.identity(), (np.pi, np.pi, np.pi))
    img = _render(b, spp=16, max_depth=8)
    expected = 1.0 - 0.5**8
    assert abs(img.mean() - expected) < 0.025, img.mean()


def test_surrounding_emitter():
    """Camera inside an emissive sphere: every ray sees Le exactly."""
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.0, 0.0, 0.0))
    b.add_emissive_sphere(
        tf.identity(), 1.0, L=(2.0, 3.0, 4.0), material=m, two_sided=True
    )
    img = _render(b, spp=4, max_depth=2)
    np.testing.assert_allclose(img.mean(axis=(0, 1)), [2.0, 3.0, 4.0], rtol=1e-3)


def test_area_light_furnace():
    """pbrt's 'Sphere, Kd = 0.5, Le = 0.5' scene (analytic_scenes.cpp:135):
    the unit sphere is both the matte surface and the (two-sided) emitter.
    Equilibrium: L = Le + rho * L  =>  L = 0.5 / (1 - 0.5) = 1."""
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5))
    b.add_emissive_sphere(
        tf.identity(), 1.0, L=(0.5, 0.5, 0.5), material=m, two_sided=True
    )
    img = _render(b, spp=32, max_depth=8)
    assert abs(img.mean() - 1.0) < 0.04, img.mean()


def test_shard_count_invariance():
    """Rendering must not depend on batch split (P8 determinism contract)."""
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5))
    b.add_sphere(tf.identity(), 1.0, material=m)
    b.add_point_light(tf.identity(), (np.pi, np.pi, np.pi))
    scene = b.build()
    cam = _interior_camera()
    film_cfg = fm.FilmConfig(full_resolution=RES)
    scfg = SamplerConfig("sobol", 2, RES)
    cfg = pt.PathConfig(max_depth=3)

    from pbrt_tpu.filters import make_filter
    from pbrt_tpu.statics import scene_statics

    filt = make_filter("box")
    pixels = pt.make_pixel_grid(film_cfg)
    statics = scene_statics(scene)

    def run(splits):
        film = fm.make_film_state(film_cfg, filt)
        for s in range(scfg.spp):
            for chunk in np.array_split(pixels, splits):
                film = pt.render_sample_batch(
                    scene, cam, film, jnp.asarray(chunk), jnp.uint32(s),
                    scfg, cfg, statics,
                )
        return np.asarray(fm.to_image(film))

    a = run(1)
    c = run(4)
    np.testing.assert_allclose(a, c, atol=1e-5)
