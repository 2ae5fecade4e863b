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


import pytest

# The reference's cross product (analytic_scenes.cpp:255-410):
# {Path, VolPath, BDPT, MLT} x {Halton, (0,2)-seq, Sobol, Random, Stratified}
# on analytic scenes, mean within Delta=0.02 (CheckSceneAverage).  MLT has no
# sampler choice (it owns its PSS sampler, mlt.cpp:53) — exactly as in the
# reference, where the MLT rows ignore the sampler axis.
SAMPLERS = ["sobol", "halton", "random", "stratified", "zerotwosequence"]


def _furnace_builder():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5), sigma=0.0)
    b.add_sphere(tf.identity(), 1.0, material=m)
    b.add_point_light(tf.identity(), (np.pi, np.pi, np.pi))
    return b


FURNACE_EXPECTED = 1.0 - 0.5**8  # at max_depth=8


@pytest.mark.parametrize("sampler", SAMPLERS)
def test_furnace_cross_path(sampler):
    img = _render(_furnace_builder(), spp=16, max_depth=8, sampler=sampler)
    assert abs(img.mean() - FURNACE_EXPECTED) < 0.025, (sampler, img.mean())


@pytest.mark.parametrize("sampler", SAMPLERS)
def test_furnace_cross_volpath(sampler):
    from pbrt_tpu.integrators import volpath as vp

    scene = _furnace_builder().build()
    img = np.asarray(vp.render(
        scene, _interior_camera(), fm.FilmConfig(full_resolution=RES),
        SamplerConfig(sampler, 16, RES), pt.PathConfig(max_depth=8),
    ))
    assert abs(img.mean() - FURNACE_EXPECTED) < 0.025, (sampler, img.mean())


@pytest.mark.slow
@pytest.mark.parametrize("sampler", SAMPLERS)
def test_furnace_cross_bdpt(sampler):
    from pbrt_tpu.integrators import bdpt

    scene = _furnace_builder().build()
    img = np.asarray(bdpt.render(
        scene, _interior_camera(), fm.FilmConfig(full_resolution=RES),
        SamplerConfig(sampler, 16, RES), bdpt.BDPTConfig(max_depth=5),
    ))
    expected = 1.0 - 0.5**5
    assert abs(img.mean() - expected) < 0.04, (sampler, img.mean())


@pytest.mark.slow
def test_furnace_cross_mlt():
    from pbrt_tpu.integrators import mlt

    scene = _furnace_builder().build()
    img = np.asarray(mlt.render(
        scene, _interior_camera(), fm.FilmConfig(full_resolution=RES),
        mlt.MLTConfig(max_depth=5, mutations_per_pixel=64),
    ))
    expected = 1.0 - 0.5**5
    # MLT normalizes by a bootstrap estimate of b: wider tolerance
    # (the reference likewise relaxes MLT rows).
    assert abs(img.mean() - expected) < 0.08, img.mean()


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


def test_direct_all_strategy_matches_one():
    """UniformSampleAll == UniformSampleOne in expectation on the furnace
    (integrator.cpp:54-106); also exercises the sample-array dim schedule."""
    from pbrt_tpu.integrators import direct as dl

    b = _furnace_builder()
    scene = b.build()
    cam = _interior_camera()
    film_cfg = fm.FilmConfig(full_resolution=RES)
    scfg = SamplerConfig("sobol", 8, RES)
    img_one = np.asarray(dl.render(
        scene, cam, film_cfg, scfg,
        dl.DirectLightingConfig(max_depth=1, strategy="one"),
    ))
    img_all = np.asarray(dl.render(
        scene, cam, film_cfg, scfg,
        dl.DirectLightingConfig(max_depth=1, strategy="all"),
    ))
    assert abs(img_one.mean() - 0.5) < 0.02
    assert abs(img_all.mean() - 0.5) < 0.02
