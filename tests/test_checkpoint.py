"""Checkpoint/resume: kill-and-resume must reproduce the uninterrupted
render EXACTLY for both engines.

Lockstep: the film accumulator + next sample index are the complete state
(utils/checkpoint.py save/load).  Wavefront: the lane-pool state dict (film +
in-flight lanes + sampler cursors + work counter) is the complete state
(save_state/load_state), so resuming mid-pool is bit-exact — the resumed run
replays the identical compiled superstep sequence from the snapshot.

The reference has no checkpointing (integrator.cpp:338 writes the film once
at the end); this is the preemption story SURVEY.md §5.4 calls for.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu import scene as sc
from pbrt_tpu import film as fm
from pbrt_tpu.cameras import make_perspective_camera
from pbrt_tpu.core import transform as tf
from pbrt_tpu.integrators import path as pt
from pbrt_tpu.integrators import wavefront as wf
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.utils import checkpoint as ckpt

RES = (16, 16)


def _scene():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.4, 0.3), sigma=0.0)
    b.add_sphere(tf.identity(), 1.0, material=m)
    b.add_point_light(tf.identity(), (np.pi, np.pi, np.pi))
    m2 = b.add_material(sc.MAT_MATTE, kd=(0.0, 0.0, 0.0))
    b.add_emissive_sphere(
        tf.translate(0.0, 0.4, 0.3), 0.2, L=(3.0, 2.0, 1.0), material=m2
    )
    return b.build()


def _camera():
    return make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), RES, fov_deg=45.0
    )


def test_lockstep_kill_and_resume(tmp_path):
    scene, cam = _scene(), _camera()
    film_cfg = fm.FilmConfig(full_resolution=RES)
    scfg = SamplerConfig("halton", 4, RES)
    cfg = pt.PathConfig(max_depth=3)
    straight = np.asarray(pt.render(scene, cam, film_cfg, scfg, cfg))

    path = str(tmp_path / "ck.npz")
    # "Kill" after 2 of 4 spp: render spp=2 with checkpointing on...
    import dataclasses
    half = dataclasses.replace(scfg, spp=2)
    pt.render(scene, cam, film_cfg, half, cfg,
              checkpoint_path=path, checkpoint_every=1)
    # The checkpoint file records next_sample=2; resuming the FULL render
    # must pick up at sample 2 and match the uninterrupted image exactly.
    resumed = np.asarray(
        pt.render(scene, cam, film_cfg, scfg, cfg,
                  checkpoint_path=path, checkpoint_every=2)
    )
    # Same jitted step, same per-batch film adds, same order -> bit-exact.
    np.testing.assert_array_equal(straight, resumed)


def test_wavefront_kill_and_resume(tmp_path):
    scene, cam = _scene(), _camera()
    film_cfg = fm.FilmConfig(full_resolution=RES)
    scfg = SamplerConfig("halton", 4, RES)
    cfg = pt.PathConfig(max_depth=3)
    kw = dict(n_lanes=512, iters_per_step=2)
    straight = np.asarray(wf.render(scene, cam, film_cfg, scfg, cfg, **kw))

    # Simulate a mid-render kill: drive the same internals for a few
    # supersteps, snapshot the state pytree, then resume via render().
    from pbrt_tpu.statics import scene_statics
    from pbrt_tpu.filters import make_filter

    statics = scene_statics(scene)
    filt = make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(pt.make_pixel_grid(film_cfg))
    total = int(pixels.shape[0]) * scfg.spp
    scene_d = jax.device_put(scene)
    cam_d = jax.device_put(cam)
    state = jax.jit(functools.partial(
        wf._initial_state, sampler_cfg=scfg, statics=statics,
        total=total, n_lanes=512,
    ))(scene_d, cam_d, film_state, pixels=pixels)
    it = functools.partial(
        wf._iteration, scene=scene_d, camera=cam_d, sampler_cfg=scfg,
        cfg=cfg, statics=statics, pixels=pixels,
    )
    superstep = jax.jit(lambda st: jax.lax.fori_loop(0, 2, lambda _, s: it(s), st))
    for _ in range(3):  # partial render, then "killed"
        state = superstep(state)
    # Genuinely mid-render: in-flight paths not yet scattered to the film
    # (all work may already be ASSIGNED once next_work wraps the pool).
    assert int(jnp.sum(state["alive"])) > 0
    path = str(tmp_path / "wf_ck.npz")
    ckpt.save_state(path, state)

    resumed = np.asarray(
        wf.render(scene, cam, film_cfg, scfg, cfg, checkpoint_path=path, **kw)
    )
    np.testing.assert_array_equal(straight, resumed)


def test_state_roundtrip_validation(tmp_path):
    st = {"a": jnp.arange(4, dtype=jnp.float32), "b": jnp.zeros((2, 3))}
    p = str(tmp_path / "s.npz")
    ckpt.save_state(p, st)
    back = ckpt.load_state(p, jax.tree_util.tree_map(jnp.zeros_like, st))
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(4))
    # Shape mismatch must be rejected, not silently loaded.
    bad = {"a": jnp.zeros((5,)), "b": jnp.zeros((2, 3))}
    try:
        ckpt.load_state(p, bad)
    except ValueError:
        pass
    else:
        raise AssertionError("shape mismatch not detected")
