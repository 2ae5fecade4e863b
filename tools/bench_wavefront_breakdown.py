#!/usr/bin/env python
"""Stage-level timing of ONE wavefront iteration on the real chip — the
round-2 regression autopsy tool (VERDICT item 1).

Times, as separate jits at the production pool size (131072 lanes) on the
real killeroo scene:
  full superstep(k=1)    — one _iteration end-to-end
  dyn-halton 1D draw x8  — the per-iteration sampler dose (per-lane dims)
  static-halton draw x8  — same dose at compile-time dims (comparison)
  argsort 131k / 262k    — the per-launch ray sort
  closest-hit 131k       — launch B (extension+camera rays)
  NEE launch (2x131k)    — launch A via sample_one_light
  hit_record+shade math  — full-pool shading work
  refill                 — fresh camera samples for dead lanes
  film scatter           — add_samples at 131k
Prints ms/call after warmup + compile seconds per piece.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.samplers import samplers as sa
from pbrt_tpu.integrators.path import PathConfig, make_pixel_grid
from pbrt_tpu.integrators import wavefront as wfm
from pbrt_tpu.integrators import common
from pbrt_tpu.statics import scene_statics
from pbrt_tpu import film as fm
from pbrt_tpu.accel import traverse as tv
from pbrt_tpu.materials import bsdf as bx

N_LANES = 1 << 17


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    out = jax.block_until_ready(out)
    per = (time.time() - t0) / reps
    print(f"{name:30s} {per*1e3:9.1f} ms/call   (compile {compile_s:.1f}s)",
          flush=True)
    return out


def main():
    scene, camera, film_cfg, sampler_cfg, cfg, filt = B.build()
    import dataclasses

    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    statics = scene_statics(scene)
    qt = statics.quadric_types
    print("device:", jax.devices()[0], " sampler:", sampler_cfg.name,
          " lanes:", N_LANES, flush=True)

    from pbrt_tpu.filters import make_filter

    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    n_pix = int(pixels.shape[0])
    total = n_pix * sampler_cfg.spp

    if cfg.light_strategy == "spatial":
        from pbrt_tpu.lights.lightdistrib import ensure_spatial_light_distribution

        scene = ensure_spatial_light_distribution(scene, statics.light_types)
        scene = jax.device_put(scene)

    init = jax.jit(functools.partial(
        wfm._initial_state, sampler_cfg=sampler_cfg, statics=statics,
        total=total, n_lanes=N_LANES,
    ))
    t0 = time.time()
    state = jax.block_until_ready(init(scene, camera, film_state, pixels=pixels))
    print(f"init (refill+first trace): {time.time()-t0:.1f}s incl compile",
          flush=True)

    it = functools.partial(
        wfm._iteration, sampler_cfg=sampler_cfg, cfg=cfg, statics=statics,
    )

    @jax.jit
    def one_iter(scene, camera, state):
        return it(state, scene=scene, camera=camera, pixels=pixels)

    state2 = timeit("full iteration", one_iter, scene, camera, state)

    # --- sampler dose ---
    dims = state["dim"]
    samp = state["sampler"]

    @jax.jit
    def dyn_draws(samp, dims):
        acc = jnp.zeros((N_LANES,), jnp.float32)
        for k in range(8):
            acc = acc + sa.get_1d_dyn(sampler_cfg, dict(samp), dims + k)
        return acc

    timeit("dyn sampler 1D draw x8", dyn_draws, samp, dims)

    @jax.jit
    def static_draws(samp):
        acc = jnp.zeros((N_LANES,), jnp.float32)
        for k in range(8):
            acc = acc + sa.get_1d(sampler_cfg, dict(samp), 5 + k)
        return acc

    timeit("static sampler 1D draw x8", static_draws, samp)

    # --- ray sort ---
    from pbrt_tpu.ops import pallas_bvh as pk

    o, d = state["o"], state["d"]

    @jax.jit
    def sort_once(o, d):
        key = pk.sort_rays_key(scene, o, d)
        return jnp.argsort(key)

    timeit("argsort 131k", sort_once, o, d)

    o2 = jnp.concatenate([o, o])
    d2 = jnp.concatenate([d, d])

    @jax.jit
    def sort_twice(o, d):
        key = pk.sort_rays_key(scene, o, d)
        return jnp.argsort(key)

    timeit("argsort 262k", sort_twice, o2, d2)

    # --- traversal launches ---
    @jax.jit
    def closest(o, d):
        return tv.intersect_closest(scene, o, d, 1e30, qt)

    t, prim = timeit("closest-hit 131k", closest, o, d)

    @jax.jit
    def closest2(o, d):
        return tv.intersect_closest(scene, o, d, 1e30, qt)

    timeit("closest-hit 262k", closest2, o2, d2)

    # --- shading work on the full pool ---
    @jax.jit
    def shade(state, t, prim):
        rec = tv.hit_record(scene, state["o"], state["d"], t, prim, qt)
        from pbrt_tpu.integrators.path import eval_scene_textures

        tex_vals = eval_scene_textures(scene, rec, statics, duv=None)
        mat = bx.gather_material(scene.materials, rec["material"], tex_vals,
                                 statics.mat_types, uv=rec["uv"])
        frame = bx.make_frame(rec["ns"], rec["dpdu"])
        ss, ts_, ns = frame
        wo_local = bx.to_local(ss, ts_, ns, rec["wo"])
        u = sa.get_2d_dyn(sampler_cfg, dict(state["sampler"]), state["dim"])
        bs = bx.sample_material(mat, wo_local, u, statics.mat_types)
        return rec, frame, mat, wo_local, bs

    rec, frame, mat, wo_local, bs = timeit("hit_record+textures+shade",
                                           shade, state, t, prim)

    # --- NEE launch via sample_one_light (launch A) ---
    @jax.jit
    def nee(state, t, prim):
        rec = tv.hit_record(scene, state["o"], state["d"], t, prim, qt)
        from pbrt_tpu.integrators.path import eval_scene_textures

        tex_vals = eval_scene_textures(scene, rec, statics, duv=None)
        mat = bx.gather_material(scene.materials, rec["material"], tex_vals,
                                 statics.mat_types, uv=rec["uv"])
        frame = bx.make_frame(rec["ns"], rec["dpdu"])
        wo_local = bx.to_local(*frame, rec["wo"])
        u_sel = sa.get_1d_dyn(sampler_cfg, dict(state["sampler"]), state["dim"])
        u_li = sa.get_2d_dyn(sampler_cfg, dict(state["sampler"]), state["dim"] + 1)
        u_sc = sa.get_2d_dyn(sampler_cfg, dict(state["sampler"]), state["dim"] + 3)
        nonspec = bx.count_nonspecular(mat, statics.mat_types) & rec["hit"]
        return common.sample_one_light(
            scene, rec, frame, mat, wo_local, u_sel, u_li, u_sc,
            nonspec, statics.mat_types, statics.light_types, qt,
        )

    timeit("NEE launch (shadow+MIS 2N)", nee, state, t, prim)

    # --- refill ---
    @jax.jit
    def refill(state):
        st = dict(state, alive=jnp.zeros((N_LANES,), bool))
        return wfm._refill(st, scene, camera, sampler_cfg, statics, pixels)

    timeit("refill (all lanes dead)", refill, state)

    # --- film scatter ---
    @jax.jit
    def scatter(state):
        return fm.add_samples(
            state["film"], state["p_film"],
            jnp.ones((N_LANES, 3), jnp.float32), state["cam_w"],
            mask=state["alive"],
        )

    timeit("film scatter 131k", scatter, state)

    # --- superstep k=8 (the production unit) ---
    @functools.partial(jax.jit, static_argnames=("k",))
    def superstep(scene, camera, state, k):
        def body(_, st):
            return it(st, scene=scene, camera=camera, pixels=pixels)
        return jax.lax.fori_loop(0, k, body, state)

    timeit("superstep k=8", superstep, scene, camera, state, 8, reps=1)


if __name__ == "__main__":
    main()
