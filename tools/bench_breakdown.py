#!/usr/bin/env python
"""Stage-level timing of the killeroo path step on the real chip.

Times, as separate jits over one 40k-ray batch:
  ray-gen+sampler | closest-hit kernel | hit_record | shading+NEE-math-only
  | shadow traversal | full bounce | full li_path depth-5
Prints seconds per call after warmup.  This is the tool for deciding where
round-1 perf time goes (NOTES.md: kernel ~2 Mrays/s but end-to-end 0.139).
"""
from __future__ import annotations

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
from pbrt_tpu.integrators.path import PathConfig, make_pixel_grid, li_path
from pbrt_tpu.integrators import common
from pbrt_tpu.statics import scene_statics
from pbrt_tpu import film as fm
from pbrt_tpu.cameras import generate_rays
from pbrt_tpu.accel import traverse as tv
from pbrt_tpu.materials import bsdf as bx


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    per = (time.time() - t0) / reps
    print(f"{name:28s} {per*1e3:9.1f} ms/call   (compile {compile_s:.1f}s)")
    return out


def main():
    scene, camera = B.build_scene()
    # One-time upload: numpy leaves passed as jit args re-upload per call
    # through the remote tunnel (~300ms/17MB) and poison every measurement.
    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    RES = B.RES
    film_cfg = fm.FilmConfig(full_resolution=RES)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))[:40960]
    sampler_cfg = SamplerConfig("sobol", 8, RES)
    statics = scene_statics(scene)
    qt = statics.quadric_types
    print("device:", jax.devices()[0], " quadric_types:", qt)

    n = pixels.shape[0]

    @jax.jit
    def raygen(pixels, s):
        state = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
        o, d, _, _ = generate_rays(camera, p_film, p_lens, time_u)
        return o, d

    o, d = timeit("raygen+sampler", raygen, pixels, jnp.uint32(0))

    @jax.jit
    def closest(o, d):
        return tv.intersect_closest(scene, o, d, 1e30, qt)

    t, prim = timeit("closest-hit traversal", closest, o, d)

    @jax.jit
    def hitrec(o, d, t, prim):
        return tv.hit_record(tv._device_scene(scene), o, d, t, prim, qt)

    rec = timeit("hit_record", hitrec, o, d, t, prim)

    @jax.jit
    def shade_math(scene, o, d, t, prim, s):
        rec = tv.hit_record(scene, o, d, t, prim, qt)
        state = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        mat = bx.gather_material(
            scene.materials, rec["material"], None, statics.mat_types,
            uv=rec["uv"],
        )
        frame = bx.make_frame(rec["ns"], rec["dpdu"])
        ss, ts, ns = frame
        wo_local = bx.to_local(ss, ts, ns, rec["wo"])
        u = sa.get_2d(sampler_cfg, state, 5)
        bs = bx.sample_material(mat, wo_local, u, statics.mat_types)
        f, pdf = bx.eval_material(mat, wo_local, bs["wi"], statics.mat_types)
        return f, pdf, bs["wi"]

    timeit("shading math (no rays)", shade_math, scene, o, d, t, prim, jnp.uint32(0))

    @jax.jit
    def shadow(scene, o, d, t, prim):
        rec = tv.hit_record(scene, o, d, t, prim, qt)
        p_l = rec["p"] + jnp.asarray([0.0, 0.0, 10.0])
        return common.occluded(scene, rec["p"], rec["p_error"], rec["ng"], p_l, qt)

    timeit("hit_record+shadow trace", shadow, scene, o, d, t, prim)

    cfg1 = PathConfig(max_depth=0)

    def fullpath(depth):
        cfg = PathConfig(max_depth=depth)

        @jax.jit
        def run(scene, o, d, s):
            state = sa.init_state(
                sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32)
            )
            return li_path(scene, o, d, sampler_cfg, state, cfg, statics)

        return run

    timeit("li_path depth-1", fullpath(1), scene, o, d, jnp.uint32(0))
    timeit("li_path depth-5", fullpath(5), scene, o, d, jnp.uint32(0))

    # ---- full 160k-pixel sample batch, film included (the bench's jitted
    # unit of work) — round-3 verdict item 1's per-stage extension ----
    from pbrt_tpu.integrators import path as pt
    from pbrt_tpu.filters import make_filter

    full_pixels = jnp.asarray(make_pixel_grid(film_cfg))
    film_state = fm.make_film_state(film_cfg, make_filter("box"))
    step = pt._step_fn(sampler_cfg, PathConfig(max_depth=5), statics, False)
    timeit(
        "render_sample_batch 160k d5",
        lambda s: step(scene, camera, film_state, full_pixels, s),
        jnp.uint32(0),
    )

    nfull = full_pixels.shape[0]

    @jax.jit
    def raygen_full(pixels, s):
        state = sa.init_state(
            sampler_cfg, pixels, jnp.full((nfull,), s, jnp.uint32)
        )
        p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
        o, d, _, _ = generate_rays(camera, p_film, p_lens, time_u)
        return o, d

    o_f, d_f = timeit("raygen 160k", raygen_full, full_pixels, jnp.uint32(0))

    @jax.jit
    def closest_full(o, d):
        return tv.intersect_closest(scene, o, d, 1e30, qt)

    timeit("closest-hit 160k", closest_full, o_f, d_f)

    def fullpath_160k(depth):
        cfg = PathConfig(max_depth=depth)

        @jax.jit
        def run(scene, o, d, s):
            state = sa.init_state(
                sampler_cfg, full_pixels, jnp.full((nfull,), s, jnp.uint32)
            )
            return li_path(scene, o, d, sampler_cfg, state, cfg, statics)

        return run

    timeit("li_path 160k d5", fullpath_160k(5), scene, o_f, d_f, jnp.uint32(0))


if __name__ == "__main__":
    main()
