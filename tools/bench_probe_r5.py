#!/usr/bin/env python
"""Round-5 perf hunt: piecewise timing of hit_record / shading internals at
the bench batch size (160k lanes) on the real chip.

The layout probe (tools/bench_layout_probe.py) killed the [N,3]-lane-waste
theory: a fused 60-op vec3 chain runs in 0.02ms.  So hit_record's 13ms and
shading's 13ms at 40k lanes come from something XLA does NOT fuse well.
This probe bisects them: gathers alone, intersect_triangle alone,
triangle_geometry, the quadric branch, sampler draws, material dispatch,
light NEE math.
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
from pbrt_tpu.integrators.path import PathConfig, make_pixel_grid
from pbrt_tpu.integrators import common
from pbrt_tpu.statics import scene_statics
from pbrt_tpu import film as fm
from pbrt_tpu.cameras import generate_rays
from pbrt_tpu.accel import traverse as tv
from pbrt_tpu.materials import bsdf as bx
from pbrt_tpu.shapes.triangle import intersect_triangle, triangle_geometry

N = 160 * 1024


def timeit(name, fn, *args, reps=10):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    per = (time.time() - t0) / reps
    print(f"{name:34s} {per*1e3:8.2f} ms/call  (compile {comp:.1f}s)",
          flush=True)
    return out


def main():
    scene, camera = B.build_scene()
    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    film_cfg = fm.FilmConfig(full_resolution=B.RES)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))[:N]
    sampler_cfg = SamplerConfig("halton", 8, B.RES)
    statics = scene_statics(scene)
    qt = statics.quadric_types
    print("device:", jax.devices()[0], " N:", N, " quadrics:", qt, flush=True)
    n = pixels.shape[0]

    @jax.jit
    def raygen(pixels, s):
        state = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
        o, d, _, _ = generate_rays(camera, p_film, p_lens, time_u)
        return o, d

    o, d = timeit("raygen+sampler (halton)", raygen, pixels, jnp.uint32(0))

    @jax.jit
    def closest(o, d):
        return tv.intersect_closest(scene, o, d, 1e30, qt)

    t, prim = timeit("closest-hit traversal", closest, o, d)

    # ---- hit_record bisection ----
    @jax.jit
    def gathers_only(o, t, prim):
        pid = jnp.clip(prim, 0, scene.prim_type.shape[0] - 1)
        meta = scene.prim_meta[pid]
        pidx = meta[..., 1]
        attr = scene.tri_attr[jnp.clip(pidx, 0, scene.tri_attr.shape[0] - 1)]
        return meta.sum() + attr.sum()

    timeit("  hr: row gathers only", gathers_only, o, t, prim)

    @jax.jit
    def tri_only(o, d, t, prim):
        pid = jnp.clip(prim, 0, scene.prim_type.shape[0] - 1)
        meta = scene.prim_meta[pid]
        pidx = meta[..., 1]
        attr = scene.tri_attr[jnp.clip(pidx, 0, scene.tri_attr.shape[0] - 1)]
        p0, p1, p2 = attr[..., 0:3], attr[..., 3:6], attr[..., 6:9]
        tri = intersect_triangle(o, d, t * 1.0001 + 1e-6, p0, p1, p2)
        return tri["p_hit"].sum() + tri["b0"].sum()

    timeit("  hr: gathers+intersect_tri", tri_only, o, d, t, prim)

    @jax.jit
    def tri_geom(o, d, t, prim):
        pid = jnp.clip(prim, 0, scene.prim_type.shape[0] - 1)
        meta = scene.prim_meta[pid]
        pidx = meta[..., 1]
        attr = scene.tri_attr[jnp.clip(pidx, 0, scene.tri_attr.shape[0] - 1)]
        p0, p1, p2 = attr[..., 0:3], attr[..., 3:6], attr[..., 6:9]
        ng, dpdu, dpdv = triangle_geometry(
            p0, p1, p2, attr[..., 9:11], attr[..., 11:13], attr[..., 13:15]
        )
        return ng.sum() + dpdu.sum()

    timeit("  hr: gathers+tri_geometry", tri_geom, o, d, t, prim)

    @jax.jit
    def hr_noquad(o, d, t, prim):
        return tv._hit_record(scene, o, d, t, prim, ())

    timeit("  hr: full, NO quadric branch", hr_noquad, o, d, t, prim)

    @jax.jit
    def hr_full(o, d, t, prim):
        return tv._hit_record(scene, o, d, t, prim, qt)

    rec = timeit("  hr: full (with quadrics)", hr_full, o, d, t, prim)
    rec = jax.tree_util.tree_map(jax.block_until_ready, rec)

    # ---- sampler draws ----
    state = sa.init_state(sampler_cfg, pixels, jnp.zeros((n,), jnp.uint32))

    @jax.jit
    def draws(pixels, s):
        st = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        acc = 0.0
        for dd in range(5, 12):
            acc = acc + sa.get_1d(sampler_cfg, st, dd)
        return acc

    timeit("7 halton 1D draws (static dim)", draws, pixels, jnp.uint32(0))

    # ---- shading bisection ----
    @jax.jit
    def texmat(rec):
        from pbrt_tpu.integrators.path import eval_scene_textures

        tex = eval_scene_textures(scene, rec, statics, duv=None)
        mat = bx.gather_material(
            scene.materials, rec["material"], tex, statics.mat_types,
            uv=rec["uv"],
        )
        return jax.tree_util.tree_map(
            lambda x: x.sum() if hasattr(x, "sum") else 0.0, mat
        )

    timeit("  sh: textures+gather_material", texmat, rec)

    @jax.jit
    def bsdf_sample(rec, s):
        st = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        from pbrt_tpu.integrators.path import eval_scene_textures

        tex = eval_scene_textures(scene, rec, statics, duv=None)
        mat = bx.gather_material(
            scene.materials, rec["material"], tex, statics.mat_types,
            uv=rec["uv"],
        )
        frame = bx.frame_from_rec(rec)
        ss, ts, ns = frame
        wo_local = bx.to_local(ss, ts, ns, rec["wo"])
        u = sa.get_2d(sampler_cfg, st, 10)
        bs = bx.sample_material(mat, wo_local, u, statics.mat_types)
        return bs["wi"].sum() + bs["f"].sum() + bs["pdf"].sum()

    timeit("  sh: +sample_material", bsdf_sample, rec, jnp.uint32(0))

    @jax.jit
    def nee_math(rec, s):
        """sample_one_light WITHOUT the traversal (occlusion forced off)."""
        st = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        from pbrt_tpu.integrators.path import eval_scene_textures
        from pbrt_tpu.lights import lights as lt

        tex = eval_scene_textures(scene, rec, statics, duv=None)
        mat = bx.gather_material(
            scene.materials, rec["material"], tex, statics.mat_types,
            uv=rec["uv"],
        )
        frame = bx.frame_from_rec(rec)
        ss, ts, ns = frame
        wo_local = bx.to_local(ss, ts, ns, rec["wo"])
        u_sel = sa.get_1d(sampler_cfg, st, 5)
        u_li = sa.get_2d(sampler_cfg, st, 6)
        n_lights = scene.lights.light_type.shape[0]
        light_i = jnp.clip(
            (u_sel * n_lights).astype(jnp.int32), 0, n_lights - 1
        )
        samp = lt.sample_li(
            scene, light_i, rec["p"], u_li, statics.light_types
        )
        wi_local = bx.to_local(ss, ts, ns, samp["wi"])
        f, pdf = bx.eval_material(mat, wo_local, wi_local, statics.mat_types)
        return f.sum() + pdf.sum() + samp["li"].sum() + samp["pdf"].sum()

    timeit("  sh: NEE math (no shadow ray)", nee_math, rec, jnp.uint32(0))

    # ---- full sample_one_light with merged launch ----
    @jax.jit
    def full_nee(rec, s):
        st = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        from pbrt_tpu.integrators.path import eval_scene_textures

        tex = eval_scene_textures(scene, rec, statics, duv=None)
        mat = bx.gather_material(
            scene.materials, rec["material"], tex, statics.mat_types,
            uv=rec["uv"],
        )
        frame = bx.frame_from_rec(rec)
        ss, ts, ns = frame
        wo_local = bx.to_local(ss, ts, ns, rec["wo"])
        u_sel = sa.get_1d(sampler_cfg, st, 5)
        u_li = sa.get_2d(sampler_cfg, st, 6)
        u_sc = sa.get_2d(sampler_cfg, st, 8)
        u_b = sa.get_2d(sampler_cfg, st, 10)
        bs = bx.sample_material(mat, wo_local, u_b, statics.mat_types)
        wi_world = bx.to_world(ss, ts, ns, bs["wi"])
        from pbrt_tpu.core.vecmath import offset_ray_origin

        o_next = offset_ray_origin(
            rec["p"], rec["p_error"], rec["ng"], wi_world
        )
        mask = rec["hit"] & (rec["material"] >= 0)
        ld, (t2, p2) = common.sample_one_light(
            scene, rec, frame, mat, wo_local, u_sel, u_li, u_sc,
            mask, statics.mat_types, statics.light_types, qt,
            extra_ray=(o_next, wi_world),
        )
        return ld.sum() + t2.sum()

    timeit("  sh: full NEE+merged 3N launch", full_nee, rec, jnp.uint32(0))

    # ---- film ----
    from pbrt_tpu.filters import make_filter

    film_state = fm.make_film_state(film_cfg, make_filter("box"))
    L = jnp.abs(rec["p"])
    pf = pixels.astype(jnp.float32) + 0.5

    @jax.jit
    def film_add(fsstate, pf, L):
        return fm.add_samples(fsstate, pf, L, jnp.ones((n,), jnp.float32))

    timeit("film add_samples", film_add, film_state, pf, L)


if __name__ == "__main__":
    main()
