#!/usr/bin/env python
"""First-divergence instrument (round-3 verdict item 4b).

Dumps per-(pixel, sample, bounce) path records — incoming ray direction,
hit position, throughput — from BOTH the instrumented reference binary
(PBRT_PATH_DUMP env; see build_reference.sh + the .refbuild patches) and
our lockstep engine, then reports where per-path streams first decohere
and by which signal (direction = sampling flip upstream; position with
matching direction = traversal flip; hit-flag = silhouette flip).

Usage:
  python refgold/path_divergence.py refgold/parity/killeroo_64_4spp.pbrt
"""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PBRT_EXE = os.path.join(REPO, ".refbuild", "pbrt_exe")

REC_DTYPE = np.dtype([
    ("px", "<i4"), ("py", "<i4"), ("s", "<i4"), ("bounce", "<i4"),
    ("hit", "<i4"), ("p", "<f4", 3), ("d", "<f4", 3), ("beta", "<f4", 3),
    ("sdpdu", "<f4", 3), ("sn", "<f4", 3), ("gn", "<f4", 3),
])


def dump_reference(scene_path, out_bin):
    env = dict(os.environ, PBRT_PATH_DUMP=out_bin)
    subprocess.run(
        [PBRT_EXE, os.path.abspath(scene_path), "--nthreads", "1"],
        cwd=os.path.dirname(os.path.abspath(scene_path)),
        env=env, check=True, capture_output=True,
    )
    return np.fromfile(out_bin, REC_DTYPE)


def dump_ours(scene_path):
    """Per-bounce records from the unrolled lockstep loop (the semantic
    reference implementation)."""
    import jax
    import jax.numpy as jnp
    from pbrt_tpu.sceneio import parse_pbrt_file
    from pbrt_tpu.integrators import path as pt
    from pbrt_tpu.samplers import samplers as sa
    from pbrt_tpu.statics import scene_statics
    from pbrt_tpu.accel import traverse as tv
    from pbrt_tpu.cameras import generate_rays
    from pbrt_tpu.lights.lightdistrib import ensure_spatial_light_distribution
    from pbrt_tpu.utils import stats as st
    from pbrt_tpu import film as fm

    setup = parse_pbrt_file(scene_path)
    scene = setup.build_scene()
    camera = setup.make_camera()
    film_cfg, _ = setup.make_film_config()
    scfg = setup.make_sampler_config()
    cfg = setup.make_integrator_config()
    statics = scene_statics(scene)
    if cfg.light_strategy == "spatial":
        scene = ensure_spatial_light_distribution(scene, statics.light_types)
    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    pixels = pt.make_pixel_grid(film_cfg)
    n = pixels.shape[0]
    pixels_j = jnp.asarray(pixels)

    @jax.jit
    def run_sample(scene, camera, s_num):
        state = sa.init_state(
            scfg, pixels_j, jnp.full((n,), s_num, jnp.uint32)
        )
        p_film, tu, pl = sa.get_camera_sample(scfg, state, pixels_j)
        o, d, _, _ = generate_rays(camera, p_film, pl, tu)
        t, prim = tv.intersect_closest(scene, o, d, 1e30, statics.quadric_types)
        carry = (
            jnp.zeros((n, 3), jnp.float32), jnp.ones((n, 3), jnp.float32),
            jnp.ones((n,), bool), jnp.zeros((n,), bool),
            jnp.ones((n,), jnp.float32), o, d, t, prim, st.zeros(),
        )
        recs = []
        dim = 5
        for b in range(cfg.max_depth + 1):
            (L, beta, alive, spec, eta, o_c, d_c, t_c, prim_c, _c) = carry
            rec = tv.hit_record(scene, o_c, d_c, t_c, prim_c,
                                statics.quadric_types)
            recs.append((alive, rec["hit"], rec["p"], d_c, beta,
                         rec["ss"], rec["ns"], rec["ng"]))
            body = pt._make_bounce_body(
                b, dim, scfg, state, cfg, statics, True, None
            )
            carry = body(scene, carry)
            dim += pt._dims_per_bounce(b, statics.mat_types)
        return recs

    out = []
    for s in range(scfg.spp):
        recs = run_sample(scene, camera, jnp.uint32(s))
        for b, (alive, hit, p, d, beta, ssv, nsv, ngv) in enumerate(recs):
            alive = np.asarray(alive)
            r = np.zeros(n, REC_DTYPE)
            r["px"], r["py"] = pixels[:, 0], pixels[:, 1]
            r["s"] = s
            r["bounce"] = b
            r["hit"] = np.asarray(hit).astype(np.int32)
            r["p"] = np.asarray(p)
            r["d"] = np.asarray(d)
            r["beta"] = np.asarray(beta)
            r["sdpdu"] = np.asarray(ssv)
            r["sn"] = np.asarray(nsv)
            r["gn"] = np.asarray(ngv)
            out.append(r[alive])  # pbrt stops dumping when the path ends
    return np.concatenate(out)


def key(r):
    return (r["px"].astype(np.int64) << 40) | (r["py"].astype(np.int64) << 20) \
        | (r["s"].astype(np.int64) << 4) | r["bounce"].astype(np.int64)


def main():
    scene_path = sys.argv[1]
    ref = dump_reference(scene_path, "/tmp/ref_paths.bin")
    ours = dump_ours(scene_path)
    kr, ko = key(ref), key(ours)
    ref = ref[np.argsort(kr)]; kr = np.sort(kr)
    ours = ours[np.argsort(ko)]; ko = np.sort(ko)
    common, ir, io = np.intersect1d(kr, ko, return_indices=True)
    R, O = ref[ir], ours[io]
    dp = np.linalg.norm(R["p"] - O["p"], axis=-1)
    dd = np.linalg.norm(R["d"] - O["d"], axis=-1)
    hit_flip = R["hit"] != O["hit"]
    POS_EPS, DIR_EPS = 1e-2, 1e-4  # scene units ~ hundreds; dirs unit
    diverged = (dp > POS_EPS) | (dd > DIR_EPS) | hit_flip

    # First divergent bounce per path.
    pkey = common >> 4
    order = np.lexsort((common & 15, pkey))
    pk_s, b_s, div_s = pkey[order], (common & 15)[order], diverged[order]
    dd_s, dp_s, hf_s = dd[order], dp[order], hit_flip[order]
    first = {}
    cls = {}
    for i in range(len(pk_s)):
        k = pk_s[i]
        if k in first:
            continue
        if div_s[i]:
            first[k] = int(b_s[i])
            if hf_s[i]:
                cls[k] = "hit-flip"
            elif dd_s[i] > DIR_EPS:
                cls[k] = "direction"  # upstream sampling flip
            else:
                cls[k] = "position"   # traversal difference
    n_paths = len(np.unique(pkey))
    print(f"paths compared: {n_paths}; records: {len(common)} "
          f"(ref {len(ref)}, ours {len(ours)})")
    print(f"paths with a divergence: {len(first)} "
          f"({100.0 * len(first) / max(n_paths, 1):.1f}%)")
    import collections
    hb = collections.Counter(first.values())
    hc = collections.Counter(cls.values())
    print("first-divergence bounce histogram:",
          dict(sorted(hb.items())))
    print("first-divergence class histogram:", dict(hc))
    # Residual ulp-noise stats on NON-diverged records.
    ok = ~diverged
    print(f"non-diverged records: |dp| median {np.median(dp[ok]):.2e} "
          f"p99 {np.percentile(dp[ok], 99):.2e}")
    # Shading-frame agreement on matching-position hit records: ours stores
    # the UNIT shading tangent; pbrt's shading.dpdu for normal-meshes is the
    # adjusted unit ss (triangle.cpp) and raw dpdu elsewhere -> compare
    # normalized.
    both_hit = (R["hit"] == 1) & (O["hit"] == 1) & (dp <= POS_EPS)
    rs = R["sdpdu"][both_hit]; os_ = O["sdpdu"][both_hit]
    rs = rs / np.maximum(np.linalg.norm(rs, axis=-1, keepdims=True), 1e-20)
    os_ = os_ / np.maximum(np.linalg.norm(os_, axis=-1, keepdims=True), 1e-20)
    dss = np.linalg.norm(rs - os_, axis=-1)
    dns = np.linalg.norm(R["sn"][both_hit] - O["sn"][both_hit], axis=-1)
    print(f"shading frame on agreeing hits: |d ss| median {np.median(dss):.2e} "
          f"p99 {np.percentile(dss, 99):.2e} frac>1e-3 {np.mean(dss > 1e-3):.3f}")
    dgn = np.linalg.norm(R["gn"][both_hit] - O["gn"][both_hit], axis=-1)
    print(f"geometric normal (triangle identity proxy): frac>1e-3 "
          f"{np.mean(dgn > 1e-3):.3f}  frac sign-flip(|d|>1) "
          f"{np.mean(dgn > 1.0):.3f}")
    print(f"shading normal: |d ns| median {np.median(dns):.2e} "
          f"frac>1e-3 {np.mean(dns > 1e-3):.3f}")


if __name__ == "__main__":
    main()
