#!/usr/bin/env python
"""Headline benchmark: killeroo-simple path tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mrays/s (closest-hit + shadow + MIS rays actually traced, the analog
of pbrt's printed ray counters, scene.cpp:40-43) on
scenes/killeroo-simple.pbrt at 400x400 @ 8spp, path depth 5 (BASELINE.json
config #1).  vs_baseline is vs the previous recorded run (BENCH_r*.json) or
1.0 on the first run — the reference publishes no numbers (BASELINE.md).
"""
from __future__ import annotations

import functools
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RES = (400, 400)
SPP = 8
KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"


def build_scene():
    import numpy as np

    if os.path.exists(KILLEROO):
        from pbrt_tpu.sceneio import parse_pbrt_file

        setup = parse_pbrt_file(KILLEROO)
        scene = setup.build_scene()
        setup.film_params._items["xresolution"] = ("integer", [RES[0]])
        setup.film_params._items["yresolution"] = ("integer", [RES[1]])
        camera = setup.make_camera()
        return scene, camera
    import __graft_entry__ as ge

    return ge._demo_scene(), ge._camera(RES)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    t_setup = time.time()
    scene, camera = build_scene()

    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.integrators.path import PathConfig, make_pixel_grid, li_path
    from pbrt_tpu.statics import scene_statics
    from pbrt_tpu import film as fm
    from pbrt_tpu.samplers import samplers as sa
    from pbrt_tpu.cameras import generate_rays

    film_cfg = fm.FilmConfig(full_resolution=RES)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    sampler_cfg = SamplerConfig("sobol", SPP, RES)
    cfg = PathConfig(max_depth=5)
    statics = scene_statics(scene)

    def batch(scene, camera, pixels, s):
        n = pixels.shape[0]
        state = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
        o, d, _, _ = generate_rays(camera, p_film, p_lens, time_u)
        L, n_rays = li_path(
            scene, o, d, sampler_cfg, state, cfg, statics, count_rays=True,
        )
        return jnp.sum(L), n_rays

    step = jax.jit(batch)
    # One-time upload: numpy-leaf pytrees re-upload per jit call otherwise.
    scene = jax.device_put(jax.tree_util.tree_map(jnp.asarray, scene))
    camera = jax.device_put(camera)
    setup_s = time.time() - t_setup

    # Pixels processed in fixed-size chunks.  160k is stable since the
    # packet kernel became grid-pipelined (per-packet VMEM blocks; the old
    # whole-batch-in-VMEM layout faulted the chip above ~100k rays).
    CHUNK = 160000
    n_pix = pixels.shape[0]
    chunks = [pixels[i : i + CHUNK] for i in range(0, n_pix, CHUNK)
              if i + CHUNK <= n_pix] or [pixels[:CHUNK]]

    # Warmup/compile.
    t0 = time.time()
    _ = jax.block_until_ready(step(scene, camera, chunks[0], jnp.uint32(0)))
    compile_s = time.time() - t0

    # Timed: TIMED sample batches over all chunks (throughput metric;
    # full-spp renders are the same rate x more batches).
    TIMED = 2
    t0 = time.time()
    total_rays = 0.0
    for s in range(1, 1 + TIMED):
        for ch in chunks:
            out, n_rays = step(scene, camera, ch, jnp.uint32(s))
            total_rays += float(n_rays)
    out = jax.block_until_ready(out)
    wall = time.time() - t0

    mrays = total_rays / wall / 1e6

    prev = None
    runs = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")))
    for r in reversed(runs):
        try:
            d = json.load(open(r))
            if "value" in d:
                prev = float(d["value"])
                break
        except Exception:
            pass
    vs = mrays / prev if prev else 1.0

    print(
        json.dumps(
            {
                "metric": "killeroo-simple 400x400@8spp path-d5 rays traced per second (1 chip)",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(vs, 3),
                "detail": {
                    "total_rays": total_rays,
                    "wall_s": round(wall, 3),
                    "compile_s": round(compile_s, 1),
                    "scene_setup_s": round(setup_s, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
