#!/usr/bin/env python
"""Headline benchmark: killeroo-simple path tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mrays/s (closest-hit + shadow + MIS rays actually traced, the analog
of pbrt's printed ray counters, scene.cpp:40-43) on
scenes/killeroo-simple.pbrt at 400x400 @ 8spp, path depth 5 (BASELINE.json
config #1), rendered END-TO-END by the streaming wavefront engine
(integrators/wavefront.py): persistent lane pool, compaction by refill,
lax.while-driven superstep.  The timed region is the full second render
(film included); compile + scene build are reported separately.
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RES = (400, 400)
SPP = 8
KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"


def build():
    from pbrt_tpu.sceneio import parse_pbrt_file

    if os.path.exists(KILLEROO):
        setup = parse_pbrt_file(KILLEROO)
        scene = setup.build_scene()
        setup.film_params._items["xresolution"] = ("integer", [RES[0]])
        setup.film_params._items["yresolution"] = ("integer", [RES[1]])
        camera = setup.make_camera()
        film_cfg, filt = setup.make_film_config()
        cfg = setup.make_integrator_config()
        import dataclasses

        film_cfg = dataclasses.replace(film_cfg, full_resolution=RES)
        sampler_cfg = dataclasses.replace(
            setup.make_sampler_config(), spp=SPP, resolution=RES
        )
        return scene, camera, film_cfg, sampler_cfg, cfg, filt
    raise SystemExit(f"{KILLEROO} missing")


def main():
    import jax

    t_setup = time.time()
    scene, camera, film_cfg, sampler_cfg, cfg, filt = build()
    from pbrt_tpu.integrators import wavefront as wf

    setup_s = time.time() - t_setup

    # Warmup/compile: 1spp render reuses the same compiled superstep (the
    # work total is a traced scalar, not a baked constant).
    import dataclasses

    t0 = time.time()
    warm_cfg = dataclasses.replace(sampler_cfg, spp=1)
    _img, _n = wf.render(
        scene, camera, film_cfg, warm_cfg, cfg, filt, count_rays=True
    )
    compile_s = time.time() - t0

    t0 = time.time()
    img, n_rays = wf.render(
        scene, camera, film_cfg, sampler_cfg, cfg, filt, count_rays=True
    )
    wall = time.time() - t0
    mrays = n_rays / wall / 1e6

    prev = None
    runs = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")))
    for r in reversed(runs):
        try:
            d = json.load(open(r))
            d = d.get("parsed", d)  # driver wraps the JSON line under "parsed"
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
                    "total_rays": float(n_rays),
                    "wall_s": round(wall, 3),
                    "compile_s": round(compile_s, 1),
                    "scene_setup_s": round(setup_s, 1),
                    "engine": "wavefront-pool",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
