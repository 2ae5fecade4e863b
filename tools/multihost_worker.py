#!/usr/bin/env python
"""One process of a multi-host render (SURVEY.md §5.8 P7 scaling harness).

Launched K times by tools/bench_scaling.py (or tests/test_multihost.py) with
--nproc K --pid i; the processes form one JAX distributed cluster over
simulated CPU devices and render the SAME image cooperatively via
pbrt_tpu.parallel.multihost.render.  Process 0 writes {img, wall_s, rays}
to --out.

On a real TPU pod the same code runs with one process per host and no
--devices-per-proc override (the TPU runtime supplies the devices).
"""
import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--port", type=int, default=21357)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--scene", default="demo", choices=["demo", "killeroo"])
    ap.add_argument("--out", default="")
    ap.add_argument("--timed-reps", type=int, default=1)
    args = ap.parse_args()

    # Environment BEFORE importing jax: each process owns its own simulated
    # CPU devices; the distributed runtime stitches them into one mesh.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_proc}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")

    from pbrt_tpu.parallel import multihost

    if args.nproc > 1:
        multihost.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nproc,
            process_id=args.pid,
        )

    import numpy as np
    import jax.numpy as jnp  # noqa: F401
    import __graft_entry__ as ge
    from pbrt_tpu import film as fm
    from pbrt_tpu.filters import make_filter
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.integrators.path import PathConfig

    res = (args.res, args.res)
    killeroo = "/root/reference/scenes/killeroo-simple.pbrt"
    if args.scene == "killeroo" and os.path.exists(killeroo):
        import dataclasses
        from pbrt_tpu.sceneio import parse_pbrt_file

        setup = parse_pbrt_file(killeroo)
        scene = setup.build_scene()
        setup.film_params._items["xresolution"] = ("integer", [res[0]])
        setup.film_params._items["yresolution"] = ("integer", [res[1]])
        camera = setup.make_camera()
        film_cfg, filt = setup.make_film_config()
        film_cfg = dataclasses.replace(film_cfg, full_resolution=res)
        sampler_cfg = dataclasses.replace(
            setup.make_sampler_config(), spp=args.spp, resolution=res
        )
        cfg = setup.make_integrator_config()
    else:
        scene = ge._demo_scene()
        camera = ge._camera(res)
        film_cfg = fm.FilmConfig(full_resolution=res)
        filt = make_filter("box")
        sampler_cfg = SamplerConfig("sobol", args.spp, res)
        cfg = PathConfig(max_depth=args.depth)

    def run():
        return multihost.render(
            scene, camera, film_cfg, sampler_cfg, cfg, filt,
            count_rays=True,
        )

    img, rays = run()  # compile + first render
    t0 = time.time()
    for _ in range(args.timed_reps):
        img, rays = run()
    wall = (time.time() - t0) / args.timed_reps

    img = np.asarray(img)
    if args.pid == 0 and args.out:
        np.savez(args.out, img=img, wall_s=wall, rays=float(rays))
        print(json.dumps({
            "nproc": args.nproc, "wall_s": round(wall, 3),
            "rays": float(rays),
            "mrays_s": round(float(rays) / wall / 1e6, 4),
            "img_mean": float(img.mean()),
        }))


if __name__ == "__main__":
    main()
