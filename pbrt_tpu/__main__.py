"""CLI entry: `python -m pbrt_tpu scene.pbrt [options]`.

Mirrors the reference CLI (main/pbrt.cpp:76-173): scene file(s), --outfile,
--quick (reduce spp), --cropwindow, --quiet.
"""
from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pbrt_tpu")
    ap.add_argument("scenes", nargs="+", help=".pbrt scene files")
    ap.add_argument("--outfile", "-o", default=None)
    ap.add_argument("--quick", action="store_true", help="1/4 the spp")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--res", type=int, nargs=2, default=None)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=logging.WARNING if args.quiet else logging.INFO,
        format="%(levelname)s %(message)s",
    )
    from .render import render_file
    from .sceneio import parse_pbrt_file

    for scene_path in args.scenes:
        spp = args.spp
        if args.quick and spp is None:
            setup = parse_pbrt_file(scene_path)
            spp = max(1, setup.make_sampler_config().spp // 4)
        img, stats = render_file(
            scene_path, out=args.outfile, spp=spp, res=args.res
        )
        mrays = stats["camera_rays"] / stats["wall_s"] / 1e6
        print(
            f"{scene_path}: {stats['resolution'][0]}x{stats['resolution'][1]}"
            f" @ {stats['spp']}spp in {stats['wall_s']:.1f}s"
            f" ({mrays:.2f} Mcam-rays/s)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
