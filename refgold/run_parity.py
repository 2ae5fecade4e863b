#!/usr/bin/env python
"""Image-parity harness: render a .pbrt scene with BOTH the reference binary
(.refbuild/pbrt_exe, see build_reference.sh) and pbrt_tpu, and compare.

Usage:
  python refgold/run_parity.py scene.pbrt [--skip-ref] [--spp N] [--tol T]

The reference writes the PFM named by the scene's Film "string filename";
we write <name>.ours.pfm next to it.  Prints MSE / max-abs / pixel-match
stats as one JSON line, exit 0 iff match fraction >= --minfrac.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PBRT_EXE = os.path.join(REPO, ".refbuild", "pbrt_exe")


def read_pfm(path):
    with open(path, "rb") as f:
        head = f.readline().strip()
        assert head in (b"PF", b"Pf"), head
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        n = w * h * (3 if head == b"PF" else 1)
        data = np.fromfile(f, "<f4" if scale < 0 else ">f4", n)
    img = data.reshape(h, w, -1)
    return img[::-1]  # PFM scanlines are bottom-up


def write_pfm(path, img):
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"PF\n%d %d\n-1.000000\n" % (w, h))
        img[::-1].astype("<f4").tofile(f)


def run_reference(scene_path):
    scene_dir = os.path.dirname(os.path.abspath(scene_path))
    with open(scene_path) as f:
        m = re.search(r'"string filename"\s*\[?\s*"([^"]+)"', f.read())
    out_name = m.group(1) if m else "pbrt.exr"
    out_path = os.path.join(scene_dir, out_name)
    subprocess.run(
        [PBRT_EXE, os.path.abspath(scene_path)],
        cwd=scene_dir, check=True, capture_output=True,
    )
    return read_pfm(out_path), out_path


def run_ours(scene_path, spp=None):
    from pbrt_tpu.render import render_file

    out = os.path.abspath(scene_path) + ".ours.pfm"
    img, stats = render_file(scene_path, out=out, spp=spp)
    return read_pfm(out), out


def compare(ref, ours, tol):
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    d = np.abs(ref - ours)
    denom = np.maximum(np.abs(ref), 1e-2)
    rel = d / denom
    match = np.all(rel <= tol, axis=-1)
    return {
        "mse": float(np.mean((ref - ours) ** 2)),
        "max_abs": float(d.max()),
        "mean_abs": float(d.mean()),
        "match_frac": float(match.mean()),
        "ref_mean": float(ref.mean()),
        "ours_mean": float(ours.mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--tol", type=float, default=1e-3,
                    help="per-pixel relative tolerance for match_frac")
    ap.add_argument("--minfrac", type=float, default=0.0)
    ap.add_argument("--ref-pfm", default=None,
                    help="use a pre-rendered reference PFM instead of running pbrt_exe")
    args = ap.parse_args()

    if args.ref_pfm:
        ref = read_pfm(args.ref_pfm)
    else:
        ref, ref_path = run_reference(args.scene)
    ours, ours_path = run_ours(args.scene, spp=args.spp)
    stats = compare(ref, ours, args.tol)
    stats["scene"] = os.path.basename(args.scene)
    print(json.dumps(stats))
    return 0 if stats["match_frac"] >= args.minfrac else 1


if __name__ == "__main__":
    sys.exit(main())
