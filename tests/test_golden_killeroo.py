"""Killeroo golden-image parity vs the reference pbrt-v3 binary.

The north-star check (BASELINE.json config 1): render killeroo-simple with
the same halton sample sequences as the reference and compare images.

Measured state (2026-08-21 round 4, CPU, killeroo_64_4spp vs golden):
  match_frac @1e-3 rel   0.684   (round 3: 0.437)
  mse 3.3e-6 (was 1.35e-4), mean_abs 2.1e-4 (was 3.7e-3)
  per-path first-divergence rate: 2.9% (was 17%) — near the measured
  irreducible 1-ulp chaos floor (1.8% self-divergence at d5, PARITY.md).
The round-4 movers, found by refgold/path_divergence.py: loopsubdiv limit
NORMALS computed from pre-limit rings (pbrt pushes vertices to the limit
first), per-vertex normal normalization (pbrt interpolates the raw
cross(S,T) magnitudes), and the missing triangle.cpp:365-381 shading-frame
re-orthogonalization.

Default suite runs the 64x64@4spp variant (CPU-feasible); the full
400x400@8spp assertion runs with PBRT_TPU_PARITY_FULL=1 (use the TPU).
"""
import os
import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "refgold"))

FULL = os.environ.get("PBRT_TPU_PARITY_FULL", "") == "1"


def _render_and_compare(scene, golden, spp=None):
    from run_parity import read_pfm, compare
    from pbrt_tpu.render import render_file

    ref = read_pfm(golden)
    out = str(scene) + ".test.pfm"
    try:
        render_file(str(scene), out=out, spp=spp)
        ours = read_pfm(out)
    finally:
        if os.path.exists(out):
            os.remove(out)
    return ref, ours, compare(ref, ours, 1e-3)


def test_killeroo_64():
    if not os.path.exists("/root/reference/scenes/geometry/killeroo.pbrt"):
        pytest.skip("reference geometry unavailable")
    ref, ours, stats = _render_and_compare(
        ROOT / "refgold" / "parity" / "killeroo_64_4spp.pbrt",
        ROOT / "refgold" / "goldens" / "parity" / "killeroo_64_4spp.pfm",
    )
    mean_rel = abs(stats["ours_mean"] - stats["ref_mean"]) / stats["ref_mean"]
    # Measured on CPU: mean_rel 1.6e-4, match 0.43; thresholds leave margin
    # for backend fma differences but catch real regressions (a wrong BRDF
    # or sampler shifts match_frac toward 0 and mean_rel above 1%).
    assert mean_rel < 2e-3, stats
    assert stats["match_frac"] > 0.60, stats


@pytest.mark.skipif(not FULL, reason="full killeroo golden (set PBRT_TPU_PARITY_FULL=1)")
def test_killeroo_400_8spp():
    scene = ROOT / ".refbuild" / "scenes" / "killeroo_400_8spp.pbrt"
    if not scene.exists():
        pytest.skip("run refgold/build_reference.sh first (needs .refbuild)")
    ref, ours, stats = _render_and_compare(
        scene, ROOT / "refgold" / "goldens" / "killeroo_400_8spp.pfm"
    )
    mean_rel = abs(stats["ours_mean"] - stats["ref_mean"]) / stats["ref_mean"]
    assert mean_rel < 5e-3, stats
    assert stats["match_frac"] > 0.60, stats
    d = np.abs(ref - ours)
    rel = d / np.maximum(np.abs(ref), 1e-2)
    assert np.percentile(rel, 50) < 1e-2, np.percentile(rel, [50, 90, 99])
