"""Image parity vs the reference pbrt-v3 binary.

Goldens in refgold/goldens/parity/ were rendered by the reference binary
built from /root/reference/src (refgold/build_reference.sh); scenes are in
refgold/parity/.  Our render of the same scene must match.

Thresholds: depth-1 scenes are deterministic per camera ray (delta light) or
share the exact sampler sequence, so they match to f32 noise.  Depth>=2
scenes decohere chaotically: pbrt computes the quadric discriminant in f64
(efloat.h Quadratic) while we stay in f32, so paths touching curved surfaces
diverge by ulps that amplify per bounce — the estimator is identical
(means agree to ~1e-4 relative), individual samples are not.  Those scenes
assert mean-level agreement plus a high match fraction.

Full-ladder run (slow, depth-5 scenes): set PBRT_TPU_PARITY_FULL=1.
"""
import os
import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
GOLD = ROOT / "refgold" / "goldens" / "parity"
SCENES = ROOT / "refgold" / "parity"
sys.path.insert(0, str(ROOT / "refgold"))

FULL = os.environ.get("PBRT_TPU_PARITY_FULL", "") == "1"

# (scene, golden, rel-tol, min match_frac, max mean-rel-error, heavy)
# match_frac < 1.0 on CPU only because XLA:CPU contracts mul+add to FMA while
# the goldens' arithmetic (and our TPU run, which matches them 100%) does not:
# a handful of geometry-edge pixels flip hit/miss.
CASES = [
    ("a_floor_point.pbrt", "a_floor_point.pfm", 1e-3, 0.995, 5e-3, False),
    ("c3_plastic_d1.pbrt", "c3_plastic_d1.pfm", 1e-3, 0.995, 5e-3, False),
    ("b_arealight.pbrt", "b_arealight.pfm", 1e-3, 0.999, 1e-4, True),
    ("c2_twolights_d2.pbrt", "c2_twolights_d2.pfm", 1e-3, 0.995, 1e-3, True),
    ("c4_mirror_d3.pbrt", "c4_mirror_d3.pfm", 1e-3, 0.995, 1e-3, True),
    ("c1_matte_point_d5.pbrt", "c1_matte_point_d5.pfm", 1e-3, 0.70, 1e-3, True),
    ("c_indirect.pbrt", "c_indirect.pfm", 2e-2, 0.70, 2e-2, True),
    # Config 4 (BASELINE.md): homogeneous fog + heterogeneous density grid,
    # volpath d5.  Non-media pixels bit-match; media pixels decorrelate (the
    # tracking loops' data-dependent RNG consumption can't align lockstep,
    # volpath.py module docstring) so the bar is estimator-level: image
    # means within 4%, >=60% of pixels (the non-media ones) matching.
    ("d_media_volpath.pbrt", "d_media_volpath.pfm", 1e-3, 0.60, 4e-2, True),
]


@pytest.mark.parametrize(
    "scene,gold,tol,min_frac,max_mean_rel,heavy",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_image_matches_reference(scene, gold, tol, min_frac, max_mean_rel, heavy):
    if heavy and not FULL:
        pytest.skip("heavy parity scene (set PBRT_TPU_PARITY_FULL=1)")
    from run_parity import read_pfm, compare

    ref = read_pfm(GOLD / gold)

    from pbrt_tpu.render import render_file

    out = str(SCENES / (scene + ".test.pfm"))
    try:
        render_file(str(SCENES / scene), out=out)
        ours = read_pfm(out)
    finally:
        if os.path.exists(out):
            os.remove(out)

    stats = compare(ref, ours, tol)
    assert stats["match_frac"] >= min_frac, stats
    mean_rel = abs(stats["ours_mean"] - stats["ref_mean"]) / max(stats["ref_mean"], 1e-6)
    assert mean_rel <= max_mean_rel, stats
