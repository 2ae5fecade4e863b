"""Committed 64spp killeroo golden (round-3 verdict item 4c).

`refgold/goldens/killeroo_400_64spp.pfm` is the reference binary's
400x400@64spp render of scenes/killeroo-simple.pbrt.  A full-CPU 64spp
render is out of test budget, so this renders a 64x64 CROP at the full
64spp: pixel sample streams are a pure function of ABSOLUTE pixel coords
(halton CRT index), so crop pixels reproduce the full render's pixels
exactly (box 0.5 filter keeps every sample in its own pixel).
"""
import os
import pathlib

import numpy as np
import pytest

GOLD = (
    pathlib.Path(__file__).resolve().parent.parent
    / "refgold" / "goldens" / "killeroo_400_64spp.pfm"
)
KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"

# Crop over the killeroo body (content-rich, mixes plastic + matte).
CROP = (0.30, 0.46, 0.30, 0.46)  # x0 x1 y0 y1 in NDC -> 64x64 px


@pytest.mark.slow
def test_killeroo_64spp_crop_matches_golden():
    if not GOLD.exists() or not os.path.exists(KILLEROO):
        pytest.skip("64spp golden or reference scene missing")
    from refgold.run_parity import read_pfm
    from pbrt_tpu.sceneio import parse_pbrt_file
    from pbrt_tpu.render import render_setup

    ref = read_pfm(str(GOLD))  # [400, 400, 3]
    setup = parse_pbrt_file(KILLEROO)
    setup.film_params._items["xresolution"] = ("integer", [400])
    setup.film_params._items["yresolution"] = ("integer", [400])
    img, _ = render_setup(setup, spp_override=64, res_override=(400, 400),
                          crop=CROP)
    x0, x1 = int(CROP[0] * 400), int(CROP[1] * 400)
    y0, y1 = int(CROP[2] * 400), int(CROP[3] * 400)
    ref_c = ref[y0:y1, x0:x1]
    ours_c = np.asarray(img)  # the film is already the cropped bounds
    assert ref_c.shape == ours_c.shape, (ref_c.shape, ours_c.shape)

    d = np.abs(ref_c - ours_c)
    denom = np.maximum(np.abs(ref_c), 1e-2)
    rel = d / denom
    match = float(np.all(rel <= 1e-3, axis=-1).mean())
    mean_rel = float(rel.mean())
    med_rel = float(np.median(rel))
    print(f"64spp crop: match@1e-3 {match:.3f} mean_rel {mean_rel:.2e} "
          f"median_rel {med_rel:.2e}")
    # Measured r4: match 0.558, mean_rel 4.9e-3 (dominated by the ~3%
    # divergent-path pixels), median_rel 3.7e-5; bounds leave margin.
    assert mean_rel < 8e-3, mean_rel
    assert med_rel < 5e-4, med_rel
    assert match > 0.45, match
