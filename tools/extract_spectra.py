#!/usr/bin/env python
"""Extract the standard spectral data tables from the reference source into
pbrt_tpu/data/spectra.npz.

Category-(b) verbatim data (SURVEY.md copy policy): CIE 1931 X/Y/Z matching
curves (471 samples, 360-830nm), the Smits-style RGB->spectrum basis tables
(32 samples), and the measured copper eta/k samples — physical-constant
tables the framework must ship bit-identically for parity, attributed to
/root/reference/src/core/spectrum.cpp:190-1172 and
/root/reference/src/materials/metal.cpp:82-115.
"""
import re
import sys
import pathlib

import numpy as np

REF = pathlib.Path("/root/reference/src")
OUT = pathlib.Path(__file__).resolve().parent.parent / "pbrt_tpu" / "data"


def parse_array(text, name):
    m = re.search(
        r"const\s+Float\s+" + re.escape(name) + r"\[[^\]]*\]\s*=\s*\{(.*?)\};",
        text, re.S,
    )
    if not m:
        raise SystemExit(f"array {name} not found")
    body = m.group(1)
    body = re.sub(r"//[^\n]*", "", body)
    vals = [float(x.rstrip("f")) for x in re.findall(r"[-+0-9.eE]+f?", body)]
    return np.asarray(vals, np.float64)


def main():
    spec = (REF / "core" / "spectrum.cpp").read_text()
    metal = (REF / "materials" / "metal.cpp").read_text()
    out = {}
    for name in ("CIE_X", "CIE_Y", "CIE_Z", "CIE_lambda", "RGB2SpectLambda"):
        out[name] = parse_array(spec, name)
    for kind in ("Refl", "Illum"):
        for c in ("White", "Cyan", "Magenta", "Yellow", "Red", "Green", "Blue"):
            name = f"RGB{kind}2Spect{c}"
            out[name] = parse_array(spec, name)
    out["CopperWavelengths"] = parse_array(metal, "CopperWavelengths")
    out["CopperN"] = parse_array(metal, "CopperN")
    out["CopperK"] = parse_array(metal, "CopperK")
    for k, v in out.items():
        n_expect = {"CIE": 471, "RGB": 32, "Cop": 56}[k[:3]]
        assert v.shape[0] == n_expect, (k, v.shape)
    np.savez(OUT / "spectra.npz", **out)
    print("wrote", OUT / "spectra.npz", {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
