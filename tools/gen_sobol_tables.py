"""Extract Sobol' generator-matrix constants into pbrt_tpu/data/sobol.npz.

The matrices are the published Joe & Kuo direction-number data ("Constructing
Sobol sequences with better two-dimensional projections", SIAM JSC 30, 2008)
as tabulated in the reference's core/sobolmatrices.cpp.  They are mathematical
constants, not code; we store them as device-loadable uint32 arrays.  64-bit
tables (used only by SobolIntervalToIndex) are split into (hi, lo) uint32
pairs since TPU kernels run in 32-bit integer lanes.

Run:  python tools/gen_sobol_tables.py
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src/core/sobolmatrices.cpp")
OUT = Path(__file__).resolve().parent.parent / "pbrt_tpu" / "data" / "sobol.npz"

NUM_DIMENSIONS = 1024
MATRIX_SIZE = 52


def _strip_comments(s: str) -> str:
    return re.sub(r"//[^\n]*", "", s)


def parse_flat_array(text: str, name: str) -> np.ndarray:
    m = re.search(re.escape(name) + r"[^=]*=\s*\{(.*?)\n\};", text, re.S)
    body = _strip_comments(m.group(1))
    nums = re.findall(r"0x[0-9a-fA-F]+|\d+", body.replace("ULL", "").replace("u", ""))
    return np.array([int(n, 0) for n in nums], dtype=np.uint64)


def parse_ragged_2d(text: str, name: str, width: int) -> np.ndarray:
    """Parse `T name[][W] = {{...}, {...}};` with ragged rows, zero-padded."""
    m = re.search(re.escape(name) + r"\[\]\[[^\]]*\]\s*=\s*\{(.*?)\}\s*;", text, re.S)
    body = _strip_comments(m.group(1))
    rows = re.findall(r"\{([^{}]*)\}", body)
    out = np.zeros((len(rows), width), dtype=np.uint64)
    for i, row in enumerate(rows):
        nums = re.findall(r"0x[0-9a-fA-F]+|\d+", row.replace("ULL", ""))
        vals = [int(n, 0) for n in nums]
        out[i, : len(vals)] = vals
    return out


def main() -> None:
    text = REF.read_text()
    m32 = parse_flat_array(text, "SobolMatrices32")
    assert m32.size == NUM_DIMENSIONS * MATRIX_SIZE, m32.size
    vdc = parse_ragged_2d(text, "VdCSobolMatrices", MATRIX_SIZE)
    vdc_inv = parse_ragged_2d(text, "VdCSobolMatricesInv", MATRIX_SIZE)

    np.savez_compressed(
        OUT,
        sobol_matrices32=m32.astype(np.uint32).reshape(NUM_DIMENSIONS, MATRIX_SIZE),
        vdc_hi=(vdc >> np.uint64(32)).astype(np.uint32),
        vdc_lo=(vdc & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        vdc_inv_hi=(vdc_inv >> np.uint64(32)).astype(np.uint32),
        vdc_inv_lo=(vdc_inv & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )
    print(f"wrote {OUT}: m32 {m32.size}, vdc {vdc.shape}, vdc_inv {vdc_inv.shape}")


if __name__ == "__main__":
    sys.exit(main())
