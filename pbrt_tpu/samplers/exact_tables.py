"""Host-side bit-exact sample tables — the `exact` sampler render mode.

pbrt's radical inverses accumulate reversedDigits EXACTLY in uint64 and do
the remaining arithmetic in Float (lowdiscrepancy.h:50-140); the in-graph
halton path (core/lowdiscrepancy.py) must accumulate the digits in f32
(TPU lanes have no int64/f64), whose per-digit rounding differs from the
exact accumulation by 1-2 ulp in the returned sample.  Over a depth-5 path
those ulps perturb hit points and occasionally flip discrete events,
decohering sample streams vs the reference (PARITY.md "Decoherence").

This module rebuilds the sample values EXACTLY as pbrt does — numpy float64
on the host, cast to f32 — and ships them to the device as plain data: the
lockstep engine passes a per-spp-batch table [N, D] into the jitted step,
and samplers.get_* read table[:, dim] instead of recomputing.  Tables are a
pure function of (pixel, sample, dim), so the render stays deterministic and
engine-agnostic in semantics; only the lockstep engine consumes them (the
wavefront's refilled lanes draw at dynamic (pixel, sample), which would need
the full [n_pix*spp, D] table resident).

Reference semantics: HaltonSampler::SampleDimension (halton.cpp:166-176),
RadicalInverse / ScrambledRadicalInverse double accumulation
(lowdiscrepancy.cpp:49-412), GlobalSampler dim consumption
(sampler.cpp:136-196).
"""
from __future__ import annotations

import numpy as np

from ..core import lowdiscrepancy as ld

# f32 OneMinusEpsilon (pbrt.h:417) — the clamp applied after the f64 math.
ONE_MINUS_EPSILON = np.float32(np.nextafter(np.float32(1.0), np.float32(0.0)))


def _radical_inverse_pbrt(base_index: int, a: np.ndarray) -> np.ndarray:
    """RadicalInverseSpecialized EXACTLY as the reference computes it
    (lowdiscrepancy.h:50-140 with Float = float): reversedDigits accumulates
    EXACTLY in uint64 (the in-graph f32 path rounds it every digit — the
    1-2 ulp deviation this module removes), invBaseN and the final multiply
    are f32."""
    a = a.astype(np.uint64)
    if base_index == 0:
        # ReverseBits64(a) * 0x1p-64 (double literal), returned as Float.
        rev = np.zeros_like(a)
        x = a.copy()
        for _ in range(64):
            rev = (rev << np.uint64(1)) | (x & np.uint64(1))
            x >>= np.uint64(1)
        return (rev.astype(np.float64) * np.float64(2.0 ** -64)).astype(
            np.float32
        )
    base = int(ld.PRIMES[base_index])
    inv_base = np.float32(1.0 / np.float32(base))
    reversed_digits = np.zeros(a.shape, np.uint64)
    inv_base_n = np.ones(a.shape, np.float32)
    x = a.copy()
    while x.any():
        nxt = x // np.uint64(base)
        digit = x - nxt * np.uint64(base)
        live = x > 0
        reversed_digits = np.where(
            live, reversed_digits * np.uint64(base) + digit, reversed_digits
        )
        inv_base_n = np.where(
            live, (inv_base_n * inv_base).astype(np.float32), inv_base_n
        )
        x = nxt
    val = (reversed_digits.astype(np.float32) * inv_base_n).astype(np.float32)
    return np.minimum(val, ONE_MINUS_EPSILON)


def _scrambled_radical_inverse_pbrt(
    base_index: int, a: np.ndarray, perm: np.ndarray
) -> np.ndarray:
    """ScrambledRadicalInverseSpecialized (lowdiscrepancy.cpp:407), Float =
    float, reversedDigits exact in uint64."""
    base = int(ld.PRIMES[base_index])
    inv_base = np.float32(1.0 / np.float32(base))
    a = a.astype(np.uint64)
    reversed_digits = np.zeros(a.shape, np.uint64)
    inv_base_n = np.ones(a.shape, np.float32)
    x = a.copy()
    import math

    for _ in range(int(math.ceil(64 / math.log2(base))) + 1):
        nxt = x // np.uint64(base)
        digit = (x - nxt * np.uint64(base)).astype(np.int64)
        live = x > 0
        pd = perm[digit].astype(np.uint64)
        reversed_digits = np.where(
            live, reversed_digits * np.uint64(base) + pd, reversed_digits
        )
        inv_base_n = np.where(
            live, (inv_base_n * inv_base).astype(np.float32), inv_base_n
        )
        x = nxt
    perm0 = np.float32(perm[0])
    # invBaseN * (reversedDigits + invBase * perm[0] / (1 - invBase)),
    # every op in f32, C++ evaluation order.
    tail = np.float32(
        np.float32(inv_base * perm0) / np.float32(np.float32(1.0) - inv_base)
    )
    val = (
        inv_base_n
        * (reversed_digits.astype(np.float32) + tail).astype(np.float32)
    ).astype(np.float32)
    return np.minimum(val, ONE_MINUS_EPSILON)


def halton_indices(cfg, pixels: np.ndarray, sample_num: int) -> np.ndarray:
    """Per-lane global Halton sample index (halton.cpp:96-118), numpy."""
    base_scales, base_exps, stride, mult_inv = cfg.halton_setup()
    K = 128  # kMaxResolution (halton.cpp:42)
    px = pixels[:, 0].astype(np.int64)
    py = pixels[:, 1].astype(np.int64)
    pm0 = px % K
    pm1 = py % K

    def inverse_radical_inverse(base, x, n_digits):
        idx = np.zeros_like(x)
        for _ in range(n_digits):
            digit = x % base
            x = x // base
            idx = idx * base + digit
        return idx

    off0 = inverse_radical_inverse(2, pm0, base_exps[0])
    off1 = inverse_radical_inverse(3, pm1, base_exps[1])
    offset = (
        off0 * (stride // base_scales[0]) * mult_inv[0]
        + off1 * (stride // base_scales[1]) * mult_inv[1]
    ) % stride
    return (offset + np.int64(sample_num) * stride).astype(np.uint64)


def halton_exact_table(
    cfg, pixels: np.ndarray, sample_num: int, n_dims: int
) -> np.ndarray:
    """[N, n_dims] f32 table of SampleDimension(index, dim) values, computed
    exactly as the reference does (f64 accumulate, f32 cast)."""
    base_scales, base_exps, stride, mult_inv = cfg.halton_setup()
    idx = halton_indices(cfg, np.asarray(pixels), int(sample_num))
    perms = ld.radical_inverse_permutations()
    out = np.empty((idx.shape[0], n_dims), np.float32)
    for dim in range(n_dims):
        if dim == 0:
            v = _radical_inverse_pbrt(0, idx >> np.uint64(base_exps[0]))
        elif dim == 1:
            v = _radical_inverse_pbrt(1, idx // np.uint64(base_scales[1]))
        else:
            off = int(ld.PRIME_SUMS[dim])
            p = int(ld.PRIMES[dim])
            v = _scrambled_radical_inverse_pbrt(
                dim, idx, perms[off : off + p]
            )
        out[:, dim] = np.minimum(v, ONE_MINUS_EPSILON)
    return out


def n_dims_for(path_cfg, statics) -> int:
    """Flat sampler dims a lockstep path render consumes: 5 camera dims +
    the per-bounce schedule (li_path docstring)."""
    from ..integrators.path import _dims_per_bounce

    d = 5
    for b in range(path_cfg.max_depth):
        d += _dims_per_bounce(b, statics.mat_types)
    # scan body reads (but discards) the RR slot on bounces <= 3.
    return d + 1


# ---------------------------------------------------------------------------
# PixelSampler exact tables (stratified / zerotwosequence / maxmindist /
# random) — round-5: exact_pixel_tables wired into a RENDER mode.
#
# pbrt's PixelSamplers draw their first `nSampledDimensions` (default 4)
# Get1D and Get2D calls from per-pixel arrays generated at StartPixel by a
# SEQUENTIAL per-tile RNG (Clone(seed = tileY*nTilesX + tileX), pixels in
# x-fastest tile-scan order, integrator.cpp:240-258); calls beyond fall
# back to that rng's UniformFloat stream, whose consumption is
# data-dependent — unreproducible in lockstep (same truncation as the
# sampler-parity story, samplers/pixel_exact.py docstring).  The render
# mode therefore ships the ARRAY-backed dims (camera dims 0-4 + bounce-0
# select/light/scatter = linear dims 0..9, whose call ordinals are static:
# 1D ordinals time=0,select=1; 2D film=0,lens=1,light=2,scatter=3) as a
# bit-exact host table and leaves the stateless-hash equivalents for the
# rest.  Camera rays and first-bounce NEE then consume reference-exact
# streams (golden-tested vs the reference binary's dumps through
# pixel_exact.py).
#
# Tile origin assumption: sampleBounds == cropped pixel bounds (true for
# the box filter, radius 0.5; wider filters shift pbrt's tile grid by the
# filter expand — documented deviation for this mode).
# ---------------------------------------------------------------------------

PIXEL_EXACT_SAMPLERS = ("stratified", "zerotwosequence", "maxmindist",
                        "maxmin")
_TILE = 16  # pbrt tileSize (integrator.cpp:243)
N_PIXEL_TABLE_DIMS = 10  # linear dims 0..9 covered by the arrays


def pixel_exact_table(name, pixels, sample_num, spp, strat_xy=None):
    """[N_PIXEL_TABLE_DIMS, n_pix] f32: the array-backed linear dims for
    every pixel at sample index `sample_num`, in pbrt's per-tile RNG
    order.  `pixels` [N,2] must be the full cropped row-major grid."""
    from .pixel_exact import exact_pixel_tables

    name = {"maxmin": "maxmindist"}.get(name, name)
    pixels = np.asarray(pixels)
    n = pixels.shape[0]
    x0, y0 = pixels[:, 0].min(), pixels[:, 1].min()
    x1, y1 = pixels[:, 0].max() + 1, pixels[:, 1].max() + 1
    n_tiles_x = -(-(x1 - x0) // _TILE)
    tx = (pixels[:, 0] - x0) // _TILE
    ty = (pixels[:, 1] - y0) // _TILE
    tile_id = ty * n_tiles_x + tx
    out = np.zeros((N_PIXEL_TABLE_DIMS, n), np.float32)
    for t in np.unique(tile_id):
        sel = np.nonzero(tile_id == t)[0]
        # x-fastest scan order within the tile (Bounds2iIterator).
        order = np.lexsort((pixels[sel, 0], pixels[sel, 1]))
        rows = sel[order]
        s1, s2 = exact_pixel_tables(
            name, pixels[rows], spp, 4, 4, seed=int(t), strat_xy=strat_xy
        )
        s = sample_num
        out[0, rows] = s2[:, 0, s, 0]   # film.x   (2D call 0)
        out[1, rows] = s2[:, 0, s, 1]   # film.y
        out[2, rows] = s1[:, 0, s]      # time     (1D call 0)
        out[3, rows] = s2[:, 1, s, 0]   # lens     (2D call 1)
        out[4, rows] = s2[:, 1, s, 1]
        out[5, rows] = s1[:, 1, s]      # b0 light select (1D call 1)
        out[6, rows] = s2[:, 2, s, 0]   # b0 uLight (2D call 2)
        out[7, rows] = s2[:, 2, s, 1]
        out[8, rows] = s2[:, 3, s, 0]   # b0 uScattering (2D call 3)
        out[9, rows] = s2[:, 3, s, 1]
    return out
