"""Low-discrepancy sequences: Sobol', radical inverse (Halton), (0,2)-sequences.

TPU re-expression of core/lowdiscrepancy.{h,cpp} + sobolmatrices.{h,cpp}.
Everything is branch-free integer bit-math over uint32 lanes:

  * Sobol' samples XOR generator-matrix columns selected by index bits
    (lowdiscrepancy.h:270-287 SobolSampleFloat) — a fixed-depth unrolled loop.
  * `sobol_interval_to_index` maps (frame, pixel) to the global sample index
    (lowdiscrepancy.h:229-249) using 64-bit emulation on (hi, lo) uint32 pairs.
  * Radical inverse per prime base is a fixed-trip digit loop; base 2 is an
    exact 32-bit bit reversal.
  * Halton scrambling permutations are generated host-side from a
    default-seeded PCG32 exactly as the reference does (halton.cpp:69-71,
    lowdiscrepancy.cpp:2490-2504), so tables match bit-for-bit.

Generator matrices are the published Joe-Kuo constants, extracted to
data/sobol.npz by tools/gen_sobol_tables.py.
"""
from __future__ import annotations

import functools
import math
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from .rng import ScalarPcg32

ONE_MINUS_EPSILON = float(jnp.float32(1.0) - jnp.finfo(jnp.float32).eps / 2)
_INV_2_32 = 2.3283064365386963e-10

PRIME_TABLE_SIZE = 1000
SOBOL_MATRIX_SIZE = 52
NUM_SOBOL_DIMENSIONS = 1024

_DATA = Path(__file__).resolve().parent.parent / "data" / "sobol.npz"


def _gen_primes(n: int) -> np.ndarray:
    primes = []
    c = 2
    while len(primes) < n:
        if all(c % p for p in primes if p * p <= c):
            primes.append(c)
        c += 1
    return np.array(primes, dtype=np.int32)


PRIMES = _gen_primes(PRIME_TABLE_SIZE)
PRIME_SUMS = np.concatenate([[0], np.cumsum(PRIMES)[:-1]]).astype(np.int64)


@functools.cache
def sobol_tables():
    """dict of numpy arrays: sobol_matrices32 [1024, 52] u32, vdc pairs.

    Cached as NUMPY (never jnp) so a first call under a jit trace can't cache
    tracers; jnp converts at use sites (constant-folded by XLA).
    """
    z = np.load(_DATA)
    return {k: z[k].copy() for k in z.files}


@functools.cache
def radical_inverse_permutations() -> np.ndarray:
    """Flat uint16-ish permutation table, PCG32-default-seeded Fisher-Yates.

    Matches ComputeRadicalInversePermutations(rng) with `RNG rng;`
    (halton.cpp:69-71): one RNG instance shuffles every prime's identity
    permutation in sequence.
    """
    cache = _DATA.parent / "halton_perms.npy"
    if cache.exists():
        return np.load(cache)
    rng = ScalarPcg32()
    total = int(PRIMES.sum())
    perms = np.zeros(total, dtype=np.int32)
    off = 0
    for p in PRIMES:
        arr = list(range(int(p)))
        rng.shuffle(arr)
        perms[off : off + p] = arr
        off += p
    try:
        np.save(cache, perms)
    except OSError:
        pass
    return perms


def _c(x):
    """uint32 constant (avoids int32 overflow on literals >= 2^31)."""
    return jnp.uint32(x)


def reverse_bits_32(b):
    b = jnp.asarray(b, jnp.uint32)
    b = (b << 16) | (b >> 16)
    b = ((b & _c(0x00FF00FF)) << 8) | ((b & _c(0xFF00FF00)) >> 8)
    b = ((b & _c(0x0F0F0F0F)) << 4) | ((b & _c(0xF0F0F0F0)) >> 4)
    b = ((b & _c(0x33333333)) << 2) | ((b & _c(0xCCCCCCCC)) >> 2)
    b = ((b & _c(0x55555555)) << 1) | ((b & _c(0xAAAAAAAA)) >> 1)
    return b


def _num_digits(base: int) -> int:
    """Max base-`base` digits of a uint32 index."""
    return int(math.ceil(32 / math.log2(base))) + 1


def radical_inverse(base_index: int, a):
    """RadicalInverse(baseIndex, a) for uint32 indices, vectorized over a.

    `base_index` is a static Python int (the prime index); the digit loop
    unrolls to the fixed max digit count for that base.
    """
    if base_index == 0:
        return jnp.minimum(
            reverse_bits_32(a).astype(jnp.float32) * jnp.float32(_INV_2_32),
            ONE_MINUS_EPSILON,
        )
    base = int(PRIMES[base_index])
    inv_base = jnp.float32(1.0 / base)
    a = jnp.asarray(a, jnp.uint32)
    reversed_digits = jnp.zeros(a.shape, jnp.float32)
    inv_base_n = jnp.ones(a.shape, jnp.float32)
    for _ in range(_num_digits(base)):
        nxt = a // base
        digit = a - nxt * base
        live = a > 0
        reversed_digits = jnp.where(
            live, reversed_digits * base + digit.astype(jnp.float32), reversed_digits
        )
        inv_base_n = jnp.where(live, inv_base_n * inv_base, inv_base_n)
        a = nxt
    return jnp.minimum(reversed_digits * inv_base_n, ONE_MINUS_EPSILON)


@functools.cache
def _pair_perm_table(base_index: int) -> np.ndarray:
    """int32 [p*p] digit-PAIR permutation table for prime `base_index`:
    entry v packs perm[v % p] (bits 0-8) | perm[v // p] << 9.

    Halves the gather count of the scrambled radical inverse: the
    per-digit [p]-table gather costs ~10ns/lane/digit on this backend
    (round-5 in-process measurement: dims 32-41 cost 83ms/160k lanes,
    ~85% of it gathers), so one [p^2] gather per digit PAIR is ~2x.
    perm values < 512 for every prime in the table (p <= 7919 needs 13
    bits -- the pair packing is only built for p <= 337, i.e. the dims a
    depth-8 path can reach; larger bases fall back to the per-digit
    form)."""
    p = int(PRIMES[base_index])
    off = int(PRIME_SUMS[base_index])
    perm = radical_inverse_permutations()[off : off + p].astype(np.int64)
    v = np.arange(p * p, dtype=np.int64)
    return (perm[v % p] | (perm[v // p] << 9)).astype(np.int32)


_PAIR_TABLE_MAX_BASE = 509  # 9-bit packing bound AND table-size bound (1MB)


def scrambled_radical_inverse_fast(base_index: int, a):
    """Bit-exact scrambled_radical_inverse with HALF the gathers.

    Consumes digit PAIRS via one [p^2]-table gather per pair; the f32
    recurrence is evaluated in the identical order (two sequential
    multiply-adds per pair), so results match the reference form bit for
    bit (asserted by tests/test_lowdiscrepancy.py)."""
    base = int(PRIMES[base_index])
    if base <= 31 or base > _PAIR_TABLE_MAX_BASE:
        # p <= 31: the [p] per-digit gather lowers to a fused select chain
        # (measured FASTER than any table form — the slow real-gather
        # lowering kicks in above ~32 entries); p > 509: pair table too big.
        off = int(PRIME_SUMS[base_index])
        perm = jnp.asarray(
            radical_inverse_permutations()[off : off + base].astype(np.int32)
        )
        return scrambled_radical_inverse(base_index, a, perm)
    p2 = base * base
    tab = jnp.asarray(_pair_perm_table(base_index))
    inv_base = jnp.float32(1.0 / base)
    a = jnp.asarray(a, jnp.uint32)
    rev = jnp.zeros(a.shape, jnp.float32)
    inv_base_n = jnp.ones(a.shape, jnp.float32)
    n_pairs = (_num_digits(base) + 1) // 2
    for _ in range(n_pairs):
        nxt2 = a // p2
        v = (a - nxt2 * p2).astype(jnp.int32)
        w = tab[v]
        pd0 = (w & 511).astype(jnp.float32)
        pd1 = ((w >> 9) & 511).astype(jnp.float32)
        live0 = a > 0
        live1 = a >= base  # second digit live iff (a // base) > 0
        rev = jnp.where(live0, rev * base + pd0, rev)
        inv_base_n = jnp.where(live0, inv_base_n * inv_base, inv_base_n)
        rev = jnp.where(live1, rev * base + pd1, rev)
        inv_base_n = jnp.where(live1, inv_base_n * inv_base, inv_base_n)
        a = nxt2
    off = int(PRIME_SUMS[base_index])
    perm0 = float(radical_inverse_permutations()[off])
    return jnp.minimum(
        inv_base_n * (rev + inv_base * perm0 / (1.0 - inv_base)),
        ONE_MINUS_EPSILON,
    )


def scrambled_radical_inverse(base_index: int, a, perm):
    """ScrambledRadicalInverse with a digit permutation (lowdiscrepancy.cpp:407).

    perm: int32 device array of length PRIMES[base_index] (the slice of the
    global permutation table for this prime).
    """
    base = int(PRIMES[base_index])
    inv_base = jnp.float32(1.0 / base)
    a = jnp.asarray(a, jnp.uint32)
    reversed_digits = jnp.zeros(a.shape, jnp.float32)
    inv_base_n = jnp.ones(a.shape, jnp.float32)
    for _ in range(_num_digits(base)):
        nxt = a // base
        digit = (a - nxt * base).astype(jnp.int32)
        live = a > 0
        pd = perm[digit].astype(jnp.float32)
        reversed_digits = jnp.where(
            live, reversed_digits * base + pd, reversed_digits
        )
        inv_base_n = jnp.where(live, inv_base_n * inv_base, inv_base_n)
        a = nxt
    perm0 = perm[0].astype(jnp.float32)
    return jnp.minimum(
        inv_base_n * (reversed_digits + inv_base * perm0 / (1.0 - inv_base)),
        ONE_MINUS_EPSILON,
    )


# ---------------------------------------------------------------------------
# Sobol'
# ---------------------------------------------------------------------------

def sobol_sample_bits32(index, dim):
    """XOR of matrix columns for set bits of `index` (uint32), any dim.

    index: uint32 array; dim: int or int32 array (broadcastable).
    Returns uint32 sample bits.
    """
    tables = sobol_tables()
    cols = tables["sobol_matrices32"][dim]  # [..., 52]
    index = jnp.asarray(index, jnp.uint32)
    v = jnp.zeros(jnp.broadcast_shapes(index.shape, cols.shape[:-1]), jnp.uint32)
    for i in range(32):
        bit = ((index >> i) & 1) != 0
        v = v ^ jnp.where(bit, cols[..., i], jnp.uint32(0))
    return v


def sobol_sample_bits64(index_hi, index_lo, dim):
    """Sobol bits for a 64-bit (hi, lo) index — up to 52 index bits used."""
    tables = sobol_tables()
    cols = tables["sobol_matrices32"][dim]  # [..., 52]
    index_hi = jnp.asarray(index_hi, jnp.uint32)
    index_lo = jnp.asarray(index_lo, jnp.uint32)
    shape = jnp.broadcast_shapes(index_lo.shape, cols.shape[:-1])
    v = jnp.zeros(shape, jnp.uint32)
    for i in range(SOBOL_MATRIX_SIZE):
        if i < 32:
            bit = ((index_lo >> i) & 1) != 0
        else:
            bit = ((index_hi >> (i - 32)) & 1) != 0
        v = v ^ jnp.where(bit, cols[..., i], jnp.uint32(0))
    return v


def sobol_sample_float(index, dim, scramble=0):
    """SobolSampleFloat (lowdiscrepancy.h:283): bits -> [0,1) float."""
    v = sobol_sample_bits32(index, dim) ^ jnp.asarray(scramble, jnp.uint32)
    return jnp.minimum(
        v.astype(jnp.float32) * jnp.float32(_INV_2_32), ONE_MINUS_EPSILON
    )


def sobol_sample_float64idx(index_hi, index_lo, dim, scramble=0):
    v = sobol_sample_bits64(index_hi, index_lo, dim) ^ jnp.asarray(
        scramble, jnp.uint32
    )
    return jnp.minimum(
        v.astype(jnp.float32) * jnp.float32(_INV_2_32), ONE_MINUS_EPSILON
    )


def sobol_interval_to_index(m: int, frame, px, py):
    """Global Sobol index of sample `frame` in pixel (px, py).

    (lowdiscrepancy.h:229-249 SobolIntervalToIndex.)  `m` is the static
    log2 of the next-pow2 image resolution; returns (hi, lo) uint32 pair.
    """
    frame = jnp.asarray(frame, jnp.uint32)
    px = jnp.asarray(px, jnp.uint32)
    py = jnp.asarray(py, jnp.uint32)
    if m == 0:
        z = jnp.zeros_like(frame)
        return z, frame
    tables = sobol_tables()
    vdc_hi = tables["vdc_hi"][m - 1]  # [52]
    vdc_lo = tables["vdc_lo"][m - 1]
    vdci_hi = tables["vdc_inv_hi"][m - 1]
    vdci_lo = tables["vdc_inv_lo"][m - 1]

    m2 = 2 * m
    # index = uint64(frame) << m2
    if m2 < 32:
        index_hi = frame >> (32 - m2)
        index_lo = frame << m2
    else:
        index_hi = frame << (m2 - 32)
        index_lo = jnp.zeros_like(frame)

    delta_hi = jnp.zeros_like(frame)
    delta_lo = jnp.zeros_like(frame)
    for c in range(32):  # frame fits in 32 bits
        bit = ((frame >> c) & 1) != 0
        delta_hi = delta_hi ^ jnp.where(bit, vdc_hi[c], jnp.uint32(0))
        delta_lo = delta_lo ^ jnp.where(bit, vdc_lo[c], jnp.uint32(0))

    # b = ((uint64(px) << m) | py) ^ delta  — px, py < 2^m, m <= 16 assumed.
    assert m <= 16, "resolutions beyond 65536 need 64-bit pixel packing"
    b_lo = ((px << m) | py) ^ delta_lo
    b_hi = delta_hi
    for c in range(SOBOL_MATRIX_SIZE):
        if c < 32:
            bit = ((b_lo >> c) & 1) != 0
        else:
            bit = ((b_hi >> (c - 32)) & 1) != 0
        index_hi = index_hi ^ jnp.where(bit, vdci_hi[c], jnp.uint32(0))
        index_lo = index_lo ^ jnp.where(bit, vdci_lo[c], jnp.uint32(0))

    return index_hi, index_lo


# ---------------------------------------------------------------------------
# Gray-code / (0,2)-sequence generation (lowdiscrepancy.h:50-180)
# ---------------------------------------------------------------------------

def multiply_generator(c, a):
    """v = C * a over GF(2): XOR columns c[i] for set bits of a (uint32)."""
    a = jnp.asarray(a, jnp.uint32)
    v = jnp.zeros(jnp.broadcast_shapes(a.shape, c.shape[:-1]), jnp.uint32)
    for i in range(32):
        bit = ((a >> i) & 1) != 0
        v = v ^ jnp.where(bit, c[..., i], jnp.uint32(0))
    return v


def sample_generator_matrix(c, a, scramble=0):
    """SampleGeneratorMatrix (lowdiscrepancy.h:166)."""
    bits = multiply_generator(c, a) ^ jnp.asarray(scramble, jnp.uint32)
    return jnp.minimum(
        bits.astype(jnp.float32) * jnp.float32(_INV_2_32), ONE_MINUS_EPSILON
    )


def vdc_generator_matrix() -> np.ndarray:
    """Identity-reversed C for the van der Corput sequence (CVanDerCorput)."""
    return np.array([1 << (31 - i) for i in range(32)], dtype=np.uint32)


def sobol2d_generator_matrices() -> np.ndarray:
    """The two Sobol' (0,2)-sequence matrices (lowdiscrepancy.cpp Sobol02)."""
    tables = sobol_tables()
    m = np.asarray(tables["sobol_matrices32"][:2, :32])
    return m


def scrambled_radical_inverse_dyn(dim, a, min_dim: int = 5):
    """ScrambledRadicalInverse at a PER-LANE traced dimension array.

    The wavefront integrator's lane-refill design gives every lane its own
    dimension cursor (per-lane conditional consumption matches pbrt's
    sampler semantics exactly: NEE dims skipped at specular-only vertices,
    the RR dim consumed only when rrBeta < threshold).  `min_dim` is the
    smallest dimension any lane can request (static), which bounds the
    digit-loop trip count: dims >= 5 have base >= PRIMES[5] = 13, so a
    uint32 index has at most ceil(32/log2(13)) + 1 = 10 digits.
    """
    import math as _m

    primes_dev = jnp.asarray(PRIMES.astype(np.int32))
    sums_dev = jnp.asarray(PRIME_SUMS.astype(np.int32))
    perms_dev = jnp.asarray(radical_inverse_permutations().astype(np.int32))
    # Idle wavefront lanes keep advancing their cursor; clamp to the table.
    dim = jnp.clip(jnp.asarray(dim, jnp.int32), 0, PRIME_TABLE_SIZE - 1)
    base = primes_dev[dim]
    off = sums_dev[dim]
    base_u = base.astype(jnp.uint32)
    inv_base = 1.0 / base.astype(jnp.float32)
    a = jnp.asarray(a, jnp.uint32)
    reversed_digits = jnp.zeros(jnp.broadcast_shapes(a.shape, dim.shape), jnp.float32)
    inv_base_n = jnp.ones_like(reversed_digits)
    a = jnp.broadcast_to(a, reversed_digits.shape)
    n_iter = int(_m.ceil(32 / _m.log2(int(PRIMES[min_dim])))) + 1
    for _ in range(n_iter):
        nxt = a // base_u
        digit = (a - nxt * base_u).astype(jnp.int32)
        live = a > 0
        pd = perms_dev[off + digit].astype(jnp.float32)
        reversed_digits = jnp.where(
            live, reversed_digits * base.astype(jnp.float32) + pd, reversed_digits
        )
        inv_base_n = jnp.where(live, inv_base_n * inv_base, inv_base_n)
        a = nxt
    perm0 = perms_dev[off].astype(jnp.float32)
    return jnp.minimum(
        inv_base_n * (reversed_digits + inv_base * perm0 / (1.0 - inv_base)),
        ONE_MINUS_EPSILON,
    )


def sobol_sample_bits64_dyn(index_hi, index_lo, dim):
    """sobol_sample_bits64 with a traced per-lane dimension array: the
    matrix column block is gathered per lane ([N, 52] rows from the device
    table) instead of being a baked constant."""
    tables = sobol_tables()
    mats = jnp.asarray(tables["sobol_matrices32"])  # [D, 52] u32
    cols = mats[jnp.asarray(dim, jnp.int32)]  # [..., 52]
    index_hi = jnp.asarray(index_hi, jnp.uint32)
    index_lo = jnp.asarray(index_lo, jnp.uint32)
    shape = jnp.broadcast_shapes(index_lo.shape, cols.shape[:-1])
    v = jnp.zeros(shape, jnp.uint32)
    for i in range(SOBOL_MATRIX_SIZE):
        if i < 32:
            bit = ((index_lo >> i) & 1) != 0
        else:
            bit = ((index_hi >> (i - 32)) & 1) != 0
        v = v ^ jnp.where(bit, cols[..., i], jnp.uint32(0))
    return v


def sobol_sample_float64idx_dyn(index_hi, index_lo, dim, scramble=0):
    v = sobol_sample_bits64_dyn(index_hi, index_lo, dim) ^ jnp.asarray(
        scramble, jnp.uint32
    )
    return jnp.minimum(
        v.astype(jnp.float32) * jnp.float32(_INV_2_32), ONE_MINUS_EPSILON
    )
