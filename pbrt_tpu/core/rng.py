"""PCG32 random number generator, TPU-vectorized.

pbrt seeds all of its stochastic machinery with PCG32 (reference:
core/rng.h:61-118).  Reproducing it exactly matters for parity: Halton
permutation tables are generated from a *default-seeded* PCG32
(halton.cpp:69-71), samplers fall back to it, and the stratified sampler's
jitter/shuffle consume it in a defined order.

TPU has no native 64-bit integers in the default f32 config, so the 64-bit
PCG state is carried as a `(hi, lo)` pair of uint32 arrays; all 64-bit
arithmetic (mul/add/shift/xor) is emulated with 16/32-bit ops that map onto
the VPU's integer lanes.  `ScalarPcg32` is a bit-exact Python-int reference
used host-side for table generation and in tests.
"""
from __future__ import annotations

import jax.numpy as jnp

PCG32_DEFAULT_STATE = 0x853C49E6748FEA9B
PCG32_DEFAULT_STREAM = 0xDA3E39CB94B95BDB
PCG32_MULT = 0x5851F42D4C957F2D

ONE_MINUS_EPSILON = float(jnp.float32(1.0) - jnp.finfo(jnp.float32).eps / 2)

_M32 = 0xFFFFFFFF


def _u32(x):
    return jnp.asarray(x, jnp.uint32)


def _umull(a, b):
    """Full 32x32 -> 64 multiply of uint32 arrays, returning (hi, lo)."""
    a = _u32(a)
    b = _u32(b)
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    t = a0 * b0
    w0 = t & 0xFFFF
    k = t >> 16
    t = a1 * b0 + k
    w1 = t & 0xFFFF
    w2 = t >> 16
    t = a0 * b1 + w1
    hi = a1 * b1 + w2 + (t >> 16)
    lo = (t << 16) | w0
    return hi, lo


def _mul64(ah, al, bh, bl):
    """(ah:al) * (bh:bl) mod 2^64 -> (hi, lo)."""
    hi, lo = _umull(al, bl)
    hi = hi + _u32(al) * _u32(bh) + _u32(ah) * _u32(bl)
    return hi, lo


def _add64(ah, al, bh, bl):
    lo = _u32(al) + _u32(bl)
    carry = (lo < _u32(al)).astype(jnp.uint32)
    hi = _u32(ah) + _u32(bh) + carry
    return hi, lo


def _shl64_1_or1(h, l):
    """(h:l) << 1 | 1 — used by SetSequence's inc computation."""
    return (h << 1) | (l >> 31), (l << 1) | _u32(1)


class Pcg32State:
    """Tuple-of-arrays PCG32 state: (state_hi, state_lo, inc_hi, inc_lo)."""


def make(seq_lo, seq_hi=None):
    """Vectorized RNG::SetSequence (rng.h:75): seq is the stream index."""
    seq_lo = _u32(seq_lo)
    seq_hi = _u32(0 if seq_hi is None else seq_hi) * jnp.ones_like(seq_lo)
    inc_h, inc_l = _shl64_1_or1(seq_hi, seq_lo)
    sh = jnp.zeros_like(seq_lo)
    sl = jnp.zeros_like(seq_lo)
    state = (sh, sl, inc_h, inc_l)
    state, _ = next_uint32(state)
    sh, sl, ih, il = state
    sh, sl = _add64(
        sh, sl, _u32(PCG32_DEFAULT_STATE >> 32), _u32(PCG32_DEFAULT_STATE & _M32)
    )
    state, _ = next_uint32((sh, sl, ih, il))
    return state


def next_uint32(state):
    """One PCG32 step (rng.h:85 UniformUInt32). Returns (new_state, bits)."""
    sh, sl, ih, il = state
    mh = _u32(PCG32_MULT >> 32)
    ml = _u32(PCG32_MULT & _M32)
    nh, nl = _mul64(sh, sl, mh, ml)
    nh, nl = _add64(nh, nl, ih, il)
    # xorshifted = uint32(((old >> 18) ^ old) >> 27)
    x18h = sh >> 18
    x18l = (sl >> 18) | (sh << 14)
    xh = x18h ^ sh
    xl = x18l ^ sl
    xorshifted = (xl >> 27) | (xh << 5)
    rot = sh >> 27  # == old >> 59
    out = (xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))
    return (nh, nl, ih, il), out


def next_float(state):
    """Uniform in [0,1) (rng.h:93 UniformFloat)."""
    state, bits = next_uint32(state)
    f = jnp.minimum(
        jnp.float32(ONE_MINUS_EPSILON),
        bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
    )
    return state, f


class ScalarPcg32:
    """Bit-exact scalar PCG32 on Python ints — host-side table generation.

    Mirrors rng.h:61-118 including the bounded-draw rejection loop used by
    Shuffle (lowdiscrepancy.cpp:2490-2504 ComputeRadicalInversePermutations).
    """

    def __init__(self, seq: int | None = None):
        if seq is None:
            self.state = PCG32_DEFAULT_STATE
            self.inc = PCG32_DEFAULT_STREAM
        else:
            self.set_sequence(seq)

    def set_sequence(self, initseq: int):
        self.state = 0
        self.inc = ((initseq << 1) | 1) & 0xFFFFFFFFFFFFFFFF
        self.uniform_uint32()
        self.state = (self.state + PCG32_DEFAULT_STATE) & 0xFFFFFFFFFFFFFFFF
        self.uniform_uint32()

    def uniform_uint32(self) -> int:
        old = self.state
        self.state = (old * PCG32_MULT + self.inc) & 0xFFFFFFFFFFFFFFFF
        xorshifted = (((old >> 18) ^ old) >> 27) & _M32
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((~rot + 1) & 31))) & _M32

    def uniform_uint32_bounded(self, b: int) -> int:
        threshold = (~b + 1) % b if b > 0 else 0
        while True:
            r = self.uniform_uint32()
            if r >= threshold:
                return r % b

    def uniform_float(self) -> float:
        import struct

        v = self.uniform_uint32() * 2.3283064365386963e-10
        v = struct.unpack("f", struct.pack("f", v))[0]
        return min(ONE_MINUS_EPSILON, v)

    def shuffle(self, arr):
        """pbrt's Shuffle (lowdiscrepancy.cpp / sampling.h:50): in-place."""
        n = len(arr)
        for i in range(n):
            other = i + self.uniform_uint32_bounded(n - i)
            arr[i], arr[other] = arr[other], arr[i]
        return arr
