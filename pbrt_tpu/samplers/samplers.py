"""Wavefront samplers: pure (pixel, sampleNum, dim) -> float programs.

TPU re-expression of core/sampler.{h,cpp} + src/samplers/: pbrt's stateful
Sampler objects become stateless index math.  A sampler "state" is just the
per-lane global sample index (computed once per batch); the integrator holds
the dimension cursor as a *static* Python int that follows pbrt's consumption
schedule (camera dims 0-4, sampler.cpp:46-52; per-bounce dims in Li order,
SURVEY.md §7 parity notes), so every Get1D/Get2D lowers to constant-folded
bit-math.

Implemented: sobol (sobol.cpp, the preferred parity default — pure bit math),
halton (halton.cpp incl. the 128-aligned pixel->index CRT inversion),
random (PCG32), stratified, zerotwosequence ((0,2)-sequence with per-pixel
scrambles), maxmin (max-min-distance matrices, CMaxMinDist tables).

PixelSampler note (sampler.h:89-104): pbrt's stratified/(0,2)/maxmin samplers
precompute per-pixel arrays with a tile-cloned RNG; the TPU re-expression is
*stateless* — stratum permutations and jitters come from counter-hashed
PCG-style mixing keyed by (pixel, dim), and the sample-index permutation uses
Kensler's cycle-walking permute (the standard stateless equivalent).  Same
stratification guarantees, deterministic, shard-invariant; not bit-equal to
the reference's tile-order-dependent streams (Sobol/Halton are the bit-exact
parity samplers).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..core import lowdiscrepancy as ld
from ..core import rng as prng

K_MAX_RESOLUTION = 128  # halton.cpp:42 kMaxResolution


def _round_up_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    name: str  # "sobol" | "halton" | "random"
    spp: int
    resolution: tuple  # full image resolution (x, y)
    sample_bounds_min: tuple = (0, 0)
    seed: int = 0
    # Exact-tables render mode (samplers/exact_tables.py): sample values are
    # precomputed host-side exactly as the reference computes them and
    # shipped to the device as a [D, N] table per spp batch; get_1d/get_2d
    # then read table[dim].  Lockstep engine only (the wavefront's
    # dynamically refilled lanes would need the whole-render table resident).
    exact: bool = False

    # --- derived (halton) ---
    def halton_setup(self):
        res = (
            min(self.resolution[0], K_MAX_RESOLUTION),
            min(self.resolution[1], K_MAX_RESOLUTION),
        )
        base_scales = []
        base_exps = []
        for i, base in enumerate((2, 3)):
            scale, exp = 1, 0
            while scale < res[i]:
                scale *= base
                exp += 1
            base_scales.append(scale)
            base_exps.append(exp)
        stride = base_scales[0] * base_scales[1]
        # multiplicativeInverse(baseScales[1-i], baseScales[i]) (halton.cpp:52).
        mult_inv = [
            pow(base_scales[1] % base_scales[0], -1, base_scales[0]),
            pow(base_scales[0] % base_scales[1], -1, base_scales[1]),
        ]
        return base_scales, base_exps, stride, mult_inv

    @property
    def sobol_log2_resolution(self) -> int:
        return int(math.log2(_round_up_pow2(max(self.resolution))))


def _mix32(x):
    """Stateless 32-bit finalizer (murmur3-style) for counter hashing."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _hash_combine(*xs):
    h = jnp.uint32(0x9E3779B9)
    for x in xs:
        h = _mix32(h ^ jnp.asarray(x, jnp.uint32) * jnp.uint32(0x85EBCA6B))
    return h


def _rand_float(bits):
    return jnp.minimum(
        bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
        ld.ONE_MINUS_EPSILON,
    )


def _kensler_permute(i, l: int, key):
    """Stateless keyed permutation of [0, l): balanced Feistel network over
    the next power-of-4 domain + cycle walking.  Provably bijective (each
    Feistel round is invertible; cycle walking restricts bijectively)."""
    import jax

    if l <= 1:
        return jnp.zeros_like(jnp.asarray(i, jnp.uint32))
    i = jnp.asarray(i, jnp.uint32)
    key = jnp.asarray(key, jnp.uint32)
    nbits = max((l - 1).bit_length(), 2)
    nbits += nbits & 1  # even for a balanced split
    h = nbits // 2
    hmask = jnp.uint32((1 << h) - 1)

    def feistel(x):
        L = (x >> h) & hmask
        R = x & hmask
        for r in range(4):
            f = _mix32(R ^ key ^ jnp.uint32((r * 0x9E3779B9) & 0xFFFFFFFF)) & hmask
            L, R = R, L ^ f
        return (L << h) | R

    out = jax.lax.while_loop(
        lambda s: jnp.any(s >= l),
        lambda s: jnp.where(s >= l, feistel(s), s),
        feistel(i),
    )
    return out


def init_state(cfg: SamplerConfig, pixel_xy, sample_num):
    """Compute per-lane global sample indices.

    pixel_xy: [N,2] int32 pixel coords; sample_num: [N] pixel-local sample #.
    Returns a dict-state used by get_1d/get_2d.
    """
    px = pixel_xy[..., 0].astype(jnp.uint32)
    py = pixel_xy[..., 1].astype(jnp.uint32)
    sample_num = sample_num.astype(jnp.uint32)

    if cfg.name == "sobol":
        # SobolSampler::GetIndexForSample (sobol.cpp:43-47).
        m = cfg.sobol_log2_resolution
        hi, lo = ld.sobol_interval_to_index(
            m,
            sample_num,
            px - jnp.uint32(cfg.sample_bounds_min[0]),
            py - jnp.uint32(cfg.sample_bounds_min[1]),
        )
        return {"hi": hi, "lo": lo, "px": px, "py": py}

    if cfg.name == "halton":
        # HaltonSampler::GetIndexForSample (halton.cpp:96-118).
        base_scales, base_exps, stride, mult_inv = cfg.halton_setup()
        pm0 = (px % K_MAX_RESOLUTION).astype(jnp.int32)
        pm1 = (py % K_MAX_RESOLUTION).astype(jnp.int32)

        # InverseRadicalInverse<base>(pm, exponent) (lowdiscrepancy.h:108):
        # read pm's base-`base` digits in reverse.
        def inverse_radical_inverse(base, x, n_digits):
            idx = jnp.zeros_like(x)
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
        index = offset.astype(jnp.uint32) + sample_num * jnp.uint32(stride)
        return {"index": index, "px": px, "py": py}

    if cfg.name == "random":
        lane_seed = (
            py * jnp.uint32(cfg.resolution[0]) + px
        ) * jnp.uint32(max(cfg.spp, 1)) + sample_num + jnp.uint32(cfg.seed)
        return {"rng": prng.make(lane_seed), "px": px, "py": py}

    if cfg.name in ("stratified", "zerotwosequence", "maxmin"):
        pixel_key = _hash_combine(
            py * jnp.uint32(cfg.resolution[0]) + px, jnp.uint32(cfg.seed)
        )
        return {"pixel_key": pixel_key, "s": sample_num, "px": px, "py": py}

    raise ValueError(f"unknown sampler {cfg.name!r}")


def _strat_xy(spp: int):
    """pbrt's CreateStratifiedSampler xsamp/ysamp; here derived from spp as
    the most-square factorization."""
    import math as _m

    xs = int(_m.sqrt(spp))
    while xs > 1 and spp % xs:
        xs -= 1
    return max(xs, 1), spp // max(xs, 1)


@functools.cache
def _maxmin_table():
    return np.load(
        Path(__file__).resolve().parent.parent / "data" / "maxmin_dist.npy"
    )


def get_1d(cfg: SamplerConfig, state, dim: int):
    """Sampler::Get1D at a static dimension.  May mutate state['rng']."""
    if "table" in state:
        # Tables mode ([D, N]: one contiguous lane-row per dimension) —
        # exact host tables (samplers/exact_tables.py) or the per-batch
        # device-precomputed halton table (integrators/path.py).
        return state["table"][dim]
    if cfg.name == "pss":
        # Primary-sample-space passthrough (MLTSampler, mlt.cpp:53-124):
        # the caller supplies the full uniform vector (mutated by the
        # Markov chain); dims beyond the vector fall back to a hash.
        x = state["x"]
        if dim < x.shape[1]:
            return x[:, dim]
        return _rand_float(
            _mix32(state["chain_key"] ^ _mix32(jnp.uint32(dim * 0x9E37)))
        )
    if cfg.name == "sobol":
        s = ld.sobol_sample_float64idx(state["hi"], state["lo"], dim)
        if dim < 2:
            # Remap pixel dims (sobol.cpp:54-60 SampleDimension).
            res = 1 << cfg.sobol_log2_resolution
            s = s * res + jnp.float32(cfg.sample_bounds_min[dim])
            pix = (state["px"] if dim == 0 else state["py"]).astype(jnp.float32)
            s = jnp.clip(s - pix, 0.0, ld.ONE_MINUS_EPSILON)
        return s
    if cfg.name == "halton":
        index = state["index"]
        base_scales, base_exps, stride, mult_inv = cfg.halton_setup()
        if dim == 0:
            return ld.radical_inverse(0, index >> base_exps[0])
        if dim == 1:
            return ld.radical_inverse(1, index // jnp.uint32(base_scales[1]))
        # Digit-pair table form: bit-exact, half the gathers (round-5 perf:
        # the per-digit perm gather dominated the [D,N] table build).
        return ld.scrambled_radical_inverse_fast(dim, index)
    if cfg.name == "random":
        state["rng"], f = prng.next_float(state["rng"])
        return f
    if cfg.name == "stratified":
        # StratifiedSample1D + Shuffle (stratified.cpp:50-73), stateless.
        spp = max(cfg.spp, 1)
        key = _hash_combine(state["pixel_key"], jnp.uint32(dim))
        j = _kensler_permute(state["s"], spp, key)
        jit = _rand_float(_mix32(key ^ _mix32(state["s"] + jnp.uint32(0xABCD))))
        return jnp.minimum(
            (j.astype(jnp.float32) + jit) / spp, ld.ONE_MINUS_EPSILON
        )
    if cfg.name == "zerotwosequence":
        # VanDerCorput-scrambled 1D (zerotwosequence.cpp StartPixel).
        scramble = _hash_combine(state["pixel_key"], jnp.uint32(dim))
        bits = ld.reverse_bits_32(state["s"]) ^ scramble
        return _rand_float(bits)
    if cfg.name == "maxmin":
        scramble = _hash_combine(state["pixel_key"], jnp.uint32(dim))
        bits = ld.reverse_bits_32(state["s"]) ^ scramble
        return _rand_float(bits)
    raise ValueError(cfg.name)


def get_2d(cfg: SamplerConfig, state, dim: int):
    if "table" in state:
        t = state["table"]
        return jnp.stack([t[dim], t[dim + 1]], -1)
    if cfg.name == "pss":
        return jnp.stack(
            [get_1d(cfg, state, dim), get_1d(cfg, state, dim + 1)], -1
        )
    if cfg.name == "stratified":
        # StratifiedSample2D (stratified.cpp:55): xs x ys strata, shuffled.
        spp = max(cfg.spp, 1)
        xs, ys = _strat_xy(spp)
        key = _hash_combine(state["pixel_key"], jnp.uint32(dim), jnp.uint32(77))
        j = _kensler_permute(state["s"], xs * ys, key)
        jx = (j % xs).astype(jnp.float32)
        jy = (j // xs).astype(jnp.float32)
        ux = _rand_float(_mix32(key ^ _mix32(state["s"] + jnp.uint32(0x1111))))
        uy = _rand_float(_mix32(key ^ _mix32(state["s"] + jnp.uint32(0x2222))))
        return jnp.stack(
            [
                jnp.minimum((jx + ux) / xs, ld.ONE_MINUS_EPSILON),
                jnp.minimum((jy + uy) / ys, ld.ONE_MINUS_EPSILON),
            ],
            -1,
        )
    if cfg.name == "zerotwosequence":
        # Sobol02 with per-(pixel,dim) scrambles (lowdiscrepancy.h:203-228).
        tables = ld.sobol_tables()
        c0 = jnp.asarray(np.ascontiguousarray(tables["sobol_matrices32"][0, :32]))
        c1 = jnp.asarray(np.ascontiguousarray(tables["sobol_matrices32"][1, :32]))
        s0 = _hash_combine(state["pixel_key"], jnp.uint32(dim), jnp.uint32(1))
        s1 = _hash_combine(state["pixel_key"], jnp.uint32(dim), jnp.uint32(2))
        x = ld.multiply_generator(c0, state["s"]) ^ s0
        y = ld.multiply_generator(c1, state["s"]) ^ s1
        return jnp.stack([_rand_float(x), _rand_float(y)], -1)
    if cfg.name == "maxmin":
        # CMaxMinDist matrices for the first 2D; Sobol02 beyond
        # (maxmin.cpp:47-72).
        spp = max(cfg.spp, 1)
        idx = min(max(spp.bit_length() - 1, 0), 16)
        cmm = jnp.asarray(np.ascontiguousarray(_maxmin_table()[idx]))
        if dim < 2:
            s0 = _hash_combine(state["pixel_key"], jnp.uint32(dim), jnp.uint32(1))
            x_bits = ld.multiply_generator(cmm, state["s"]) ^ s0
            # y = paired van der Corput as in pbrt's MaxMin matrices usage.
            y_bits = ld.reverse_bits_32(state["s"]) ^ _hash_combine(
                state["pixel_key"], jnp.uint32(dim), jnp.uint32(2)
            )
            return jnp.stack([_rand_float(x_bits), _rand_float(y_bits)], -1)
        tables = ld.sobol_tables()
        c0 = jnp.asarray(np.ascontiguousarray(tables["sobol_matrices32"][0, :32]))
        c1 = jnp.asarray(np.ascontiguousarray(tables["sobol_matrices32"][1, :32]))
        s0 = _hash_combine(state["pixel_key"], jnp.uint32(dim), jnp.uint32(1))
        s1 = _hash_combine(state["pixel_key"], jnp.uint32(dim), jnp.uint32(2))
        x = ld.multiply_generator(c0, state["s"]) ^ s0
        y = ld.multiply_generator(c1, state["s"]) ^ s1
        return jnp.stack([_rand_float(x), _rand_float(y)], -1)
    return jnp.stack(
        [get_1d(cfg, state, dim), get_1d(cfg, state, dim + 1)], axis=-1
    )


def get_1d_dyn(cfg: SamplerConfig, state, dim):
    """Sampler::Get1D at a PER-LANE traced dimension array (all values must
    be >= 5: the pixel-remap dims 0-1 and camera dims are always consumed at
    statically-known dims by the refill step).  Used by the wavefront
    integrator, whose lane pool mixes bounces — and whose per-lane dim
    cursors replicate pbrt's CONDITIONAL consumption (NEE dims skipped at
    specular-only vertices, RR dim only when rrBeta < threshold), which the
    static schedule in li_path cannot."""
    dim = jnp.minimum(jnp.asarray(dim, jnp.int32), 1021)  # idle-lane clamp
    if "table" in state:
        t = state["table"]  # [D, N]
        d = jnp.clip(dim, 0, t.shape[0] - 1)
        if d.ndim == 0:
            # Scalar dim (the lax.scan bounce body): one dynamic ROW slice
            # of the [D, N] table — contiguous lanes, no gather.
            import jax as _jax

            return _jax.lax.dynamic_index_in_dim(
                t, d, axis=0, keepdims=False
            )
        # Per-lane dims (unused today: the wavefront does not run tables).
        return jnp.take_along_axis(
            t, jnp.broadcast_to(d, t.shape[1:])[None, :], axis=0
        )[0]
    if cfg.name == "sobol":
        return ld.sobol_sample_float64idx_dyn(state["hi"], state["lo"], dim)
    if cfg.name == "halton":
        return ld.scrambled_radical_inverse_dyn(dim, state["index"])
    if cfg.name == "random":
        state["rng"], f = prng.next_float(state["rng"])
        return f
    if cfg.name == "stratified":
        spp = max(cfg.spp, 1)
        key = _hash_combine(state["pixel_key"], dim.astype(jnp.uint32))
        j = _kensler_permute(state["s"], spp, key)
        jit = _rand_float(_mix32(key ^ _mix32(state["s"] + jnp.uint32(0xABCD))))
        return jnp.minimum(
            (j.astype(jnp.float32) + jit) / spp, ld.ONE_MINUS_EPSILON
        )
    if cfg.name in ("zerotwosequence", "maxmin"):
        scramble = _hash_combine(state["pixel_key"], dim.astype(jnp.uint32))
        bits = ld.reverse_bits_32(state["s"]) ^ scramble
        return _rand_float(bits)
    raise ValueError(cfg.name)


def get_2d_dyn(cfg: SamplerConfig, state, dim):
    dim = jnp.asarray(dim, jnp.int32)
    if "table" in state:
        return jnp.stack(
            [get_1d_dyn(cfg, state, dim), get_1d_dyn(cfg, state, dim + 1)],
            axis=-1,
        )
    if cfg.name == "stratified":
        spp = max(cfg.spp, 1)
        xs, ys = _strat_xy(spp)
        key = _hash_combine(
            state["pixel_key"], dim.astype(jnp.uint32), jnp.uint32(77)
        )
        j = _kensler_permute(state["s"], xs * ys, key)
        jx = (j % xs).astype(jnp.float32)
        jy = (j // xs).astype(jnp.float32)
        ux = _rand_float(_mix32(key ^ _mix32(state["s"] + jnp.uint32(0x1111))))
        uy = _rand_float(_mix32(key ^ _mix32(state["s"] + jnp.uint32(0x2222))))
        return jnp.stack(
            [
                jnp.minimum((jx + ux) / xs, ld.ONE_MINUS_EPSILON),
                jnp.minimum((jy + uy) / ys, ld.ONE_MINUS_EPSILON),
            ],
            -1,
        )
    if cfg.name in ("zerotwosequence", "maxmin"):
        tables = ld.sobol_tables()
        c0 = jnp.asarray(np.ascontiguousarray(tables["sobol_matrices32"][0, :32]))
        c1 = jnp.asarray(np.ascontiguousarray(tables["sobol_matrices32"][1, :32]))
        s0 = _hash_combine(state["pixel_key"], dim.astype(jnp.uint32), jnp.uint32(1))
        s1 = _hash_combine(state["pixel_key"], dim.astype(jnp.uint32), jnp.uint32(2))
        x = ld.multiply_generator(c0, state["s"]) ^ s0
        y = ld.multiply_generator(c1, state["s"]) ^ s1
        return jnp.stack([_rand_float(x), _rand_float(y)], -1)
    return jnp.stack(
        [get_1d_dyn(cfg, state, dim), get_1d_dyn(cfg, state, dim + 1)], axis=-1
    )


def get_camera_sample(cfg: SamplerConfig, state, pixel_xy):
    """Sampler::GetCameraSample (sampler.cpp:46-52): dims 0-4.

    Returns (p_film [N,2], time [N], p_lens [N,2]).
    """
    p_film = (
        pixel_xy.astype(jnp.float32) + get_2d(cfg, state, 0)
    )
    time = get_1d(cfg, state, 2)
    p_lens = get_2d(cfg, state, 3)
    return p_film, time, p_lens


def _halton_perm_device():
    # numpy (cached inside radical_inverse_permutations); jnp-converts at the
    # use site so no tracer can be cached.
    return ld.radical_inverse_permutations().astype(np.int32)
