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
random (PCG32), stratified-equivalent via padded Sobol is TODO.
"""
from __future__ import annotations

import dataclasses
import math

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

    raise ValueError(f"unknown sampler {cfg.name!r}")


def get_1d(cfg: SamplerConfig, state, dim: int):
    """Sampler::Get1D at a static dimension.  May mutate state['rng']."""
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
        perms = _halton_perm_device()
        off = int(ld.PRIME_SUMS[dim])
        p = int(ld.PRIMES[dim])
        return ld.scrambled_radical_inverse(
            dim, index, jnp.asarray(perms[off : off + p])
        )
    if cfg.name == "random":
        state["rng"], f = prng.next_float(state["rng"])
        return f
    raise ValueError(cfg.name)


def get_2d(cfg: SamplerConfig, state, dim: int):
    return jnp.stack(
        [get_1d(cfg, state, dim), get_1d(cfg, state, dim + 1)], axis=-1
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
