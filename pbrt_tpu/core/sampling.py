"""Sampling warps, MIS heuristics and piecewise distributions.

TPU re-expression of pbrt's core/sampling.{h,cpp}: the warps are pure
elementwise math over `[..., 2]` sample arrays; Distribution1D/2D become CDF
arrays built host-side (numpy) and sampled on device with `searchsorted`
(the vectorized analog of pbrt's FindInterval binary search, sampling.h:55-157).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .pytree import pytree_dataclass
from .vecmath import vec

PI = float(np.pi)
INV_PI = 1.0 / PI
INV_2PI = 1.0 / (2.0 * PI)
INV_4PI = 1.0 / (4.0 * PI)
PI_OVER_2 = PI / 2.0
PI_OVER_4 = PI / 4.0


# ---------------------------------------------------------------------------
# Warps (sampling.cpp)
# ---------------------------------------------------------------------------

def uniform_sample_hemisphere(u):
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return vec(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_hemisphere_pdf():
    return INV_2PI


def uniform_sample_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return vec(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_sphere_pdf():
    return INV_4PI


def uniform_sample_disk(u):
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def concentric_sample_disk(u):
    """(sampling.cpp:113 ConcentricSampleDisk) — branch order matches pbrt."""
    u_off = 2.0 * u - 1.0
    x = u_off[..., 0]
    y = u_off[..., 1]
    degenerate = (x == 0.0) & (y == 0.0)
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    theta = jnp.where(
        use_x,
        PI_OVER_4 * (y / jnp.where(x == 0.0, 1.0, x)),
        PI_OVER_2 - PI_OVER_4 * (x / jnp.where(y == 0.0, 1.0, y)),
    )
    p = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(degenerate[..., None], 0.0, p)


def cosine_sample_hemisphere(u):
    d = concentric_sample_disk(u)
    z = jnp.sqrt(
        jnp.maximum(0.0, 1.0 - d[..., 0] * d[..., 0] - d[..., 1] * d[..., 1])
    )
    return vec(d[..., 0], d[..., 1], z)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_cone(u, cos_theta_max):
    cos_t = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = u[..., 1] * 2.0 * PI
    return vec(jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * PI * (1.0 - cos_theta_max))


def uniform_sample_triangle(u):
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


# ---------------------------------------------------------------------------
# MIS heuristics (sampling.h:167-174)
# ---------------------------------------------------------------------------

def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / (nf * f_pdf + ng * g_pdf)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    # Double-where: inf pdfs (delta-adjacent lanes) must not reach the
    # division, or their infinite partials poison the backward pass (a
    # 0-cotangent times inf is NaN).
    f = nf * f_pdf
    g = ng * g_pdf
    f_inf = jnp.isinf(f * f)
    g_inf = jnp.isinf(g * g)
    fs = jnp.where(f_inf | g_inf, 1.0, f)
    gs = jnp.where(f_inf | g_inf, 1.0, g)
    # Epsilon 1e-18, not 1e-30: the division's backward squares the
    # denominator, and (1e-30)^2 underflows f32 to 0 -> 0/0 NaN adjoints.
    w = (fs * fs) / jnp.maximum(fs * fs + gs * gs, 1e-18)
    w = jnp.where(g_inf & ~f_inf, 0.0, w)  # finite^2 / inf == 0
    return jnp.where(f_inf, 1.0, w)


# ---------------------------------------------------------------------------
# Distribution1D / Distribution2D
# ---------------------------------------------------------------------------

@pytree_dataclass
class Distribution1D:
    """CDF arrays for inverse-CDF sampling (sampling.h:55-108).

    func: [n] unnormalized pdf values; cdf: [n+1]; func_int: [] integral.
    """

    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray


def build_distribution_1d(f: np.ndarray) -> Distribution1D:
    """Host-side CDF build matching Distribution1D's ctor exactly."""
    f = np.asarray(f, np.float64)
    n = f.shape[-1]
    cdf = np.zeros(f.shape[:-1] + (n + 1,), np.float64)
    cdf[..., 1:] = np.cumsum(f / n, axis=-1)
    func_int = cdf[..., n].copy()
    zero = func_int == 0
    uniform = np.arange(1, n + 1, dtype=np.float64) / n
    cdf[..., 1:] = np.where(
        zero[..., None], uniform, cdf[..., 1:] / np.where(zero, 1.0, func_int)[..., None]
    )
    # Host-side numpy (uploaded once at the jit boundary with the scene).
    return Distribution1D(
        func=np.asarray(f, np.float32),
        cdf=np.asarray(cdf, np.float32),
        func_int=np.asarray(func_int, np.float32),
    )


def find_interval(cdf, u):
    """Largest i with cdf[..., i] <= u, clamped — pbrt's FindInterval.

    Implemented as a vectorized comparison-sum (branch-free, VPU-friendly,
    batches over leading axes of `cdf`); O(n) in work but O(1) in depth.
    """
    n = cdf.shape[-1]
    idx = jnp.sum((cdf <= u[..., None]).astype(jnp.int32), axis=-1) - 1
    return jnp.clip(idx, 0, n - 2)


def sample_continuous_1d(d: Distribution1D, u):
    """Returns (x in [0,1), pdf, offset) — Distribution1D::SampleContinuous."""
    n = d.func.shape[-1]
    offset = find_interval(d.cdf, u)
    c0 = jnp.take(d.cdf, offset, axis=-1)
    c1 = jnp.take(d.cdf, offset + 1, axis=-1)
    denom = c1 - c0
    du = jnp.where(denom > 0.0, (u - c0) / jnp.maximum(denom, 1e-30), u - c0)
    f = jnp.take(d.func, offset, axis=-1)
    pdf = jnp.where(d.func_int > 0.0, f / jnp.maximum(d.func_int, 1e-30), 0.0)
    return (offset.astype(jnp.float32) + du) / n, pdf, offset


def sample_discrete_1d(d: Distribution1D, u):
    """Returns (offset, pmf, u_remapped) — Distribution1D::SampleDiscrete."""
    n = d.func.shape[-1]
    offset = find_interval(d.cdf, u)
    f = jnp.take(d.func, offset, axis=-1)
    pmf = jnp.where(
        d.func_int > 0.0, f / jnp.maximum(d.func_int * n, 1e-30), 0.0
    )
    c0 = jnp.take(d.cdf, offset, axis=-1)
    c1 = jnp.take(d.cdf, offset + 1, axis=-1)
    u_remapped = (u - c0) / jnp.maximum(c1 - c0, 1e-30)
    return offset, pmf, u_remapped


def discrete_pdf_1d(d: Distribution1D, index):
    n = d.func.shape[-1]
    f = jnp.take(d.func, index, axis=-1)
    return f / jnp.maximum(d.func_int * n, 1e-30)


@pytree_dataclass
class Distribution2D:
    """Marginal-over-rows + conditional-per-row (sampling.h:123-157).

    cond_func: [H, W]; cond_cdf: [H, W+1]; cond_int: [H];
    marg_func: [H]; marg_cdf: [H+1]; marg_int: [].
    """

    cond_func: jnp.ndarray
    cond_cdf: jnp.ndarray
    cond_int: jnp.ndarray
    marg_func: jnp.ndarray
    marg_cdf: jnp.ndarray
    marg_int: jnp.ndarray


def build_distribution_2d(f: np.ndarray) -> Distribution2D:
    f = np.asarray(f, np.float64)  # [H, W] (v-major, as pbrt: func[v][u])
    h, w = f.shape
    cond = build_distribution_1d(f)  # batched over rows
    cond_int = np.asarray(cond.func_int)
    marg = build_distribution_1d(cond_int)
    return Distribution2D(
        cond_func=cond.func,
        cond_cdf=cond.cdf,
        cond_int=cond.func_int,
        marg_func=marg.func,
        marg_cdf=marg.cdf,
        marg_int=marg.func_int,
    )


def sample_continuous_2d(d: Distribution2D, u):
    """u: [..., 2] -> ((u_x, u_y) in [0,1)^2, pdf)."""
    h = d.cond_func.shape[0]
    w = d.cond_func.shape[1]
    # Sample marginal (v) first — matches Distribution2D::SampleContinuous.
    marg1d = Distribution1D(d.marg_func, d.marg_cdf, d.marg_int)
    v, pdf_v, iv = sample_continuous_1d(marg1d, u[..., 1])
    cond_cdf = d.cond_cdf[iv]  # [..., W+1]
    cond_func = d.cond_func[iv]  # [..., W]
    cint = d.cond_int[iv]
    iu = find_interval(cond_cdf, u[..., 0])
    c0 = jnp.take_along_axis(cond_cdf, iu[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(cond_cdf, iu[..., None] + 1, axis=-1)[..., 0]
    denom = c1 - c0
    du = jnp.where(denom > 0.0, (u[..., 0] - c0) / jnp.maximum(denom, 1e-30), u[..., 0] - c0)
    fval = jnp.take_along_axis(cond_func, iu[..., None], axis=-1)[..., 0]
    pdf_u = jnp.where(cint > 0.0, fval / jnp.maximum(cint, 1e-30), 0.0)
    x = (iu.astype(jnp.float32) + du) / w
    return jnp.stack([x, v], axis=-1), pdf_u * pdf_v


def pdf_2d(d: Distribution2D, p):
    """Distribution2D::Pdf(p) — p in [0,1)^2."""
    h, w = d.cond_func.shape
    iu = jnp.clip((p[..., 0] * w).astype(jnp.int32), 0, w - 1)
    iv = jnp.clip((p[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return d.cond_func[iv, iu] / jnp.maximum(d.marg_int, 1e-30)


# ---------------------------------------------------------------------------
# Stratified sample generation (sampling.cpp:44-73) — device-side variants
# live with the stratified sampler; these host helpers serve tests/tables.
# ---------------------------------------------------------------------------

def radical_inverse_base2_u32(bits):
    """Bit-reverse a uint32 and scale to [0,1) — ReverseBits32 based."""
    from .lowdiscrepancy import reverse_bits_32

    b = reverse_bits_32(bits)
    return b.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
