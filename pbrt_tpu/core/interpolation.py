"""Catmull-Rom spline + Fourier-series interpolation/sampling.

TPU re-expression of core/interpolation.{h,cpp} (reference
interpolation.cpp:40-460): pbrt's scalar Newton-bisection inversion loops
become fixed-trip-count `lax.fori_loop`s vectorized over the lane axis, and
`FindInterval` binary searches become `searchsorted` (static node vectors) or
an explicit log2-depth bisection (per-lane interpolated CDFs).

These primitives power the FourierBSDF (reflection.cpp:312-641) and the
tabulated BSSRDF (bssrdf.cpp Sample_Sr / Pdf_Sr); the host-side (numpy)
variants build BSSRDF CDF tables and invert reflectance curves
(IntegrateCatmullRom / InvertCatmullRom, interpolation.cpp:255-345).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_NEWTON_ITERS = 40  # bisection fallback halves [a,b]: 2^-40 << pbrt's 1e-6


# ---------------------------------------------------------------------------
# Catmull-Rom weights (interpolation.cpp:61-103), vectorized over x.
# ---------------------------------------------------------------------------

def catmull_rom_weights(nodes, x):
    """nodes: [n] (device, sorted), x: [...] -> (offset, w4[...,4], valid).

    offset is the index of the first of 4 control points (idx-1); out-of-bound
    x yields valid=False (weights still finite so callers can mask).
    """
    n = nodes.shape[0]
    valid = (x >= nodes[0]) & (x <= nodes[n - 1])
    idx = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0, n - 2)
    x0 = nodes[idx]
    x1 = nodes[idx + 1]
    t = (x - x0) / jnp.where(x1 == x0, 1.0, x1 - x0)
    t2 = t * t
    t3 = t2 * t

    w1 = 2 * t3 - 3 * t2 + 1
    w2 = -2 * t3 + 3 * t2
    # first node weight
    has_prev = idx > 0
    xm1 = nodes[jnp.maximum(idx - 1, 0)]
    w0p = (t3 - 2 * t2 + t) * (x1 - x0) / jnp.where(has_prev, x1 - xm1, 1.0)
    w0n = t3 - 2 * t2 + t  # no prev: fold into w1/w2
    w0 = jnp.where(has_prev, -w0p, 0.0)
    w1 = jnp.where(has_prev, w1, w1 - w0n)
    w2 = w2 + jnp.where(has_prev, w0p, w0n)
    # last node weight
    has_next = idx + 2 < n
    xp2 = nodes[jnp.minimum(idx + 2, n - 1)]
    w3p = (t3 - t2) * (x1 - x0) / jnp.where(has_next, xp2 - x0, 1.0)
    w3n = t3 - t2
    w3 = jnp.where(has_next, w3p, 0.0)
    w1 = w1 - jnp.where(has_next, w3p, w3n)
    w2 = w2 + jnp.where(has_next, 0.0, w3n)

    weights = jnp.stack([w0, w1, w2, w3], axis=-1)
    return idx - 1, weights, valid


# ---------------------------------------------------------------------------
# Fourier series evaluation (interpolation.cpp:348-361).
# ---------------------------------------------------------------------------

def fourier_eval(ak, cos_phi, m=None):
    """sum_k ak[...,k] * cos(k*phi) via the cosine double-angle recurrence.

    ak: [..., mMax]; cos_phi: [...]; m: optional per-lane active order [...]
    (terms with k >= m are masked).  Returns [...].
    """
    m_max = ak.shape[-1]
    if m is None:
        m = jnp.full(cos_phi.shape, m_max, jnp.int32)

    def body(k, carry):
        val, ckm1, ck = carry  # ck = cos(k*phi), ckm1 = cos((k-1)*phi)
        val = val + jnp.where(k < m, ak[..., k] * ck, 0.0)
        ckp1 = 2.0 * cos_phi * ck - ckm1
        return val, ck, ckp1

    val = jnp.zeros_like(cos_phi)
    # at k=0: cos(0)=1, cos(-phi)=cos(phi)
    val, _, _ = jax.lax.fori_loop(
        0, m_max, body, (val, cos_phi, jnp.ones_like(cos_phi))
    )
    return val


def sample_fourier(ak, u, m=None, iters=_NEWTON_ITERS):
    """Importance-sample phi from a Fourier series (interpolation.cpp:363-421).

    ak: [..., mMax] (luminance coefficients), u: [...] in [0,1).
    Returns (f_value, pdf, phi).
    """
    m_max = ak.shape[-1]
    if m is None:
        m = jnp.full(u.shape, m_max, jnp.int32)
    flip = u >= 0.5
    u = jnp.where(flip, 1.0 - 2.0 * (u - 0.5), 2.0 * u)
    pi = jnp.pi

    def eval_Ff(phi):
        # F(phi) = integral_0^phi f; via sin recurrences (a_k/k sin(k phi)).
        cos_phi = jnp.cos(phi)
        sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi * cos_phi))

        def body(k, carry):
            F, f, sin_prev, sin_cur, cos_prev, cos_cur = carry
            sin_next = 2.0 * cos_phi * sin_cur - sin_prev
            cos_next = 2.0 * cos_phi * cos_cur - cos_prev
            live = k < m
            F = F + jnp.where(live, ak[..., k] / k.astype(jnp.float32) * sin_next, 0.0)
            f = f + jnp.where(live, ak[..., k] * cos_next, 0.0)
            return F, f, sin_cur, sin_next, cos_cur, cos_next

        F0 = ak[..., 0] * phi
        f0 = ak[..., 0]
        F, f, *_ = jax.lax.fori_loop(
            1, m_max, body,
            (F0, f0, -sin_phi, jnp.zeros_like(phi), cos_phi, jnp.ones_like(phi)),
        )
        return F - u * ak[..., 0] * pi, f

    def newton(i, carry):
        a, b, phi = carry
        F, f = eval_Ff(phi)
        b = jnp.where(F > 0, phi, b)
        a = jnp.where(F > 0, a, phi)
        phi_new = phi - F / jnp.where(f == 0, 1.0, f)
        oob = ~((phi_new > a) & (phi_new < b))
        phi_new = jnp.where(oob, 0.5 * (a + b), phi_new)
        done = (jnp.abs(F) < 1e-6) | (b - a < 1e-6)
        phi = jnp.where(done, phi, phi_new)
        return a, b, phi

    a0 = jnp.zeros_like(u)
    b0 = jnp.full_like(u, pi)
    phi0 = jnp.full_like(u, 0.5 * pi)
    _, _, phi = jax.lax.fori_loop(0, iters, newton, (a0, b0, phi0))
    _, f = eval_Ff(phi)
    phi = jnp.where(flip, 2.0 * pi - phi, phi)
    a0k = ak[..., 0]
    pdf = jnp.where(a0k > 0, f / (2.0 * pi * jnp.where(a0k == 0, 1.0, a0k)), 0.0)
    return f, pdf, phi


# ---------------------------------------------------------------------------
# Spline-segment definite-integral inversion shared by SampleCatmullRom{,2D}.
# ---------------------------------------------------------------------------

def _invert_segment_integral(f0, f1, d0, d1, u, iters=_NEWTON_ITERS):
    """Solve Fhat(t) = u on one spline segment (interpolation.cpp:130-167).

    Returns (t, fhat) with Fhat the Horner-form antiderivative of the cubic.
    """
    t_lin = jnp.where(
        f0 != f1,
        (f0 - jnp.sqrt(jnp.maximum(0.0, f0 * f0 + 2.0 * u * (f1 - f0))))
        / jnp.where(f0 == f1, 1.0, f0 - f1),
        u / jnp.where(f0 == 0, 1.0, f0),
    )

    def Ff(t):
        Fhat = t * (f0 + t * (0.5 * d0 + t * ((1.0 / 3.0) * (-2 * d0 - d1)
                    + f1 - f0 + t * (0.25 * (d0 + d1) + 0.5 * (f0 - f1)))))
        fhat = f0 + t * (d0 + t * (-2 * d0 - d1 + 3 * (f1 - f0)
                    + t * (d0 + d1 + 2 * (f0 - f1))))
        return Fhat, fhat

    def body(i, carry):
        a, b, t = carry
        t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
        Fhat, fhat = Ff(t)
        done = (jnp.abs(Fhat - u) < 1e-6) | (b - a < 1e-6)
        a2 = jnp.where(Fhat - u < 0, t, a)
        b2 = jnp.where(Fhat - u < 0, b, t)
        t2 = t - (Fhat - u) / jnp.where(fhat == 0, 1.0, fhat)
        return (
            jnp.where(done, a, a2),
            jnp.where(done, b, b2),
            jnp.where(done, t, t2),
        )

    a = jnp.zeros_like(u)
    b = jnp.ones_like(u)
    _, _, t = jax.lax.fori_loop(0, iters, body, (a, b, t_lin))
    t = jnp.clip(t, 0.0, 1.0)
    _, fhat = Ff(t)
    return t, fhat


def _fd_derivs(f0, f1, fm1, fp2, x0, x1, xm1, xp2, has_prev, has_next):
    width = x1 - x0
    d0 = jnp.where(
        has_prev, width * (f1 - fm1) / jnp.where(has_prev, x1 - xm1, 1.0), f1 - f0
    )
    d1 = jnp.where(
        has_next, width * (fp2 - f0) / jnp.where(has_next, xp2 - x0, 1.0), f1 - f0
    )
    return d0, d1


def sample_catmull_rom_2d(nodes1, nodes2, values, cdf, alpha, u):
    """SampleCatmullRom2D (interpolation.cpp:175-253), vectorized.

    nodes1: [n1], nodes2: [n2], values/cdf: [n1, n2] device arrays;
    alpha, u: [...] per-lane.  Returns (x, fval, pdf).
    """
    n2 = nodes2.shape[0]
    off1, w1, valid = catmull_rom_weights(nodes1, alpha)

    rows = jnp.clip(off1[..., None] + jnp.arange(4), 0, nodes1.shape[0] - 1)
    wmask = w1  # [...,4]

    def interp(tab, idx):
        # tab: [n1,n2]; idx: [...] column index -> weighted sum over 4 rows
        v = tab[rows, jnp.clip(idx, 0, n2 - 1)[..., None]]  # [...,4]
        return jnp.sum(v * wmask, axis=-1)

    maximum = interp(cdf, jnp.full(alpha.shape, n2 - 1, jnp.int32))
    u = u * maximum

    # FindInterval on the per-lane interpolated cdf: log2 bisection.
    lo = jnp.zeros(alpha.shape, jnp.int32)
    hi = jnp.full(alpha.shape, n2 - 1, jnp.int32)  # invariant: cdf[lo]<=u
    n_steps = int(np.ceil(np.log2(max(n2, 2)))) + 1
    for _ in range(n_steps):
        mid = (lo + hi) // 2
        below = interp(cdf, mid) <= u
        lo = jnp.where(below, jnp.maximum(mid, lo), lo)
        hi = jnp.where(below, hi, jnp.minimum(mid, hi))
    idx = jnp.clip(lo, 0, n2 - 2)

    f0 = interp(values, idx)
    f1 = interp(values, idx + 1)
    x0 = nodes2[idx]
    x1 = nodes2[idx + 1]
    width = x1 - x0
    u_seg = (u - interp(cdf, idx)) / jnp.where(width == 0, 1.0, width)

    has_prev = idx > 0
    has_next = idx + 2 < n2
    fm1 = interp(values, jnp.maximum(idx - 1, 0))
    fp2 = interp(values, jnp.minimum(idx + 2, n2 - 1))
    xm1 = nodes2[jnp.maximum(idx - 1, 0)]
    xp2 = nodes2[jnp.minimum(idx + 2, n2 - 1)]
    d0, d1 = _fd_derivs(f0, f1, fm1, fp2, x0, x1, xm1, xp2, has_prev, has_next)

    t, fhat = _invert_segment_integral(f0, f1, d0, d1, u_seg)
    x = x0 + width * t
    pdf = jnp.where(
        valid & (maximum > 0), fhat / jnp.where(maximum == 0, 1.0, maximum), 0.0
    )
    fval = jnp.where(valid, fhat, 0.0)
    return x, fval, pdf


def catmull_rom_interp_2d(nodes1, nodes2, values, alpha, x):
    """Tensor-product spline value at (alpha, x) — the Sr(rho, r) lookup."""
    off1, w1, v1 = catmull_rom_weights(nodes1, alpha)
    off2, w2, v2 = catmull_rom_weights(nodes2, x)
    rows = jnp.clip(off1[..., None] + jnp.arange(4), 0, nodes1.shape[0] - 1)
    cols = jnp.clip(off2[..., None] + jnp.arange(4), 0, nodes2.shape[0] - 1)
    v = values[rows[..., :, None], cols[..., None, :]]  # [...,4,4]
    val = jnp.einsum("...ij,...i,...j->...", v, w1, w2)
    return jnp.where(v1 & v2, val, 0.0)


# ---------------------------------------------------------------------------
# Host-side (numpy) table builders: IntegrateCatmullRom / InvertCatmullRom.
# ---------------------------------------------------------------------------

def integrate_catmull_rom_np(x, values):
    """(interpolation.cpp:255-283) -> (total, cdf[n]).  values: [..., n]."""
    x = np.asarray(x, np.float64)
    v = np.asarray(values, np.float64)
    n = x.shape[-1]
    cdf = np.zeros(v.shape, np.float64)
    total = np.zeros(v.shape[:-1], np.float64)
    for i in range(n - 1):
        x0, x1 = x[i], x[i + 1]
        f0, f1 = v[..., i], v[..., i + 1]
        width = x1 - x0
        if i > 0:
            d0 = width * (f1 - v[..., i - 1]) / (x1 - x[i - 1])
        else:
            d0 = f1 - f0
        if i + 2 < n:
            d1 = width * (v[..., i + 2] - f0) / (x[i + 2] - x0)
        else:
            d1 = f1 - f0
        total = total + ((d0 - d1) * (1.0 / 12.0) + (f0 + f1) * 0.5) * width
        cdf[..., i + 1] = total
    return total, cdf


def invert_catmull_rom_np(x, values, u):
    """(interpolation.cpp:285-345) scalar host inversion of a monotone spline."""
    x = np.asarray(x, np.float64)
    v = np.asarray(values, np.float64)
    n = len(x)
    if not (u > v[0]):
        return float(x[0])
    if not (u < v[n - 1]):
        return float(x[n - 1])
    i = int(np.searchsorted(v, u, side="right") - 1)
    i = min(max(i, 0), n - 2)
    x0, x1 = x[i], x[i + 1]
    f0, f1 = v[i], v[i + 1]
    width = x1 - x0
    d0 = width * (f1 - v[i - 1]) / (x1 - x[i - 1]) if i > 0 else f1 - f0
    d1 = width * (v[i + 2] - f0) / (x[i + 2] - x0) if i + 2 < n else f1 - f0
    a, b, t = 0.0, 1.0, 0.5
    for _ in range(64):
        if not (a < t < b):
            t = 0.5 * (a + b)
        t2, t3 = t * t, t * t * t
        Fhat = ((2 * t3 - 3 * t2 + 1) * f0 + (-2 * t3 + 3 * t2) * f1
                + (t3 - 2 * t2 + t) * d0 + (t3 - t2) * d1)
        fhat = ((6 * t2 - 6 * t) * f0 + (-6 * t2 + 6 * t) * f1
                + (3 * t2 - 4 * t + 1) * d0 + (3 * t2 - 2 * t) * d1)
        if abs(Fhat - u) < 1e-6 or b - a < 1e-6:
            break
        if Fhat - u < 0:
            a = t
        else:
            b = t
        t -= (Fhat - u) / fhat
    return float(x0 + t * width)


def catmull_rom_np(x, values, xq):
    """Scalar spline eval (interpolation.cpp:39-59) — host-side oracle."""
    x = np.asarray(x, np.float64)
    v = np.asarray(values, np.float64)
    n = len(x)
    if not (xq >= x[0] and xq <= x[-1]):
        return 0.0
    i = min(max(int(np.searchsorted(x, xq, side="right") - 1), 0), n - 2)
    x0, x1 = x[i], x[i + 1]
    f0, f1 = v[i], v[i + 1]
    width = x1 - x0
    d0 = width * (f1 - v[i - 1]) / (x1 - x[i - 1]) if i > 0 else f1 - f0
    d1 = width * (v[i + 2] - f0) / (x[i + 2] - x0) if i + 2 < n else f1 - f0
    t = (xq - x0) / width
    t2, t3 = t * t, t ** 3
    return float((2 * t3 - 3 * t2 + 1) * f0 + (-2 * t3 + 3 * t2) * f1
                 + (t3 - 2 * t2 + t) * d0 + (t3 - t2) * d1)
