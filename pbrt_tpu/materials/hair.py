"""Hair BSDF (Marschner decomposition, Chiang et al. 2016 parameterization).

TPU re-expression of materials/hair.{h,cpp} (HairBSDF, hair.h:90-115): the
4-lobe (R, TT, TRT, residual; pMax=3) longitudinal x azimuthal factorization
— Mp longitudinal scattering with variance from beta_m, Ap attenuation from
sigma_a Beer-Lambert through the fiber, Np azimuthal scattering as a trimmed
logistic with scale from beta_n — evaluated as pure elementwise math over the
batch.

Frame convention matches pbrt's: the local x axis is the curve tangent
(dpdu), so sin(theta) = w.x and the azimuth phi lives in the (y, z) plane.
h in [-1, 1] is the normalized offset of the intersection across the curve
width (from the curve hit's v coordinate, hair.cpp HairBSDF ctor).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import vec
from . import bsdf as bx

P_MAX = 3
SQRT_PI_OVER_8 = 0.626657069


def _i0(x):
    """Modified Bessel I0, series (hair.cpp I0): 10 terms."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    i4 = 1.0
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (i4 * ifact * ifact)
        x2i = x2i * x * x
        i4 *= 4.0
    return val


def _log_i0(x):
    big = x > 12.0
    safe = jnp.minimum(x, 12.0)
    return jnp.where(
        big,
        x + 0.5 * (-jnp.log(2.0 * jnp.pi) + jnp.log(1.0 / jnp.maximum(x, 1e-6)) + 1.0 / jnp.maximum(8.0 * x, 1e-6)),
        jnp.log(jnp.maximum(_i0(safe), 1e-30)),
    )


def _mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal scattering (hair.cpp Mp)."""
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    small_v = v <= 0.1
    mp_small = jnp.exp(
        _log_i0(a) - b - 1.0 / v + 0.6931 + jnp.log(1.0 / (2.0 * v))
    )
    mp_big = (
        jnp.exp(-b) * _i0(a)
    ) / jnp.maximum(jnp.sinh(1.0 / v) * 2.0 * v, 1e-30)
    return jnp.where(small_v, mp_small, mp_big)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / jnp.maximum(
        _logistic_cdf(b, s) - _logistic_cdf(a, s), 1e-12
    )


def _sample_trimmed_logistic(u, s, a, b):
    """(hair.cpp SampleTrimmedLogistic): inverse CDF."""
    k = _logistic_cdf(b, s) - _logistic_cdf(a, s)
    x = -s * jnp.log(
        1.0 / jnp.maximum(u * k + _logistic_cdf(a, s), 1e-12) - 1.0
    )
    return jnp.clip(x, a, b)


def _phi_fn(p, gamma_o, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * jnp.pi


def _np(phi, p, s, gamma_o, gamma_t):
    dphi = phi - _phi_fn(p, gamma_o, gamma_t)
    # Wrap to [-pi, pi].
    dphi = jnp.remainder(dphi + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return _trimmed_logistic(dphi, s, -jnp.pi, jnp.pi)


def _geometry(mat, wo):
    """Per-lane derived quantities shared by eval/sample/pdf."""
    hp = mat["hair"]
    sigma_a = hp[..., 0:3]
    beta_m = hp[..., 3]
    beta_n = hp[..., 4]
    alpha = jnp.deg2rad(hp[..., 5])
    eta = jnp.full_like(beta_m, 1.55)
    # h from the curve-width coordinate (uv[1] in [0,1] -> [-1,1]).
    h = jnp.clip(-1.0 + 2.0 * mat.get("uv", jnp.zeros_like(sigma_a[..., :2]))[..., 1], -1.0, 1.0)

    # Longitudinal variances per bounce p (hair.cpp:270-276).
    t = 0.726 * beta_m + 0.812 * beta_m**2 + 3.7 * beta_m**20
    v0 = t * t
    v = [v0, 0.25 * v0, 4.0 * v0, 4.0 * v0]
    # Azimuthal logistic scale (hair.cpp:282).
    s = SQRT_PI_OVER_8 * (
        0.265 * beta_n + 1.194 * beta_n**2 + 5.372 * beta_n**22
    )
    # Scale-tilt sin/cos 2^k alpha (hair.cpp:287-293).
    sin2k = [jnp.sin(alpha)]
    cos2k = [jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2k[0] ** 2))]
    for i in range(1, 3):
        sin2k.append(2.0 * cos2k[i - 1] * sin2k[i - 1])
        cos2k.append(cos2k[i - 1] ** 2 - sin2k[i - 1] ** 2)

    sin_to = wo[..., 0]
    cos_to = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_to * sin_to))
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    gamma_o = jnp.arcsin(jnp.clip(h, -1.0, 1.0))
    # Refracted geometry (hair.cpp:359-372).
    sin_tt = sin_to / eta
    cos_tt = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_tt * sin_tt))
    etap = jnp.sqrt(jnp.maximum(eta * eta - sin_to * sin_to, 1e-12)) / jnp.maximum(
        cos_to, 1e-6
    )
    sin_gt = h / etap
    cos_gt = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_gt * sin_gt))
    gamma_t = jnp.arcsin(jnp.clip(sin_gt, -1.0, 1.0))
    # Transmittance through the fiber interior (hair.cpp:373).
    T = jnp.exp(
        -sigma_a * (2.0 * cos_gt / jnp.maximum(cos_tt, 1e-6))[..., None]
    )
    return dict(
        sigma_a=sigma_a, eta=eta, h=h, v=v, s=s,
        sin2k=sin2k, cos2k=cos2k,
        sin_to=sin_to, cos_to=cos_to, phi_o=phi_o,
        gamma_o=gamma_o, gamma_t=gamma_t, T=T,
    )


def _ap(g, wo):
    """Attenuation per lobe (hair.cpp Ap): [P_MAX+1] list of [.,3]."""
    cos_go = jnp.cos(g["gamma_o"])
    cos_theta_fr = g["cos_to"] * cos_go
    f = bx.fresnel_dielectric(cos_theta_fr, jnp.ones_like(g["eta"]), g["eta"])
    ap = [f[..., None] * jnp.ones_like(g["T"])]
    T = g["T"]
    ap.append((1.0 - f[..., None]) ** 2 * T)
    for p in range(2, P_MAX):
        ap.append(ap[p - 1] * T * f[..., None])
    # Residual (hair.cpp:410): geometric-series remainder.
    ap.append(
        ap[P_MAX - 1] * f[..., None] * T
        / jnp.maximum(1.0 - T * f[..., None], 1e-4)
    )
    return ap


def _tilted_angles(g, p):
    """Scale-tilted sin/cos theta_o for lobe p (hair.cpp:391-403)."""
    sin_to, cos_to = g["sin_to"], g["cos_to"]
    s2, c2 = g["sin2k"], g["cos2k"]
    if p == 0:
        sin_top = sin_to * c2[1] - cos_to * s2[1]
        cos_top = cos_to * c2[1] + sin_to * s2[1]
    elif p == 1:
        sin_top = sin_to * c2[0] + cos_to * s2[0]
        cos_top = cos_to * c2[0] - sin_to * s2[0]
    elif p == 2:
        sin_top = sin_to * c2[2] + cos_to * s2[2]
        cos_top = cos_to * c2[2] - sin_to * s2[2]
    else:
        sin_top, cos_top = sin_to, cos_to
    return sin_top, jnp.abs(cos_top)


def hair_eval(mat, wo, wi):
    """HairBSDF::f + Pdf (hair.cpp:340-430, 625-664)."""
    g = _geometry(mat, wo)
    sin_ti = wi[..., 0]
    cos_ti = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_ti * sin_ti))
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])
    phi = phi_i - g["phi_o"]
    ap = _ap(g, wo)
    # Ap pdf weights from luminance (hair.cpp SamplePdf common).
    lums = [
        0.212671 * a[..., 0] + 0.715160 * a[..., 1] + 0.072169 * a[..., 2]
        for a in ap
    ]
    lum_sum = sum(lums)
    f = jnp.zeros(wo.shape, jnp.float32)
    pdf = jnp.zeros(wo.shape[:-1], jnp.float32)
    for p in range(P_MAX + 1):
        sin_top, cos_top = _tilted_angles(g, p)
        mp = _mp(cos_ti, cos_top, sin_ti, sin_top, g["v"][min(p, 3)])
        if p < P_MAX:
            np_ = _np(phi, p, g["s"], g["gamma_o"], g["gamma_t"])
        else:
            np_ = jnp.full_like(mp, 1.0 / (2.0 * jnp.pi))
        f = f + mp[..., None] * ap[p] * np_[..., None]
        pdf = pdf + mp * (lums[p] / jnp.maximum(lum_sum, 1e-12)) * np_
    abs_cos_wi = jnp.abs(wi[..., 2])
    f = f / jnp.maximum(abs_cos_wi, 1e-6)[..., None]
    return f, pdf


def hair_sample(mat, wo, u2):
    """HairBSDF::Sample_f (hair.cpp:511-598).

    Uses 2 uniforms demuxed into 4 (hair.cpp DemuxFloat analog via bit
    splitting is overkill here; we reuse u and derived hashes)."""
    g = _geometry(mat, wo)
    ap = _ap(g, wo)
    lums = [
        0.212671 * a[..., 0] + 0.715160 * a[..., 1] + 0.072169 * a[..., 2]
        for a in ap
    ]
    lum_sum = jnp.maximum(sum(lums), 1e-12)
    # Demux u2[0] into lobe choice + u for theta (stratified reuse).
    u0 = u2[..., 0]
    cdf = jnp.zeros_like(u0)
    p_choice = jnp.full(u0.shape, P_MAX, jnp.int32)
    rem = u0
    for p in range(P_MAX + 1):
        w = lums[p] / lum_sum
        inside = (u0 >= cdf) & (u0 < cdf + w)
        p_choice = jnp.where(inside & (p_choice == P_MAX) & (p < P_MAX), p, p_choice)
        rem = jnp.where(inside, (u0 - cdf) / jnp.maximum(w, 1e-12), rem)
        cdf = cdf + w
    u_theta = jnp.clip(rem, 1e-6, 1.0 - 1e-6)
    u_phi = u2[..., 1]

    # Sample Mp for the chosen lobe (hair.cpp:540-554).
    sin_top = jnp.zeros_like(u0)
    cos_top = jnp.zeros_like(u0)
    vs = jnp.zeros_like(u0)
    for p in range(P_MAX + 1):
        st, ct = _tilted_angles(g, p)
        m = p_choice == p
        sin_top = jnp.where(m, st, sin_top)
        cos_top = jnp.where(m, ct, cos_top)
        vs = jnp.where(m, g["v"][min(p, 3)], vs)
    cos_theta = 1.0 + vs * jnp.log(
        jnp.maximum(u_theta + (1.0 - u_theta) * jnp.exp(-2.0 / vs), 1e-30)
    )
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta**2))
    # Second angle from u_phi's fractional reuse.
    cos_phi_r = jnp.cos(2.0 * jnp.pi * jnp.remainder(u_phi * 7.0, 1.0))
    sin_ti = -cos_theta * sin_top + sin_theta * cos_phi_r * cos_top
    cos_ti = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_ti * sin_ti))

    # Sample Np (hair.cpp:560-570).
    dphi_lobe = jnp.zeros_like(u0)
    for p in range(P_MAX):
        m = p_choice == p
        dphi_lobe = jnp.where(
            m, _phi_fn(p, g["gamma_o"], g["gamma_t"]), dphi_lobe
        )
    sampled_dphi = _sample_trimmed_logistic(
        jnp.clip(u_phi, 1e-6, 1.0 - 1e-6), g["s"], -jnp.pi, jnp.pi
    )
    dphi = jnp.where(
        p_choice < P_MAX, dphi_lobe + sampled_dphi, 2.0 * jnp.pi * u_phi
    )
    phi_i = g["phi_o"] + dphi
    wi = vec(
        sin_ti, cos_ti * jnp.cos(phi_i), cos_ti * jnp.sin(phi_i)
    )
    f, pdf = hair_eval(mat, wo, wi)
    return {"wi": wi, "f": f, "pdf": pdf,
            "is_specular": jnp.zeros(wo.shape[:-1], bool)}
