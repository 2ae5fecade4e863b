"""Microfacet distributions (Beckmann & Trowbridge-Reitz/GGX).

TPU re-expression of core/microfacet.{h,cpp}: D, Smith Lambda/G, and
visible-normal sampling as pure elementwise functions in the local shading
frame (z = normal).  Formulas follow microfacet.h:48-129, microfacet.cpp
(TrowbridgeReitzSample11 at microfacet.cpp:238-290).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import (
    abs_cos_theta,
    cos2_theta,
    cos_phi,
    cos_theta,
    normalize,
    same_hemisphere,
    sin_phi,
    tan2_theta,
    tan_theta,
    vec,
    dot,
)


def roughness_to_alpha(roughness):
    """TrowbridgeReitzDistribution::RoughnessToAlpha (microfacet.h:122)."""
    roughness = jnp.maximum(roughness, 1e-3)
    x = jnp.log(roughness)
    return (
        1.62142
        + 0.819955 * x
        + 0.1734 * x * x
        + 0.0171201 * x * x * x
        + 0.000640711 * x * x * x * x
    )


def tr_d(wh, ax, ay):
    """TrowbridgeReitz D (microfacet.cpp:130).

    Grazing wh lanes return 0: pbrt's own f32 arithmetic degenerates to
    inf/NaN there and its NaN-radiance clamp eats the sample
    (integrator.cpp:294).  The mask covers not only tan2 == inf but also
    large-FINITE tan2 (t2 > 1e12), where (1+e)^2 overflows f32 — the inf
    intermediate made 0-cotangent backward products NaN (ks/roughness
    adjoints on deep killeroo bounces, round-4 hunt)."""
    t2 = tan2_theta(wh)
    fin = jnp.isfinite(t2) & (t2 <= 1e12)
    t2 = jnp.where(fin, t2, 0.0)
    c4 = jnp.where(fin, cos2_theta(wh), 1.0) ** 2
    e = (cos_phi(wh) ** 2 / (ax * ax) + sin_phi(wh) ** 2 / (ay * ay)) * t2
    d = 1.0 / (jnp.pi * ax * ay * c4 * (1.0 + e) ** 2)
    return jnp.where(fin, d, 0.0)


def tr_lambda(w, ax, ay):
    """TrowbridgeReitz Lambda (microfacet.cpp:149).

    abs_tan is clamped to 1e12: larger finite values overflow
    (alpha*tan)^2 to inf, and the inf intermediate NaNs the alpha adjoint
    (0.5/sqrt(inf) * d(a2t2)/d(alpha) = 0 * inf).  Forward is unchanged in
    effect: G = 1/(1+lam) is already ~0 at lam ~ 1e10."""
    abs_tan = jnp.abs(tan_theta(w))
    fin = jnp.isfinite(abs_tan)
    abs_tan = jnp.minimum(jnp.where(fin, abs_tan, 0.0), 1e12)
    # The 1e-14 floor guards sqrt'(0): zero-vector w (dead lanes carry
    # d = 0) makes cos_phi = sin_phi = 0, and the unguarded sqrt(0) put
    # inf*0 = NaN into the ax/ay adjoints of every dead lane (round-4
    # killeroo grad hunt; real lanes have the sum >= min(ax,ay)^2 >= 1e-6).
    alpha = jnp.sqrt(jnp.maximum(
        cos_phi(w) ** 2 * ax * ax + sin_phi(w) ** 2 * ay * ay, 1e-14
    ))
    a2t2 = (alpha * abs_tan) ** 2
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(fin, lam, 0.0)


def tr_g1(w, ax, ay):
    return 1.0 / (1.0 + tr_lambda(w, ax, ay))


def tr_g(wo, wi, ax, ay):
    """Smith height-correlated-ish G used by pbrt: 1/(1+Λo+Λi)."""
    return 1.0 / (1.0 + tr_lambda(wo, ax, ay) + tr_lambda(wi, ax, ay))


def _tr_sample_11(cos_theta_in, u1, u2):
    """TrowbridgeReitzSample11 (microfacet.cpp:238): slope sampling for the
    isotropic unit-roughness distribution given incident cos theta."""
    # Special case: normal incidence.
    r = jnp.sqrt(u1 / jnp.maximum(1.0 - u1, 1e-12))
    phi = 2.0 * jnp.pi * u2
    slope_x_n = r * jnp.cos(phi)
    slope_y_n = r * jnp.sin(phi)

    cos_t = jnp.clip(cos_theta_in, -0.9999999, 0.9999999)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    tan_t = sin_t / jnp.where(cos_t == 0.0, 1e-12, cos_t)
    a = 1.0 / jnp.where(tan_t == 0.0, 1e-12, tan_t)
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / jnp.maximum(a * a, 1e-20)))

    # Sample slope_x (microfacet.cpp:255-270).  A is NOT restricted to
    # [-1,1]: u1 > G1 gives A > 1 with probability 1-G1 (that's the
    # visible-normal weighting); clipping it skews the distribution — caught
    # by the chi-square suite (tests/test_chi2_bsdf.py).  pbrt clamps only
    # tmp > 1e10; the symmetric lower clamp guards the measure-zero
    # A*A == 1 lane against inf/NaN on f32 lanes.
    A = 2.0 * u1 / g1 - 1.0
    denom = A * A - 1.0
    tmp = 1.0 / jnp.where(denom == 0.0, 1e-10, denom)
    tmp = jnp.clip(tmp, -1e10, 1e10)
    B = tan_t
    Darg = B * B * tmp * tmp - (A * A - B * B) * tmp
    pos = Darg > 0.0
    D = jnp.where(pos, jnp.sqrt(jnp.where(pos, Darg, 1.0)), 0.0)
    sx1 = B * tmp - D
    sx2 = B * tmp + D
    slope_x = jnp.where((A < 0.0) | (sx2 > 1.0 / jnp.maximum(tan_t, 1e-12)), sx1, sx2)

    # Sample slope_y (microfacet.cpp:272-285).
    s = jnp.where(u2 > 0.5, 1.0, -1.0)
    u2r = jnp.where(u2 > 0.5, 2.0 * (u2 - 0.5), 2.0 * (0.5 - u2))
    z = (
        u2r
        * (u2r * (u2r * 0.27385 - 0.73369) + 0.46341)
    ) / (u2r * (u2r * (u2r * 0.093073 + 0.309420) - 1.000000) + 0.597999)
    slope_y = s * z * jnp.sqrt(1.0 + slope_x * slope_x)

    near_normal = cos_theta_in > 0.9999
    return (
        jnp.where(near_normal, slope_x_n, slope_x),
        jnp.where(near_normal, slope_y_n, slope_y),
    )


def tr_sample_wh_visible(wo, u, ax, ay):
    """TrowbridgeReitzSample (microfacet.cpp:292): visible-normal sampling."""
    flip = cos_theta(wo) < 0.0
    wo_f = jnp.where(flip[..., None], -wo, wo)
    # Stretch wo.
    wi_str = normalize(
        vec(ax * wo_f[..., 0], ay * wo_f[..., 1], wo_f[..., 2])
    )
    sx, sy = _tr_sample_11(cos_theta(wi_str), u[..., 0], u[..., 1])
    # Rotate.
    cp = cos_phi(wi_str)
    sp = sin_phi(wi_str)
    tmp = cp * sx - sp * sy
    sy = sp * sx + cp * sy
    sx = tmp
    # Unstretch.
    sx = ax * sx
    sy = ay * sy
    wh = normalize(vec(-sx, -sy, jnp.ones_like(sx)))
    return jnp.where(flip[..., None], -wh, wh)


def tr_sample_wh_full(wo, u, ax, ay):
    """Full-distribution sampling (microfacet.cpp:296-334, !sampleVisibleArea).
    Isotropic branch only for now (anisotropic full-sampling is rare)."""
    alpha = jnp.sqrt(ax * ay)
    tan2 = alpha * alpha * u[..., 0] / jnp.maximum(1.0 - u[..., 0], 1e-12)
    phi = (2.0 * jnp.pi) * u[..., 1]
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    # _safe_sqrt: u[0] == 0 lanes have cos_t == 1 exactly; sqrt'(0) = inf
    # would NaN the roughness adjoints (alpha flows through tan2).
    from ..core.vecmath import _safe_sqrt

    sin_t = _safe_sqrt(1.0 - cos_t * cos_t)
    wh = vec(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)
    return jnp.where(same_hemisphere(wo, wh)[..., None], wh, -wh)


def tr_pdf_visible(wo, wh, ax, ay):
    """MicrofacetDistribution::Pdf, sampleVisibleArea=true (microfacet.cpp:336)."""
    return (
        tr_d(wh, ax, ay)
        * tr_g1(wo, ax, ay)
        * jnp.abs(dot(wo, wh))
        / jnp.maximum(abs_cos_theta(wo), 1e-12)
    )


def beckmann_d(wh, ax, ay):
    """BeckmannDistribution::D (microfacet.cpp:112).  Same large-finite-t2
    overflow mask as tr_d (exp(-inf) backward is 0 * inf = NaN)."""
    t2 = tan2_theta(wh)
    fin = jnp.isfinite(t2) & (t2 <= 1e12)
    t2 = jnp.where(fin, t2, 0.0)
    c4 = jnp.where(fin, cos2_theta(wh), 1.0) ** 2
    d = jnp.exp(
        -t2 * (cos_phi(wh) ** 2 / (ax * ax) + sin_phi(wh) ** 2 / (ay * ay))
    ) / (jnp.pi * ax * ay * c4)
    return jnp.where(fin, d, 0.0)


def beckmann_lambda(w, ax, ay):
    """(microfacet.cpp:137) rational-polynomial approximation."""
    abs_tan = jnp.abs(tan_theta(w))
    fin = jnp.isfinite(abs_tan)
    abs_tan = jnp.where(fin, abs_tan, 0.0)
    # sqrt'(0) guard for zero-vector w — see tr_lambda.
    alpha = jnp.sqrt(jnp.maximum(
        cos_phi(w) ** 2 * ax * ax + sin_phi(w) ** 2 * ay * ay, 1e-14
    ))
    a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-12)
    lam = (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a)
    lam = jnp.where(a >= 1.6, 0.0, lam)
    return jnp.where(fin, lam, 0.0)
