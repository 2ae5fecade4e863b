"""Disney "principled" BSDF.

TPU re-expression of materials/disney.cpp:92-625 (Burley 2012/2015): the
reference's per-hit BxDF* allocations become one fused elementwise evaluation
over the batch, with pbrt's lobe set — DisneyDiffuse + Retro + Sheen (cosine
sampled), anisotropic GGX microfacet reflection with the metallic-blended
DisneyFresnel, GTR1 clearcoat, microfacet spec transmission, and the thin
lobes (FakeSS flatness blend, diffuse Lambertian transmission, roughness-
scaled thin transmission).

Parameter layout (MaterialTable.disney [M,12]):
  0 metallic, 1 specularTint, 2 anisotropic, 3 sheen, 4 sheenTint,
  5 clearcoat, 6 clearcoatGloss, 7 specTrans, 8 flatness, 9 diffTrans,
  10 thin (0/1), 11 pad.  Base color = kd; eta, raw roughness from the
  common columns.

Mixture sampling follows the BSDF::Sample_f rule (reflection.cpp:714-764)
with a per-lane dynamic matching-lobe count, mirroring which BxDFs
disney.cpp adds for the lane's parameters.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import (
    abs_cos_theta,
    cos_theta,
    dot,
    normalize,
    reflect,
    same_hemisphere,
    vec,
)
from ..core.sampling import INV_PI
from . import microfacet as mf
from . import bsdf as bx


def _schlick_weight(cos_t):
    c = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    return (c * c) * (c * c) * c


def _params(mat):
    d = mat["disney"]
    rough = jnp.maximum(mat["raw_rough"], 1e-4)
    aspect = jnp.sqrt(1.0 - 0.9 * d[..., 2])
    ax = jnp.maximum(1e-3, rough * rough / aspect)
    ay = jnp.maximum(1e-3, rough * rough * aspect)
    c = mat["kd"]
    lum = (
        0.212671 * c[..., 0] + 0.715160 * c[..., 1] + 0.072169 * c[..., 2]
    )
    ctint = jnp.where(
        (lum > 0.0)[..., None], c / jnp.maximum(lum, 1e-8)[..., None], 1.0
    )
    return {
        "c": c,
        "metallic": d[..., 0],
        "spec_tint": d[..., 1],
        "sheen": d[..., 3],
        "sheen_tint": d[..., 4],
        "clearcoat": d[..., 5],
        "cc_gloss": d[..., 6],
        "spec_trans": d[..., 7],
        "flatness": d[..., 8],
        "diff_trans": d[..., 9] / 2.0,  # pbrt: dt in [0,1] -> /2 (disney.cpp:605)
        "thin": d[..., 10] > 0.5,
        "eta": mat["eta"],
        "rough": rough,
        "ax": ax,
        "ay": ay,
        "ctint": ctint,
        "lum": lum,
    }


def _lobe_presence(p):
    diffuse_w = (1.0 - p["metallic"]) * (1.0 - p["spec_trans"])
    has_diffuse = diffuse_w > 0.0
    has_dt = p["thin"] & (p["diff_trans"] > 0.0) & has_diffuse
    has_cc = p["clearcoat"] > 0.0
    has_st = p["spec_trans"] > 0.0
    return diffuse_w, has_diffuse, has_dt, has_cc, has_st


def _gtr1_d(wh, alpha):
    """Gtr1 NDF (disney.cpp:409): (a^2-1)/(pi log(a^2) (1+(a^2-1)cos^2)).
    For alpha < 1 both numerator and log(a^2) are negative — the division
    must preserve that sign structure (no naive positive clamps)."""
    a2 = alpha * alpha
    c2 = cos_theta(wh) ** 2
    denom = jnp.pi * jnp.log(a2) * (1.0 + (a2 - 1.0) * c2)
    safe = jnp.where(jnp.abs(denom) < 1e-12, jnp.sign(denom) * 1e-12 + 1e-30, denom)
    d = (a2 - 1.0) / safe
    # alpha -> 1 limit is 1/pi.
    return jnp.where(jnp.abs(a2 - 1.0) < 1e-6, 1.0 / jnp.pi, jnp.maximum(d, 0.0))


def _smith_g_ggx(w, alpha):
    """smithG_GGX (disney.cpp:415) with fixed alpha."""
    from ..core.vecmath import tan2_theta

    t2 = tan2_theta(w)
    t2 = jnp.where(jnp.isfinite(t2), t2, 0.0)
    return 2.0 / (1.0 + jnp.sqrt(1.0 + alpha * alpha * t2))


def _disney_fresnel(p, cos_i):
    """DisneyFresnel::Evaluate (disney.cpp:376): lerp by metallic between
    dielectric fresnel and Schlick to Cspec0."""
    r0 = ((p["eta"] - 1.0) / (p["eta"] + 1.0)) ** 2
    cspec0 = (
        (1.0 - p["metallic"])[..., None]
        * r0[..., None]
        * _lerp_sp(p["spec_tint"], 1.0, p["ctint"])
        + p["metallic"][..., None] * p["c"]
    )
    fd = bx.fresnel_dielectric(cos_i, jnp.ones_like(p["eta"]), p["eta"])
    fs = cspec0 + _schlick_weight(cos_i)[..., None] * (1.0 - cspec0)
    return (
        (1.0 - p["metallic"])[..., None] * fd[..., None]
        + p["metallic"][..., None] * fs
    )


def _lerp_sp(t, a, b):
    """lerp(t, a_scalar, b_spectrum)."""
    return (1.0 - t)[..., None] * a + t[..., None] * b


def _eval_lobes(p, wo, wi):
    """All reflection+transmission lobes; returns (f [.,3], pdf_parts)."""
    refl = same_hemisphere(wo, wi)
    co = abs_cos_theta(wo)
    ci = abs_cos_theta(wi)
    wh_r = wo + wi
    degen = jnp.sum(wh_r * wh_r, -1) == 0.0
    wh = normalize(jnp.where(degen[..., None], vec(0.0, 0.0, 1.0), wh_r))
    cos_d = dot(wi, wh)  # cosThetaD

    diffuse_w, has_diffuse, has_dt, has_cc, has_st = _lobe_presence(p)
    fo = _schlick_weight(co)
    fi = _schlick_weight(ci)

    # DisneyDiffuse (disney.cpp:133): full retro-less base diffuse.
    f_base = p["c"] * (INV_PI * (1.0 - fo / 2.0) * (1.0 - fi / 2.0))[..., None]
    # Thin lanes blend flatness between base diffuse and FakeSS
    # (disney.cpp:567-573); FakeSS (disney.cpp:160): Hanrahan-Krueger-ish.
    fss90 = cos_d * cos_d * p["rough"]
    fss = (1.0 + (fss90 - 1.0) * fo) * (1.0 + (fss90 - 1.0) * fi)
    ss = (
        p["c"]
        * (1.25 * INV_PI * (fss * (1.0 / jnp.maximum(co + ci, 1e-4) - 0.5) + 0.5))[
            ..., None
        ]
    )
    f_diffuse_part = jnp.where(
        p["thin"][..., None],
        _lerp_sp(p["flatness"], f_base, ss)
        * (1.0 - p["diff_trans"])[..., None],
        f_base,
    )
    # Retro (disney.cpp:180).
    rr = 2.0 * p["rough"] * cos_d * cos_d
    f_retro = (
        p["c"]
        * (INV_PI * rr * (fo + fi + fo * fi * (rr - 1.0)))[..., None]
    )
    # Sheen (disney.cpp:219).
    csheen = _lerp_sp(p["sheen_tint"], 1.0, p["ctint"])
    f_sheen = (p["sheen"] * _schlick_weight(cos_d))[..., None] * csheen

    # diffuseWeight scales diffuse, retro, and sheen (disney.cpp:556-583).
    f_diff = diffuse_w[..., None] * (f_diffuse_part + f_retro + f_sheen)
    f_diff = jnp.where((refl & has_diffuse)[..., None], f_diff, 0.0)

    # Microfacet reflection with DisneyFresnel.
    d_tr = mf.tr_d(wh, p["ax"], p["ay"])
    g_tr = mf.tr_g(wo, wi, p["ax"], p["ay"])
    F = _disney_fresnel(p, cos_d)
    f_spec = F * (d_tr * g_tr / jnp.maximum(4.0 * ci * co, 1e-12))[..., None]
    f_spec = jnp.where((refl & ~degen)[..., None], f_spec, 0.0)

    # Clearcoat (disney.cpp:427): Gtr1 * Fr(.04 schlick) * G(.25) / 4.
    alpha_cc = (1.0 - p["cc_gloss"]) * 0.1 + p["cc_gloss"] * 1e-3
    alpha_cc = jnp.maximum(alpha_cc, 1e-3)
    d_cc = _gtr1_d(wh, alpha_cc)
    f_cc_s = 0.04 + _schlick_weight(cos_d) * (1.0 - 0.04)
    g_cc = _smith_g_ggx(wo, 0.25) * _smith_g_ggx(wi, 0.25)
    f_cc = (p["clearcoat"] * 0.25 * d_cc * f_cc_s * g_cc)[..., None]
    f_cc = jnp.where((refl & has_cc & ~degen)[..., None], f_cc, 0.0)

    # Spec transmission: T = specTrans * sqrt(c) (disney.cpp:586-603);
    # thin lanes use the roughness-scaled distribution (disney.cpp:590).
    t_spec = p["spec_trans"][..., None] * jnp.sqrt(jnp.abs(p["c"]))
    rscaled = (0.65 * p["eta"] - 0.35) * p["rough"]
    ax_t = jnp.where(p["thin"], jnp.maximum(1e-3, rscaled * rscaled / jnp.sqrt(1.0 - 0.9 * 0.0)), p["ax"])
    ay_t = jnp.where(p["thin"], ax_t, p["ay"])
    f_mt = bx.microfacet_transmission_f(t_spec, ax_t, ay_t, p["eta"], wo, wi)
    f_mt = jnp.where(has_st[..., None], f_mt, 0.0)

    # Thin diffuse transmission (disney.cpp:605): dt * c / pi.
    f_dt = (
        p["diff_trans"][..., None]
        * p["c"]
        * INV_PI
        * (1.0 - p["spec_trans"])[..., None]
        * (1.0 - p["metallic"])[..., None]
    )
    f_dt = jnp.where((~refl & has_dt)[..., None], f_dt, 0.0)

    f = f_diff + f_spec + f_cc + f_mt + f_dt

    # pdf parts.
    pdf_cos_r = bx.cosine_pdf(wo, wi)
    pdf_cos_t = bx.cosine_transmit_pdf(wo, wi)
    pdf_mf = mf.tr_pdf_visible(wo, wh, p["ax"], p["ay"]) / jnp.maximum(
        4.0 * dot(wo, wh), 1e-12
    )
    pdf_mf = jnp.where(refl & ~degen, pdf_mf, 0.0)
    pdf_cc = d_cc * abs_cos_theta(wh) / jnp.maximum(4.0 * dot(wo, wh), 1e-12)
    pdf_cc = jnp.where(refl & ~degen, pdf_cc, 0.0)
    pdf_mt = bx.microfacet_transmission_pdf(ax_t, ay_t, p["eta"], wo, wi)

    n_diff = jnp.where(has_diffuse, 3.0, 0.0)  # diffuse+retro+sheen
    n_dt = has_dt.astype(jnp.float32)
    n_cc = has_cc.astype(jnp.float32)
    n_st = has_st.astype(jnp.float32)
    nmatch = jnp.maximum(n_diff + n_dt + 1.0 + n_cc + n_st, 1.0)
    pdf_sum = (
        n_diff * pdf_cos_r
        + n_dt * pdf_cos_t
        + pdf_mf
        + n_cc * pdf_cc
        + n_st * pdf_mt
    )
    return f, pdf_sum, nmatch, (n_diff, n_dt, n_cc, n_st)


def disney_eval(mat, wo, wi):
    """(f, pdf) for the NEE path: pdf averaged over matching lobes (all
    Disney lobes are non-specular)."""
    p = _params(mat)
    f, pdf_sum, nmatch, _ = _eval_lobes(p, wo, wi)
    return f, pdf_sum / nmatch


def disney_sample(mat, wo, u):
    """Mixture sampling over the present lobes (BSDF::Sample_f rule)."""
    p = _params(mat)
    diffuse_w, has_diffuse, has_dt, has_cc, has_st = _lobe_presence(p)
    n_diff = jnp.where(has_diffuse, 3.0, 0.0)
    n_dt = has_dt.astype(jnp.float32)
    n_cc = has_cc.astype(jnp.float32)
    n_st = has_st.astype(jnp.float32)
    nmatch = jnp.maximum(n_diff + n_dt + 1.0 + n_cc + n_st, 1.0)

    idx = jnp.clip((u[..., 0] * nmatch).astype(jnp.int32), 0, 6)
    u0 = jnp.minimum(u[..., 0] * nmatch - idx.astype(jnp.float32), 1.0 - 1e-7)
    u_re = jnp.stack([u0, u[..., 1]], -1)
    fidx = idx.astype(jnp.float32)

    # Lobe order: [diffuse x n_diff][diff-trans][microfacet][clearcoat][spec-trans]
    c0 = n_diff
    c1 = c0 + n_dt
    c2 = c1 + 1.0
    c3 = c2 + n_cc
    pick_diff = fidx < c0
    pick_dt = ~pick_diff & (fidx < c1)
    pick_mf = ~pick_diff & ~pick_dt & (fidx < c2)
    pick_cc = ~pick_diff & ~pick_dt & ~pick_mf & (fidx < c3)
    pick_st = ~(pick_diff | pick_dt | pick_mf | pick_cc)

    wi_d = bx._cosine_sample_wi(wo, u_re)
    wi_t = bx._cosine_sample_wi_transmit(wo, u_re)
    wh_mf = mf.tr_sample_wh_visible(wo, u_re, p["ax"], p["ay"])
    wi_mf = reflect(wo, wh_mf)
    # Clearcoat wh sampling (disney.cpp:444): Gtr1 inverse-CDF elevation.
    alpha_cc = jnp.maximum((1.0 - p["cc_gloss"]) * 0.1 + p["cc_gloss"] * 1e-3, 1e-3)
    a2 = alpha_cc * alpha_cc
    ct2 = jnp.clip((1.0 - jnp.power(a2, 1.0 - u_re[..., 0])) / (1.0 - a2), 0.0, 1.0)
    ct = jnp.sqrt(ct2)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct2))
    phi = 2.0 * jnp.pi * u_re[..., 1]
    wh_cc = vec(st * jnp.cos(phi), st * jnp.sin(phi), ct)
    wh_cc = jnp.where(same_hemisphere(wo, wh_cc)[..., None], wh_cc, -wh_cc)
    wi_cc = reflect(wo, wh_cc)
    rscaled = (0.65 * p["eta"] - 0.35) * p["rough"]
    ax_t = jnp.where(p["thin"], jnp.maximum(1e-3, rscaled * rscaled), p["ax"])
    ay_t = jnp.where(p["thin"], ax_t, p["ay"])
    wi_st, _, ok_st = bx.microfacet_transmission_sample(ax_t, ay_t, p["eta"], wo, u_re)

    wi = jnp.where(
        pick_diff[..., None], wi_d,
        jnp.where(pick_dt[..., None], wi_t,
        jnp.where(pick_mf[..., None], wi_mf,
        jnp.where(pick_cc[..., None], wi_cc, wi_st))),
    )
    f, pdf_sum, nmatch2, (n_diff, n_dt, n_cc, n_st) = _eval_lobes(p, wo, wi)
    pdf = pdf_sum / nmatch2
    # Below-horizon reflection-map leakage: eval zeroes the mf/clearcoat pdf
    # terms for transmit-side wi, but the maps DO put mass there — count it
    # or the transmission lobes' f gets over-weighted (see
    # bsdf.microfacet_reflection_pdf_raw).
    below = ~same_hemisphere(wo, wi)
    raw_mf = bx.microfacet_reflection_pdf_raw(p["ax"], p["ay"], wo, wi)
    wh_b = normalize(wo + wi + 1e-12)
    raw_cc = _gtr1_d(wh_b, jnp.maximum(
        (1.0 - p["cc_gloss"]) * 0.1 + p["cc_gloss"] * 1e-3, 1e-3
    )) * abs_cos_theta(wh_b) / jnp.maximum(4.0 * jnp.abs(dot(wo, wh_b)), 1e-12)
    pdf = pdf + jnp.where(below, (raw_mf + n_cc * raw_cc) / nmatch2, 0.0)
    bad = pick_st & ~ok_st  # TIR on the spec-transmission pick
    f = jnp.where(bad[..., None], 0.0, f)
    pdf = jnp.where(bad, 0.0, pdf)
    return {
        "wi": wi,
        "f": f,
        "pdf": pdf,
        "is_specular": jnp.zeros(wo.shape[:-1], bool),
    }
