"""BSDF lobes + pbrt's mixture-sampling semantics, in the local shading frame.

TPU re-expression of core/reflection.{h,cpp}: every lobe is a pure
`(params, wo, wi) -> f` / `(params, wo, u) -> (wi, f, pdf)` function over
batched local-frame directions (z = shading normal).  Materials build a
per-lane parameter struct (materials table row -> lobe params); dispatch over
material type is masked evaluation of the types present in the scene.

Mixture sampling follows reflection.cpp:714-764 exactly (lobe =
floor(u0 * matchingComps), u0 remapped, f/pdf summed over matching
non-specular lobes, pdf / matchingComps) — SURVEY.md pins this for parity.

Conventions: wo, wi point away from the surface; local frame from
(ns, dpdu): s = normalize(dpdu - ns*dot), t = ns x s (reflection.h:164 BSDF).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import (
    abs_cos_theta,
    cos_theta,
    cross,
    dot,
    normalize,
    reflect,
    same_hemisphere,
    vec,
)
from ..core import sampling as smp
from ..core import vecmath as vm
from ..core.sampling import INV_PI
from . import microfacet as mf
from ..scene import (
    MAT_BSSRDF_ADAPTER,
    MAT_DISNEY,
    MAT_FOURIER,
    MAT_GLASS,
    MAT_HAIR,
    MAT_MATTE,
    MAT_METAL,
    MAT_MIRROR,
    MAT_MIX,
    MAT_PLASTIC,
    MAT_SUBSTRATE,
    MAT_SUBSURFACE,
    MAT_UBER,
    MAT_TRANSLUCENT,
)


# ---------------------------------------------------------------------------
# Shading frame
# ---------------------------------------------------------------------------

def make_frame(ns, dpdu):
    """BSDF ctor (reflection.h:166): ss = Normalize(dpdu), ts = ns x ss.

    pbrt does NOT orthogonalize ss against ns — replicate exactly (shading
    normals make ss slightly non-perpendicular to ns; the local<->world
    round trip still works because to_local uses the same dot products)."""
    ss_len = jnp.sqrt(jnp.sum(dpdu * dpdu, axis=-1, keepdims=True))
    # Fallback frame when dpdu is degenerate (zero).
    from ..core.vecmath import coordinate_system

    fb, _ = coordinate_system(ns)
    ss = jnp.where(ss_len > 1e-12, dpdu / jnp.maximum(ss_len, 1e-20), fb)
    ts = cross(ns, ss)
    return ss, ts, ns


def frame_from_rec(rec):
    """BSDF frame from a hit record: uses the pbrt shading tangent
    (rec["ss"], the triangle.cpp:365-381 re-orthogonalized tangent on
    normal-carrying meshes) when present, else the raw dpdu."""
    return make_frame(rec["ns"], rec.get("ss", rec["dpdu"]))


def to_local(ss, ts, ns, v):
    return jnp.stack([dot(v, ss), dot(v, ts), dot(v, ns)], axis=-1)


def to_world(ss, ts, ns, v):
    return (
        v[..., 0:1] * ss + v[..., 1:2] * ts + v[..., 2:3] * ns
    )


# ---------------------------------------------------------------------------
# Fresnel (reflection.cpp:47-115)
# ---------------------------------------------------------------------------

def fresnel_dielectric(cos_theta_i, eta_i, eta_t):
    """FrDielectric (reflection.cpp:47), handles both sides."""
    ci = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = ci > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(ci)
    # _safe_sqrt: zero (not inf) gradient at the clamp — the TIR branch's
    # sqrt(0) otherwise poisons the backward pass (0-cotangent * inf = NaN).
    si = vm._safe_sqrt(1.0 - ci * ci)
    st = ei / et * si
    tir = st >= 1.0
    ct = vm._safe_sqrt(1.0 - st * st)
    r_parl = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-12)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-12)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fresnel_conductor(cos_theta_i, eta_i, eta_t, k):
    """FrConductor (reflection.cpp:77): spectral, eta/k are [..., 3]."""
    ci = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)[..., None]
    eta = eta_t / eta_i
    etak = k / eta_i
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - si2
    a2b2 = vm._safe_sqrt(t0 * t0 + 4.0 * eta2 * etak2)
    t1 = a2b2 + ci2
    a = vm._safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * ci * a
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


# ---------------------------------------------------------------------------
# Diffuse lobes
# ---------------------------------------------------------------------------

def oren_nayar_f(kd, sigma_deg, wo, wi):
    """OrenNayar::f (reflection.cpp:197); sigma=0 reduces exactly to
    Lambertian kd/pi."""
    sigma = jnp.deg2rad(sigma_deg)
    s2 = sigma * sigma
    A = 1.0 - s2 / (2.0 * (s2 + 0.33))
    B = 0.45 * s2 / (s2 + 0.09)
    from ..core.vecmath import sin_theta, cos_phi, sin_phi

    sin_ti = sin_theta(wi)
    sin_to = sin_theta(wo)
    cos_dphi = cos_phi(wi) * cos_phi(wo) + sin_phi(wi) * sin_phi(wo)
    max_cos = jnp.maximum(0.0, cos_dphi)
    abs_ci = abs_cos_theta(wi)
    abs_co = abs_cos_theta(wo)
    sin_alpha = jnp.where(abs_ci > abs_co, sin_to, sin_ti)
    tan_beta = jnp.where(
        abs_ci > abs_co,
        sin_ti / jnp.maximum(abs_ci, 1e-12),
        sin_to / jnp.maximum(abs_co, 1e-12),
    )
    return kd * (INV_PI * (A + B * max_cos * sin_alpha * tan_beta))[..., None]


def _cosine_sample_wi(wo, u):
    wi = smp.cosine_sample_hemisphere(u)
    # Flip to wo's hemisphere (LambertianReflection::Sample_f base logic).
    return jnp.where((cos_theta(wo) < 0.0)[..., None], wi * vec(1.0, 1.0, -1.0), wi)


def cosine_pdf(wo, wi):
    return jnp.where(
        same_hemisphere(wo, wi), abs_cos_theta(wi) * INV_PI, 0.0
    )


def _cosine_sample_wi_transmit(wo, u):
    """LambertianTransmission::Sample_f (reflection.cpp:800): cosine sample
    the hemisphere OPPOSITE wo."""
    wi = smp.cosine_sample_hemisphere(u)
    return jnp.where((cos_theta(wo) > 0.0)[..., None], wi * vec(1.0, 1.0, -1.0), wi)


def cosine_transmit_pdf(wo, wi):
    return jnp.where(
        ~same_hemisphere(wo, wi), abs_cos_theta(wi) * INV_PI, 0.0
    )


def schlick_fresnel(rs, cos_t):
    """SchlickFresnel (reflection.h FresnelBlend::SchlickFresnel): rs [.,3]."""
    c = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    pow5 = (c * c) * (c * c) * c
    return rs + pow5[..., None] * (1.0 - rs)


# ---------------------------------------------------------------------------
# Microfacet reflection lobe (reflection.cpp:415-472)
# ---------------------------------------------------------------------------

def microfacet_reflection_f(R, ax, ay, wo, wi, fresnel_fn):
    co = abs_cos_theta(wo)
    ci = abs_cos_theta(wi)
    wh = wi + wo
    # Near-grazing lanes (not just exact zeros) are masked AND their inputs
    # sanitized (double-where): at ci/co ~ 1e-12 the f32 product
    # d*g/(4 ci co) overflows to inf, which both leaks NaN forward through
    # the `~refl -> 0 * f` branches of callers and NaNs every 0-cotangent
    # backward product.  pbrt's corresponding samples die in its
    # NaN-radiance clamp (integrator.cpp:294) — masking to 0 is the same
    # observable behavior without the NaN.
    degenerate = (ci < 1e-8) | (co < 1e-8) | (
        jnp.sum(wh * wh, -1) < 1e-16
    )
    ci_s = jnp.where(degenerate, 1.0, ci)
    co_s = jnp.where(degenerate, 1.0, co)
    wh = normalize(jnp.where(degenerate[..., None], vec(0.0, 0.0, 1.0), wh))
    # Fresnel with wh faceforwarded to +z (reflection.cpp:441).
    whf = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    F = fresnel_fn(dot(wi, whf))
    d = mf.tr_d(wh, ax, ay)
    g = mf.tr_g(wo, wi, ax, ay)
    f = R * F * (d * g / jnp.maximum(4.0 * ci_s * co_s, 1e-12))[..., None]
    return jnp.where(
        (degenerate | ~same_hemisphere(wo, wi))[..., None], 0.0, f
    )


def microfacet_reflection_pdf(ax, ay, wo, wi):
    # Degenerate wo + wi ~ 0 guard (same as the _raw variant below): the
    # unguarded normalize fed near-zero half vectors into tr_pdf, whose
    # huge-but-finite partials overflowed to inf/NaN in backward passes.
    wh_r = wo + wi
    degen = jnp.sum(wh_r * wh_r, -1) < 1e-16
    wh = normalize(jnp.where(degen[..., None], vec(0.0, 0.0, 1.0), wh_r))
    pdf = mf.tr_pdf_visible(wo, wh, ax, ay) / jnp.maximum(
        4.0 * dot(wo, wh), 1e-12
    )
    return jnp.where(~degen & same_hemisphere(wo, wi), pdf, 0.0)


def microfacet_reflection_pdf_raw(ax, ay, wo, wi):
    """The reflection map's TRUE density at wi, including below-horizon
    leakage (wh = (wo+wi)/|..| inverts reflect() in both hemispheres).  Used
    when combining lobe pdfs on the SAMPLING side: a mixture that contains
    transmission lobes must count this mass at transmit-side wi or those
    lobes' contributions are over-weighted.  (The eval/NEE pdf keeps pbrt's
    hemisphere-zeroed form, reflection.cpp BSDF::Pdf — MIS stays unbiased
    for any consistent weight.)"""
    wh_r = wo + wi
    degen = jnp.sum(wh_r * wh_r, -1) < 1e-16
    wh = normalize(jnp.where(degen[..., None], vec(0.0, 0.0, 1.0), wh_r))
    pdf = mf.tr_pdf_visible(wo, wh, ax, ay) / jnp.maximum(
        4.0 * dot(wo, wh), 1e-12
    )
    return jnp.where(degen | (dot(wo, wh) <= 0.0), 0.0, pdf)


def microfacet_reflection_sample(ax, ay, wo, u):
    """Returns (wi, raw map pdf).  The raw pdf is NOT zeroed for
    below-horizon wi — BSDF::Sample_f keeps the chosen lobe's own pdf there
    (reflection.cpp:811-824, 744-752); callers combining lobes must use it
    for the chosen-sample density or transmission lobes get biased."""
    wh = mf.tr_sample_wh_visible(wo, u, ax, ay)
    wi = reflect(wo, wh)
    pdf = mf.tr_pdf_visible(wo, wh, ax, ay) / jnp.maximum(4.0 * dot(wo, wh), 1e-12)
    return wi, jnp.where(dot(wo, wh) > 0.0, pdf, 0.0)


# ---------------------------------------------------------------------------
# Microfacet transmission lobe (reflection.cpp:471-538 MicrofacetTransmission)
# ---------------------------------------------------------------------------

def _transmit_half(wo, wi, eta_mat):
    """Half vector + per-lane eta for transmission; eta_mat = interior IOR.
    Returns (wh oriented to +z, eta = etaT/etaI for this wo side)."""
    eta = jnp.where(cos_theta(wo) > 0.0, eta_mat, 1.0 / eta_mat)
    wh = wo + wi * eta[..., None]
    wh = normalize(wh)
    wh = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    return wh, eta


def microfacet_transmission_f(T, ax, ay, eta_mat, wo, wi):
    """MicrofacetTransmission::f (reflection.cpp:492): radiance transport
    (factor = 1/eta)."""
    co = cos_theta(wo)
    ci = cos_theta(wi)
    wh, eta = _transmit_half(wo, wi, eta_mat)
    dwo = dot(wo, wh)
    dwi = dot(wi, wh)
    F = fresnel_dielectric(dwo, jnp.ones_like(eta_mat), eta_mat)
    sqrt_denom = dwo + eta * dwi
    factor = 1.0 / eta  # radiance transport mode
    d = mf.tr_d(wh, ax, ay)
    g = mf.tr_g(wo, wi, ax, ay)
    val = (
        (1.0 - F)
        * jnp.abs(d * g * eta * eta * jnp.abs(dwi) * jnp.abs(dwo) * factor * factor)
        / jnp.maximum(jnp.abs(ci * co) * sqrt_denom * sqrt_denom, 1e-12)
    )
    bad = same_hemisphere(wo, wi) | (ci == 0.0) | (co == 0.0) | (dwo * dwi > 0.0)
    return jnp.where(bad[..., None], 0.0, T * val[..., None])


def microfacet_transmission_pdf(ax, ay, eta_mat, wo, wi):
    """(reflection.cpp:522) pdf_wh * |dwh/dwi|."""
    wh, eta = _transmit_half(wo, wi, eta_mat)
    dwo = dot(wo, wh)
    dwi = dot(wi, wh)
    sqrt_denom = dwo + eta * dwi
    dwh_dwi = jnp.abs(
        (eta * eta * dwi) / jnp.maximum(sqrt_denom * sqrt_denom, 1e-12)
    )
    pdf = mf.tr_pdf_visible(wo, wh, ax, ay) * dwh_dwi
    bad = same_hemisphere(wo, wi) | (dwo * dwi > 0.0)
    return jnp.where(bad, 0.0, pdf)


def microfacet_transmission_sample(ax, ay, eta_mat, wo, u):
    """MicrofacetTransmission::Sample_f (reflection.cpp:538): sample wh,
    refract wo about it.  Returns (wi, pdf, ok)."""
    from ..core.vecmath import refract as _refract

    wh = mf.tr_sample_wh_visible(wo, u, ax, ay)
    # eta for Refract = etaI/etaT given wo's side (reflection.cpp:547-549).
    going_in = cos_theta(wo) > 0.0
    eta_ratio = jnp.where(going_in, 1.0 / eta_mat, eta_mat)
    whf = jnp.where((dot(wo, wh) < 0.0)[..., None], -wh, wh)
    ok, wi = _refract(wo, whf, eta_ratio)
    ok = ok & (dot(wo, wh) > 0.0) & ~same_hemisphere(wo, wi)
    pdf = microfacet_transmission_pdf(ax, ay, eta_mat, wo, wi)
    return wi, jnp.where(ok, pdf, 0.0), ok


# ---------------------------------------------------------------------------
# FresnelBlend (substrate) lobe (reflection.cpp:404-413, 555-580)
# ---------------------------------------------------------------------------

def fresnel_blend_f(rd, rs, ax, ay, wo, wi):
    """FresnelBlend::f (reflection.cpp:555): Ashikhmin-Shirley diffuse +
    Schlick-fresnel microfacet gloss."""
    ci = abs_cos_theta(wi)
    co = abs_cos_theta(wo)

    def pow5(x):
        return (x * x) * (x * x) * x

    diffuse = (
        (28.0 / (23.0 * jnp.pi))
        * rd
        * (1.0 - rs)
        * (1.0 - pow5(1.0 - 0.5 * ci))[..., None]
        * (1.0 - pow5(1.0 - 0.5 * co))[..., None]
    )
    wh = wi + wo
    degenerate = jnp.sum(wh * wh, -1) == 0.0
    wh_n = normalize(jnp.where(degenerate[..., None], vec(0.0, 0.0, 1.0), wh))
    d = mf.tr_d(wh_n, ax, ay)
    spec = (
        d / jnp.maximum(4.0 * jnp.abs(dot(wi, wh_n)) * jnp.maximum(ci, co), 1e-12)
    )[..., None] * schlick_fresnel(rs, dot(wi, wh_n))
    f = diffuse + spec
    ok = same_hemisphere(wo, wi) & ~degenerate
    return jnp.where(ok[..., None], f, 0.0)


def fresnel_blend_pdf(ax, ay, wo, wi):
    """FresnelBlend::Pdf (reflection.cpp:594): .5 (cosine + wh pdf)."""
    wh = normalize(wo + wi)
    pdf_wh = mf.tr_pdf_visible(wo, wh, ax, ay) / jnp.maximum(
        4.0 * dot(wo, wh), 1e-12
    )
    return jnp.where(
        same_hemisphere(wo, wi),
        0.5 * (abs_cos_theta(wi) * INV_PI + pdf_wh),
        0.0,
    )


def fresnel_blend_sample(ax, ay, wo, u):
    """FresnelBlend::Sample_f (reflection.cpp:580): u0 < .5 cosine sample,
    else sample wh and reflect."""
    pick_diff = u[..., 0] < 0.5
    u0 = jnp.where(pick_diff, 2.0 * u[..., 0], 2.0 * (u[..., 0] - 0.5))
    u_re = jnp.stack([jnp.minimum(u0, 1.0 - 1e-7), u[..., 1]], -1)
    wi_d = _cosine_sample_wi(wo, u_re)
    wh = mf.tr_sample_wh_visible(wo, u_re, ax, ay)
    wi_s = reflect(wo, wh)
    wi = jnp.where(pick_diff[..., None], wi_d, wi_s)
    return wi, fresnel_blend_pdf(ax, ay, wo, wi)


# ---------------------------------------------------------------------------
# Per-material BSDF interface
#
# A material instance per lane is a dict:
#   {"type": i32, "kd": [.,3], "ks": [.,3], "kr": [.,3], "kt": [.,3],
#    "sigma": [.], "ax": [.], "ay": [.], "eta": [.],
#    "metal_eta": [.,3], "metal_k": [.,3]}
# Directions are local.  Returns RGB f, scalar pdf.
# ---------------------------------------------------------------------------

def count_nonspecular(mat, mat_types):
    """BSDF::NumComponents(BSDF_ALL & ~BSDF_SPECULAR) > 0 per lane.

    pbrt's path integrator SKIPS the NEE sample draws entirely at vertices
    whose BSDF has no non-specular lobes (path.cpp:117-131) — the wavefront
    integrator's per-lane dim cursor replicates that.  Lobe presence follows
    each material's ComputeScatteringFunctions: lobes are added only for
    non-black coefficients, and glass/uber specular lobes don't count.
    """
    t = mat["type"]
    any3 = lambda x: jnp.any(x > 0.0, axis=-1)
    out = jnp.zeros(t.shape, bool)

    def put(type_id, flag):
        nonlocal out
        if type_id in mat_types:
            out = jnp.where(t == type_id, flag, out)

    put(MAT_MATTE, any3(mat["kd"]))  # matte.cpp:49-60
    put(MAT_PLASTIC, any3(mat["kd"]) | any3(mat["ks"]))  # plastic.cpp:46-60
    # mirror: SpecularReflection only -> 0 nonspecular (mirror.cpp:43-50)
    put(MAT_MIRROR, jnp.zeros(t.shape, bool))
    # glass: rough>0 -> microfacet lobes; else specular only (glass.cpp:59-92)
    put(MAT_GLASS, mat["is_rough"] & (any3(mat["kr"]) | any3(mat["kt"])))
    put(MAT_METAL, jnp.ones(t.shape, bool))  # metal.cpp microfacet
    # uber: op*kd lambert + op*ks microfacet are the non-specular lobes
    put(MAT_UBER, any3(mat["opacity"] * mat["kd"]) | any3(mat["opacity"] * mat["ks"]))
    put(MAT_SUBSTRATE, any3(mat["kd"]) | any3(mat["ks"]))  # FresnelBlend
    put(MAT_TRANSLUCENT, any3(mat["kd"]) | any3(mat["ks"]))
    put(MAT_FOURIER, jnp.ones(t.shape, bool))
    put(MAT_HAIR, jnp.ones(t.shape, bool))
    put(MAT_DISNEY, jnp.ones(t.shape, bool))
    # subsurface surface BSDF: rough>0 microfacet else specular
    put(MAT_SUBSURFACE, mat["is_rough"])
    put(MAT_BSSRDF_ADAPTER, jnp.ones(t.shape, bool))
    if MAT_MIX in mat_types:
        sub_types = tuple(x for x in mat_types if x != MAT_MIX) or (MAT_MATTE,)
        a = count_nonspecular(mat["sub_a"], sub_types)
        b = count_nonspecular(mat["sub_b"], sub_types)
        out = jnp.where(t == MAT_MIX, a | b, out)
    return out & (t >= 0)


def eval_material(mat, wo, wi, mat_types):
    """BSDF::f + BSDF::Pdf over non-specular lobes (EstimateDirect's
    BSDF_ALL & ~BSDF_SPECULAR query: pdf averaged over matching NON-specular
    lobes, reflection.cpp BSDF::Pdf).

    mat_types: static tuple of material type ids present (specialization).
    Specular-only materials (mirror, specular glass) contribute f=0, pdf=0.
    """
    if MAT_MIX in mat_types:
        # MixMaterial (materials/mixmat.cpp:46): both sub-materials' lobe
        # sets, scaled by amt / (1-amt).  Sub-dicts are resolved by
        # gather_material; recursion depth is 1 (pbrt allows nesting, we
        # flatten one level — nested mixes resolve to their first material).
        sub_types = tuple(x for x in mat_types if x != MAT_MIX) or (MAT_MATTE,)
        f_a, pdf_a = _eval_one(mat["sub_a"], wo, wi, sub_types)
        f_b, pdf_b = _eval_one(mat["sub_b"], wo, wi, sub_types)
        amt = mat["mix_amount"]
        is_mix = mat["type"] == MAT_MIX
        f_mix = amt * f_a + (1.0 - amt) * f_b
        pdf_mix = 0.5 * (pdf_a + pdf_b)
        f0, pdf0 = _eval_one(mat, wo, wi, mat_types)
        return (
            jnp.where(is_mix[..., None], f_mix, f0),
            jnp.where(is_mix, pdf_mix, pdf0),
        )
    return _eval_one(mat, wo, wi, mat_types)


def _eval_one(mat, wo, wi, mat_types):
    t = mat["type"]
    f = jnp.zeros(wo.shape, jnp.float32)
    pdf = jnp.zeros(wo.shape[:-1], jnp.float32)
    refl = same_hemisphere(wo, wi)

    if MAT_MATTE in mat_types:
        m = t == MAT_MATTE
        f_m = oren_nayar_f(mat["kd"], mat["sigma"], wo, wi)
        f_m = jnp.where(refl[..., None], f_m, 0.0)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, cosine_pdf(wo, wi), pdf)

    if MAT_PLASTIC in mat_types:
        # plastic = lambertian(kd) + TR-microfacet(ks, FresnelDielectric)
        # (materials/plastic.cpp:46-60).  NOTE pbrt constructs
        # FresnelDielectric(etaI=1.5, etaT=1.0) — the inverted order is a
        # reference quirk we replicate for image parity (front hits get
        # F(1.5->1), flipped-wh back hits get F(1->1.5)).
        m = t == MAT_PLASTIC
        lam_f = mat["kd"] * INV_PI
        fres = lambda c: fresnel_dielectric(c, 1.5, 1.0)[..., None]
        mfr = microfacet_reflection_f(mat["ks"], mat["ax"], mat["ay"], wo, wi, fres)
        f_m = jnp.where(refl[..., None], lam_f + mfr, 0.0)
        pdf_m = 0.5 * (
            cosine_pdf(wo, wi) + microfacet_reflection_pdf(mat["ax"], mat["ay"], wo, wi)
        )
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_UBER in mat_types:
        # uber (materials/uber.cpp:42-98): op*kd lambert + op*ks microfacet
        # (+ specular kr/kt/pass-through lobes, which eval as 0 here).
        m = t == MAT_UBER
        op = mat["opacity"]
        kd_e = op * mat["kd"]
        ks_e = op * mat["ks"]
        fres = lambda c: fresnel_dielectric(c, 1.0, mat["eta"])[..., None]
        lam_f = kd_e * INV_PI
        mfr = microfacet_reflection_f(ks_e, mat["ax"], mat["ay"], wo, wi, fres)
        has_d = jnp.any(kd_e > 0.0, -1)
        has_g = jnp.any(ks_e > 0.0, -1)
        n_nonspec = jnp.maximum(
            has_d.astype(jnp.float32) + has_g.astype(jnp.float32), 1.0
        )
        f_m = jnp.where(refl[..., None], lam_f + mfr, 0.0)
        pdf_m = (
            cosine_pdf(wo, wi) * has_d
            + microfacet_reflection_pdf(mat["ax"], mat["ay"], wo, wi) * has_g
        ) / n_nonspec
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_SUBSTRATE in mat_types:
        # substrate = FresnelBlend(Kd, Ks) (materials/substrate.cpp:44-58).
        m = t == MAT_SUBSTRATE
        f_m = fresnel_blend_f(mat["kd"], mat["ks"], mat["ax"], mat["ay"], wo, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, fresnel_blend_pdf(mat["ax"], mat["ay"], wo, wi), pdf)

    if MAT_METAL in mat_types:
        m = t == MAT_METAL
        fres = lambda c: fresnel_conductor(
            c, jnp.ones_like(mat["metal_eta"]), mat["metal_eta"], mat["metal_k"]
        )
        f_m = microfacet_reflection_f(
            jnp.ones_like(mat["ks"]), mat["ax"], mat["ay"], wo, wi, fres
        )
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(
            m, microfacet_reflection_pdf(mat["ax"], mat["ay"], wo, wi), pdf
        )

    if MAT_GLASS in mat_types or MAT_SUBSURFACE in mat_types:
        # Rough glass only (roughness > 0): microfacet refl + trans
        # (materials/glass.cpp:62-87); specular glass evals to 0.  Subsurface
        # materials carry the identical rough/smooth dielectric surface BSDF
        # (materials/subsurface.cpp:49-92).
        m = ((t == MAT_GLASS) | (t == MAT_SUBSURFACE)) & mat["is_rough"]
        fres = lambda c: fresnel_dielectric(c, 1.0, mat["eta"])[..., None]
        f_r = microfacet_reflection_f(mat["kr"], mat["ax"], mat["ay"], wo, wi, fres)
        f_t = microfacet_transmission_f(
            mat["kt"], mat["ax"], mat["ay"], mat["eta"], wo, wi
        )
        pdf_m = 0.5 * (
            microfacet_reflection_pdf(mat["ax"], mat["ay"], wo, wi)
            + microfacet_transmission_pdf(mat["ax"], mat["ay"], mat["eta"], wo, wi)
        )
        f = jnp.where(m[..., None], f_r + f_t, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_TRANSLUCENT in mat_types:
        # translucent (materials/translucent.cpp:47-76): kr-weighted reflect
        # lobes + kt-weighted transmit lobes (Lambertian + microfacet each).
        m = t == MAT_TRANSLUCENT
        r_w = mat["kr"]  # "reflect" spectrum
        t_w = mat["kt"]  # "transmit" spectrum
        lam_r = r_w * mat["kd"] * INV_PI
        lam_t = t_w * mat["kd"] * INV_PI
        fres = lambda c: fresnel_dielectric(c, 1.0, 1.5)[..., None]
        mf_r = microfacet_reflection_f(r_w * mat["ks"], mat["ax"], mat["ay"], wo, wi, fres)
        mf_t = microfacet_transmission_f(
            t_w * mat["ks"], mat["ax"], mat["ay"], jnp.full_like(mat["eta"], 1.5), wo, wi
        )
        f_m = jnp.where(refl[..., None], lam_r + mf_r, lam_t + mf_t)
        pdf_refl = cosine_pdf(wo, wi) + microfacet_reflection_pdf(
            mat["ax"], mat["ay"], wo, wi
        )
        pdf_trans = cosine_transmit_pdf(wo, wi) + microfacet_transmission_pdf(
            mat["ax"], mat["ay"], jnp.full_like(mat["eta"], 1.5), wo, wi
        )
        pdf_m = 0.25 * (pdf_refl + pdf_trans)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_DISNEY in mat_types:
        from . import disney as dz

        m = t == MAT_DISNEY
        f_m, pdf_m = dz.disney_eval(mat, wo, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_HAIR in mat_types:
        from . import hair as hz

        m = t == MAT_HAIR
        f_m, pdf_m = hz.hair_eval(mat, wo, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_FOURIER in mat_types:
        from . import fourier as fz

        m = t == MAT_FOURIER
        f_m, pdf_m = fz.fourier_eval(mat, wo, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_BSSRDF_ADAPTER in mat_types:
        # SeparableBSSRDFAdapter.f = Sw(wi) * eta^2 in radiance mode
        # (bssrdf.h:153-166); diffuse reflection lobe, cosine pdf.
        from . import bssrdf as bsx

        m = t == MAT_BSSRDF_ADAPTER
        f_m = (bsx.sw(mat["eta"], wi[..., 2]) * mat["eta"] ** 2)[..., None]
        f_m = jnp.where(refl[..., None], jnp.broadcast_to(f_m, wo.shape), 0.0)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, cosine_pdf(wo, wi), pdf)

    # MAT_MIRROR / specular MAT_GLASS: specular only -> f = 0, pdf = 0.
    return f, pdf


def sample_material(mat, wo, u, mat_types):
    """BSDF::Sample_f (reflection.cpp:714-764) over a batch.

    u: [., 2] (the 2D BSDF sample; the lobe choice consumes u[0] and remaps,
    matching pbrt).  Returns dict: wi, f, pdf, is_specular, valid.
    Specular lobes use the convention: f is the delta weight
    (F * spectrum / |cos|) and pdf = the lobe-selection probability.
    """
    if MAT_MIX in mat_types:
        # Mix lanes: pick sub-material a with prob 1/2 (u0 remapped), f/pdf
        # blended — a consistent estimator of the scaled-lobe-union BSDF.
        pick_a = u[..., 0] < 0.5
        u0 = jnp.where(pick_a, 2.0 * u[..., 0], 2.0 * (u[..., 0] - 0.5))
        u_re = jnp.stack([jnp.minimum(u0, 1.0 - 1e-7), u[..., 1]], -1)
        sub_types = tuple(x for x in mat_types if x != MAT_MIX) or (MAT_MATTE,)
        s_a = _sample_one(mat["sub_a"], wo, u_re, sub_types)
        s_b = _sample_one(mat["sub_b"], wo, u_re, sub_types)
        amt = mat["mix_amount"]
        is_mix = mat["type"] == MAT_MIX
        chosen = {
            k: jnp.where(
                pick_a[..., None] if s_a[k].ndim == 2 else pick_a,
                s_a[k], s_b[k],
            )
            for k in ("wi", "is_specular")
        }
        wi_m = chosen["wi"]
        spec_m = chosen["is_specular"]
        # Non-specular mix lanes: blend f, average pdf over both subs.
        f_a, pdf_a = _eval_one(mat["sub_a"], wo, wi_m, sub_types)
        f_b, pdf_b = _eval_one(mat["sub_b"], wo, wi_m, sub_types)
        f_mix = amt * f_a + (1.0 - amt) * f_b
        pdf_mix = 0.5 * (pdf_a + pdf_b)
        # Specular chosen lobe: keep the chosen sub's delta weight scaled.
        w_spec = jnp.where(
            pick_a[..., None], amt * s_a["f"], (1.0 - amt) * s_b["f"]
        )
        pdf_spec = 0.5 * jnp.where(pick_a, s_a["pdf"], s_b["pdf"])
        f_mix = jnp.where(spec_m[..., None], w_spec, f_mix)
        pdf_mix = jnp.where(spec_m, pdf_spec, pdf_mix)

        s0 = _sample_one(mat, wo, u, mat_types)
        out = {
            "wi": jnp.where(is_mix[..., None], wi_m, s0["wi"]),
            "f": jnp.where(is_mix[..., None], f_mix, s0["f"]),
            "pdf": jnp.where(is_mix, pdf_mix, s0["pdf"]),
            "is_specular": jnp.where(is_mix, spec_m, s0["is_specular"]),
        }
        out["valid"] = (out["pdf"] > 0.0) & jnp.any(out["f"] != 0.0, -1)
        return out
    return _sample_one(mat, wo, u, mat_types)


def _sample_one(mat, wo, u, mat_types):
    t = mat["type"]
    n = wo.shape[0]
    wi = jnp.zeros_like(wo)
    f = jnp.zeros_like(wo)
    pdf = jnp.zeros((n,), jnp.float32)
    is_spec = jnp.zeros((n,), bool)

    if MAT_MATTE in mat_types:
        m = t == MAT_MATTE
        wi_m = _cosine_sample_wi(wo, u)
        f_m = oren_nayar_f(mat["kd"], mat["sigma"], wo, wi_m)
        pdf_m = cosine_pdf(wo, wi_m)
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_PLASTIC in mat_types:
        m = t == MAT_PLASTIC
        # 2 matching lobes: comp = floor(2 u0); remap u0 (reflection.cpp:725).
        pick_spec_lobe = u[..., 0] >= 0.5
        u0 = jnp.where(pick_spec_lobe, 2.0 * (u[..., 0] - 0.5), 2.0 * u[..., 0])
        u_re = jnp.stack([jnp.minimum(u0, 1.0 - 1e-7), u[..., 1]], -1)
        wi_d = _cosine_sample_wi(wo, u_re)
        wi_s, _ = microfacet_reflection_sample(mat["ax"], mat["ay"], wo, u_re)
        wi_m = jnp.where(pick_spec_lobe[..., None], wi_s, wi_d)
        # pbrt quirk: plastic's FresnelDielectric is (1.5, 1.0) (plastic.cpp:59).
        fres = lambda c: fresnel_dielectric(c, 1.5, 1.0)[..., None]
        lam_f = mat["kd"] * INV_PI
        mfr = microfacet_reflection_f(mat["ks"], mat["ax"], mat["ay"], wo, wi_m, fres)
        f_m = jnp.where(same_hemisphere(wo, wi_m)[..., None], lam_f + mfr, 0.0)
        pdf_m = 0.5 * (
            cosine_pdf(wo, wi_m)
            + microfacet_reflection_pdf(mat["ax"], mat["ay"], wo, wi_m)
        )
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_METAL in mat_types:
        m = t == MAT_METAL
        wi_m, pdf_m = microfacet_reflection_sample(mat["ax"], mat["ay"], wo, u)
        fres = lambda c: fresnel_conductor(
            c, jnp.ones_like(mat["metal_eta"]), mat["metal_eta"], mat["metal_k"]
        )
        f_m = microfacet_reflection_f(
            jnp.ones_like(mat["ks"]), mat["ax"], mat["ay"], wo, wi_m, fres
        )
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_MIRROR in mat_types:
        # SpecularReflection with FresnelNoOp (materials/mirror.cpp:45).
        m = t == MAT_MIRROR
        wi_m = vec(-wo[..., 0], -wo[..., 1], wo[..., 2])
        w_m = mat["kr"] / jnp.maximum(abs_cos_theta(wi_m), 1e-12)[..., None]
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], w_m, f)
        pdf = jnp.where(m, 1.0, pdf)
        is_spec = is_spec | m

    if MAT_GLASS in mat_types or MAT_SUBSURFACE in mat_types:
        # FresnelSpecular (reflection.cpp:126-161 Sample_f): choose
        # reflection with prob F, else refract; handles both sides.
        # SMOOTH glass only — rough lanes take the microfacet branch below
        # and must NOT be flagged specular.  Smooth subsurface surfaces use
        # the same FresnelSpecular (subsurface.cpp:60-62).
        m = ((t == MAT_GLASS) | (t == MAT_SUBSURFACE)) & ~mat["is_rough"]
        eta = mat["eta"]
        F = fresnel_dielectric(cos_theta(wo), jnp.ones_like(eta), eta)
        choose_refl = u[..., 0] < F
        # Reflection branch.
        wi_r = vec(-wo[..., 0], -wo[..., 1], wo[..., 2])
        f_r = (F / jnp.maximum(abs_cos_theta(wi_r), 1e-12))[..., None] * mat["kr"]
        # Transmission branch.
        entering = cos_theta(wo) > 0.0
        eta_i = jnp.where(entering, 1.0, eta)
        eta_t = jnp.where(entering, eta, 1.0)
        n_l = jnp.broadcast_to(vec(0.0, 0.0, 1.0), wo.shape)
        n_face = jnp.where(entering[..., None], n_l, -n_l)
        from ..core.vecmath import refract as _refract

        ok_t, wi_t = _refract(wo, n_face, eta_i / eta_t)
        # Radiance transport scaling (eta_i/eta_t)^2 (reflection.cpp:155).
        ft = mat["kt"] * (1.0 - F)[..., None]
        ft = ft * ((eta_i / eta_t) ** 2)[..., None]
        f_t = ft / jnp.maximum(abs_cos_theta(wi_t), 1e-12)[..., None]

        wi_m = jnp.where(choose_refl[..., None], wi_r, wi_t)
        f_m = jnp.where(choose_refl[..., None], f_r, f_t)
        pdf_m = jnp.where(choose_refl, F, 1.0 - F)
        valid_m = choose_refl | ok_t
        f_m = jnp.where(valid_m[..., None], f_m, 0.0)
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)
        is_spec = is_spec | m

    if MAT_GLASS in mat_types or MAT_SUBSURFACE in mat_types:
        # Rough glass (materials/glass.cpp:62-87): 2 matching non-specular
        # lobes; pick by u0 halves, remap, f summed, pdf averaged.
        m = ((t == MAT_GLASS) | (t == MAT_SUBSURFACE)) & mat["is_rough"]
        pick_t = u[..., 0] >= 0.5
        u0 = jnp.where(pick_t, 2.0 * (u[..., 0] - 0.5), 2.0 * u[..., 0])
        u_re = jnp.stack([jnp.minimum(u0, 1.0 - 1e-7), u[..., 1]], -1)
        wi_r, pdf_r_raw = microfacet_reflection_sample(mat["ax"], mat["ay"], wo, u_re)
        wi_t, _, ok_t = microfacet_transmission_sample(
            mat["ax"], mat["ay"], mat["eta"], wo, u_re
        )
        wi_m = jnp.where(pick_t[..., None], wi_t, wi_r)
        fres = lambda c: fresnel_dielectric(c, 1.0, mat["eta"])[..., None]
        f_r = microfacet_reflection_f(mat["kr"], mat["ax"], mat["ay"], wo, wi_m, fres)
        f_t = microfacet_transmission_f(
            mat["kt"], mat["ax"], mat["ay"], mat["eta"], wo, wi_m
        )
        pdf_m = 0.5 * (
            microfacet_reflection_pdf_raw(mat["ax"], mat["ay"], wo, wi_m)
            + microfacet_transmission_pdf(mat["ax"], mat["ay"], mat["eta"], wo, wi_m)
        )
        bad_t = pick_t & ~ok_t
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], jnp.where(bad_t[..., None], 0.0, f_r + f_t), f)
        pdf = jnp.where(m, jnp.where(bad_t, 0.0, pdf_m), pdf)

    if MAT_SUBSTRATE in mat_types:
        m = t == MAT_SUBSTRATE
        wi_m, pdf_m = fresnel_blend_sample(mat["ax"], mat["ay"], wo, u)
        f_m = fresnel_blend_f(mat["kd"], mat["ks"], mat["ax"], mat["ay"], wo, wi_m)
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_TRANSLUCENT in mat_types:
        # 4 matching lobes; pick by u0 quarters (reflection.cpp:725 rule).
        m = t == MAT_TRANSLUCENT
        lobe = jnp.clip((u[..., 0] * 4.0).astype(jnp.int32), 0, 3)
        u0 = jnp.minimum(u[..., 0] * 4.0 - lobe.astype(jnp.float32), 1.0 - 1e-7)
        u_re = jnp.stack([u0, u[..., 1]], -1)
        eta15 = jnp.full_like(mat["eta"], 1.5)
        wi_lr = _cosine_sample_wi(wo, u_re)
        wi_lt = _cosine_sample_wi_transmit(wo, u_re)
        wi_mr, pdf_mr_raw = microfacet_reflection_sample(mat["ax"], mat["ay"], wo, u_re)
        wi_mt, _, ok_mt = microfacet_transmission_sample(
            mat["ax"], mat["ay"], eta15, wo, u_re
        )
        wi_m = jnp.where(
            (lobe == 0)[..., None], wi_lr,
            jnp.where((lobe == 1)[..., None], wi_lt,
                      jnp.where((lobe == 2)[..., None], wi_mr, wi_mt)),
        )
        f_m, _ = _eval_one(
            {**mat, "type": jnp.full_like(t, MAT_TRANSLUCENT)},
            wo, wi_m, (MAT_TRANSLUCENT,),
        )
        # Sampling-side combined pdf: the micro-R term uses the map's TRUE
        # density (incl. below-horizon leakage) so transmit-side samples
        # aren't over-weighted.
        pdf_m = 0.25 * (
            cosine_pdf(wo, wi_m)
            + cosine_transmit_pdf(wo, wi_m)
            + microfacet_reflection_pdf_raw(mat["ax"], mat["ay"], wo, wi_m)
            + microfacet_transmission_pdf(mat["ax"], mat["ay"], eta15, wo, wi_m)
        )
        # Failed refraction (TIR) on the microfacet-transmission pick:
        # invalid sample (Sample_f returns 0, reflection.cpp:538-546).
        bad = (lobe == 3) & ~ok_mt
        f_m = jnp.where(bad[..., None], 0.0, f_m)
        pdf_m = jnp.where(bad, 0.0, pdf_m)
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

    if MAT_UBER in mat_types:
        # Dynamic matching-lobe set: pass-through(1-op), diffuse(op*kd),
        # gloss(op*ks), specular refl(op*kr), specular trans(op*kt)
        # (materials/uber.cpp:42-98); lobe = floor(u0 * nmatch) over the
        # present lobes in that order, u0 remapped (reflection.cpp:714-737).
        m = t == MAT_UBER
        op = mat["opacity"]
        pass_w = (1.0 - op)
        kd_e = op * mat["kd"]
        ks_e = op * mat["ks"]
        kr_e = op * mat["kr"]
        kt_e = op * mat["kt"]
        present = [
            jnp.any(pass_w > 0.0, -1),
            jnp.any(kd_e > 0.0, -1),
            jnp.any(ks_e > 0.0, -1),
            jnp.any(kr_e > 0.0, -1),
            jnp.any(kt_e > 0.0, -1),
        ]
        counts = [p.astype(jnp.float32) for p in present]
        nmatch = jnp.maximum(sum(counts), 1.0)
        idx = jnp.clip((u[..., 0] * nmatch).astype(jnp.int32), 0, 4)
        u0 = jnp.minimum(u[..., 0] * nmatch - idx.astype(jnp.float32), 1.0 - 1e-7)
        u_re = jnp.stack([u0, u[..., 1]], -1)
        cum = [jnp.zeros_like(counts[0])]
        for c in counts[:-1]:
            cum.append(cum[-1] + c)
        choose = [
            present[i] & (idx == cum[i].astype(jnp.int32)) for i in range(5)
        ]
        eta = mat["eta"]
        # Candidate wi per lobe.
        wi_pass = -wo
        wi_d = _cosine_sample_wi(wo, u_re)
        wi_g, _ = microfacet_reflection_sample(mat["ax"], mat["ay"], wo, u_re)
        wi_sr = vec(-wo[..., 0], -wo[..., 1], wo[..., 2])
        from ..core.vecmath import refract as _refract

        entering = cos_theta(wo) > 0.0
        n_l = jnp.broadcast_to(vec(0.0, 0.0, 1.0), wo.shape)
        n_face = jnp.where(entering[..., None], n_l, -n_l)
        eta_i = jnp.where(entering, 1.0, eta)
        eta_t_ = jnp.where(entering, eta, 1.0)
        ok_st, wi_st = _refract(wo, n_face, eta_i / eta_t_)
        wi_m = jnp.where(
            choose[0][..., None], wi_pass,
            jnp.where(choose[1][..., None], wi_d,
            jnp.where(choose[2][..., None], wi_g,
            jnp.where(choose[3][..., None], wi_sr, wi_st))),
        )
        spec_m = choose[0] | choose[3] | choose[4]
        # Non-specular chosen: f = kd+gloss lobes, pdf averaged over nmatch.
        fres = lambda c: fresnel_dielectric(c, 1.0, eta)[..., None]
        lam_f = kd_e * INV_PI
        mfr = microfacet_reflection_f(ks_e, mat["ax"], mat["ay"], wo, wi_m, fres)
        f_ns = jnp.where(same_hemisphere(wo, wi_m)[..., None], lam_f + mfr, 0.0)
        pdf_ns = (
            cosine_pdf(wo, wi_m) * counts[1]
            + microfacet_reflection_pdf(mat["ax"], mat["ay"], wo, wi_m) * counts[2]
        ) / nmatch
        # Specular chosen: delta weight / selection prob 1/nmatch.
        Fr = fresnel_dielectric(cos_theta(wo), jnp.ones_like(eta), eta)
        ac = jnp.maximum(abs_cos_theta(wi_m), 1e-12)[..., None]
        w_pass = pass_w / ac
        w_sr = kr_e * Fr[..., None] / ac
        w_st = kt_e * (1.0 - Fr)[..., None] * ((eta_i / eta_t_) ** 2)[..., None] / ac
        w_st = jnp.where(ok_st[..., None], w_st, 0.0)
        f_sp = jnp.where(
            choose[0][..., None], w_pass,
            jnp.where(choose[3][..., None], w_sr, w_st),
        )
        f_m = jnp.where(spec_m[..., None], f_sp, f_ns)
        pdf_m = jnp.where(spec_m, 1.0 / nmatch, pdf_ns)
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)
        is_spec = is_spec | (m & spec_m)

    if MAT_DISNEY in mat_types:
        from . import disney as dz

        m = t == MAT_DISNEY
        s = dz.disney_sample(mat, wo, u)
        wi = jnp.where(m[..., None], s["wi"], wi)
        f = jnp.where(m[..., None], s["f"], f)
        pdf = jnp.where(m, s["pdf"], pdf)
        is_spec = is_spec | (m & s["is_specular"])

    if MAT_HAIR in mat_types:
        from . import hair as hz

        m = t == MAT_HAIR
        s = hz.hair_sample(mat, wo, u)
        wi = jnp.where(m[..., None], s["wi"], wi)
        f = jnp.where(m[..., None], s["f"], f)
        pdf = jnp.where(m, s["pdf"], pdf)

    if MAT_FOURIER in mat_types:
        from . import fourier as fz

        m = t == MAT_FOURIER
        s = fz.fourier_sample(mat, wo, u)
        wi = jnp.where(m[..., None], s["wi"], wi)
        f = jnp.where(m[..., None], s["f"], f)
        pdf = jnp.where(m, s["pdf"], pdf)

    if MAT_BSSRDF_ADAPTER in mat_types:
        # SeparableBSSRDFAdapter: diffuse lobe -> default BxDF::Sample_f
        # cosine-hemisphere sampling; f = Sw(wi) * eta^2 (bssrdf.h:153-166).
        from . import bssrdf as bsx

        m = t == MAT_BSSRDF_ADAPTER
        wi_m = _cosine_sample_wi(wo, u)
        f_m = (bsx.sw(mat["eta"], wi_m[..., 2]) * mat["eta"] ** 2)[..., None]
        f_m = jnp.broadcast_to(f_m, wo.shape)
        wi = jnp.where(m[..., None], wi_m, wi)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, cosine_pdf(wo, wi_m), pdf)

    valid = (pdf > 0.0) & jnp.any(f != 0.0, axis=-1)
    return {"wi": wi, "f": f, "pdf": pdf, "is_specular": is_spec, "valid": valid}


def gather_material(table, mat_id, tex_values=None, mat_types=(), uv=None):
    """Build the per-lane material param dict from the MaterialTable.

    tex_values: [T, N, 3] evaluated texture stack (textures/textures.py) —
    parameters with a texture binding (``*_tex >= 0``) override constants
    (Material::ComputeScatteringFunctions evaluating its Texture inputs).

    mat_types: static type set; when MAT_MIX is present, the two
    sub-material parameter dicts are gathered too (one level deep).
    """
    mat = _gather_base(table, mat_id, tex_values)
    if uv is not None:
        mat["uv"] = uv  # hair needs the curve-width coordinate (h = -1+2v)
    if MAT_MIX in mat_types:
        is_mix = mat["type"] == MAT_MIX
        mid = jnp.clip(mat_id, 0, table.mat_type.shape[0] - 1)
        a_id = jnp.where(is_mix, table.mix_m1[mid], mat_id)
        b_id = jnp.where(is_mix, table.mix_m2[mid], mat_id)
        sub_a = _gather_base(table, a_id, tex_values)
        sub_b = _gather_base(table, b_id, tex_values)
        # Nested mixes flatten to their first sub-material.
        sub_a["type"] = jnp.where(
            sub_a["type"] == MAT_MIX, MAT_MATTE, sub_a["type"]
        )
        sub_b["type"] = jnp.where(
            sub_b["type"] == MAT_MIX, MAT_MATTE, sub_b["type"]
        )
        mat["sub_a"] = sub_a
        mat["sub_b"] = sub_b
        mat["mix_amount"] = table.mix_amount[mid]
    return mat


def _gather_base(table, mat_id, tex_values=None):
    from ..textures.textures import gather_texture

    mid = jnp.clip(mat_id, 0, table.mat_type.shape[0] - 1)
    rough = table.roughness[mid]
    remap = table.remap_roughness[mid]
    urough = table.urough[mid]
    vrough = table.vrough[mid]
    kd = table.kd[mid]
    ks = table.ks[mid]
    sigma = table.sigma[mid]
    if tex_values is not None:
        kd = gather_texture(tex_values, table.kd_tex[mid], kd)
        ks = gather_texture(tex_values, table.ks_tex[mid], ks)
        sigma = gather_texture(
            tex_values, table.sigma_tex[mid], sigma[..., None].repeat(3, -1)
        )[..., 0]
        rough = gather_texture(
            tex_values, table.rough_tex[mid], rough[..., None].repeat(3, -1)
        )[..., 0]
    ur = jnp.where(urough >= 0.0, urough, rough)
    vr = jnp.where(vrough >= 0.0, vrough, rough)
    ax = jnp.where(remap, mf.roughness_to_alpha(ur), jnp.maximum(ur, 1e-3))
    ay = jnp.where(remap, mf.roughness_to_alpha(vr), jnp.maximum(vr, 1e-3))
    opacity = table.opacity[mid]
    if tex_values is not None:
        opacity = gather_texture(tex_values, table.opacity_tex[mid], opacity)
    ss_extra = {}
    if table.ss_sigma_t is not None:
        ss_extra = {
            "ss_sigma_t": table.ss_sigma_t[mid],
            "ss_rho": table.ss_rho[mid],
            "ss_table": table.ss_table[mid],
        }
    if table.fourier:
        ss_extra["fourier_id"] = table.fourier_id[mid]
        ss_extra["fourier_tables"] = table.fourier
    return {
        **ss_extra,
        "type": jnp.where(mat_id >= 0, table.mat_type[mid], -1),
        "kd": kd,
        "ks": ks,
        "kr": table.kr[mid],
        "kt": table.kt[mid],
        "sigma": sigma,
        "ax": ax,
        "ay": ay,
        "eta": table.eta[mid],
        "metal_eta": table.metal_eta[mid],
        "metal_k": table.metal_k[mid],
        "opacity": opacity,
        # Rough- vs specular-glass gate: raw (pre-remap) roughness > 0.
        "is_rough": jnp.maximum(ur, vr) > 0.0,
        "raw_rough": ur,
        "disney": table.disney[mid],
        "hair": table.hair[mid],
    }
