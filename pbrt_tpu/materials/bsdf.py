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
from ..core.sampling import INV_PI
from . import microfacet as mf
from ..scene import (
    MAT_GLASS,
    MAT_MATTE,
    MAT_METAL,
    MAT_MIRROR,
    MAT_PLASTIC,
    MAT_SUBSTRATE,
    MAT_UBER,
    MAT_TRANSLUCENT,
)


# ---------------------------------------------------------------------------
# Shading frame
# ---------------------------------------------------------------------------

def make_frame(ns, dpdu):
    """BSDF ctor (reflection.h:166): ss from dpdu orthogonalized against ns."""
    ss = dpdu - ns * dot(ns, dpdu)[..., None]
    ss_len = jnp.sqrt(jnp.sum(ss * ss, axis=-1, keepdims=True))
    # Fallback frame when dpdu ~ parallel to ns.
    from ..core.vecmath import coordinate_system

    fb, _ = coordinate_system(ns)
    ss = jnp.where(ss_len > 1e-8, ss / jnp.maximum(ss_len, 1e-20), fb)
    ts = cross(ns, ss)
    return ss, ts, ns


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
    si = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    st = ei / et * si
    tir = st >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - st * st))
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
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2b2 + ci2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
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


# ---------------------------------------------------------------------------
# Microfacet reflection lobe (reflection.cpp:415-472)
# ---------------------------------------------------------------------------

def microfacet_reflection_f(R, ax, ay, wo, wi, fresnel_fn):
    co = abs_cos_theta(wo)
    ci = abs_cos_theta(wi)
    wh = wi + wo
    degenerate = (ci == 0.0) | (co == 0.0) | (jnp.sum(wh * wh, -1) == 0.0)
    wh = normalize(jnp.where(degenerate[..., None], vec(0.0, 0.0, 1.0), wh))
    # Fresnel with wh faceforwarded to +z (reflection.cpp:441).
    whf = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    F = fresnel_fn(dot(wi, whf))
    d = mf.tr_d(wh, ax, ay)
    g = mf.tr_g(wo, wi, ax, ay)
    f = R * F * (d * g / jnp.maximum(4.0 * ci * co, 1e-12))[..., None]
    return jnp.where(
        (degenerate | ~same_hemisphere(wo, wi))[..., None], 0.0, f
    )


def microfacet_reflection_pdf(ax, ay, wo, wi):
    wh = normalize(wo + wi)
    pdf = mf.tr_pdf_visible(wo, wh, ax, ay) / jnp.maximum(
        4.0 * dot(wo, wh), 1e-12
    )
    return jnp.where(same_hemisphere(wo, wi), pdf, 0.0)


def microfacet_reflection_sample(ax, ay, wo, u):
    wh = mf.tr_sample_wh_visible(wo, u, ax, ay)
    wi = reflect(wo, wh)
    ok = same_hemisphere(wo, wi) & (dot(wo, wh) > 0.0)
    pdf = mf.tr_pdf_visible(wo, wh, ax, ay) / jnp.maximum(4.0 * dot(wo, wh), 1e-12)
    return wi, jnp.where(ok, pdf, 0.0)


# ---------------------------------------------------------------------------
# Per-material BSDF interface
#
# A material instance per lane is a dict:
#   {"type": i32, "kd": [.,3], "ks": [.,3], "kr": [.,3], "kt": [.,3],
#    "sigma": [.], "ax": [.], "ay": [.], "eta": [.],
#    "metal_eta": [.,3], "metal_k": [.,3]}
# Directions are local.  Returns RGB f, scalar pdf.
# ---------------------------------------------------------------------------

def eval_material(mat, wo, wi, mat_types):
    """BSDF::f + BSDF::Pdf over non-specular lobes.

    mat_types: static tuple of material type ids present (specialization).
    Specular-only materials (mirror, glass) contribute f=0, pdf=0.
    """
    t = mat["type"]
    f = jnp.zeros(wo.shape, jnp.float32)
    pdf = jnp.zeros(wo.shape[:-1], jnp.float32)

    if MAT_MATTE in mat_types:
        m = t == MAT_MATTE
        f_m = oren_nayar_f(mat["kd"], mat["sigma"], wo, wi)
        f_m = jnp.where(same_hemisphere(wo, wi)[..., None], f_m, 0.0)
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, cosine_pdf(wo, wi), pdf)

    if MAT_PLASTIC in mat_types or MAT_UBER in mat_types or MAT_SUBSTRATE in mat_types:
        # plastic = lambertian(kd) + TR-microfacet(ks, FresnelDielectric 1.5)
        # (materials/plastic.cpp:46-60).
        m = (t == MAT_PLASTIC) | (t == MAT_UBER)
        lam_f = mat["kd"] * INV_PI
        fres = lambda c: fresnel_dielectric(c, 1.0, 1.5)[..., None]
        mfr = microfacet_reflection_f(mat["ks"], mat["ax"], mat["ay"], wo, wi, fres)
        f_m = jnp.where(
            same_hemisphere(wo, wi)[..., None], lam_f + mfr, mfr * 0.0
        )
        pdf_m = 0.5 * (
            cosine_pdf(wo, wi) + microfacet_reflection_pdf(mat["ax"], mat["ay"], wo, wi)
        )
        f = jnp.where(m[..., None], f_m, f)
        pdf = jnp.where(m, pdf_m, pdf)

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

    # MAT_MIRROR / MAT_GLASS: specular only -> f = 0, pdf = 0.
    return f, pdf


def sample_material(mat, wo, u, mat_types):
    """BSDF::Sample_f (reflection.cpp:714-764) over a batch.

    u: [., 2] (the 2D BSDF sample; the lobe choice consumes u[0] and remaps,
    matching pbrt).  Returns dict: wi, f, pdf, is_specular, valid.
    Specular lobes return f_over_pdf premultiplied convention:
    here f is the delta weight (F * spectrum / |cos|) and pdf = 1.
    """
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

    if MAT_PLASTIC in mat_types or MAT_UBER in mat_types:
        m = (t == MAT_PLASTIC) | (t == MAT_UBER)
        # 2 matching lobes: comp = floor(2 u0); remap u0 (reflection.cpp:725).
        pick_spec_lobe = u[..., 0] >= 0.5
        u0 = jnp.where(pick_spec_lobe, 2.0 * (u[..., 0] - 0.5), 2.0 * u[..., 0])
        u_re = jnp.stack([jnp.minimum(u0, 1.0 - 1e-7), u[..., 1]], -1)
        wi_d = _cosine_sample_wi(wo, u_re)
        wi_s, _ = microfacet_reflection_sample(mat["ax"], mat["ay"], wo, u_re)
        wi_m = jnp.where(pick_spec_lobe[..., None], wi_s, wi_d)
        fres = lambda c: fresnel_dielectric(c, 1.0, 1.5)[..., None]
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

    if MAT_GLASS in mat_types:
        # FresnelSpecular (reflection.cpp:126-161 Sample_f): choose
        # reflection with prob F, else refract; handles both sides.
        m = t == MAT_GLASS
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

    valid = (pdf > 0.0) & jnp.any(f != 0.0, axis=-1)
    return {"wi": wi, "f": f, "pdf": pdf, "is_specular": is_spec, "valid": valid}


def gather_material(table, mat_id, tex_values=None):
    """Build the per-lane material param dict from the MaterialTable.

    tex_values: [T, N, 3] evaluated texture stack (textures/textures.py) —
    parameters with a texture binding (``*_tex >= 0``) override constants
    (Material::ComputeScatteringFunctions evaluating its Texture inputs).
    """
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
    return {
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
    }
