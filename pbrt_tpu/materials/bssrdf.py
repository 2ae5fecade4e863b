"""Tabulated BSSRDF (photon-beam diffusion subsurface scattering).

TPU re-expression of core/bssrdf.{h,cpp}:

- Host side (numpy): `compute_beam_diffusion_bssrdf` builds the
  (100 albedos x 64 radii) diffusion profile exactly as
  ComputeBeamDiffusionBSSRDF (bssrdf.cpp:146-178): per entry,
  2*pi*r*(BeamDiffusionSS + BeamDiffusionMS) with 100-sample integration;
  per-albedo CDFs via IntegrateCatmullRom give rhoEff and the importance-
  sampling tables.  `subsurface_from_diffuse` inverts the rhoEff curve for
  "kdsubsurface" materials (bssrdf.cpp:180-189).
- Device side (jnp): spline lookups/sampling of the profile
  (TabulatedBSSRDF::Sr / Sample_Sr / Pdf_Sr, bssrdf.cpp:198-392) and the
  separable terms Sw / Pdf_Sp (bssrdf.h:84-95, bssrdf.cpp:331-356),
  vectorized over the ray batch.  The probe-ray Sample_Sp walk lives in the
  path integrator (bounded re-intersection loop).

Tables are stacked over distinct (g, eta) pairs: profile/cdf are
[(K*100), 64] row-major so a per-lane table id becomes a row offset.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import interpolation as itp

N_RHO = 100
N_RADIUS = 64


# ---------------------------------------------------------------------------
# Fresnel moments (bssrdf.cpp:41-64) — polynomial fits; work on np or jnp.
# ---------------------------------------------------------------------------

def fresnel_moment1(eta):
    xp = jnp if isinstance(eta, jnp.ndarray) else np
    eta2, eta3 = eta * eta, eta ** 3
    eta4, eta5 = eta ** 4, eta ** 5
    lo = (0.45966 - 1.73965 * eta + 3.37668 * eta2 - 3.904945 * eta3
          + 2.49277 * eta4 - 0.68441 * eta5)
    hi = (-4.61686 + 11.1136 * eta - 10.4646 * eta2 + 5.11455 * eta3
          - 1.27198 * eta4 + 0.12746 * eta5)
    return xp.where(eta < 1, lo, hi)


def fresnel_moment2(eta):
    xp = jnp if isinstance(eta, jnp.ndarray) else np
    eta2, eta3 = eta * eta, eta ** 3
    eta4, eta5 = eta ** 4, eta ** 5
    lo = (0.27614 - 0.87350 * eta + 1.12077 * eta2 - 0.65095 * eta3
          + 0.07883 * eta4 + 0.04860 * eta5)
    r_eta = 1.0 / eta
    hi = (-547.033 + 45.3087 * r_eta ** 3 - 218.725 * r_eta ** 2
          + 458.843 * r_eta + 404.557 * eta - 189.519 * eta2
          + 54.9327 * eta3 - 9.00603 * eta4 + 0.63942 * eta5)
    return xp.where(eta < 1, lo, hi)


def _fr_dielectric_np(cos_i, eta_i, eta_t):
    """FrDielectric (reflection.cpp:47-64), numpy scalar/array."""
    cos_i = np.clip(cos_i, -1.0, 1.0)
    swap = cos_i <= 0.0
    ei = np.where(swap, eta_t, eta_i)
    et = np.where(swap, eta_i, eta_t)
    cos_i = np.abs(cos_i)
    sin_t = ei / et * np.sqrt(np.maximum(0.0, 1.0 - cos_i * cos_i))
    tir = sin_t >= 1.0
    cos_t = np.sqrt(np.maximum(0.0, 1.0 - sin_t * sin_t))
    r_par = (et * cos_i - ei * cos_t) / (et * cos_i + ei * cos_t)
    r_perp = (ei * cos_i - et * cos_t) / (ei * cos_i + et * cos_t)
    return np.where(tir, 1.0, 0.5 * (r_par * r_par + r_perp * r_perp))


def _phase_hg_np(cos_theta, g):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return (1.0 / (4.0 * np.pi)) * (1.0 - g * g) / (denom * np.sqrt(np.maximum(denom, 1e-20)))


# ---------------------------------------------------------------------------
# Beam diffusion integrands (bssrdf.cpp:66-144), vectorized over (rho, r).
# ---------------------------------------------------------------------------

def beam_diffusion_ms(sigma_s, sigma_a, g, eta, r, n_samples=100):
    """Multiple-scattering dipole term E_d(r) (bssrdf.cpp:66-119)."""
    sigma_s, sigma_a, r = np.broadcast_arrays(
        np.asarray(sigma_s, np.float64), np.asarray(sigma_a, np.float64),
        np.asarray(r, np.float64))
    sigmap_s = sigma_s * (1.0 - g)
    sigmap_t = sigma_a + sigmap_s
    rhop = np.where(sigmap_t > 0, sigmap_s / np.maximum(sigmap_t, 1e-30), 0.0)
    d_g = (2.0 * sigma_a + sigmap_s) / (3.0 * np.maximum(sigmap_t, 1e-30) ** 2)
    sigma_tr = np.sqrt(sigma_a / np.maximum(d_g, 1e-30))
    fm1 = fresnel_moment1(np.float64(eta))
    fm2 = fresnel_moment2(np.float64(eta))
    ze = -2.0 * d_g * (1.0 + 3.0 * fm2) / (1.0 - 2.0 * fm1)
    c_phi = 0.25 * (1.0 - 2.0 * fm1)
    c_e = 0.5 * (1.0 - 3.0 * fm2)
    i = np.arange(n_samples, dtype=np.float64)
    # exponential depth samples of the real source (equi-spaced in CDF)
    zr = -np.log(1.0 - (i + 0.5) / n_samples)[:, None] / np.maximum(
        sigmap_t[None, :], 1e-30)
    zv = -zr + 2.0 * ze[None, :]
    rr = r[None, :]
    dr = np.sqrt(rr * rr + zr * zr)
    dv = np.sqrt(rr * rr + zv * zv)
    phi_d = (1.0 / (4.0 * np.pi)) / d_g[None, :] * (
        np.exp(-sigma_tr[None, :] * dr) / dr
        - np.exp(-sigma_tr[None, :] * dv) / dv)
    e_dn = (1.0 / (4.0 * np.pi)) * (
        zr * (1.0 + sigma_tr[None, :] * dr) * np.exp(-sigma_tr[None, :] * dr) / dr ** 3
        - zv * (1.0 + sigma_tr[None, :] * dv) * np.exp(-sigma_tr[None, :] * dv) / dv ** 3)
    e = phi_d * c_phi + e_dn * c_e
    kappa = 1.0 - np.exp(-2.0 * sigmap_t[None, :] * (dr + zr))
    ed = kappa * (rhop[None, :] ** 2) * e
    return ed.mean(axis=0)


def beam_diffusion_ss(sigma_s, sigma_a, g, eta, r, n_samples=100):
    """Single-scattering term E_ss(r) (bssrdf.cpp:121-144)."""
    sigma_s, sigma_a, r = np.broadcast_arrays(
        np.asarray(sigma_s, np.float64), np.asarray(sigma_a, np.float64),
        np.asarray(r, np.float64))
    sigma_t = sigma_a + sigma_s
    rho = np.where(sigma_t > 0, sigma_s / np.maximum(sigma_t, 1e-30), 0.0)
    t_crit = r * np.sqrt(max(eta * eta - 1.0, 0.0))
    i = np.arange(n_samples, dtype=np.float64)
    ti = t_crit[None, :] - np.log(1.0 - (i[:, None] + 0.5) / n_samples) / np.maximum(
        sigma_t[None, :], 1e-30)
    d = np.sqrt(r[None, :] ** 2 + ti * ti)
    cos_o = ti / np.maximum(d, 1e-30)
    ess = (rho[None, :] * np.exp(-sigma_t[None, :] * (d + t_crit[None, :]))
           / np.maximum(d * d, 1e-30)
           * _phase_hg_np(cos_o, g)
           * (1.0 - _fr_dielectric_np(-cos_o, 1.0, eta))
           * np.abs(cos_o))
    return ess.mean(axis=0)


# ---------------------------------------------------------------------------
# Table construction (bssrdf.cpp:146-189).
# ---------------------------------------------------------------------------

def compute_beam_diffusion_bssrdf(g, eta, n_rho=N_RHO, n_radius=N_RADIUS):
    """Build {rho, radius, profile[n_rho,n_radius], cdf, rho_eff} (float32)."""
    radius = np.zeros(n_radius, np.float64)
    radius[1] = 2.5e-3
    for i in range(2, n_radius):
        radius[i] = radius[i - 1] * 1.2
    rho = (1.0 - np.exp(-8.0 * np.arange(n_rho) / (n_rho - 1))) / (1.0 - np.exp(-8.0))

    profile = np.zeros((n_rho, n_radius), np.float64)
    for i in range(n_rho):
        profile[i] = 2.0 * np.pi * radius * (
            beam_diffusion_ss(rho[i], 1.0 - rho[i], g, eta, radius)
            + beam_diffusion_ms(rho[i], 1.0 - rho[i], g, eta, radius))
    rho_eff, cdf = itp.integrate_catmull_rom_np(radius, profile)
    return dict(
        rho=rho.astype(np.float32),
        radius=radius.astype(np.float32),
        profile=profile.astype(np.float32),
        cdf=cdf.astype(np.float32),
        rho_eff=rho_eff.astype(np.float32),
    )


def subsurface_from_diffuse(table, rho_eff_target, mfp):
    """SubsurfaceFromDiffuse (bssrdf.cpp:180-189): invert rhoEff(rho).

    rho_eff_target, mfp: [3] rgb.  Returns (sigma_a, sigma_s) [3] each.
    """
    sigma_a = np.zeros(3, np.float32)
    sigma_s = np.zeros(3, np.float32)
    for c in range(3):
        rho = itp.invert_catmull_rom_np(
            table["rho"], table["rho_eff"], float(rho_eff_target[c]))
        sigma_s[c] = rho / mfp[c]
        sigma_a[c] = (1.0 - rho) / mfp[c]
    return sigma_a, sigma_s


# ---------------------------------------------------------------------------
# Device-side profile lookups (batched over lanes; tables stacked over K).
# ---------------------------------------------------------------------------

def sr_eval(rho_nodes, radius_nodes, profile, table_id, sigma_t, rho, r):
    """TabulatedBSSRDF::Sr (bssrdf.cpp:198-231): [N] radius -> [N,3] Sr.

    profile: [(K*N_RHO), N_RADIUS]; table_id: [N] i32; sigma_t/rho: [N,3].
    """
    r_optical = r[..., None] * sigma_t  # [N,3]
    row_off = (table_id * rho_nodes.shape[0])[..., None]  # [N,1]
    sr = _interp2d_rows(
        rho_nodes, radius_nodes, profile, row_off, rho, r_optical)
    # Cancel the 2*pi*r marginal factor baked into the profile.
    sr = jnp.where(
        r_optical > 0, sr / (2.0 * jnp.pi * jnp.maximum(r_optical, 1e-20)), sr)
    return jnp.maximum(sr * sigma_t * sigma_t, 0.0)


def _interp2d_rows(nodes1, nodes2, values, row_off, alpha, x):
    """Tensor spline with a per-lane row offset into stacked tables.

    alpha, x: [..., C]; row_off broadcastable to alpha; returns [..., C].
    """
    n1 = nodes1.shape[0]
    n2 = nodes2.shape[0]
    off1, w1, v1 = itp.catmull_rom_weights(nodes1, alpha)
    off2, w2, v2 = itp.catmull_rom_weights(nodes2, x)
    rows = jnp.clip(off1[..., None] + jnp.arange(4), 0, n1 - 1) + row_off[..., None]
    cols = jnp.clip(off2[..., None] + jnp.arange(4), 0, n2 - 1)
    v = values[rows[..., :, None], cols[..., None, :]]
    val = jnp.sum(v * w1[..., :, None] * w2[..., None, :], axis=(-2, -1))
    return jnp.where(v1 & v2, val, 0.0)


def sample_sr(rho_nodes, radius_nodes, profile, cdf, table_id, sigma_t_ch,
              rho_ch, u):
    """TabulatedBSSRDF::Sample_Sr (bssrdf.cpp:358-365) for one channel.

    sigma_t_ch, rho_ch, u: [N].  Returns r [N] (negative = invalid).
    """
    row_off = table_id * rho_nodes.shape[0]
    x, _, _ = _sample_cr2d_rows(
        rho_nodes, radius_nodes, profile, cdf, row_off, rho_ch, u)
    r = x / jnp.maximum(sigma_t_ch, 1e-20)
    return jnp.where(sigma_t_ch == 0, -1.0, r)


def _sample_cr2d_rows(nodes1, nodes2, values, cdf, row_off, alpha, u):
    """sample_catmull_rom_2d with stacked tables (row offset per lane)."""
    n1 = nodes1.shape[0]
    n2 = nodes2.shape[0]
    off1, w1, valid = itp.catmull_rom_weights(nodes1, alpha)
    rows = jnp.clip(off1[..., None] + jnp.arange(4), 0, n1 - 1) + row_off[..., None]

    def interp(tab, idx):
        v = tab[rows, jnp.clip(idx, 0, n2 - 1)[..., None]]
        return jnp.sum(v * w1, axis=-1)

    maximum = interp(cdf, jnp.full(alpha.shape, n2 - 1, jnp.int32))
    u = u * maximum
    lo = jnp.zeros(alpha.shape, jnp.int32)
    hi = jnp.full(alpha.shape, n2 - 1, jnp.int32)
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
    d0, d1 = itp._fd_derivs(f0, f1, fm1, fp2, x0, x1, xm1, xp2, has_prev, has_next)
    t, fhat = itp._invert_segment_integral(f0, f1, d0, d1, u_seg)
    x = x0 + width * t
    pdf = jnp.where(valid & (maximum > 0),
                    fhat / jnp.where(maximum == 0, 1.0, maximum), 0.0)
    return x, jnp.where(valid, fhat, 0.0), pdf


def pdf_sr(rho_nodes, radius_nodes, profile, rho_eff, table_id, sigma_t,
           rho, r):
    """TabulatedBSSRDF::Pdf_Sr (bssrdf.cpp:367-392), all 3 channels at once.

    sigma_t/rho: [N,3]; r: [N] or [N,3].  Returns [N,3] pdf of r per channel.
    """
    if r.ndim == sigma_t.ndim - 1:
        r = r[..., None]
    r_optical = r * sigma_t
    n_rho = rho_nodes.shape[0]
    row_off = (table_id * n_rho)[..., None]
    sr = _interp2d_rows(rho_nodes, radius_nodes, profile, row_off, rho, r_optical)
    # interpolated rhoEff along the rho axis
    off1, w1, v1 = itp.catmull_rom_weights(rho_nodes, rho)
    rows = jnp.clip(off1[..., None] + jnp.arange(4), 0, n_rho - 1) + row_off[..., None]
    re = jnp.sum(rho_eff[rows] * w1, axis=-1)
    sr = jnp.where(r_optical > 0,
                   sr / (2.0 * jnp.pi * jnp.maximum(r_optical, 1e-20)), sr)
    pdf = sr * sigma_t * sigma_t / jnp.maximum(re, 1e-20)
    return jnp.maximum(jnp.where(v1 & (re > 0), pdf, 0.0), 0.0)


# ---------------------------------------------------------------------------
# Separable terms (bssrdf.h:84-95) + Pdf_Sp (bssrdf.cpp:331-356).
# ---------------------------------------------------------------------------

def sw(eta, cos_theta_w):
    """Sw directional term, scalar per lane (bssrdf.h:89-92)."""
    c = 1.0 - 2.0 * fresnel_moment1(1.0 / eta)
    fr = _fr_dielectric_jnp(cos_theta_w, jnp.ones_like(eta), eta)
    return (1.0 - fr) / (c * jnp.pi)


def _fr_dielectric_jnp(cos_i, eta_i, eta_t):
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    swap = cos_i <= 0.0
    ei = jnp.where(swap, eta_t, eta_i)
    et = jnp.where(swap, eta_i, eta_t)
    cos_i = jnp.abs(cos_i)
    sin_t = ei / et * jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_par = (et * cos_i - ei * cos_t) / jnp.maximum(et * cos_i + ei * cos_t, 1e-20)
    r_perp = (ei * cos_i - et * cos_t) / jnp.maximum(ei * cos_i + et * cos_t, 1e-20)
    return jnp.where(tir, 1.0, 0.5 * (r_par * r_par + r_perp * r_perp))


def pdf_sp(rho_nodes, radius_nodes, profile, rho_eff, table_id, sigma_t, rho,
           po_p, frame_ss, frame_ts, frame_ns, pi_p, pi_ng):
    """SeparableBSSRDF::Pdf_Sp (bssrdf.cpp:331-356): MIS over 3 axes x 3 ch."""
    d = po_p - pi_p
    d_local = jnp.stack([
        jnp.sum(frame_ss * d, -1), jnp.sum(frame_ts * d, -1),
        jnp.sum(frame_ns * d, -1)], -1)
    n_local = jnp.stack([
        jnp.sum(frame_ss * pi_ng, -1), jnp.sum(frame_ts * pi_ng, -1),
        jnp.sum(frame_ns * pi_ng, -1)], -1)
    r_proj = jnp.stack([
        jnp.sqrt(d_local[..., 1] ** 2 + d_local[..., 2] ** 2),
        jnp.sqrt(d_local[..., 2] ** 2 + d_local[..., 0] ** 2),
        jnp.sqrt(d_local[..., 0] ** 2 + d_local[..., 1] ** 2)], -1)
    axis_prob = jnp.asarray([0.25, 0.25, 0.5], jnp.float32)
    ch_prob = 1.0 / 3.0
    pdf = jnp.zeros(po_p.shape[:-1], jnp.float32)
    for axis in range(3):
        p_axis = pdf_sr(rho_nodes, radius_nodes, profile, rho_eff, table_id,
                        sigma_t, rho, r_proj[..., axis])  # [N,3]
        pdf = pdf + jnp.sum(p_axis, -1) * jnp.abs(n_local[..., axis]) * ch_prob * axis_prob[axis]
    return pdf
