"""FourierBSDF — tabulated measured BSDFs in a Spline x Fourier basis.

TPU re-expression of core/reflection.h:130-156 (FourierBSDFTable) +
reflection.cpp FourierBSDF::{f, Sample_f, Pdf} + materials/fourier.cpp
(the 'SCATFUN\\x01' layerlab file reader).

Layout: the ragged per-(muI,muO)-pair coefficient lists stay as pbrt stores
them — one flat `a` array + per-pair (offset, order m) tables — since a
dense [nMu^2, C, mMax] padding would blow up HBM for glossy tables.  The
4x4 spline-neighborhood accumulation of `ak` becomes 16 batched gathers of
[N, C, mMax] masked by k < m(pair); series evaluation and phi sampling use
the shared recurrences in core/interpolation.py (fourier_eval /
sample_fourier).  Tables ride on MaterialTable.fourier as pytree leaves
with static (n_mu, m_max, n_channels, eta) so each table's loop bounds are
compile-time constants.

Transport-mode note: the wavefront integrators trace radiance (camera)
paths, so the eta^2 radiance-mode scale (reflection.cpp FourierBSDF::f)
is applied when mu_i * mu_o > 0; BDPT light subpaths pass
mode_radiance=False via the mat dict ("transport_importance").
"""
from __future__ import annotations

import struct

import numpy as np
import jax.numpy as jnp

from ..core import interpolation as itp
from ..core.pytree import pytree_dataclass, static_field


@pytree_dataclass
class FourierTable:
    """Device-resident FourierBSDFTable (reflection.h:130-156)."""

    mu: jnp.ndarray  # [nMu] zenith cosine nodes
    cdf: jnp.ndarray  # [nMu, nMu] per-muO marginal CDF over muI
    a0: jnp.ndarray  # [nMu, nMu] 0th-order coefficients (luminance)
    m: jnp.ndarray  # [nMu*nMu] i32 per-pair series order
    a_offset: jnp.ndarray  # [nMu*nMu] i32 offset into `a`
    a: jnp.ndarray  # [nCoeffs + mMax] f32 coefficients (zero pad tail)
    n_mu: int = static_field(default=0)
    m_max: int = static_field(default=0)
    n_channels: int = static_field(default=1)
    eta: float = static_field(default=1.0)


def read_bsdf(path: str) -> FourierTable:
    """Parse a 'SCATFUN' v1 .bsdf file (materials/fourier.cpp:105-198).

    Host-side numpy; raises ValueError on unsupported layouts (textured
    nBases != 1, harmonic extrapolation), matching the reference's bails.
    """
    raw = open(path, "rb").read()
    if raw[:8] != b"SCATFUN\x01":
        raise ValueError(f"{path}: not a SCATFUN v1 BSDF file")
    flags, n_mu, n_coeffs, m_max, n_channels, n_bases = struct.unpack(
        "<6i", raw[8:32])
    eta = struct.unpack("<f", raw[44:48])[0]
    if flags != 1 or n_channels not in (1, 3) or n_bases != 1:
        raise ValueError(f"{path}: unsupported BSDF file layout")
    off = 64
    mu = np.frombuffer(raw, np.float32, n_mu, off)
    off += 4 * n_mu
    cdf = np.frombuffer(raw, np.float32, n_mu * n_mu, off).reshape(n_mu, n_mu)
    off += 4 * n_mu * n_mu
    offset_and_length = np.frombuffer(raw, np.int32, n_mu * n_mu * 2, off)
    off += 8 * n_mu * n_mu
    a = np.frombuffer(raw, np.float32, n_coeffs, off)
    a_offset = offset_and_length[0::2].copy()
    m = offset_and_length[1::2].copy()
    a0 = np.where(m > 0, a[np.clip(a_offset, 0, n_coeffs - 1)], 0.0).reshape(
        n_mu, n_mu).astype(np.float32)
    a_pad = np.concatenate(
        [a, np.zeros(3 * m_max, np.float32)])  # safe k-overrun gathers
    return FourierTable(
        mu=jnp.asarray(mu), cdf=jnp.asarray(cdf), a0=jnp.asarray(a0),
        m=jnp.asarray(m), a_offset=jnp.asarray(a_offset),
        a=jnp.asarray(a_pad),
        n_mu=int(n_mu), m_max=int(m_max), n_channels=int(n_channels),
        eta=float(eta),
    )


def _cos_d_phi(wa, wb):
    """CosDPhi (geometry.h): azimuth-difference cosine of two directions."""
    waxy = wa[..., 0] ** 2 + wa[..., 1] ** 2
    wbxy = wb[..., 0] ** 2 + wb[..., 1] ** 2
    num = wa[..., 0] * wb[..., 0] + wa[..., 1] * wb[..., 1]
    den = jnp.sqrt(jnp.maximum(waxy * wbxy, 1e-20))
    ok = (waxy > 0) & (wbxy > 0)
    return jnp.where(ok, jnp.clip(num / den, -1.0, 1.0), 1.0)


def _accumulate_ak(tbl: FourierTable, mu_i, mu_o):
    """Weighted 4x4-neighborhood sum of coefficient series (reflection.cpp
    FourierBSDF::f 'Accumulate weighted sums of nearby ak').

    Returns (ak [N, C, mMax], m_active [N], valid [N]).
    """
    n = mu_i.shape[0]
    c = tbl.n_channels
    off_i, w_i, valid_i = itp.catmull_rom_weights(tbl.mu, mu_i)
    off_o, w_o, valid_o = itp.catmull_rom_weights(tbl.mu, mu_o)
    ks = jnp.arange(tbl.m_max)
    ak = jnp.zeros((n, c, tbl.m_max), jnp.float32)
    m_active = jnp.zeros((n,), jnp.int32)
    for b in range(4):
        for ai in range(4):
            oi = jnp.clip(off_i + ai, 0, tbl.n_mu - 1)
            oo = jnp.clip(off_o + b, 0, tbl.n_mu - 1)
            pair = oo * tbl.n_mu + oi
            w = w_i[..., ai] * w_o[..., b]
            m_p = tbl.m[pair]
            base = tbl.a_offset[pair]
            live = w != 0.0
            m_active = jnp.maximum(
                m_active, jnp.where(live, m_p, 0))
            idx = (base[:, None, None]
                   + jnp.arange(c)[None, :, None] * m_p[:, None, None]
                   + ks[None, None, :])
            coef = tbl.a[jnp.clip(idx, 0, tbl.a.shape[0] - 1)]
            coef = jnp.where(ks[None, None, :] < m_p[:, None, None], coef, 0.0)
            ak = ak + jnp.where(live[:, None, None], w[:, None, None] * coef, 0.0)
    return ak, m_active, valid_i & valid_o


def _rgb_from_series(tbl, ak, m_active, cos_phi, mu_i, mu_o, radiance):
    """Shared tail of f/Sample_f: series -> scaled RGB (reflection.cpp)."""
    y = jnp.maximum(itp.fourier_eval(ak[:, 0, :], cos_phi, m_active), 0.0)
    scale = jnp.where(mu_i != 0.0, 1.0 / jnp.maximum(jnp.abs(mu_i), 1e-20), 0.0)
    if radiance and tbl.eta != 1.0:
        eta = jnp.where(mu_i > 0, 1.0 / tbl.eta, tbl.eta)
        scale = scale * jnp.where(mu_i * mu_o > 0, eta * eta, 1.0)
    if tbl.n_channels == 1:
        return jnp.repeat((y * scale)[..., None], 3, axis=-1)
    r = itp.fourier_eval(ak[:, 1, :], cos_phi, m_active)
    b = itp.fourier_eval(ak[:, 2, :], cos_phi, m_active)
    g = 1.39829 * y - 0.100913 * b - 0.297375 * r
    rgb = jnp.stack([r, g, b], axis=-1) * scale[..., None]
    return jnp.maximum(rgb, 0.0)


def table_f(tbl: FourierTable, wo, wi, radiance=True):
    """FourierBSDF::f + ::Pdf for one table.  Returns (f [N,3], pdf [N])."""
    mu_i = -wi[..., 2]
    mu_o = wo[..., 2]
    cos_phi = _cos_d_phi(-wi, wo)
    ak, m_active, valid = _accumulate_ak(tbl, mu_i, mu_o)
    f = _rgb_from_series(tbl, ak, m_active, cos_phi, mu_i, mu_o, radiance)
    f = jnp.where(valid[..., None], f, 0.0)
    # Pdf (reflection.cpp FourierBSDF::Pdf): Y / (weighted rho over muO row).
    off_o, w_o, _ = itp.catmull_rom_weights(tbl.mu, mu_o)
    rho = jnp.zeros_like(mu_o)
    for b in range(4):
        oo = jnp.clip(off_o + b, 0, tbl.n_mu - 1)
        rho = rho + w_o[..., b] * tbl.cdf[oo, tbl.n_mu - 1] * (2.0 * jnp.pi)
    y = itp.fourier_eval(ak[:, 0, :], cos_phi, m_active)
    pdf = jnp.where(valid & (rho > 0) & (y > 0),
                    y / jnp.where(rho == 0, 1.0, rho), 0.0)
    return f, pdf


def table_sample(tbl: FourierTable, wo, u, radiance=True):
    """FourierBSDF::Sample_f for one table.

    Returns dict(wi, f, pdf) — non-specular (is_specular=False lanes).
    """
    mu_o = wo[..., 2]
    mu_i, _, pdf_mu = itp.sample_catmull_rom_2d(
        tbl.mu, tbl.mu, tbl.a0, tbl.cdf, mu_o, u[..., 1])
    ak, m_active, valid = _accumulate_ak(tbl, mu_i, mu_o)
    y, pdf_phi, phi = itp.sample_fourier(ak[:, 0, :], u[..., 0], m_active)
    pdf = jnp.maximum(pdf_phi * pdf_mu, 0.0)
    sin2_i = jnp.maximum(0.0, 1.0 - mu_i * mu_i)
    sin2_o = jnp.maximum(0.0, 1.0 - mu_o * mu_o)
    norm = jnp.sqrt(sin2_i / jnp.maximum(sin2_o, 1e-20))
    norm = jnp.where(sin2_o <= 0.0, 0.0, norm)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    wi = -jnp.stack([
        norm * (cp * wo[..., 0] - sp * wo[..., 1]),
        norm * (sp * wo[..., 0] + cp * wo[..., 1]),
        mu_i,
    ], axis=-1)
    wi = wi / jnp.maximum(
        jnp.sqrt(jnp.sum(wi * wi, -1, keepdims=True)), 1e-20)
    f = _rgb_from_series(tbl, ak, m_active, cp, mu_i, mu_o, radiance)
    ok = valid & (pdf > 0)
    return {
        "wi": wi,
        "f": jnp.where(ok[..., None], f, 0.0),
        "pdf": jnp.where(ok, pdf, 0.0),
    }


# ---------------------------------------------------------------------------
# Dispatch glue for materials/bsdf.py: loop over the scene's (static) tuple
# of tables, masking lanes by fourier_id.
# ---------------------------------------------------------------------------

def fourier_eval(mat, wo, wi):
    """(f [N,3], pdf [N]) across all fourier tables in the material table."""
    f = jnp.zeros(wo.shape, jnp.float32)
    pdf = jnp.zeros(wo.shape[:-1], jnp.float32)
    radiance = not mat.get("transport_importance", False)
    for ti, tbl in enumerate(mat["fourier_tables"]):
        f_t, pdf_t = table_f(tbl, wo, wi, radiance)
        sel = mat["fourier_id"] == ti
        f = jnp.where(sel[..., None], f_t, f)
        pdf = jnp.where(sel, pdf_t, pdf)
    return f, pdf


def fourier_sample(mat, wo, u):
    """Sampled dict across all fourier tables (lanes masked by table id)."""
    out = {
        "wi": jnp.zeros(wo.shape, jnp.float32),
        "f": jnp.zeros(wo.shape, jnp.float32),
        "pdf": jnp.zeros(wo.shape[:-1], jnp.float32),
    }
    radiance = not mat.get("transport_importance", False)
    for ti, tbl in enumerate(mat["fourier_tables"]):
        s = table_sample(tbl, wo, u, radiance)
        sel = mat["fourier_id"] == ti
        for k in out:
            m = sel[..., None] if out[k].ndim > sel.ndim else sel
            out[k] = jnp.where(m, s[k], out[k])
    return out
