"""Chi-square BSDF sampling tests (src/tests/bsdfs.cpp:20-216,556).

The reference's core statistical validation, re-expressed for the SoA
material kernels: draw 10^6 directions from sample_material, histogram them
on a 10x20 (theta, phi) grid, integrate the analytic pdf (eval_material's
mixture pdf x sin(theta)) over each cell with per-cell Gauss-Legendre, then run a
chi-square goodness-of-fit test at significance 0.01 with Dunn-Sidak
correction over 5 runs — exactly bsdfs.cpp's parameters (CHI2_RUNS=5,
CHI2_THETA_RES=10, CHI2_PHI_RES=2*10, CHI2_SAMPLECOUNT=10^6,
CHI2_MINFREQ=5, CHI2_SLEVEL=0.01).

Covered lobes: Lambertian (matte sigma=0), Oren-Nayar (matte sigma=20),
plastic (cosine + TR-visible mixture) at two roughnesses, metal
(TR visible-normal sampling), substrate (FresnelBlend's dedicated sampling),
disney — each at two outgoing directions.  This validates both the per-lobe
warps AND pbrt's lobe-mixture contract (choose by floor(u0*n), remap u0,
pdf averaged — reflection.cpp:714-764), since the histogram is against the
material-level mixture pdf.
"""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pbrt_tpu import scene as sc
from pbrt_tpu.materials import bsdf as bx

THETA_RES = 10
PHI_RES = 2 * THETA_RES
SAMPLE_COUNT = 1_000_000
MIN_FREQ = 5.0
RUNS = 5
SIG_LEVEL = 0.01


def _chi2_pvalue(chi2, dof):
    try:
        from scipy.special import gammaincc
        return float(gammaincc(dof / 2.0, chi2 / 2.0))
    except ImportError:  # torch fallback (cpu build is baked in)
        import torch
        return float(torch.special.gammaincc(
            torch.tensor(dof / 2.0, dtype=torch.float64),
            torch.tensor(chi2 / 2.0, dtype=torch.float64)))


def _make_mat(mat_type, n, **over):
    """A length-n SoA material dict with the given type and overrides."""
    from pbrt_tpu.materials.microfacet import roughness_to_alpha

    d = {
        "type": jnp.full((n,), mat_type, jnp.int32),
        "kd": jnp.full((n, 3), 0.5, jnp.float32),
        "ks": jnp.full((n, 3), 0.5, jnp.float32),
        "kr": jnp.full((n, 3), 0.9, jnp.float32),
        "kt": jnp.full((n, 3), 0.9, jnp.float32),
        "sigma": jnp.zeros((n,), jnp.float32),
        "eta": jnp.full((n,), 1.5, jnp.float32),
        "metal_eta": jnp.full((n, 3), 0.2, jnp.float32),
        "metal_k": jnp.full((n, 3), 3.9, jnp.float32),
        "opacity": jnp.ones((n, 3), jnp.float32),
        "is_rough": jnp.ones((n,), bool),
        "disney": jnp.zeros((n, 12), jnp.float32),
        "hair": jnp.zeros((n, 6), jnp.float32),
    }
    rough = float(over.pop("roughness", 0.1))
    remap = bool(over.pop("remap", True))
    # pbrt remaps roughness -> alpha (microfacet.h:122); gather_material does
    # this once per lane — replicate it here.
    a = float(np.asarray(roughness_to_alpha(jnp.float32(rough)))) if remap else rough
    d["ax"] = jnp.full((n,), a, jnp.float32)
    d["ay"] = jnp.full((n,), a, jnp.float32)
    for k, v in over.items():
        arr = jnp.asarray(v, jnp.float32)
        d[k] = jnp.broadcast_to(arr, (n,) + arr.shape).astype(jnp.float32) \
            if arr.ndim else jnp.full((n,), float(v), jnp.float32)
    return d


def _histogram(wi, valid):
    """Counts on the (theta, phi) grid over the full sphere."""
    wi = np.asarray(wi, np.float64)
    theta = np.arccos(np.clip(wi[:, 2], -1.0, 1.0))
    phi = np.arctan2(wi[:, 1], wi[:, 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    ti = np.minimum((theta / np.pi * THETA_RES).astype(int), THETA_RES - 1)
    pi_ = np.minimum((phi / (2 * np.pi) * PHI_RES).astype(int), PHI_RES - 1)
    idx = ti * PHI_RES + pi_
    counts = np.bincount(idx[np.asarray(valid)], minlength=THETA_RES * PHI_RES)
    return counts.astype(np.float64)


GL_ORDER = 16


def _expected(mat_1, wo, mat_types, n_total):
    """Integral of the material pdf over each (theta,phi) cell x n_total
    draws (pbrt normalizes by SAMPLECOUNT, bsdfs.cpp — the pdf's missing
    mass is exactly the invalid/rejected sample fraction).

    Quadrature: per-cell tensor Gauss-Legendre with interior nodes — the
    pdf's only discontinuity (the hemisphere boundary) lies exactly on cell
    edges (THETA_RES is even), so interior-node quadrature never samples it;
    Simpson's boundary nodes would leak reflected-lobe mass into
    below-horizon cells."""
    x, w = np.polynomial.legendre.leggauss(GL_ORDER)
    x = (x + 1.0) / 2.0  # -> (0,1)
    w = w / 2.0
    dt = np.pi / THETA_RES
    dp = 2 * np.pi / PHI_RES
    # All cells x all nodes in one batch.
    ti = np.arange(THETA_RES)[:, None] * dt
    pj = np.arange(PHI_RES)[:, None] * dp
    theta_n = (ti + x[None, :] * dt)  # [T, G]
    phi_n = (pj + x[None, :] * dp)  # [P, G]
    tg = theta_n[:, None, :, None]  # [T,1,G,1]
    pg = phi_n[None, :, None, :]  # [1,P,1,G]
    tg, pg = np.broadcast_arrays(tg, pg)
    st, ct = np.sin(tg), np.cos(tg)
    wi = np.stack([st * np.cos(pg), st * np.sin(pg), ct], -1).reshape(-1, 3)

    m = wi.shape[0]
    mat = {k: (jnp.broadcast_to(v[:1], (m,) + v.shape[1:])
               if hasattr(v, "ndim") else v) for k, v in mat_1.items()}
    wo_b = jnp.broadcast_to(jnp.asarray(wo, jnp.float32)[None], (m, 3))
    _, pdf = bx.eval_material(mat, wo_b, jnp.asarray(wi, jnp.float32),
                              mat_types)
    integrand = (np.asarray(pdf, np.float64) * np.sin(tg).ravel()).reshape(
        THETA_RES, PHI_RES, GL_ORDER, GL_ORDER
    )
    cells = np.einsum("tpgh,g,h->tp", integrand, w * dt, w * dp)
    return cells.ravel() * n_total


def _chi2_run(mat_type, overrides, wo, seed, mat_types):
    rs = np.random.RandomState(seed)
    u = jnp.asarray(rs.rand(SAMPLE_COUNT, 2), jnp.float32)
    mat = _make_mat(mat_type, SAMPLE_COUNT, **overrides)
    wo_b = jnp.broadcast_to(jnp.asarray(wo, jnp.float32)[None],
                            (SAMPLE_COUNT, 3))
    bs = jax.jit(bx.sample_material, static_argnames=("mat_types",))(
        mat, wo_b, u, mat_types
    )
    valid = np.asarray(bs["valid"]) & np.asarray(bs["pdf"] > 0)
    counts = _histogram(bs["wi"], valid)
    expected = _expected(
        {k: v[:1] for k, v in mat.items()}, wo, mat_types, SAMPLE_COUNT
    )

    # Pool cells below the minimum expected frequency (bsdfs.cpp:120-150
    # pools into neighbours; pooling into one bucket is the standard
    # equivalent and keeps the statistic conservative).
    big = expected >= MIN_FREQ
    obs = np.concatenate([counts[big], [counts[~big].sum()]])
    exp = np.concatenate([expected[big], [expected[~big].sum()]])
    if exp[-1] < MIN_FREQ:
        # The pooled low-frequency bucket is itself below MIN_FREQ: fold it
        # into the largest remaining cell instead of dropping it, so obs and
        # exp keep equal total mass (dropping it compared unequal totals).
        obs, pool_o = obs[:-1], obs[-1]
        exp, pool_e = exp[:-1], exp[-1]
        j = int(np.argmax(exp))
        obs = obs.astype(np.float64).copy()
        exp = exp.astype(np.float64).copy()
        obs[j] += pool_o
        exp[j] += pool_e
    chi2 = float(np.sum((obs - exp) ** 2 / np.maximum(exp, 1e-9)))
    dof = len(obs) - 1
    return _chi2_pvalue(chi2, dof), chi2, dof


def _run_chi2(mat_type, overrides, wo, mat_types):
    # Dunn-Sidak over all runs of this test (bsdfs.cpp:41,205).
    alpha = 1.0 - (1.0 - SIG_LEVEL) ** (1.0 / RUNS)
    pvals = []
    for run in range(RUNS):
        p, chi2, dof = _chi2_run(mat_type, overrides, wo, 1000 + run,
                                 mat_types)
        pvals.append(p)
        assert p >= alpha, (
            f"chi2 reject: p={p:.2e} < {alpha:.2e} "
            f"(chi2={chi2:.1f}, dof={dof}, run {run})"
        )
    return pvals


WO_A = np.array([0.0, 0.0, 1.0]) * 0.6 + np.array([0.8, 0.0, 0.0])  # oblique
WO_A = WO_A / np.linalg.norm(WO_A)
WO_B = np.array([0.3, -0.2, 0.93])
WO_B = WO_B / np.linalg.norm(WO_B)


def test_chi2_lambertian():
    _run_chi2(sc.MAT_MATTE, dict(sigma=0.0), WO_A, (sc.MAT_MATTE,))


def test_chi2_oren_nayar():
    # Oren-Nayar samples cosine-hemisphere (pdf is cosine) — checks the
    # sampling/pdf pairing, not the f shape.
    _run_chi2(sc.MAT_MATTE, dict(sigma=20.0), WO_B, (sc.MAT_MATTE,))


def test_chi2_plastic_mixture_rough():
    _run_chi2(sc.MAT_PLASTIC, dict(roughness=0.3), WO_A, (sc.MAT_PLASTIC,))


@pytest.mark.slow
def test_chi2_plastic_mixture_glossy():
    _run_chi2(sc.MAT_PLASTIC, dict(roughness=0.1), WO_B, (sc.MAT_PLASTIC,))


def test_chi2_metal_tr_visible():
    _run_chi2(sc.MAT_METAL, dict(roughness=0.2), WO_A, (sc.MAT_METAL,))


@pytest.mark.slow
def test_chi2_metal_glancing_wo():
    wo = np.array([0.95, 0.0, 0.3121])
    wo = wo / np.linalg.norm(wo)
    _run_chi2(sc.MAT_METAL, dict(roughness=0.35), wo, (sc.MAT_METAL,))


@pytest.mark.slow
def test_chi2_substrate_fresnel_blend():
    _run_chi2(sc.MAT_SUBSTRATE, dict(roughness=0.25), WO_A,
              (sc.MAT_SUBSTRATE,))
