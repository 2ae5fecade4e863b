"""Tabulated BSSRDF tests (core/bssrdf.{h,cpp} parity).

Statistical tests in the style of src/tests/bsdfs.cpp: closed-form or
quadrature ground truths for the photon-beam-diffusion tables, the Sr
sampling routines, and the Sw directional term, plus an end-to-end
subsurface render smoke test (the reference has no direct BSSRDF unit
tests; analytic_scenes.cpp is the model for the render check).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu import film as fm
from pbrt_tpu import scene as sc
from pbrt_tpu.cameras import make_perspective_camera
from pbrt_tpu.core import transform as tf
from pbrt_tpu.integrators import path as pt
from pbrt_tpu.materials import bssrdf as bsx
from pbrt_tpu.samplers.samplers import SamplerConfig


def _table(g=0.0, eta=1.33):
    return bsx.compute_beam_diffusion_bssrdf(g, eta)


def test_beam_diffusion_table_properties():
    """ComputeBeamDiffusionBSSRDF (bssrdf.cpp:146-178): rhoEff must be a
    monotone map of single-scattering albedo, profile nonnegative, radius
    grid geometric with ratio 1.2."""
    tbl = _table()
    assert tbl["profile"].shape == (bsx.N_RHO, bsx.N_RADIUS)
    assert np.all(np.diff(tbl["rho_eff"]) >= 0)
    assert tbl["rho_eff"][0] == 0.0
    assert np.all(tbl["profile"] >= -1e-6)
    r = tbl["radius"]
    np.testing.assert_allclose(r[3:] / r[2:-1], 1.2, rtol=1e-5)


def test_pdf_sr_normalization():
    """Pdf_Sr (bssrdf.cpp:367-392) is a polar-measure density:
    int_0^inf Pdf_Sr(r) 2 pi r dr == 1 per channel."""
    tbl = _table()
    rn, dn = jnp.asarray(tbl["rho"]), jnp.asarray(tbl["radius"])
    pf, re = jnp.asarray(tbl["profile"]), jnp.asarray(tbl["rho_eff"])
    n = 4000
    r = jnp.asarray(np.geomspace(1e-5, 80.0, n), jnp.float32)
    sigma_t = jnp.broadcast_to(jnp.asarray([1.0, 2.0, 4.0]), (n, 3))
    rho = jnp.broadcast_to(jnp.asarray([0.3, 0.5, 0.8]), (n, 3))
    pdf = bsx.pdf_sr(rn, dn, pf, re, jnp.zeros(n, jnp.int32), sigma_t, rho, r)
    integ = np.trapezoid(
        np.asarray(pdf) * 2 * np.pi * np.asarray(r)[:, None],
        np.asarray(r), axis=0)
    np.testing.assert_allclose(integ, 1.0, atol=5e-3)


def test_sample_sr_matches_pdf():
    """Sample_Sr draws must reproduce quadrature moments of Pdf_Sr
    (importance-sampling consistency, the hair.cpp:197 test pattern)."""
    tbl = _table()
    rn, dn = jnp.asarray(tbl["rho"]), jnp.asarray(tbl["radius"])
    pf, cd = jnp.asarray(tbl["profile"]), jnp.asarray(tbl["cdf"])
    re = jnp.asarray(tbl["rho_eff"])
    n = 100_000
    u = jnp.asarray((np.arange(n) + 0.5) / n, jnp.float32)
    rs = np.asarray(bsx.sample_sr(
        rn, dn, pf, cd, jnp.zeros(n, jnp.int32),
        jnp.full(n, 2.0), jnp.full(n, 0.5), u))
    assert (rs >= 0).all()
    m = 4000
    r = jnp.asarray(np.geomspace(1e-5, 80.0, m), jnp.float32)
    pdf = bsx.pdf_sr(rn, dn, pf, re, jnp.zeros(m, jnp.int32),
                     jnp.full((m, 3), 2.0), jnp.full((m, 3), 0.5), r)
    mean_quad = np.trapezoid(
        np.asarray(pdf)[:, 0] * 2 * np.pi * np.asarray(r) ** 2, np.asarray(r))
    np.testing.assert_allclose(rs.mean(), mean_quad, rtol=2e-3)


def test_sw_white_furnace():
    """Sw normalization (bssrdf.h:89-92): the 1/(c*pi) constant is chosen so
    int_{H^2} Sw(w) cos(theta) dw == 1 exactly."""
    ct = np.linspace(0, 1, 20001)[1:]
    for eta in (1.33, 1.5):
        sw = np.asarray(bsx.sw(jnp.full(ct.shape, eta, jnp.float32),
                               jnp.asarray(ct, jnp.float32)))
        integ = 2 * np.pi * np.trapezoid(sw * ct, ct)
        np.testing.assert_allclose(integ, 1.0, atol=1e-3)


def test_kdsubsurface_inversion_roundtrip():
    """SubsurfaceFromDiffuse (bssrdf.cpp:180-189): inverting rhoEff for a
    target diffuse Kd then mapping the resulting albedo forward through the
    rhoEff curve must recover Kd."""
    tbl = _table()
    for kd in (0.2, 0.5, 0.8):
        sig_a, sig_s = bsx.subsurface_from_diffuse(
            tbl, np.full(3, kd), np.ones(3))
        rho = sig_s / (sig_a + sig_s)
        rho_eff = np.interp(rho[0], tbl["rho"], tbl["rho_eff"])
        np.testing.assert_allclose(rho_eff, kd, atol=2e-3)
        np.testing.assert_allclose(sig_a + sig_s, 1.0, rtol=1e-5)


@pytest.mark.slow
def test_subsurface_render_smoke():
    """End-to-end: a subsurface sphere inside an emissive surround renders
    finite, nonzero, and below the emitter radiance (no energy creation)."""
    res = (8, 8)
    b = sc.SceneBuilder()
    black = b.add_material(sc.MAT_MATTE, kd=(0.0, 0.0, 0.0))
    ss = b.add_material(
        sc.MAT_SUBSURFACE,
        kr=(1.0, 1.0, 1.0), kt=(1.0, 1.0, 1.0), eta=1.33,
        roughness=0.0, urough=0.0, vrough=0.0,
        ss_sigma_a=(0.1, 0.1, 0.1), ss_sigma_s=(10.0, 10.0, 10.0),
        ss_g=0.0, ss_scale=1.0,
    )
    b.add_sphere(tf.translate(0.0, 0.0, 2.0), 0.5, material=ss)
    b.add_emissive_sphere(
        tf.identity(), 10.0, L=(1.0, 1.0, 1.0), material=black,
        two_sided=True)
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), res, fov_deg=30.0)
    img = np.asarray(pt.render(
        scene, cam, fm.FilmConfig(full_resolution=res),
        SamplerConfig("sobol", 16, res),
        pt.PathConfig(max_depth=3, ss_probe_depth=2),
    ))
    assert np.isfinite(img).all()
    # Center pixels see the subsurface sphere: lit, but not brighter than
    # the surrounding emitter.
    center = img[3:5, 3:5].mean()
    assert 0.05 < center < 1.5, center
