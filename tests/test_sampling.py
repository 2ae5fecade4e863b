"""Distribution1D/2D exactness + warp sanity (src/tests/sampling.cpp style)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import sampling as smp


def test_distribution1d_discrete_exact():
    f = np.array([1.0, 2.0, 0.0, 3.0])
    d = smp.build_distribution_1d(f)
    assert abs(float(d.func_int) - (6.0 / 4)) < 1e-6
    # Sample many uniforms; empirical pmf must be exact by CDF construction.
    u = jnp.linspace(0, 1, 10001)[:-1] + 1e-5
    off, pmf, _ = smp.sample_discrete_1d(d, u)
    off = np.asarray(off)
    counts = np.bincount(off, minlength=4) / len(off)
    np.testing.assert_allclose(counts, [1 / 6, 2 / 6, 0, 3 / 6], atol=2e-3)
    pmf = np.asarray(pmf)
    want_pmf = np.array([1 / 6, 2 / 6, 0, 3 / 6])
    np.testing.assert_allclose(pmf, want_pmf[off], rtol=1e-5)


def test_distribution1d_continuous_pdf_integrates():
    f = np.array([0.5, 1.5, 2.0, 0.0, 1.0])
    d = smp.build_distribution_1d(f)
    u = jnp.asarray(np.random.RandomState(7).rand(4000), jnp.float32)
    x, pdf, _ = smp.sample_continuous_1d(d, u)
    x, pdf = np.asarray(x), np.asarray(pdf)
    assert (x >= 0).all() and (x < 1).all()
    # E[1/pdf] = measure of the support: 4 of 5 bins have func > 0.
    np.testing.assert_allclose(
        np.mean(1.0 / np.maximum(pdf, 1e-9)), 0.8, rtol=2e-2
    )


def test_distribution2d_sample_pdf_consistency():
    rs = np.random.RandomState(0)
    f = rs.rand(8, 16) + 0.01
    d = smp.build_distribution_2d(f)
    u = jnp.asarray(rs.rand(4096, 2), jnp.float32)
    p, pdf = smp.sample_continuous_2d(d, u)
    pdf2 = smp.pdf_2d(d, p)
    # pdf returned by sampling = conditional*marginal; pdf_2d = func/marg_int.
    # They agree up to the per-cell normalization identity.
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-3)
    # MC estimate of integral of 1 = 1.
    np.testing.assert_allclose(
        np.mean(1.0 / np.maximum(np.asarray(pdf), 1e-9)), 1.0, rtol=5e-2
    )


def test_concentric_disk_in_unit_disk():
    rs = np.random.RandomState(1)
    u = jnp.asarray(rs.rand(1000, 2), jnp.float32)
    p = np.asarray(smp.concentric_sample_disk(u))
    r = np.hypot(p[:, 0], p[:, 1])
    assert (r <= 1.0 + 1e-6).all()
    # Center of mass ~ 0 for uniform disk.
    assert np.abs(p.mean(0)).max() < 0.05


def test_cosine_hemisphere_mean_cos():
    rs = np.random.RandomState(2)
    u = jnp.asarray(rs.rand(20000, 2), jnp.float32)
    w = np.asarray(smp.cosine_sample_hemisphere(u))
    assert (w[:, 2] >= 0).all()
    # E[cos theta] under pdf cos/pi over hemisphere = 2/3.
    np.testing.assert_allclose(w[:, 2].mean(), 2.0 / 3.0, atol=0.01)


def test_uniform_triangle_barycentrics():
    rs = np.random.RandomState(3)
    u = jnp.asarray(rs.rand(1000, 2), jnp.float32)
    b = np.asarray(smp.uniform_sample_triangle(u))
    assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()


def test_power_heuristic():
    assert abs(float(smp.power_heuristic(1, 1.0, 1, 1.0)) - 0.5) < 1e-6
    assert float(smp.power_heuristic(1, 10.0, 1, 0.0)) == 1.0
    assert float(smp.power_heuristic(1, 0.0, 1, 10.0)) == 0.0
