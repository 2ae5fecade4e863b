"""Double-single (two-float) f64 emulation vs numpy float64.

core/dsfloat.py supplies pbrt's two native-double refuges (efloat.h Quadratic
discriminant; triangle.cpp:243-250 edge-function re-evaluation) on f64-less
TPU lanes.  These tests check the emulation against real float64 on the
exact quantities the renderer uses.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import dsfloat as ds


def _rand(n, lo=-1e3, hi=1e3, seed=0):
    rs = np.random.RandomState(seed)
    return rs.uniform(lo, hi, n).astype(np.float32)


def test_two_prod_exact():
    a = _rand(4096, seed=1)
    b = _rand(4096, seed=2)
    p, err = ds.two_prod(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(err, np.float64)
    # Dekker's TwoProduct is exact: p + err == a*b in f64 (the product of two
    # f32 fits in f64 exactly).
    np.testing.assert_array_equal(got, exact)


def test_two_sum_exact():
    a = _rand(4096, seed=3)
    b = _rand(4096, seed=4) * 1e-5  # force cancellation-scale addends
    s, err = ds.two_sum(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) + b.astype(np.float64)
    got = np.asarray(s, np.float64) + np.asarray(err, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_discriminant_matches_f64():
    """b^2-4ac on catastrophically-cancelling quadric-style coefficients."""
    rs = np.random.RandomState(7)
    # Grazing-sphere regime: b^2 ~ 4ac so the f32 discriminant loses all
    # its bits.  a ~ |d|^2 = 1, c = |o|^2 - r^2.
    a = np.ones(8192, np.float32)
    r = rs.uniform(0.5, 2.0, 8192).astype(np.float32)
    t = rs.uniform(1.0, 50.0, 8192).astype(np.float32)
    miss = rs.uniform(-1e-3, 1e-3, 8192).astype(np.float32)
    b = (-2.0 * t).astype(np.float32)
    c = (t.astype(np.float64) ** 2 - r.astype(np.float64) ** 2
         + miss.astype(np.float64)).astype(np.float32)
    dh, dl = ds.dd_discriminant(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    exact = (b.astype(np.float64) ** 2
             - 4.0 * a.astype(np.float64) * c.astype(np.float64))
    got = np.asarray(dh, np.float64) + np.asarray(dl, np.float64)
    np.testing.assert_array_equal(got, exact)  # |b|,|a|,|c| < 2^24: exact
    # Sign agreement (the hit/miss decision) must be perfect.
    assert np.all(np.sign(got) == np.sign(exact))


def test_dd_sqrt_matches_f64_rounding():
    rs = np.random.RandomState(11)
    a = np.ones(8192, np.float32)
    b = rs.uniform(-100, -1, 8192).astype(np.float32)
    c = rs.uniform(0.0, 1.0, 8192).astype(np.float32) * (b * b / 4.0)
    dh, dl = ds.dd_discriminant(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    root = np.asarray(ds.dd_sqrt_to_f32(dh, dl))
    exact = np.sqrt(
        b.astype(np.float64) ** 2 - 4 * a.astype(np.float64) * c.astype(np.float64)
    ).astype(np.float32)
    # f32 rounding of the f64 sqrt, to 1 ulp (the Newton step's residual).
    ulp = np.spacing(exact)
    assert np.all(np.abs(root - exact) <= ulp), (
        np.abs(root - exact).max(), ulp.min())
    match = (root == exact).mean()
    assert match > 0.999, match


def test_dd_cross2_matches_f64():
    """Edge-function fallback: exact 2D cross vs f64 on near-degenerate
    configurations (points nearly collinear with the origin)."""
    rs = np.random.RandomState(13)
    ax = rs.uniform(-10, 10, 8192).astype(np.float32)
    ay = rs.uniform(-10, 10, 8192).astype(np.float32)
    s = rs.uniform(0.99999, 1.00001, 8192).astype(np.float32)
    bx, by = (s * ax).astype(np.float32), (s * ay).astype(np.float32)
    got = np.asarray(ds.dd_cross2_f32(
        jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(bx), jnp.asarray(by)))
    exact = (ax.astype(np.float64) * by.astype(np.float64)
             - ay.astype(np.float64) * bx.astype(np.float64))
    exact32 = exact.astype(np.float32)
    # Same sign everywhere (the watertightness decision)...
    assert np.all(np.sign(got) == np.sign(exact32))
    # ...and f32-equal to the f64 result.
    np.testing.assert_allclose(got, exact32, rtol=1e-6, atol=0)
