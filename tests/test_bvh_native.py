"""Native C++ BVH builder vs numpy oracle: identical arrays."""
import numpy as np
import pytest

from pbrt_tpu.accel import build as bb


def _random_bounds(n, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.randn(n, 3) * 5
    e = rs.rand(n, 3) * 0.5
    return c - e, c + e


@pytest.mark.skipif(not bb._native_lib(), reason="libbvh.so not built")
@pytest.mark.parametrize("n", [1, 2, 7, 100, 2000])
def test_native_matches_numpy(n):
    bmin, bmax = _random_bounds(n, seed=n)
    a = bb.build_bvh(bmin, bmax, prefer_native=False)
    b = bb.build_bvh_native(bmin, bmax)
    np.testing.assert_array_equal(a.order, b.order)
    np.testing.assert_array_equal(a.offset, b.offset)
    np.testing.assert_array_equal(a.n_prims, b.n_prims)
    np.testing.assert_array_equal(a.axis, b.axis)
    np.testing.assert_allclose(a.nodes_min, b.nodes_min, rtol=1e-6)
    np.testing.assert_allclose(a.nodes_max, b.nodes_max, rtol=1e-6)


@pytest.mark.skipif(not bb._native_lib(), reason="libbvh.so not built")
def test_native_speed_smoke():
    import time

    bmin, bmax = _random_bounds(200_000, seed=1)
    t0 = time.time()
    out = bb.build_bvh_native(bmin, bmax)
    dt = time.time() - t0
    assert out.n_nodes > 100_000
    assert dt < 5.0, dt  # numpy takes ~60s at this size
