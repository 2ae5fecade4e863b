"""Sampler tests: stratification properties + determinism (sampling.cpp style)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.samplers import samplers as sa

RES = (16, 16)


def _states(name, spp, n_pixels=4, sample_range=None):
    cfg = sa.SamplerConfig(name, spp, RES)
    spl = spp if sample_range is None else sample_range
    px = jnp.arange(n_pixels, dtype=jnp.int32)
    pixels = jnp.stack([px, px * 0 + 3], -1)
    states = []
    for s in range(spl):
        states.append(
            sa.init_state(cfg, pixels, jnp.full((n_pixels,), s, jnp.uint32))
        )
    return cfg, states


@pytest.mark.parametrize("name", ["sobol", "halton", "stratified",
                                  "zerotwosequence", "maxmin", "random"])
def test_range_and_determinism(name):
    cfg, states = _states(name, 16)
    for dim in (0, 2, 5, 7):
        vals = np.stack(
            [np.asarray(sa.get_1d(cfg, dict(s), dim)) for s in states]
        )
        assert (vals >= 0).all() and (vals < 1).all(), (name, dim)
        vals2 = np.stack(
            [np.asarray(sa.get_1d(cfg, dict(s), dim)) for s in states]
        )
        np.testing.assert_array_equal(vals, vals2)


def test_stratified_1d_covers_strata():
    spp = 16
    cfg, states = _states("stratified", spp, n_pixels=8)
    vals = np.stack(
        [np.asarray(sa.get_1d(cfg, s, 6)) for s in states]
    )  # [spp, pixels]
    for p in range(8):
        strata = np.floor(vals[:, p] * spp).astype(int)
        assert sorted(strata.tolist()) == list(range(spp)), strata


def test_stratified_2d_covers_grid():
    spp = 16
    cfg, states = _states("stratified", spp, n_pixels=4)
    pts = np.stack([np.asarray(sa.get_2d(cfg, s, 5)) for s in states])
    xs, ys = sa._strat_xy(spp)
    for p in range(4):
        cell = (
            np.floor(pts[:, p, 0] * xs).astype(int) * ys
            + np.floor(pts[:, p, 1] * ys).astype(int)
        )
        assert sorted(cell.tolist()) == list(range(spp))


def test_zerotwosequence_elementary_intervals():
    spp = 16
    cfg, states = _states("zerotwosequence", spp)
    pts = np.stack([np.asarray(sa.get_2d(cfg, s, 5)) for s in states])
    for p in range(pts.shape[1]):
        for log_bx in range(5):
            bx, by = 1 << log_bx, 1 << (4 - log_bx)
            count = np.zeros((bx, by), int)
            np.add.at(
                count,
                (
                    (pts[:, p, 0] * bx).astype(int),
                    (pts[:, p, 1] * by).astype(int),
                ),
                1,
            )
            assert (count == 1).all(), (bx, by)


def test_pixels_decorrelated():
    cfg, states = _states("zerotwosequence", 8)
    pts = np.stack([np.asarray(sa.get_2d(cfg, s, 5)) for s in states])
    # Different pixels get different scrambles.
    assert not np.allclose(pts[:, 0], pts[:, 1])


def test_camera_sample_dims():
    cfg = sa.SamplerConfig("sobol", 4, RES)
    pixels = jnp.asarray([[3, 5], [10, 2]], jnp.int32)
    state = sa.init_state(cfg, pixels, jnp.zeros((2,), jnp.uint32))
    p_film, time, p_lens = sa.get_camera_sample(cfg, state, pixels)
    pf = np.asarray(p_film)
    assert ((pf >= np.asarray(pixels)) & (pf < np.asarray(pixels) + 1)).all()
