"""MIPMap + ray-differential tests (mipmap.h:63-118, interaction.cpp:160-220,
camera.cpp:68-85)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.textures import textures as tx


def _table_with_image(img, fparams=(0, 8.0, 0, 0)):
    t = tx.HostTextureTable()
    tid = t.add(tx.TEX_IMAGEMAP, c1=(1, 1, 1), image=img, fparams=fparams)
    return t.freeze(), tid


def test_pyramid_levels_and_constancy():
    img = np.full((16, 32, 3), 0.25, np.float32)
    levels = tx.build_pyramid(img)
    # pow2 input: nLevels = log2(max(w,h)) + 1 (mipmap.cpp:147).
    assert len(levels) == 6
    assert levels[0].shape == (16, 32, 3)
    assert levels[-1].shape == (1, 1, 3)
    for lvl in levels:
        np.testing.assert_allclose(lvl, 0.25, atol=1e-6)


def test_pyramid_nonpow2_resample():
    # Non-pow2 input is Lanczos-resampled UP to the next pow2 (mipmap.cpp:93).
    img = np.random.default_rng(1).uniform(0, 1, (10, 24, 3)).astype(np.float32)
    levels = tx.build_pyramid(img)
    assert levels[0].shape == (16, 32, 3)
    # Resampling preserves the mean to within filter ringing.
    assert abs(levels[0].mean() - img.mean()) < 0.05
    # Coarsest level == image mean (box-average chain is exact).
    np.testing.assert_allclose(
        levels[-1][0, 0], levels[0].mean(axis=(0, 1)), rtol=1e-4
    )


def test_trilinear_wide_width_is_mean():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    table, tid = _table_with_image(img)
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    v = tx._trilinear_lookup(table, tid, uv, jnp.asarray([1.0]), 4, tx.WRAP_REPEAT)
    np.testing.assert_allclose(np.asarray(v)[0], img.mean(axis=(0, 1)), atol=1e-4)


def test_trilinear_zero_width_is_bilinear():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    table, tid = _table_with_image(img)
    uv = jnp.asarray([[0.3, 0.7], [0.9, 0.1]], jnp.float32)
    v0 = tx._bilinear_lookup(table, tid, uv)
    v1 = tx._trilinear_lookup(
        table, tid, uv, jnp.zeros((2,)), 4, tx.WRAP_REPEAT
    )
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)


def test_evaluate_textures_with_duv_selects_coarse():
    # A checker image: sharp at level 0, mean (0.5) at the top level.
    img = np.indices((16, 16)).sum(0) % 2
    img = np.repeat(img[..., None], 3, -1).astype(np.float32)
    table, tid = _table_with_image(img)
    uv = jnp.asarray([[0.51, 0.52]], jnp.float32)
    p = jnp.zeros((1, 3))
    sharp = tx.evaluate_textures(table, uv, p)
    wide = tx.evaluate_textures(
        table, uv, p,
        duvdx=jnp.full((1, 2), 1.0), duvdy=jnp.full((1, 2), 1.0),
    )
    assert abs(float(wide[tid, 0, 0]) - 0.5) < 0.05
    # And zero differentials reproduce the sharp level-0 value.
    zero = tx.evaluate_textures(
        table, uv, p, duvdx=jnp.zeros((1, 2)), duvdy=jnp.zeros((1, 2))
    )
    np.testing.assert_allclose(
        np.asarray(zero[tid]), np.asarray(sharp[tid]), atol=1e-5
    )


def test_aniso_lookup_bounded_and_finite():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    table, tid = _table_with_image(img)
    uv = jnp.asarray([[0.4, 0.6]], jnp.float32)
    v = tx._aniso_lookup(
        table, tid, uv,
        jnp.asarray([[0.25, 0.0]]), jnp.asarray([[0.0, 0.01]]),
        5, tx.WRAP_REPEAT, 8.0,
    )
    v = np.asarray(v)
    assert np.all(np.isfinite(v))
    assert np.all(v >= img.min() - 1e-4) and np.all(v <= img.max() + 1e-4)


def test_wrap_modes():
    img = np.ones((4, 4, 3), np.float32)
    for wrap, expect_out in ((tx.WRAP_BLACK, 0.0), (tx.WRAP_CLAMP, 1.0),
                             (tx.WRAP_REPEAT, 1.0)):
        table, tid = _table_with_image(img, fparams=(0, 8.0, wrap, 0))
        uv = jnp.asarray([[1.6, 0.5]], jnp.float32)  # outside [0,1)
        v = float(tx._bilinear_lookup(table, tid, uv, wrap)[0, 0])
        assert abs(v - expect_out) < 1e-6, (wrap, v)


def test_uv_differentials_plane():
    from pbrt_tpu.accel.traverse import uv_differentials

    n = 3
    rec = {
        "p": jnp.zeros((n, 3)),
        "ng": jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)),
        "dpdu": jnp.broadcast_to(jnp.asarray([2.0, 0.0, 0.0]), (n, 3)),
        "dpdv": jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3)),
        "hit": jnp.ones((n,), bool),
    }
    # Auxiliary rays straight down, offset by 0.2 in x / 0.3 in y.
    rx_o = jnp.broadcast_to(jnp.asarray([0.2, 0.0, 1.0]), (n, 3))
    ry_o = jnp.broadcast_to(jnp.asarray([0.0, 0.3, 1.0]), (n, 3))
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
    duvdx, duvdy = uv_differentials(rec, rx_o, rd, ry_o, rd)
    # dpdx = (0.2,0,0) = dpdu*dudx -> dudx = 0.1 (dpdu has length 2).
    np.testing.assert_allclose(np.asarray(duvdx), [[0.1, 0.0]] * n, atol=1e-6)
    np.testing.assert_allclose(np.asarray(duvdy), [[0.0, 0.3]] * n, atol=1e-6)


def test_camera_ray_differentials_one_pixel_apart():
    from pbrt_tpu.cameras import (
        make_perspective_camera, generate_rays, generate_ray_differentials,
    )

    from pbrt_tpu.core import transform as tf

    cam = make_perspective_camera(
        tf.Transform(np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32)),
        (64, 64), fov_deg=60.0,
    )
    p_film = jnp.asarray([[32.5, 32.5]], jnp.float32)
    p_lens = jnp.zeros((1, 2))
    tu = jnp.zeros((1,))
    o, d, time, w, rx_o, rx_d, ry_o, ry_d = generate_ray_differentials(
        cam, p_film, p_lens, tu, spp=1
    )
    o1, d1, _, _ = generate_rays(cam, p_film + jnp.asarray([1.0, 0.0]), p_lens, tu)
    np.testing.assert_allclose(np.asarray(rx_d), np.asarray(d1), atol=1e-6)
    # spp scaling shrinks the offset by 1/sqrt(spp) (integrator.cpp:290).
    out = generate_ray_differentials(cam, p_film, p_lens, tu, spp=4)
    rx_d4 = out[5]
    np.testing.assert_allclose(
        np.asarray(rx_d4 - d), np.asarray(rx_d - d) * 0.5, atol=1e-6
    )
