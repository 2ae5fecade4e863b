"""Curve/nurbs tessellation + realistic (lens) camera."""
import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import transform as tf


def test_curve_tessellation_geometry():
    from pbrt_tpu.shapes.curve import tessellate_curves, bezier_eval

    cps = np.array([[[0, 0, 0], [0, 0, 1], [0, 1, 2], [0, 2, 3]]], np.float32)
    idx, p, n, uv = tessellate_curves(cps, 0.2, 0.1, n_segments=8)
    assert idx.shape[1] == 3 and p.shape[1] == 3 and uv.shape[1] == 2
    # v spans the width: rail 0 has v=0, rail 1 has v=1.
    assert set(np.unique(uv[:, 1]).tolist()) == {0.0, 1.0}
    # Ribbon width matches the lerped width at the endpoints.
    k = 9
    w_start = np.linalg.norm(p[0] - p[k])
    w_end = np.linalg.norm(p[k - 1] - p[2 * k - 1])
    assert abs(w_start - 0.2) < 1e-5 and abs(w_end - 0.1) < 1e-5
    # Centerline matches the bezier.
    mid = 0.5 * (p[:k] + p[k:2 * k])
    pe, _ = bezier_eval(cps, np.linspace(0, 1, k).astype(np.float32))
    np.testing.assert_allclose(mid, pe[0], atol=1e-5)


def test_nurbs_flat_patch():
    from pbrt_tpu.shapes.nurbs import tessellate_nurbs

    # Flat bilinear-ish cubic patch z=0 spanning [0,3]^2.
    xs, ys = np.meshgrid(np.linspace(0, 3, 4), np.linspace(0, 3, 4))
    pw = np.stack([xs, ys, np.zeros_like(xs), np.ones_like(xs)], -1)
    idx, p, uv = tessellate_nurbs(
        4, 4, 4, 4, [0, 0, 0, 0, 1, 1, 1, 1], [0, 0, 0, 0, 1, 1, 1, 1], pw
    )
    assert np.abs(p[:, 2]).max() < 1e-5
    assert p[:, 0].min() >= -1e-5 and p[:, 0].max() <= 3 + 1e-5


def test_realistic_camera_focus():
    from pbrt_tpu.cameras.realistic import (
        make_realistic_camera, generate_rays_realistic,
    )

    fd = 2.0
    cam = make_realistic_camera(tf.identity(), (64, 64), focus_distance=fd)
    n = 512
    rs = np.random.RandomState(1)
    pf = jnp.broadcast_to(jnp.asarray([45.0, 32.0]), (n, 2))
    pl = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    o, d, t, w = jax.jit(generate_rays_realistic)(
        cam, pf, pl, jnp.zeros((n,))
    )
    o, d, w = np.asarray(o), np.asarray(d), np.asarray(w)
    m = w > 0
    assert m.mean() > 0.3, "vignetting too aggressive"
    assert np.isfinite(o).all() and np.isfinite(d).all()
    ts = np.linspace(0.3, 8, 400)
    spread = [
        np.mean(np.var(o[m, :2] + tt * d[m, :2] / d[m, 2:3], axis=0))
        for tt in ts
    ]
    z_best = ts[int(np.argmin(spread))]
    assert abs(z_best - fd) < 0.4, f"focus at {z_best}, wanted {fd}"
