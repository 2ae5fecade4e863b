"""Packet-kernel traversal vs wavefront-loop oracle (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu import scene as sc
from pbrt_tpu.accel import traverse as tv
from pbrt_tpu.core import transform as tf


def _tri_scene(n_tris=200, seed=0):
    rs = np.random.RandomState(seed)
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE)
    c = rs.randn(n_tris, 1, 3) * 2.0
    v = c + rs.randn(n_tris, 3, 3) * 0.5
    b.add_triangle_mesh(
        np.arange(3 * n_tris).reshape(-1, 3), v.reshape(-1, 3), material=m
    )
    b.add_point_light(tf.translate(0, 0, 5), (1, 1, 1))
    return b.build()


@pytest.mark.slow
def test_packet_kernel_matches_wavefront_interpret():
    from pbrt_tpu.ops import pallas_bvh as pk

    scene = _tri_scene()
    tables = pk.pack_scene_for_kernel(scene)

    rs = np.random.RandomState(1)
    n = pk.PACKET  # one packet
    # Coherent-ish packet: common origin, narrow cone of directions.
    o = np.tile(np.array([[0.0, 0.0, -8.0]], np.float32), (n, 1))
    d = np.array([[0, 0, 1]], np.float32) + rs.randn(n, 3).astype(np.float32) * 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    t_ref, p_ref = tv.intersect_closest(scene, o_j, d_j, 1e30)

    import pbrt_tpu.ops.pallas_bvh as mod

    orig = mod.pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    mod.pl.pallas_call = interp_call
    try:
        t_k, p_k = pk.intersect_closest_packets(scene, tables, o_j, d_j, 1e30)
    finally:
        mod.pl.pallas_call = orig

    hit_ref = np.asarray(p_ref) >= 0
    hit_k = np.asarray(p_k) >= 0
    # Same hit set and same prims (tMT and watertight may differ on grazing
    # hits; require 99%+ agreement and matching t where both hit).
    agree = hit_ref == hit_k
    assert agree.mean() > 0.99, agree.mean()
    both = hit_ref & hit_k
    same_prim = np.asarray(p_ref)[both] == np.asarray(p_k)[both]
    assert same_prim.mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(t_k)[both][same_prim],
        np.asarray(t_ref)[both][same_prim],
        rtol=1e-3,
    )


@pytest.mark.slow
def test_packet_kernel_any_mask_interpret():
    """Kernel any-hit lanes: occlusion boolean matches the closest-hit
    kernel; non-flagged lanes unchanged (interpret mode)."""
    from pbrt_tpu.ops import pallas_bvh as pk

    scene = _tri_scene(seed=2)
    tables = pk.pack_scene_for_kernel(scene)
    rs = np.random.RandomState(5)
    n = pk.PACKET
    o = np.tile(np.array([[0.0, 0.0, -8.0]], np.float32), (n, 1))
    d = np.array([[0, 0, 1]], np.float32) + rs.randn(n, 3).astype(np.float32) * 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    mask = jnp.asarray(rs.rand(n) < 0.5)

    import pbrt_tpu.ops.pallas_bvh as mod

    orig = mod.pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    mod.pl.pallas_call = interp_call
    try:
        t_c, p_c = pk.intersect_closest_packets(scene, tables, o_j, d_j, 1e30)
        t_m, p_m = pk.intersect_closest_packets(
            scene, tables, o_j, d_j, 1e30, any_mask=mask
        )
    finally:
        mod.pl.pallas_call = orig

    mk = np.asarray(mask)
    np.testing.assert_array_equal(
        (np.asarray(p_m) >= 0)[mk], (np.asarray(p_c) >= 0)[mk]
    )
    np.testing.assert_array_equal(np.asarray(p_m)[~mk], np.asarray(p_c)[~mk])
    np.testing.assert_array_equal(np.asarray(t_m)[~mk], np.asarray(t_c)[~mk])
