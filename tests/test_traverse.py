"""BVH traversal vs brute force, + shape robustness (src/tests/shapes.cpp style)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu import scene as sc
from pbrt_tpu.accel import traverse as tv
from pbrt_tpu.core import transform as tf
from pbrt_tpu.shapes.triangle import intersect_triangle


def _random_tri_scene(n_tris=50, seed=0):
    rs = np.random.RandomState(seed)
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5))
    for _ in range(n_tris):
        c = rs.randn(3) * 2.0
        v = c + rs.randn(3, 3) * 0.5
        b.add_triangle_mesh([[0, 1, 2]], v, material=m)
    b.add_point_light(tf.translate(0, 0, 5), (10, 10, 10))
    return b


def _brute_force(b: sc.SceneBuilder, o, d, t_max):
    """Reference: test every triangle directly."""
    best_t = np.full(o.shape[0], t_max, np.float32)
    hit_any = np.zeros(o.shape[0], bool)
    for tri_i, (idx, p) in enumerate(zip(b.tri_indices, b.tri_p)):
        pass
    all_idx = np.concatenate(b.tri_indices)
    all_p = np.concatenate(b.tri_p)
    for k in range(all_idx.shape[0]):
        v = all_p[all_idx[k]]
        r = intersect_triangle(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(best_t),
            jnp.asarray(np.broadcast_to(v[0], o.shape).copy()),
            jnp.asarray(np.broadcast_to(v[1], o.shape).copy()),
            jnp.asarray(np.broadcast_to(v[2], o.shape).copy()),
        )
        h = np.asarray(r["hit"])
        t = np.asarray(r["t"])
        upd = h & (t < best_t)
        best_t = np.where(upd, t, best_t)
        hit_any |= upd
    return hit_any, best_t


def test_bvh_matches_brute_force():
    b = _random_tri_scene()
    scene = b.build()
    rs = np.random.RandomState(1)
    n = 256
    o = rs.randn(n, 3).astype(np.float32) * 4.0
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t, prim = tv.intersect_closest(
        scene, jnp.asarray(o), jnp.asarray(d), 1e30
    )
    t = np.asarray(t)
    prim = np.asarray(prim)

    bf_hit, bf_t = _brute_force(b, o, d, 1e30)
    np.testing.assert_array_equal(prim >= 0, bf_hit)
    np.testing.assert_allclose(
        np.where(bf_hit, t, 0.0), np.where(bf_hit, bf_t, 0.0), rtol=1e-5
    )


def test_shadow_matches_closest():
    b = _random_tri_scene(seed=3)
    scene = b.build()
    rs = np.random.RandomState(2)
    n = 256
    o = rs.randn(n, 3).astype(np.float32) * 4.0
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t, prim = tv.intersect_closest(scene, jnp.asarray(o), jnp.asarray(d), 1e30)
    occ = tv.intersect_any(scene, jnp.asarray(o), jnp.asarray(d), 1e30)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(prim) >= 0)


def test_sphere_in_bvh():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE)
    b.add_sphere(tf.translate(0, 0, 0), 1.0, material=m)
    b.add_point_light(tf.translate(0, 0, 5), (1, 1, 1))
    scene = b.build()
    qt = tv.scene_quadric_types(scene)
    assert qt == (sc.SHAPE_SPHERE,)
    o = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 3.0, -5.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t, prim = tv.intersect_closest(scene, o, d, 1e30, qt)
    t = np.asarray(t)
    assert prim[0] >= 0 and abs(t[0] - 4.0) < 1e-3
    assert prim[1] < 0  # misses
    assert prim[2] >= 0 and abs(t[2] - 1.0) < 1e-3  # from inside

    rec = tv.hit_record(scene, o, d, jnp.asarray(t), prim, qt)
    ng = np.asarray(rec["ng"])
    np.testing.assert_allclose(ng[0], [0, 0, -1], atol=1e-4)
    np.testing.assert_allclose(ng[2], [0, 0, 1], atol=1e-4)


def test_reintersect_self_offset():
    """Rays spawned from hit points with OffsetRayOrigin must not re-hit the
    same surface (shapes.cpp:48-110 'reintersect' pattern)."""
    from pbrt_tpu.core.vecmath import offset_ray_origin

    b = _random_tri_scene(n_tris=20, seed=5)
    scene = b.build()
    rs = np.random.RandomState(6)
    n = 128
    o = rs.randn(n, 3).astype(np.float32) * 4.0
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t, prim = tv.intersect_closest(scene, o, d, 1e30)
    rec = tv.hit_record(scene, o, d, t, prim)
    hit = np.asarray(rec["hit"])
    # Spawn reflected rays from hit points.
    w = -d
    o2 = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], w)
    t2, prim2 = tv.intersect_closest(scene, o2, w, 1e30)
    # The re-cast ray goes back toward the origin; it must not hit the same
    # triangle at t~0.
    t2 = np.asarray(t2)
    same_self_hit = hit & (np.asarray(prim2) == np.asarray(prim)) & (t2 < 1e-4)
    assert not same_self_hit.any()


def test_any_mask_mixed_launch():
    """Per-lane any-hit (merged shadow+extension launches): flagged lanes'
    hit BOOLEAN matches closest-hit; unflagged lanes in the same launch are
    bit-identical to a pure closest-hit query."""
    b = _random_tri_scene(seed=7)
    scene = b.build()
    rs = np.random.RandomState(4)
    n = 256
    o = rs.randn(n, 3).astype(np.float32) * 4.0
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t_ref, p_ref = tv.intersect_closest(scene, oj, dj, 1e30)
    mask = jnp.asarray(rs.rand(n) < 0.5)
    t_m, p_m = tv.intersect_closest(scene, oj, dj, 1e30, any_mask=mask)
    mk = np.asarray(mask)
    # Flagged lanes: same occlusion boolean (first-hit vs closest-hit).
    np.testing.assert_array_equal(
        (np.asarray(p_m) >= 0)[mk], (np.asarray(p_ref) >= 0)[mk]
    )
    # Unflagged lanes: identical closest hit.
    np.testing.assert_array_equal(np.asarray(p_m)[~mk], np.asarray(p_ref)[~mk])
    np.testing.assert_array_equal(np.asarray(t_m)[~mk], np.asarray(t_ref)[~mk])
