"""Kd-tree accelerator vs BVH oracle (accelerators/kdtreeaccel.{h,cpp}).

Same-scene closest-hit and shadow queries must agree between the two
accelerators (the reference's own expectation: accelerators are
interchangeable behind the Primitive interface)."""
import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu import scene as sc
from pbrt_tpu.core import transform as tf
from pbrt_tpu.accel import traverse as tv


def _scene(accel):
    rs = np.random.RandomState(0)
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE)
    n_tri = 150
    c = rs.randn(n_tri, 1, 3) * 2
    v = c + rs.randn(n_tri, 3, 3) * 0.5
    b.add_triangle_mesh(
        np.arange(3 * n_tri).reshape(-1, 3), v.reshape(-1, 3), material=m
    )
    b.add_sphere(tf.translate(0, 0, 4), 1.0, material=m)
    return b.build(accelerator=accel)


def test_kdtree_matches_bvh():
    scene_b = _scene("bvh")
    scene_k = _scene("kdtree")
    assert scene_k.kd_nodes is not None and scene_b.kd_nodes is None
    rs = np.random.RandomState(1)
    N = 4096
    o = jnp.asarray(rs.randn(N, 3).astype(np.float32) * 4)
    d = rs.randn(N, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    qt = tv.scene_quadric_types(scene_b)

    t_b, p_b = jax.jit(lambda s, o, d: tv.intersect_closest(s, o, d, 1e30, qt))(
        scene_b, o, d
    )
    t_k, p_k = jax.jit(lambda s, o, d: tv.intersect_closest(s, o, d, 1e30, qt))(
        scene_k, o, d
    )
    p_b, p_k = np.asarray(p_b), np.asarray(p_k)
    assert ((p_b >= 0) == (p_k >= 0)).mean() > 0.999
    both = (p_b >= 0) & (p_k >= 0)
    assert (p_b[both] == p_k[both]).mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(t_b)[both], np.asarray(t_k)[both], rtol=1e-4, atol=1e-5
    )

    occ_b = jax.jit(lambda s, o, d: tv.intersect_any(s, o, d, 10.0, qt))(
        scene_b, o, d
    )
    occ_k = jax.jit(lambda s, o, d: tv.intersect_any(s, o, d, 10.0, qt))(
        scene_k, o, d
    )
    assert (np.asarray(occ_b) == np.asarray(occ_k)).mean() > 0.999
