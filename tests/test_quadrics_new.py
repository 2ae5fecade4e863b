"""Cone / paraboloid / hyperboloid intersection (shapes/{cone,paraboloid,
hyperboloid}.cpp): analytic hit points, normals, and BVH integration."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu import scene as sc
from pbrt_tpu.core import transform as tf
from pbrt_tpu.shapes import quadrics as quad
from pbrt_tpu.accel import traverse as tv


def _eye():
    return jnp.eye(4, dtype=jnp.float32)


def test_cone_lateral_hit():
    """Ray at z=h/2 toward the axis hits the cone at radius r(1 - z/h)."""
    r, h = 1.0, 2.0
    par = jnp.asarray([[r, h, 2 * np.pi, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                      jnp.float32)
    o = jnp.asarray([[5.0, 0.0, 1.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    s = quad.intersect_cone(o, d, 1e30, _eye(), _eye(), par)
    assert bool(s["hit"][0])
    # At z=1 = h/2 the cone radius is r*(1 - z/h) = 0.5.
    np.testing.assert_allclose(float(s["t"][0]), 5.0 - 0.5, rtol=1e-5)
    p = np.asarray(s["p_hit"][0])
    np.testing.assert_allclose(p, [0.5, 0.0, 1.0], atol=1e-5)
    ng = np.asarray(s["ng"][0])
    # Outward normal points +x and +z-tilted (apex up): nx>0, nz>0.
    assert ng[0] > 0.5 and abs(ng[1]) < 1e-4 and ng[2] > 0.0
    # uv: phi=0 -> u=0; v = z/h = 0.5.
    np.testing.assert_allclose(np.asarray(s["uv"][0]), [0.0, 0.5], atol=1e-5)


def test_cone_z_clip():
    """Rays above the apex miss."""
    par = jnp.asarray([[1.0, 2.0, 2 * np.pi, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                      jnp.float32)
    o = jnp.asarray([[5.0, 0.0, 3.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    s = quad.intersect_cone_object(o, d, 1e30, par)
    assert not bool(s["hit"][0])


def test_paraboloid_hit():
    """z = zmax*(x^2+y^2)/r^2: lateral ray at height z hits at
    radius sqrt(z r^2 / zmax)."""
    r, zmin, zmax = 1.0, 0.0, 2.0
    par = jnp.asarray([[r, zmin, zmax, 2 * np.pi, 0, 0, 0, 0, 0, 0, 0, 0]],
                      jnp.float32)
    o = jnp.asarray([[5.0, 0.0, 0.5]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    s = quad.intersect_paraboloid(o, d, 1e30, _eye(), _eye(), par)
    assert bool(s["hit"][0])
    x_hit = np.sqrt(0.5 * r * r / zmax)
    np.testing.assert_allclose(float(s["t"][0]), 5.0 - x_hit, rtol=1e-5)
    ng = np.asarray(s["ng"][0])
    assert abs(ng[1]) < 1e-4
    # v = (z - zmin)/(zmax - zmin) = 0.25.
    np.testing.assert_allclose(float(s["uv"][0, 1]), 0.25, atol=1e-5)


def test_hyperboloid_through_profile_points():
    """The surface must pass through p1 and p2."""
    from pbrt_tpu.scene import SceneBuilder

    b = SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5))
    p1 = (1.0, 0.0, -1.0)
    p2 = (1.5, 0.0, 2.0)
    b.add_hyperboloid(tf.identity(), p1, p2, material=m)
    scene = b.build()
    par = jnp.asarray(scene.q_params)
    # Implicit ah(x^2+y^2) - ch z^2 = 1 at p1 and p2.
    ah, ch = float(par[0, 0]), float(par[0, 1])
    for p in (p1, p2):
        val = ah * (p[0] ** 2 + p[1] ** 2) - ch * p[2] ** 2
        np.testing.assert_allclose(val, 1.0, rtol=1e-5)
    # Axial lateral ray at z=-1 hits at radius 1 (through p1).
    o = jnp.asarray([[5.0, 0.0, -1.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    s = quad.intersect_hyperboloid(o, d, 1e30, _eye(), _eye(), par)
    assert bool(s["hit"][0])
    np.testing.assert_allclose(float(s["t"][0]), 4.0, rtol=1e-4)
    # At z=2: radius 1.5 (through p2).
    o2 = jnp.asarray([[5.0, 0.0, 2.0]])
    s2 = quad.intersect_hyperboloid(o2, d, 1e30, _eye(), _eye(), par)
    np.testing.assert_allclose(float(s2["t"][0]), 3.5, rtol=1e-4)


def test_new_quadrics_through_bvh():
    """Scene-level: cone + paraboloid + hyperboloid found by the traversal
    and hit_record returns sane attributes."""
    from pbrt_tpu.scene import SceneBuilder

    b = SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5))
    b.add_cone(tf.translate(-3.0, 0.0, 0.0), 1.0, 2.0, material=m)
    b.add_paraboloid(tf.identity(), 1.0, 0.0, 2.0, material=m)
    b.add_hyperboloid(
        tf.translate(3.0, 0.0, 0.0), (1.0, 0.0, -1.0), (1.0, 0.0, 1.0),
        material=m,
    )
    scene = b.build()
    qt = tv.scene_quadric_types(scene)
    assert set(qt) == {sc.SHAPE_CONE, sc.SHAPE_PARABOLOID,
                       sc.SHAPE_HYPERBOLOID}
    # Three vertical rays, one per shape, from above... use lateral rays.
    o = jnp.asarray([
        [-3.0, 5.0, 0.5],   # cone at x=-3
        [0.0, 5.0, 0.5],    # paraboloid
        [3.0, 5.0, 0.0],    # hyperboloid (cylinder-like at r=1)
    ])
    d = jnp.asarray([[0.0, -1.0, 0.0]] * 3)
    t, prim = tv.intersect_closest(scene, o, d, 1e30, qt)
    assert bool(jnp.all(prim >= 0)), prim
    rec = tv.hit_record(scene, o, d, t, prim, qt)
    ng = np.asarray(rec["ng"])
    # All normals face back toward +y ray origins.
    assert (ng[:, 1] > 0.1).all(), ng
    p = np.asarray(rec["p"])
    np.testing.assert_allclose(p[1, 1], np.sqrt(0.5 / 2.0), rtol=1e-4)
    np.testing.assert_allclose(p[2, 1], 1.0, rtol=1e-4)
