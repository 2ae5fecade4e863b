"""Procedural ray-curve intersection (shapes/curve.py, curve.cpp:188-380).

Analytic checks on a straight flat curve (known geometry), hit/miss at the
width boundary, uv parameterization, the ribbon orientation scaling, and an
end-to-end render through the BVH dispatch path.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu import scene as sc
from pbrt_tpu.core import transform as tf
from pbrt_tpu.shapes.curve import (
    CURVE_FLAT, CURVE_RIBBON, curve_intersect, pack_curve_rows,
)


def _straight_row(ctype=CURVE_FLAT, w=0.2, n0=None, n1=None):
    cp = np.array(
        [[-1.0, 0.0, 5.0], [-1 / 3, 0.0, 5.0], [1 / 3, 0.0, 5.0],
         [1.0, 0.0, 5.0]], np.float32,
    )
    return pack_curve_rows(cp[None], w, w, 0.0, 1.0, ctype, n0, n1)


def _shoot(rows, origins, dirs, want_record=False):
    n = origins.shape[0]
    row = jnp.asarray(np.broadcast_to(rows, (n, rows.shape[-1])))
    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(dirs, jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return curve_intersect(o, d, jnp.full((n,), 1e30, jnp.float32), row,
                           want_record=want_record)


def test_straight_flat_curve_hit_t_u_v():
    rows = _straight_row()
    # Rays along +z through x = -0.5, 0, 0.5 on the curve; one off-width.
    o = np.array(
        [[-0.5, 0.0, 0.0], [0.0, 0.0, 0.0], [0.5, 0.05, 0.0],
         [0.0, 0.15, 0.0]], np.float32,
    )
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    res = _shoot(rows[0], o, d, want_record=True)
    hit = np.asarray(res["hit"])
    assert list(hit) == [True, True, True, False]
    t = np.asarray(res["t"])
    np.testing.assert_allclose(t[:3], 5.0, rtol=1e-5)
    uv = np.asarray(res["uv"])
    # u = (x+1)/2 for the straight parameterization
    np.testing.assert_allclose(uv[:3, 0], [0.25, 0.5, 0.75], atol=1e-3)
    # v: centered ray ~0.5; the y=+0.05 ray is offset by half the
    # half-width -> |v - 0.5| = 0.25
    assert abs(uv[1, 1] - 0.5) < 2e-2
    assert abs(abs(uv[2, 1] - 0.5) - 0.25) < 2e-2
    # record geometry: p on the curve plane, ng ~ +/-z
    p = np.asarray(res["p_hit"])
    np.testing.assert_allclose(p[1], [0.0, 0.0, 5.0], atol=1e-5)
    ng = np.asarray(res["ng"])
    assert abs(abs(ng[1, 2]) - 1.0) < 1e-4


def test_curve_tmax_and_miss():
    rows = _straight_row()
    o = np.array([[0.0, 0.0, 0.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    row = jnp.asarray(rows)
    res = curve_intersect(
        jnp.asarray(o), jnp.asarray(d), jnp.full((1,), 4.0, jnp.float32), row
    )
    assert not bool(res["hit"][0])  # t_max=4 < hit t=5 (zMax reject)
    # ray pointing away
    res2 = _shoot(rows[0], o, -d)
    assert not bool(res2["hit"][0])


def test_ribbon_width_scales_with_normal():
    # Ribbon normals along z (facing the ray): full width; rotate the
    # normals to graze (~x) and the effective width shrinks -> miss at an
    # offset that the facing ribbon still catches.
    nz = np.array([[0.0, 0.0, 1.0]], np.float32)
    nx = np.array([[0.9998477, 0.0, 0.01745241]], np.float32)  # ~89 deg off
    rows_face = _straight_row(CURVE_RIBBON, n0=nz, n1=nz)
    rows_graze = _straight_row(CURVE_RIBBON, n0=nx, n1=nx)
    o = np.array([[0.0, 0.08, 0.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    assert bool(_shoot(rows_face[0], o, d)["hit"][0])
    assert not bool(_shoot(rows_graze[0], o, d)["hit"][0])


def test_curved_curve_offset_hits():
    # A bowed curve: control polygon arches in y; rays at the arch apex.
    cp = np.array(
        [[-1.0, 0.0, 5.0], [-0.3, 0.8, 5.0], [0.3, 0.8, 5.0],
         [1.0, 0.0, 5.0]], np.float32,
    )
    rows = pack_curve_rows(cp[None], 0.1, 0.1, 0.0, 1.0, CURVE_FLAT)
    # Bezier midpoint y = (0 + 3*0.8 + 3*0.8 + 0)/8 = 0.6
    o = np.array([[0.0, 0.6, 0.0], [0.0, 0.0, 0.0]], np.float32)
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (2, 1))
    res = _shoot(rows[0], o, d)
    assert bool(res["hit"][0])
    assert not bool(res["hit"][1])


def test_curve_render_end_to_end():
    """Curve prims through the full BVH + path-integrator dispatch."""
    from pbrt_tpu import film as fm
    from pbrt_tpu.cameras import make_perspective_camera
    from pbrt_tpu.integrators import path as pt
    from pbrt_tpu.samplers.samplers import SamplerConfig

    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.6, 0.5, 0.4))
    cp = np.array(
        [[-1.0, -0.3, 4.0], [-0.3, 0.6, 4.0], [0.3, 0.6, 4.0],
         [1.0, -0.3, 4.0]], np.float32,
    )
    b.add_curve(cp, 0.3, 0.3, curve_type="flat", material=m)
    mf = b.add_material(sc.MAT_MATTE, kd=(0.4, 0.4, 0.4))
    b.add_triangle_mesh(
        np.array([[0, 1, 2], [0, 2, 3]]),
        np.array([[-5, -5, 6], [5, -5, 6], [5, 5, 6], [-5, 5, 6]], np.float32),
        material=mf,
    )
    b.add_point_light(tf.translate(0.0, 2.0, 0.0), (20.0, 20.0, 20.0))
    scene = b.build()
    assert scene.curve_packed is not None and scene.curve_packed.shape[0] >= 1
    res = (32, 32)
    cam = make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), res, fov_deg=50.0
    )
    img = pt.render(
        scene, cam, fm.FilmConfig(full_resolution=res),
        SamplerConfig("halton", 2, res), pt.PathConfig(max_depth=2),
    )
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.mean() > 1e-3  # something rendered
    # the curve occludes the brighter floor in the middle rows
    assert a[8:24, 8:24].mean() != pytest.approx(a.mean(), rel=1e-3)
