"""AnimatedTransform tests (pattern of src/tests/animatedtransform.cpp:70 —
interpolation vs brute-force expectations)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import animated as an
from pbrt_tpu.core import transform as tf


def _trs(tx, ty, tz, deg, ax, ay, az, s):
    return (
        tf.translate(tx, ty, tz).m
        @ tf.rotate(deg, ax, ay, az).m
        @ tf.scale(s, s, s).m
    )


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        deg = rng.uniform(-179, 179)
        R = tf.rotate(deg, *axis).m[:3, :3]
        q = an.quat_from_matrix(R)
        R2 = np.asarray(an.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_decompose_recompose_endpoints():
    m0 = _trs(1, 2, 3, 30, 0, 0, 1, 2.0)
    m1 = _trs(-1, 0, 5, 120, 0, 1, 0, 0.5)
    at = an.make_animated(m0, m1, 0.0, 1.0)
    got0 = np.asarray(an.interpolate(at, jnp.asarray([0.0])))[0]
    got1 = np.asarray(an.interpolate(at, jnp.asarray([1.0])))[0]
    np.testing.assert_allclose(got0, m0, atol=1e-5)
    np.testing.assert_allclose(got1, m1, atol=1e-5)
    # interior recompose at t=0 keyframe equality is exact; interior must
    # at least be finite + affine.
    mid = np.asarray(an.interpolate(at, jnp.asarray([0.5])))[0]
    assert np.all(np.isfinite(mid)) and abs(mid[3, 3] - 1.0) < 1e-6


def test_rotation_midpoint_is_half_angle():
    m0 = tf.rotate(0.0, 0, 0, 1).m
    m1 = tf.rotate(90.0, 0, 0, 1).m
    at = an.make_animated(m0, m1)
    mid = np.asarray(an.interpolate(at, jnp.asarray([0.5])))[0]
    np.testing.assert_allclose(mid, tf.rotate(45.0, 0, 0, 1).m, atol=1e-4)


def test_translation_lerp_batched():
    m0 = tf.translate(0, 0, 0).m
    m1 = tf.translate(10, 0, 0).m
    at = an.make_animated(m0, m1)
    times = jnp.asarray([0.0, 0.25, 0.5, 1.0])
    ms = np.asarray(an.interpolate(at, times))
    np.testing.assert_allclose(ms[:, 0, 3], [0, 2.5, 5.0, 10.0], atol=1e-5)


def test_clamp_outside_shutter():
    m0 = tf.translate(0, 0, 0).m
    m1 = tf.translate(4, 0, 0).m
    at = an.make_animated(m0, m1, 0.25, 0.75)
    ms = np.asarray(an.interpolate(at, jnp.asarray([0.0, 1.0])))
    np.testing.assert_allclose(ms[0], m0, atol=1e-6)
    np.testing.assert_allclose(ms[1], m1, atol=1e-6)


def test_motion_bounds_contains_sampled_motion():
    m0 = _trs(0, 0, 0, 0, 0, 0, 1, 1.0)
    m1 = _trs(3, 1, 0, 170, 0, 0, 1, 1.0)
    at = an.make_animated(m0, m1)
    bmin, bmax = np.array([-1.0, -1, -1]), np.array([1.0, 1, 1])
    lo, hi = an.motion_bounds(at, bmin, bmax)
    rng = np.random.default_rng(1)
    ts = rng.uniform(0, 1, 200).astype(np.float32)
    ms = np.asarray(an.interpolate(at, jnp.asarray(ts)))
    pts = rng.uniform(-1, 1, (200, 3))
    world = np.einsum("sij,sj->si", ms[:, :3, :3], pts) + ms[:, :3, 3]
    assert np.all(world >= lo - 1e-4) and np.all(world <= hi + 1e-4)


def test_interpolate_inverse():
    m0 = _trs(1, 2, 3, 40, 1, 1, 0, 1.5)
    m1 = _trs(0, -1, 2, -30, 0, 1, 1, 0.8)
    at = an.make_animated(m0, m1)
    t = jnp.asarray([0.3, 0.9])
    m = np.asarray(an.interpolate(at, t))
    mi = np.asarray(an.interpolate_inverse(at, t))
    for k in range(2):
        np.testing.assert_allclose(m[k] @ mi[k], np.eye(4), atol=1e-4)
