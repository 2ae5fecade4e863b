"""Vector math + transform sanity (core/geometry.h, core/transform.cpp)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import vecmath as vm
from pbrt_tpu.core import transform as tf


def test_coordinate_system_orthonormal():
    rs = np.random.RandomState(0)
    v = rs.randn(100, 3)
    v = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True), jnp.float32)
    t, b = vm.coordinate_system(v)
    np.testing.assert_allclose(np.asarray(vm.dot(v, t)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(v, b)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.length(t)), 1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.length(b)), 1, atol=1e-5)


def test_reflect_refract():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = vm.normalize(jnp.asarray([[1.0, 0.0, 1.0]]))
    r = vm.reflect(wo, n)
    np.testing.assert_allclose(np.asarray(r), [[-wo[0, 0], 0.0, wo[0, 2]]], atol=1e-6)
    ok, wt = vm.refract(wo, n, jnp.asarray([1.0 / 1.5]))
    assert bool(ok[0])
    # Snell: sin_t = sin_i / 1.5
    sin_i = float(jnp.sqrt(1 - vm.dot(wo, n) ** 2)[0])
    sin_t = float(jnp.sqrt(wt[0, 0] ** 2 + wt[0, 1] ** 2) / vm.length(wt)[0])
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-6)


def test_refract_tir():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = vm.normalize(jnp.asarray([[5.0, 0.0, 1.0]]))
    ok, _ = vm.refract(wo, n, jnp.asarray([1.5]))
    assert not bool(ok[0])


def test_lookat_maps_eye_and_dir():
    t = tf.look_at([1, 2, 3], [1, 2, 10], [0, 1, 0])
    p = t.apply_point(np.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(p, [1, 2, 3], atol=1e-5)
    d = t.apply_vector(np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-5)


def test_transform_compose_inverse():
    t = tf.translate(1, 2, 3) @ tf.rotate(30, 0, 1, 0) @ tf.scale(2, 2, 2)
    p = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    q = t.inverse.apply_point(t.apply_point(p))
    np.testing.assert_allclose(q, p, atol=1e-4)


def test_normal_transform_preserves_orthogonality():
    t = tf.scale(1, 1, 4) @ tf.rotate(25, 1, 1, 0)
    # Tangent v on surface, normal n orthogonal to it.
    v = np.array([1.0, 0.0, 0.0])
    n = np.array([0.0, 0.0, 1.0])
    tv = t.apply_vector(v)
    tn = t.apply_normal(n)
    np.testing.assert_allclose(np.dot(tv, tn), 0.0, atol=1e-5)


def test_spherical_direction_roundtrip():
    rs = np.random.RandomState(4)
    v = rs.randn(50, 3)
    v = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True), jnp.float32)
    theta = vm.spherical_theta(v)
    phi = vm.spherical_phi(v)
    w = vm.spherical_direction(jnp.sin(theta), jnp.cos(theta), phi)
    np.testing.assert_allclose(np.asarray(w), np.asarray(v), atol=1e-5)
