"""Batched 3D vector math over `[..., 3]` arrays (SoA-of-vec layout).

TPU-native re-expression of pbrt's scalar Vector3f/Point3f/Normal3f algebra
(reference: core/geometry.h:1-1479).  There are no vector *classes* on the
device side — a "vector" is just the trailing axis of a float32 array, so every
op below vectorizes over arbitrary leading (ray-batch) dimensions and maps
straight onto the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Machine epsilon /2, as pbrt's MachineEpsilon (core/pbrt.h float variant).
MACHINE_EPSILON = float(jnp.finfo(jnp.float32).eps) / 2.0
ONE_MINUS_EPSILON = float(jnp.float32(1.0) - jnp.finfo(jnp.float32).eps / 2)
INF = float("inf")


def gamma(n) -> float:
    """pbrt's conservative fp rounding bound gamma(n) (core/pbrt.h:409)."""
    return (n * MACHINE_EPSILON) / (1 - n * MACHINE_EPSILON)


def vec(x, y, z, dtype=jnp.float32):
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)],
        axis=-1,
    )


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_squared(v))


def normalize(v):
    # sqrt is clamped *inside* so zero vectors on masked lanes don't emit an
    # inf derivative (0-cotangent * inf = NaN in the backward pass).
    return v / jnp.sqrt(jnp.maximum(length_squared(v), 1e-30))[..., None]


def xform_point(m, p):
    """Apply the affine part of a 4x4 (or [..., 4, 4]) matrix to points [..., 3].

    Implemented as broadcast multiply+sum, NOT `@`/einsum: tiny contractions
    lower to dot_general, which TPUs execute in bfloat16 passes by default —
    quantizing every ray/vertex to 8 mantissa bits.  Mul+sum stays on the VPU
    in full f32 (and is faster than an MXU dispatch at these shapes).
    """
    return jnp.sum(m[..., :3, :3] * p[..., None, :], axis=-1) + m[..., :3, 3]


def xform_vector(m, v):
    return jnp.sum(m[..., :3, :3] * v[..., None, :], axis=-1)


def xform_normal_w2o(w2o, n):
    """Transform a normal with (M^-1)^T given the world-to-object matrix:
    n_world[i] = sum_j w2o[j, i] * n_obj[j] (transform.h:287-295)."""
    return jnp.sum(w2o[..., :3, :3] * n[..., :, None], axis=-2)


def xform_abs(m, x):
    """|m[:3,:3]| applied to x (error-bound propagation, transform.h:1052)."""
    return jnp.sum(jnp.abs(m[..., :3, :3]) * x[..., None, :], axis=-1)


def distance(p, q):
    return length(p - q)


def distance_squared(p, q):
    return length_squared(p - q)


def face_forward(n, v):
    """Flip n to lie in the hemisphere of v (geometry.h Faceforward)."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def component3(v, idx):
    """v[..., idx] for per-lane idx in {0,1,2}, as a SELECT chain.

    jnp.take_along_axis on a [N,3] array lowers to a per-lane gather on
    this backend — measured 21ms of intersect_triangle's 23ms at 160k
    lanes (round-5 probe, tools/bench_layout_probe.py sibling); the
    equivalent two-where select fuses with neighbors and is ~free.
    """
    return jnp.where(
        idx == 0, v[..., 0], jnp.where(idx == 1, v[..., 1], v[..., 2])
    )


def permute3(v, kx, ky, kz):
    """Per-lane coordinate permutation (geometry.h Permute) via selects."""
    return jnp.stack(
        [component3(v, kx), component3(v, ky), component3(v, kz)], axis=-1
    )


def coordinate_system(v1):
    """Build an orthonormal basis around unit v1 (geometry.h:236 CoordinateSystem).

    Matches pbrt's branch: pick the smaller-magnitude axis pair.
    """
    c1 = jnp.abs(v1[..., 0]) > jnp.abs(v1[..., 1])
    inv_a = 1.0 / jnp.sqrt(
        jnp.maximum(
            jnp.where(
                c1,
                v1[..., 0] * v1[..., 0] + v1[..., 2] * v1[..., 2],
                v1[..., 1] * v1[..., 1] + v1[..., 2] * v1[..., 2],
            ),
            1e-30,
        )
    )
    v2 = jnp.where(
        c1[..., None],
        vec(-v1[..., 2] * inv_a, jnp.zeros_like(inv_a), v1[..., 0] * inv_a),
        vec(jnp.zeros_like(inv_a), v1[..., 2] * inv_a, -v1[..., 1] * inv_a),
    )
    v3 = cross(v1, v2)
    return v2, v3


def spherical_direction(sin_theta, cos_theta, phi):
    """(geometry.h:312 SphericalDirection)."""
    return vec(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def spherical_direction_basis(sin_theta, cos_theta, phi, x, y, z):
    return (
        (sin_theta * jnp.cos(phi))[..., None] * x
        + (sin_theta * jnp.sin(phi))[..., None] * y
        + cos_theta[..., None] * z
    )


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * jnp.pi, p)


# ---------------------------------------------------------------------------
# Local shading-frame helpers (reflection.h:50-102 semantics, z = normal)
# ---------------------------------------------------------------------------

def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] * w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def _safe_sqrt(x):
    """sqrt with a zero (not inf) gradient at x<=0 — double-where so masked
    lanes can't poison the backward pass (sqrt'(0) = inf otherwise)."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def sin_theta(w):
    return _safe_sqrt(sin2_theta(w))


def tan_theta(w):
    # Grad-safe at grazing: z == 0 lanes return a *constant* inf (consumers
    # mask on isfinite), so no infinite partial leaks into the backward pass.
    z = w[..., 2]
    bad = z == 0.0
    return jnp.where(bad, jnp.inf, sin_theta(w) / jnp.where(bad, 1.0, z))


def tan2_theta(w):
    c2 = cos2_theta(w)
    bad = c2 == 0.0
    return jnp.where(bad, jnp.inf, sin2_theta(w) / jnp.where(bad, 1.0, c2))


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.maximum(s, 1e-20), -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.maximum(s, 1e-20), -1.0, 1.0))


def same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0.0


def reflect(wo, n):
    """(reflection.h:443 Reflect)."""
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Snell refraction (reflection.h:448 Refract).

    Returns (ok, wt): ok=False marks total internal reflection lanes.
    `eta` is incident_ior / transmitted_ior.
    """
    cos_i = dot(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wt = eta[..., None] * -wi + (eta * cos_i - cos_t)[..., None] * n
    return ok, wt


@jax.custom_jvp
def _nudge_away(po, offset):
    """Round the offset point one ulp away from the surface
    (geometry.h:1450-1457), conservatively emulated with nextafter.
    Identity-derivative custom_jvp: the one-ulp nudge is d(po)/d(po)=1 for
    AD purposes (nextafter itself has no JAX differentiation rule)."""
    return jnp.where(
        offset > 0.0,
        jnp.nextafter(po, jnp.inf),
        jnp.where(offset < 0.0, jnp.nextafter(po, -jnp.inf), po),
    )


@_nudge_away.defjvp
def _nudge_away_jvp(primals, tangents):
    po, offset = primals
    dpo, _ = tangents
    return _nudge_away(po, offset), dpo


def offset_ray_origin(p, p_error, n, w):
    """Robust ray-origin offset along the normal (geometry.h:1440 OffsetRayOrigin).

    Moves the origin off the surface by the accumulated intersection error
    bound so that re-cast rays don't self-intersect.
    """
    d = dot(jnp.abs(n), p_error)
    offset = d[..., None] * n
    offset = jnp.where(dot(w, n)[..., None] < 0.0, -offset, offset)
    po = p + offset
    return _nudge_away(po, offset)
