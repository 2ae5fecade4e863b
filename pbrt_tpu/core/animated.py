"""AnimatedTransform: keyframe matrix interpolation for motion blur.

TPU re-expression of core/quaternion.{h,cpp} + AnimatedTransform
(transform.h:412-439, transform.cpp:1108-1612): the two keyframe matrices are
decomposed host-side (numpy, at scene-compile time) into translate/rotate
(quaternion)/scale per pbrt's polar-iteration Decompose
(transform.cpp:1138-1174); per-ray interpolation is a pure vectorized jnp
function of time [N] -> matrices [N,4,4] (Interpolate,
transform.cpp:1176-1202) used by the animated camera and animated-instance
intersection paths.  Motion bounds are a densely-sampled conservative union
(pbrt's closed-form BoundPointMotion derivative machinery,
transform.cpp:1232-1454, is exact; the sampled union with padding is the
array-friendly equivalent and strictly simpler — the BVH only needs
conservative bounds).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .pytree import pytree_dataclass


# ---------------------------------------------------------------------------
# Quaternions (core/quaternion.h:50-110). Layout: (x, y, z, w).
# ---------------------------------------------------------------------------

def quat_from_matrix(m: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (Quaternion(const Transform&),
    quaternion.cpp:62-102). Host-side, single matrix."""
    m = np.asarray(m, np.float64)[:3, :3]
    trace = m[0, 0] + m[1, 1] + m[2, 2]
    q = np.zeros(4)
    if trace > 0.0:
        s = np.sqrt(trace + 1.0)
        q[3] = s / 2.0
        s = 0.5 / s
        q[0] = (m[2, 1] - m[1, 2]) * s
        q[1] = (m[0, 2] - m[2, 0]) * s
        q[2] = (m[1, 0] - m[0, 1]) * s
    else:
        nxt = [1, 2, 0]
        i = 0
        if m[1, 1] > m[0, 0]:
            i = 1
        if m[2, 2] > m[i, i]:
            i = 2
        j = nxt[i]
        k = nxt[j]
        s = np.sqrt((m[i, i] - (m[j, j] + m[k, k])) + 1.0)
        qv = np.zeros(3)
        qv[i] = s * 0.5
        if s != 0.0:
            s = 0.5 / s
        q[3] = (m[k, j] - m[j, k]) * s
        qv[j] = (m[j, i] + m[i, j]) * s
        qv[k] = (m[k, i] + m[i, k]) * s
        q[:3] = qv
    return q / np.linalg.norm(q)


def quat_to_matrix(q):
    """Quaternion [.., 4] -> rotation matrix [.., 3, 3]
    (Quaternion::ToTransform, quaternion.cpp:47-60). jnp, batched."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w)], -1),
        jnp.stack([2 * (x * y - z * w), 1 - 2 * (x * x + z * z), 2 * (y * z + x * w)], -1),
        jnp.stack([2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y)], -1),
    ], -1)
    # pbrt transposes for the left-handed convention (quaternion.cpp:59).
    return r


def slerp(t, q0, q1):
    """Spherical lerp (quaternion.cpp:34-45), batched over t [..]."""
    cos_theta = jnp.sum(q0 * q1, -1)
    lin = cos_theta > 0.9995
    # linear branch
    qlin = q0 * (1 - t)[..., None] + q1 * t[..., None]
    qlin = qlin / jnp.linalg.norm(qlin, axis=-1, keepdims=True)
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    thetap = theta * t
    qperp = q1 - q0 * cos_theta[..., None]
    qperp = qperp / jnp.maximum(
        jnp.linalg.norm(qperp, axis=-1, keepdims=True), 1e-12
    )
    qs = q0 * jnp.cos(thetap)[..., None] + qperp * jnp.sin(thetap)[..., None]
    return jnp.where(lin[..., None], qlin, qs)


# ---------------------------------------------------------------------------
# Decomposition + AnimatedTransform
# ---------------------------------------------------------------------------

def decompose(m: np.ndarray):
    """M = T * R * S (AnimatedTransform::Decompose, transform.cpp:1138-1174):
    extract translation, polar-iterate to the rotation, S = R^-1 * M.
    Host-side."""
    m = np.asarray(m, np.float64)
    T = m[:3, 3].copy()
    M = m.copy()
    M[:3, 3] = 0.0
    M[3, :] = (0, 0, 0, 1)
    # polar decomposition: R_{i+1} = 0.5 (R + R^-T)
    R = M.copy()
    for _ in range(100):
        Rnext = 0.5 * (R + np.linalg.inv(R.T))
        norm = np.max(np.sum(np.abs(R - Rnext), axis=1)[:3])
        R = Rnext
        if norm < 1e-4:
            break
    quat = quat_from_matrix(R)
    S = np.linalg.inv(R) @ M
    return T.astype(np.float32), quat.astype(np.float32), S[:3, :3].astype(np.float32)


@pytree_dataclass
class AnimatedXf:
    """Decomposed keyframe pair; `interpolate` is jnp over per-ray times."""
    start_time: jnp.ndarray  # scalar
    end_time: jnp.ndarray  # scalar
    trans: jnp.ndarray  # [2, 3]
    quat: jnp.ndarray  # [2, 4]
    scale: jnp.ndarray  # [2, 3, 3]
    m0: jnp.ndarray  # [4, 4] exact keyframe matrices (used at t<=t0 / t>=t1)
    m1: jnp.ndarray  # [4, 4]


def make_animated(m_start: np.ndarray, m_end: np.ndarray,
                  start_time: float = 0.0, end_time: float = 1.0) -> AnimatedXf:
    """Host-side constructor (AnimatedTransform ctor, transform.cpp:1108-1136);
    flips the second quaternion to the same hemisphere for shortest-path
    slerp (transform.cpp:1129-1132)."""
    t0, q0, s0 = decompose(m_start)
    t1, q1, s1 = decompose(m_end)
    if float(np.dot(q0, q1)) < 0.0:
        q1 = -q1
    return AnimatedXf(
        start_time=jnp.float32(start_time),
        end_time=jnp.float32(end_time),
        trans=jnp.asarray(np.stack([t0, t1])),
        quat=jnp.asarray(np.stack([q0, q1])),
        scale=jnp.asarray(np.stack([s0, s1])),
        m0=jnp.asarray(np.asarray(m_start, np.float32)),
        m1=jnp.asarray(np.asarray(m_end, np.float32)),
    )


def is_animated(m_start: np.ndarray, m_end: np.ndarray) -> bool:
    return not np.allclose(np.asarray(m_start), np.asarray(m_end))


def interpolate(at: AnimatedXf, time) -> jnp.ndarray:
    """time [N] -> object-to-world matrices [N, 4, 4]
    (AnimatedTransform::Interpolate, transform.cpp:1176-1202)."""
    time = jnp.asarray(time, jnp.float32)
    dt = (time - at.start_time) / jnp.maximum(
        at.end_time - at.start_time, 1e-12
    )
    dtc = jnp.clip(dt, 0.0, 1.0)
    trans = (1 - dtc)[..., None] * at.trans[0] + dtc[..., None] * at.trans[1]
    rot = quat_to_matrix(slerp(dtc, at.quat[0][None], at.quat[1][None]))
    scl = (1 - dtc)[..., None, None] * at.scale[0] + dtc[..., None, None] * at.scale[1]
    # Mul+sum, not einsum: dot_general runs bf16 on TPU by default.
    rs = jnp.sum(rot[..., :, :, None] * scl[..., None, :, :], axis=-2)
    m = jnp.zeros(time.shape + (4, 4), jnp.float32)
    m = m.at[..., :3, :3].set(rs)
    m = m.at[..., :3, 3].set(trans)
    m = m.at[..., 3, 3].set(1.0)
    # Exact keyframes outside [t0, t1] (transform.cpp:1177-1185).
    m = jnp.where((dt <= 0.0)[..., None, None], at.m0, m)
    m = jnp.where((dt >= 1.0)[..., None, None], at.m1, m)
    return m


def interpolate_inverse(at: AnimatedXf, time) -> jnp.ndarray:
    """Per-ray world-to-object: invert the interpolated rigid(ish) matrix.
    Small 4x4 batch inverse — fine on device for the few animated
    instances a scene has."""
    return jnp.linalg.inv(interpolate(at, time))


_MB_SAMPLES = 64


def motion_bounds(at: AnimatedXf, bounds_min, bounds_max):
    """Conservative world bounds of `bounds` swept over [t0, t1]
    (AnimatedTransform::MotionBounds, transform.cpp:1214-1230): union of the
    transformed box at _MB_SAMPLES times, padded 1% + epsilon against
    between-sample rotation extrema.  Host-side (numpy in, numpy out)."""
    bmin = np.asarray(bounds_min, np.float64)
    bmax = np.asarray(bounds_max, np.float64)
    corners = np.array([
        [bmin[0], bmin[1], bmin[2]], [bmax[0], bmin[1], bmin[2]],
        [bmin[0], bmax[1], bmin[2]], [bmax[0], bmax[1], bmin[2]],
        [bmin[0], bmin[1], bmax[2]], [bmax[0], bmin[1], bmax[2]],
        [bmin[0], bmax[1], bmax[2]], [bmax[0], bmax[1], bmax[2]],
    ])
    times = np.linspace(
        float(at.start_time), float(at.end_time), _MB_SAMPLES, dtype=np.float32
    )
    ms = np.asarray(interpolate(at, jnp.asarray(times)))  # [S,4,4]
    pts = np.einsum("sij,cj->sci", ms[:, :3, :3], corners) + ms[:, None, :3, 3]
    lo = pts.min(axis=(0, 1))
    hi = pts.max(axis=(0, 1))
    pad = 0.01 * (hi - lo) + 1e-5
    return (lo - pad).astype(np.float32), (hi + pad).astype(np.float32)
