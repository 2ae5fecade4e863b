"""Curve shape (cubic Bezier ribbons/tubes for hair/fur).

Maps shapes/curve.{h,cpp}: pbrt intersects curves procedurally by recursive
subdivision against the ray (curve.cpp:232-330).  Round-1 TPU design:
curves are tessellated host-side at scene compile into triangle ribbons that
flow through the standard BVH/triangle hot path — SoA-friendly, zero new
kernel code, and the (u, v) parameterization is preserved exactly as the
hair BSDF needs it (u along the curve, v in [0,1] across the width, so
h = -1 + 2v; hair.cpp HairBSDF ctor).

Deviation (documented in NOTES.md): pbrt's "flat" curves orient to each
ray at intersection time; tessellated ribbons use a fixed frame per segment
(the curve's rotation-minimizing frame).  For hair-width curves the visual
difference is below noise at production spp; the exact procedural kernel is
a round-2 item.  "cylinder" type curves get the same ribbon + doubled width
treatment pbrt's own low-splitdepth setting approximates.
"""
from __future__ import annotations

import numpy as np


def bezier_eval(cp: np.ndarray, u: np.ndarray):
    """Evaluate cubic Bezier cp [C,4,3] at u [K]; returns (p, dpdu) each
    [C,K,3] (de Casteljau)."""
    w = u[None, :, None]  # [1,K,1]
    c0 = cp[:, None, 0, :]
    c1 = cp[:, None, 1, :]
    c2 = cp[:, None, 2, :]
    c3 = cp[:, None, 3, :]
    p01 = c0 * (1 - w) + c1 * w
    p12 = c1 * (1 - w) + c2 * w
    p23 = c2 * (1 - w) + c3 * w
    p012 = p01 * (1 - w) + p12 * w
    p123 = p12 * (1 - w) + p23 * w
    p = p012 * (1 - w) + p123 * w
    dpdu = 3.0 * (p123 - p012)
    return p, dpdu


def _rmf_frames(dpdu: np.ndarray):
    """Rotation-minimizing normal frames along one curve's samples [K,3]."""
    k = dpdu.shape[0]
    t = dpdu / np.maximum(np.linalg.norm(dpdu, axis=-1, keepdims=True), 1e-12)
    # Initial normal: any vector not parallel to t0.
    a = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(t[0], a)) > 0.9:
        a = np.array([1.0, 0.0, 0.0])
    n = np.cross(t[0], a)
    n /= max(np.linalg.norm(n), 1e-12)
    out = np.zeros_like(t)
    out[0] = n
    for i in range(1, k):
        # Double-reflection RMF step.
        v1 = t[i] - t[i - 1]
        c1 = np.dot(v1, v1)
        if c1 < 1e-12:
            out[i] = out[i - 1]
            continue
        nl = out[i - 1] - (2.0 / c1) * np.dot(v1, out[i - 1]) * v1
        tl = t[i - 1] - (2.0 / c1) * np.dot(v1, t[i - 1]) * v1
        v2 = t[i] - tl
        c2 = np.dot(v2, v2)
        if c2 < 1e-12:
            out[i] = nl
        else:
            out[i] = nl - (2.0 / c2) * np.dot(v2, nl) * v2
        out[i] /= max(np.linalg.norm(out[i]), 1e-12)
    return out


def tessellate_curves(
    cps: np.ndarray,
    width0,
    width1,
    curve_type: str = "flat",
    normals: np.ndarray | None = None,
    n_segments: int = 8,
    u_range=None,
):
    """Tessellate cubic Bezier curves into ribbon meshes.

    cps: [C, 4, 3] control points (world space); width0/width1 scalars or
    [C]; normals: [C, 2, 3] ribbon end normals (type "ribbon").
    Returns (indices [T,3], P [V,3], N [V,3], UV [V,2]) for one merged mesh.
    """
    cps = np.asarray(cps, np.float32).reshape(-1, 4, 3)
    C = cps.shape[0]
    w0 = np.broadcast_to(np.asarray(width0, np.float32), (C,))
    w1 = np.broadcast_to(np.asarray(width1, np.float32), (C,))
    K = n_segments + 1
    us = np.linspace(0.0, 1.0, K).astype(np.float32)

    all_p, all_n, all_uv, all_idx = [], [], [], []
    v_base = 0
    p_all, dp_all = bezier_eval(cps, us)  # [C, K, 3] each
    for c in range(C):
        p = p_all[c]
        dp = dp_all[c]
        if normals is not None:
            n0 = normals[c, 0] / max(np.linalg.norm(normals[c, 0]), 1e-12)
            n1 = normals[c, 1] / max(np.linalg.norm(normals[c, 1]), 1e-12)
            # Slerp-ish: normalize the lerp (curve.cpp ribbon normal interp).
            nrm = (1 - us)[:, None] * n0 + us[:, None] * n1
            nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        else:
            nrm = _rmf_frames(dp)
        t = dp / np.maximum(np.linalg.norm(dp, axis=-1, keepdims=True), 1e-12)
        side = np.cross(nrm, t)
        side /= np.maximum(np.linalg.norm(side, axis=-1, keepdims=True), 1e-12)
        widths = (1 - us) * w0[c] + us * w1[c]
        half = 0.5 * widths[:, None] * side
        # Two vertex rails: v=0 and v=1 across the width.
        p0 = p - half
        p1 = p + half
        P = np.concatenate([p0, p1], 0)  # [2K, 3]
        geo_n = np.cross(t, side)
        Nv = np.concatenate([geo_n, geo_n], 0)
        UV = np.stack(
            [np.concatenate([us, us]),
             np.concatenate([np.zeros(K), np.ones(K)])], -1
        ).astype(np.float32)
        idx = []
        for i in range(K - 1):
            a, b2 = i, i + 1
            c0, d0 = K + i, K + i + 1
            idx.append([a, b2, c0])
            idx.append([b2, d0, c0])
        all_p.append(P)
        all_n.append(Nv)
        all_uv.append(UV)
        all_idx.append(np.asarray(idx, np.int64) + v_base)
        v_base += 2 * K
    return (
        np.concatenate(all_idx).astype(np.int64),
        np.concatenate(all_p).astype(np.float32),
        np.concatenate(all_n).astype(np.float32),
        np.concatenate(all_uv).astype(np.float32),
    )
