"""Watertight ray-triangle intersection, batched.

TPU re-expression of pbrt's Triangle::Intersect (shapes/triangle.cpp:188-430):
translate-to-origin, permute axes so z is the max |d| component, shear to the
ray frame, signed 2D edge functions, scaled depth test, gamma()-bounded error
estimates.  All lanes evaluate branch-free with masks; the exact-zero-edge
double-precision fallback (triangle.cpp:243-250) is implemented with Dekker
two-product double-single arithmetic (core/dsfloat.py) — TPU has no f64
lanes, so the exact 2D cross re-evaluation supplies the same decision bits.

Mesh storage is SoA in HBM: positions [V,3], indices [T,3], optional normals /
tangents / uv; vertices are pre-transformed to world space at scene compile
exactly as the reference does at creation (triangle.cpp:54).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import dsfloat as ds
from ..core.vecmath import cross, dot, normalize, vec, gamma, coordinate_system

GAMMA2 = gamma(2)
GAMMA3 = gamma(3)
GAMMA5 = gamma(5)
GAMMA6 = gamma(6)
GAMMA7 = gamma(7)


def _max_dimension(v):
    ax = jnp.abs(v)
    return jnp.where(
        ax[..., 0] > ax[..., 1],
        jnp.where(ax[..., 0] > ax[..., 2], 0, 2),
        jnp.where(ax[..., 1] > ax[..., 2], 1, 2),
    )


def _permute(v, kx, ky, kz):
    # Select-chain, NOT take_along_axis: per-lane gathers on [N,3] cost
    # 21 of this function's former 23ms at 160k lanes (round-5 probe);
    # the where-based pick fuses and runs in ~2.7ms.
    from ..core.vecmath import permute3

    return permute3(v, kx, ky, kz)


def intersect_triangle(o, d, t_max, p0, p1, p2):
    """Watertight intersect of ray batch vs per-lane triangle.

    All args batched on leading axes.  Returns dict with:
      hit [.] bool, t [.], b0 b1 b2 barycentrics, p_hit [.,3], p_error [.,3].
    """
    # Translate vertices to ray origin (triangle.cpp:206-210).
    p0t = p0 - o
    p1t = p1 - o
    p2t = p2 - o

    # Permute so |d| max axis is z (triangle.cpp:211-218).
    kz = _max_dimension(d)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    dt = _permute(d, kx, ky, kz)
    p0t = _permute(p0t, kx, ky, kz)
    p1t = _permute(p1t, kx, ky, kz)
    p2t = _permute(p2t, kx, ky, kz)

    # Shear to align ray with +z (triangle.cpp:219-230).  Degenerate (zero)
    # directions only occur on masked lanes; guard the divide so they can't
    # produce NaN t's (NaN compares false through every miss test below,
    # which would otherwise make a dead lane report hit=True, t=NaN) or
    # poison the backward pass.
    dz = dt[..., 2]
    degen = dz == 0.0
    inv_dz = 1.0 / jnp.where(degen, 1.0, dz)
    sx = -dt[..., 0] * inv_dz
    sy = -dt[..., 1] * inv_dz
    sz = inv_dz
    p0x = p0t[..., 0] + sx * p0t[..., 2]
    p0y = p0t[..., 1] + sy * p0t[..., 2]
    p1x = p1t[..., 0] + sx * p1t[..., 2]
    p1y = p1t[..., 1] + sy * p1t[..., 2]
    p2x = p2t[..., 0] + sx * p2t[..., 2]
    p2y = p2t[..., 1] + sy * p2t[..., 2]

    # Edge functions (triangle.cpp:236-250).  pbrt recomputes all three in
    # f64 when any is exactly zero (the watertightness fallback); TPU lanes
    # have no f64, so the fallback is double-single exact 2D cross products
    # (core/dsfloat.py) rounded back to f32 — same decision bits.
    e0 = p1x * p2y - p1y * p2x
    e1 = p2x * p0y - p2y * p0x
    e2 = p0x * p1y - p0y * p1x
    any_zero = (e0 == 0.0) | (e1 == 0.0) | (e2 == 0.0)
    e0 = jnp.where(any_zero, ds.dd_cross2_f32(p1x, p1y, p2x, p2y), e0)
    e1 = jnp.where(any_zero, ds.dd_cross2_f32(p2x, p2y, p0x, p0y), e1)
    e2 = jnp.where(any_zero, ds.dd_cross2_f32(p0x, p0y, p1x, p1y), e2)

    has_neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    has_pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    det = e0 + e1 + e2
    miss_sign = has_neg & has_pos
    miss_det = det == 0.0

    # Scaled hit distance (triangle.cpp:252-266).
    p0z = p0t[..., 2] * sz
    p1z = p1t[..., 2] * sz
    p2z = p2t[..., 2] * sz
    t_scaled = e0 * p0z + e1 * p1z + e2 * p2z
    neg_det = det < 0.0
    miss_range = jnp.where(
        neg_det,
        (t_scaled >= 0.0) | (t_scaled < t_max * det),
        (t_scaled <= 0.0) | (t_scaled > t_max * det),
    )

    inv_det = 1.0 / jnp.where(miss_det, 1.0, det)
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det
    t = t_scaled * inv_det

    # Conservative depth test against rounding (triangle.cpp:270-296).
    max_zt = jnp.maximum(jnp.maximum(jnp.abs(p0z), jnp.abs(p1z)), jnp.abs(p2z))
    delta_z = GAMMA3 * max_zt
    max_xt = jnp.maximum(jnp.maximum(jnp.abs(p0x), jnp.abs(p1x)), jnp.abs(p2x))
    max_yt = jnp.maximum(jnp.maximum(jnp.abs(p0y), jnp.abs(p1y)), jnp.abs(p2y))
    delta_x = GAMMA5 * (max_xt + max_zt)
    delta_y = GAMMA5 * (max_yt + max_zt)
    delta_e = 2.0 * (GAMMA2 * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt)
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    delta_t = 3.0 * (
        GAMMA3 * max_e * max_zt + delta_e * max_zt + delta_z * max_e
    ) * jnp.abs(inv_det)
    miss_eps = t <= delta_t

    hit = ~(miss_sign | miss_det | miss_range | miss_eps | degen)

    p_hit = b0[..., None] * p0 + b1[..., None] * p1 + b2[..., None] * p2
    # Error bounds (triangle.cpp:302-305): gamma(7) * sum |b_i p_i|.
    x_abs = (
        jnp.abs(b0[..., None] * p0)
        + jnp.abs(b1[..., None] * p1)
        + jnp.abs(b2[..., None] * p2)
    )
    p_error = GAMMA7 * x_abs

    return {
        "hit": hit,
        "t": jnp.where(hit, t, jnp.inf),
        "b0": b0,
        "b1": b1,
        "b2": b2,
        "p_hit": p_hit,
        "p_error": p_error,
    }


def triangle_geometry(p0, p1, p2, uv0, uv1, uv2):
    """Partial derivatives & geometric normal from uv parameterization
    (triangle.cpp:309-334 region).  Returns (ng, dpdu, dpdv)."""
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    dp02 = p0 - p2
    dp12 = p1 - p2
    det = duv02[..., 0] * duv12[..., 1] - duv02[..., 1] * duv12[..., 0]
    degenerate = jnp.abs(det) < 1e-8
    inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
    dpdu = (duv12[..., 1:2] * dp02 - duv02[..., 1:2] * dp12) * inv_det[..., None]
    dpdv = (-duv12[..., 0:1] * dp02 + duv02[..., 0:1] * dp12) * inv_det[..., None]
    ng = normalize(cross(dp02, dp12))
    # Degenerate uv: build any frame around ng (triangle.cpp:327-334).
    t_fb, b_fb = coordinate_system(ng)
    dpdu = jnp.where(degenerate[..., None], t_fb, dpdu)
    dpdv = jnp.where(degenerate[..., None], b_fb, dpdv)
    return ng, dpdu, dpdv
