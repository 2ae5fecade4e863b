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


# ---------------------------------------------------------------------------
# Procedural ray-curve intersection (curve.cpp:188-380) — round-5 item.
#
# pbrt intersects curves by recursive subdivision against the ray.  The TPU
# re-expression replaces the recursion with a STATIC window sweep: each
# curve prim carries a (u0,u1) sub-range of its Bezier (pre-split at scene
# build so the pbrt refinement formula needs at most K_LOG2 further levels),
# and the prim test evaluates all 2^K_LOG2 leaf windows branch-free,
# masking windows beyond the per-ray maxDepth EXACTLY as pbrt computes it
# (the Log2 bit trick on ray-space curvature, curve.cpp:217-230).  Leaf
# math (edge tests, min-distance w, width test, v from the edge function)
# is curve.cpp:294-339 verbatim; like pbrt, a later (higher-u) passing
# window overwrites an earlier one within the same prim.
# ---------------------------------------------------------------------------
import jax
import jax.numpy as jnp

CURVE_FLAT, CURVE_CYLINDER, CURVE_RIBBON = 0, 1, 2
K_LOG2 = 4  # leaf windows per prim test = 16; build pre-splits to fit
CURVE_ROW_W = 28  # cp(12) w0 w1 u0 u1 n0(3) n1(3) angle invsin ctype pad(3)


def _lerp(t, a, b):
    return (1.0 - t) * a + t * b


def _blossom1(c0, c1, c2, c3, u0, u1, u2):
    """BlossomBezier (curve.cpp:44-50) on per-lane scalars/components."""
    a0 = _lerp(u0, c0, c1)
    a1 = _lerp(u0, c1, c2)
    a2 = _lerp(u0, c2, c3)
    b0 = _lerp(u1, a0, a1)
    b1 = _lerp(u1, a1, a2)
    return _lerp(u2, b0, b1)


def _eval_bezier1(c0, c1, c2, c3, u):
    """EvalBezier value + derivative on one component (curve.cpp:64-85);
    degenerate-derivative fallback handled by the CALLER (needs all 3
    components to test the squared length)."""
    a0 = _lerp(u, c0, c1)
    a1 = _lerp(u, c1, c2)
    a2 = _lerp(u, c2, c3)
    b0 = _lerp(u, a0, a1)
    b1 = _lerp(u, a1, a2)
    return _lerp(u, b0, b1), 3.0 * (b1 - b0)


def _log2_pbrt(v):
    """pbrt's round-to-nearest integer log2 via float bits (curve.cpp:220)."""
    bits = jax.lax.bitcast_convert_type(jnp.asarray(v, jnp.float32), jnp.int32)
    lg = (bits >> 23) - 127 + jnp.where((bits & (1 << 22)) != 0, 1, 0)
    return jnp.where(v < 1.0, 0, lg)


def curve_intersect(o, d, t_max, row, want_record: bool = False):
    """Batched Curve::Intersect.  o,d [N,3] (d normalized), t_max [N],
    row [N, CURVE_ROW_W] per-lane curve-prim data (world-space cps).

    Returns dict(hit, t) and, when want_record, (p_hit, p_error, ng, dpdu,
    dpdv, uv) — the SurfaceInteraction pieces (curve.cpp:340-370)."""
    cp = row[..., 0:12].reshape(row.shape[:-1] + (4, 3))
    w0 = row[..., 12]
    w1 = row[..., 13]
    u0g = row[..., 14]
    u1g = row[..., 15]
    n0 = row[..., 16:19]
    n1 = row[..., 19:22]
    norm_angle = row[..., 22]
    inv_sin_na = row[..., 23]
    ctype = row[..., 24].astype(jnp.int32)

    # --- ray coordinate system (curve.cpp:160-175) ---
    span = cp[..., 3, :] - cp[..., 0, :]
    up0 = jnp.cross(d, span)
    deg = jnp.sum(up0 * up0, axis=-1) < 1e-20
    from ..core.vecmath import coordinate_system

    fb, _ = coordinate_system(d)
    up = jnp.where(deg[..., None], fb, up0)
    upl = jnp.sqrt(jnp.maximum(jnp.sum(up * up, -1, keepdims=True), 1e-30))
    right0 = jnp.cross(up / upl, d)
    rl = jnp.sqrt(jnp.maximum(jnp.sum(right0 * right0, -1, keepdims=True), 1e-30))
    right = right0 / rl
    newup = jnp.cross(d, right)

    def to_ray_p(p):
        q = p - o
        return (jnp.sum(right * q, -1), jnp.sum(newup * q, -1),
                jnp.sum(d * q, -1))

    cx = []
    cy = []
    cz = []
    for i in range(4):
        x, y, z = to_ray_p(cp[..., i, :])
        cx.append(x)
        cy.append(y)
        cz.append(z)

    zmax = t_max  # d normalized -> rayLength == 1
    wid_u0 = _lerp(u0g, w0, w1)
    wid_u1 = _lerp(u1g, w0, w1)
    max_width = jnp.maximum(wid_u0, wid_u1)

    def box_miss(xs, mw, zmax_):
        mx = jnp.maximum(jnp.maximum(xs[0], xs[1]), jnp.maximum(xs[2], xs[3]))
        mn = jnp.minimum(jnp.minimum(xs[0], xs[1]), jnp.minimum(xs[2], xs[3]))
        return (mx + 0.5 * mw < 0.0) | (mn - 0.5 * mw > zmax_)

    prim_miss = (
        box_miss(cy, max_width, 0.0)
        | box_miss(cx, max_width, 0.0)
        | box_miss(cz, max_width, zmax)
    )

    # --- per-ray refinement depth (curve.cpp:207-230) ---
    l0 = jnp.zeros_like(w0)
    for i in range(2):
        l0 = jnp.maximum(
            l0,
            jnp.maximum(
                jnp.maximum(
                    jnp.abs(cx[i] - 2.0 * cx[i + 1] + cx[i + 2]),
                    jnp.abs(cy[i] - 2.0 * cy[i + 1] + cy[i + 2]),
                ),
                jnp.abs(cz[i] - 2.0 * cz[i + 1] + cz[i + 2]),
            ),
        )
    eps = jnp.maximum(w0, w1) * 0.05
    r0 = _log2_pbrt(1.41421356237 * 6.0 * l0 / (8.0 * jnp.maximum(eps, 1e-20))) // 2
    depth = jnp.clip(r0, 0, 10)
    d_eff = jnp.minimum(depth, K_LOG2).astype(jnp.int32)
    stride = jnp.left_shift(jnp.int32(1), K_LOG2 - d_eff)  # windows coarsen
    inv_k = 1.0 / (1 << K_LOG2)

    hit = jnp.zeros(w0.shape, bool)
    t_out = jnp.zeros_like(w0)
    u_out = jnp.zeros_like(w0)
    v_out = jnp.zeros_like(w0)
    nhit_out = jnp.zeros(w0.shape + (3,), jnp.float32)
    wseg_out = jnp.zeros_like(w0)  # window-local w for the record pass
    s0_out = jnp.zeros_like(w0)
    s1_out = jnp.zeros_like(w0)

    for wdx in range(1 << K_LOG2):
        active = (jnp.int32(wdx) & (stride - 1)) == 0
        s0 = wdx * inv_k
        s1 = s0 + stride.astype(jnp.float32) * inv_k
        # window control points in ray space (blossom is affine, so it
        # commutes with the ray transform)
        qx = [
            _blossom1(cx[0], cx[1], cx[2], cx[3], a, b_, c_)
            for (a, b_, c_) in ((s0, s0, s0), (s0, s0, s1), (s0, s1, s1),
                                (s1, s1, s1))
        ]
        qy = [
            _blossom1(cy[0], cy[1], cy[2], cy[3], a, b_, c_)
            for (a, b_, c_) in ((s0, s0, s0), (s0, s0, s1), (s0, s1, s1),
                                (s1, s1, s1))
        ]
        qz = [
            _blossom1(cz[0], cz[1], cz[2], cz[3], a, b_, c_)
            for (a, b_, c_) in ((s0, s0, s0), (s0, s0, s1), (s0, s1, s1),
                                (s1, s1, s1))
        ]
        uw0 = _lerp(s0, u0g, u1g)
        uw1 = _lerp(jnp.minimum(s1, 1.0), u0g, u1g)
        mw = jnp.maximum(_lerp(uw0, w0, w1), _lerp(uw1, w0, w1))
        cull = box_miss(qy, mw, 0.0) | box_miss(qx, mw, 0.0) | box_miss(
            qz, mw, zmax
        )
        # --- leaf test (curve.cpp:294-339) ---
        edge0 = (qy[1] - qy[0]) * (-qy[0]) + qx[0] * (qx[0] - qx[1])
        edge1 = (qy[2] - qy[3]) * (-qy[3]) + qx[3] * (qx[3] - qx[2])
        sdx = qx[3] - qx[0]
        sdy = qy[3] - qy[0]
        denom = sdx * sdx + sdy * sdy
        wseg = (-(qx[0]) * sdx + (-(qy[0])) * sdy) / jnp.where(
            denom == 0.0, 1.0, denom
        )
        u_hit = jnp.clip(_lerp(wseg, uw0, uw1), uw0, uw1)
        hit_width = _lerp(u_hit, w0, w1)
        # ribbon orientation scaling (curve.cpp:311-318)
        sin0 = jnp.sin((1.0 - u_hit) * norm_angle) * inv_sin_na
        sin1 = jnp.sin(u_hit * norm_angle) * inv_sin_na
        nhit_r = sin0[..., None] * n0 + sin1[..., None] * n1
        # parallel end normals: angle ~ 0 -> plain lerp
        small = norm_angle < 1e-6
        nhit_r = jnp.where(
            small[..., None],
            _lerp(u_hit[..., None], n0, n1),
            nhit_r,
        )
        is_ribbon = ctype == CURVE_RIBBON
        hit_width = jnp.where(
            is_ribbon,
            hit_width * jnp.abs(jnp.sum(nhit_r * d, -1)),
            hit_width,
        )
        wc = jnp.clip(wseg, 0.0, 1.0)
        pcx, _dx_ = _eval_bezier1(qx[0], qx[1], qx[2], qx[3], wc)
        pcy, _dy_ = _eval_bezier1(qy[0], qy[1], qy[2], qy[3], wc)
        pcz, _dz_ = _eval_bezier1(qz[0], qz[1], qz[2], qz[3], wc)
        dist2 = pcx * pcx + pcy * pcy
        ok = (
            active
            & ~cull
            & (edge0 >= 0.0)
            & (edge1 >= 0.0)
            & (denom != 0.0)
            & (dist2 <= hit_width * hit_width * 0.25)
            & (pcz >= 0.0)
            & (pcz <= zmax)
        )
        dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
        edge_f = _dx_ * (-pcy) + pcx * _dy_
        v = jnp.where(
            edge_f > 0.0,
            0.5 + dist / jnp.maximum(hit_width, 1e-20),
            0.5 - dist / jnp.maximum(hit_width, 1e-20),
        )
        # pbrt's recursion overwrites tHit on every passing leaf, in
        # ascending-u order: later windows win.
        hit = hit | ok
        t_out = jnp.where(ok, pcz, t_out)
        u_out = jnp.where(ok, u_hit, u_out)
        v_out = jnp.where(ok, v, v_out)
        nhit_out = jnp.where(ok[..., None], nhit_r, nhit_out)
        wseg_out = jnp.where(ok, wc, wseg_out)
        s0_out = jnp.where(ok, s0, s0_out)
        s1_out = jnp.where(ok, s1, s1_out)

    hit = hit & ~prim_miss
    out = {"hit": hit, "t": jnp.where(hit, t_out, jnp.inf)}
    if not want_record:
        return out

    # --- SurfaceInteraction pieces (curve.cpp:340-370) ---
    u = u_out
    # dpdu of the PRIM's bezier at local s (prim cps are the blossomed
    # sub-curve; direction equals pbrt's full-curve dpdu, magnitude scales
    # by (u1-u0) -- normalized downstream, documented deviation).
    s_loc = jnp.where(
        u1g > u0g, (u - u0g) / jnp.maximum(u1g - u0g, 1e-20), 0.0
    )
    dpdu_c = []
    for comp in range(3):
        c0, c1, c2, c3 = (cp[..., i, comp] for i in range(4))
        _, dv = _eval_bezier1(c0, c1, c2, c3, s_loc)
        dpdu_c.append(dv)
    dpdu = jnp.stack(dpdu_c, -1)
    dpdu_deg = jnp.sum(dpdu * dpdu, -1) < 1e-24
    dpdu = jnp.where(dpdu_deg[..., None], span, dpdu)
    hw = _lerp(u, w0, w1)
    is_ribbon = ctype == CURVE_RIBBON
    hw = jnp.where(
        is_ribbon, hw * jnp.abs(jnp.sum(nhit_out * d, -1)), hw
    )
    # flat/cylinder dpdv in the ray plane (curve.cpp:355-366)
    dpdu_px = jnp.sum(right * dpdu, -1)
    dpdu_py = jnp.sum(newup * dpdu, -1)
    dpl = jnp.sqrt(jnp.maximum(dpdu_px * dpdu_px + dpdu_py * dpdu_py, 1e-30))
    dvx = -dpdu_py / dpl
    dvy = dpdu_px / dpl
    # cylinder: rotate dpdvPlane by -theta around dpduPlane
    theta = _lerp(v_out, -90.0, 90.0) * (jnp.pi / 180.0)
    is_cyl = ctype == CURVE_CYLINDER
    # Rodrigues in the ray plane basis: axis = normalize(dpduPlane, 0)
    axx = dpdu_px / dpl
    axy = dpdu_py / dpl
    ct = jnp.cos(-theta)
    st = jnp.sin(-theta)
    # v_plane = (dvx, dvy, 0); axis = (axx, axy, 0) (unit, in-plane):
    # rotate: v' = v cos + (axis x v) sin + axis (axis.v)(1-cos);
    # axis x v = (0, 0, axx*dvy - axy*dvx); axis.v = axx*dvx + axy*dvy = 0
    czc = (axx * dvy - axy * dvx) * st
    rvx = jnp.where(is_cyl, dvx * ct, dvx)
    rvy = jnp.where(is_cyl, dvy * ct, dvy)
    rvz = jnp.where(is_cyl, czc, jnp.zeros_like(ct))
    dpdv_world = (
        rvx[..., None] * right + rvy[..., None] * newup + rvz[..., None] * d
    ) * hw[..., None]
    # ribbon dpdv (curve.cpp:352-353)
    rib_dv = jnp.cross(nhit_out, dpdu)
    rl2 = jnp.sqrt(jnp.maximum(jnp.sum(rib_dv * rib_dv, -1, keepdims=True), 1e-30))
    dpdv = jnp.where(
        is_ribbon[..., None], rib_dv / rl2 * hw[..., None], dpdv_world
    )
    p_hit = o + t_out[..., None] * d
    ng_raw = jnp.cross(dpdu, dpdv)
    ngl = jnp.sqrt(jnp.maximum(jnp.sum(ng_raw * ng_raw, -1, keepdims=True), 1e-30))
    out.update(
        p_hit=p_hit,
        p_error=jnp.broadcast_to((2.0 * hw)[..., None], p_hit.shape),
        ng=ng_raw / ngl,
        dpdu=dpdu,
        dpdv=dpdv,
        uv=jnp.stack([u, v_out], -1),
    )
    return out


def pack_curve_rows(cp, w0, w1, u0, u1, ctype, n0=None, n1=None):
    """Host-side rows for curve_packed [C, CURVE_ROW_W]."""
    cp = np.asarray(cp, np.float32).reshape(-1, 12)
    c = cp.shape[0]
    rows = np.zeros((c, CURVE_ROW_W), np.float32)
    rows[:, 0:12] = cp
    rows[:, 12] = w0
    rows[:, 13] = w1
    rows[:, 14] = u0
    rows[:, 15] = u1
    if n0 is not None:
        n0 = np.asarray(n0, np.float32).reshape(-1, 3)
        n1 = np.asarray(n1, np.float32).reshape(-1, 3)
        n0 = n0 / np.maximum(np.linalg.norm(n0, axis=-1, keepdims=True), 1e-12)
        n1 = n1 / np.maximum(np.linalg.norm(n1, axis=-1, keepdims=True), 1e-12)
        rows[:, 16:19] = n0
        rows[:, 19:22] = n1
        ang = np.arccos(np.clip(np.sum(n0 * n1, -1), 0.0, 1.0))
        rows[:, 22] = ang
        with np.errstate(divide="ignore"):
            rows[:, 23] = np.where(ang > 1e-6, 1.0 / np.sin(ang), 0.0)
    rows[:, 24] = ctype
    return rows


def curve_build_depth(cp) -> int:
    """Conservative object-space refinement depth (the per-ray formula's
    upper bound over rotations: 2-norm second differences).  Build splits
    a prim until this is <= K_LOG2, so the in-test window sweep reaches
    pbrt's exact refinement."""
    cp = np.asarray(cp, np.float64).reshape(4, 3)
    l0 = 0.0
    for i in range(2):
        l0 = max(l0, float(np.linalg.norm(cp[i] - 2 * cp[i + 1] + cp[i + 2])))
    return l0


def split_curve_for_build(cp, w0, w1, u0=0.0, u1=1.0, max_extra=6):
    """Split (cp, [u0,u1]) until the conservative depth fits K_LOG2.
    Returns list of (cp12, u0, u1) with cps world-space blossomed."""
    cp = np.asarray(cp, np.float64).reshape(4, 3)
    out = []

    def blossom_np(c, s0, s1):
        def bl(a, b_, cc):
            a0 = c[0] * (1 - a) + c[1] * a
            a1 = c[1] * (1 - a) + c[2] * a
            a2 = c[2] * (1 - a) + c[3] * a
            b0 = a0 * (1 - b_) + a1 * b_
            b1 = a1 * (1 - b_) + a2 * b_
            return b0 * (1 - cc) + b1 * cc

        return np.stack([bl(s0, s0, s0), bl(s0, s0, s1), bl(s0, s1, s1),
                         bl(s1, s1, s1)])

    def rec(c, a, b_, extra):
        l0 = curve_build_depth(c)
        eps = max(w0, w1) * 0.05
        import math as _m

        if l0 <= 0 or eps <= 0:
            depth = 0
        else:
            depth = max(0, round(_m.log2(1.41421356237 * 6.0 * l0 / (8.0 * eps)))) // 2
        if depth <= K_LOG2 or extra <= 0:
            out.append((c.reshape(12).astype(np.float32), a, b_))
            return
        mid_s = 0.5
        c_lo = blossom_np(c, 0.0, mid_s)
        c_hi = blossom_np(c, mid_s, 1.0)
        mid_u = 0.5 * (a + b_)
        rec(c_lo, a, mid_u, extra - 1)
        rec(c_hi, mid_u, b_, extra - 1)

    rec(cp, float(u0), float(u1), max_extra)
    return out


def curve_prim_bounds(cp12, u0, u1, w0, w1):
    """Curve::ObjectBound (curve.cpp:123-135): convex hull of the segment's
    cps expanded by max width/2.  cp12 is already the SEGMENT's cps."""
    c = np.asarray(cp12, np.float32).reshape(4, 3)
    mw = 0.5 * max((1 - u0) * w0 + u0 * w1, (1 - u1) * w0 + u1 * w1)
    return c.min(0) - mw, c.max(0) + mw
