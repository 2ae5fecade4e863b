"""Quadric shapes (sphere, cylinder, disk, cone, paraboloid, hyperboloid).

TPU re-expression of src/shapes/{sphere,cylinder,disk,...}.cpp: one
type-switched kernel family over a SoA quadric table.  Each quadric carries
its object<->world 4x4 matrices (quadrics intersect in object space,
sphere.cpp:70-77) plus params {radius, z_min, z_max, phi_max, extra}.

The reference uses EFloat interval arithmetic for robust quadratic roots
(efloat.h:48-100), retreating to f64 for the discriminant + sqrt; here the
discriminant is computed in double-single (two-float) emulation
(core/dsfloat.py) with pbrt's closed-form gamma() error bounds for the
t-epsilons — SURVEY.md §2.1's "conservative fixed gamma(n) scalars" plan.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import dsfloat as ds
from ..core import vecmath as vm
from ..core.vecmath import dot, gamma, length, normalize, vec, cross

QUADRIC_SPHERE = 0
QUADRIC_CYLINDER = 1
QUADRIC_DISK = 2
QUADRIC_CONE = 3
QUADRIC_PARABOLOID = 4
QUADRIC_HYPERBOLOID = 5


def _quadratic(a, b, c):
    """Stable quadratic solve (efloat.h:48-100 Quadratic), vectorized.

    The discriminant and its square root are computed in double-single
    (two-float) arithmetic — pbrt's one f64 refuge in the intersection path
    (`(double)b*b - 4*(double)a*c`, `std::sqrt(double)`); TPU lanes have no
    f64, so core/dsfloat.py emulates the ~48 bits that decide which root a
    grazing ray takes.  Everything after the rounded-to-f32 root follows
    pbrt's f32 EFloat center arithmetic.

    Returns (ok, t0, t1) with t0 <= t1.
    """
    dh, dl = ds.dd_discriminant(a, b, c)
    ok = ~((dh < 0.0) | ((dh == 0.0) & (dl < 0.0)))
    root = ds.dd_sqrt_to_f32(dh, dl)
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    t0 = q / jnp.where(a == 0.0, 1.0, a)
    t1 = c / jnp.where(q == 0.0, 1.0, q)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    return ok, lo, hi


def _safe_atan2(y, x):
    """arctan2 with a zero (not NaN) gradient at (0,0) — masked lanes hit
    the origin exactly and arctan2's partials are y/(x^2+y^2) there."""
    zero = (x == 0.0) & (y == 0.0)
    return jnp.arctan2(jnp.where(zero, 0.0, y), jnp.where(zero, 1.0, x))


def xform_point(m, p):
    return vm.xform_point(m, p)


def xform_vector(m, v):
    return vm.xform_vector(m, v)


def intersect_sphere_object(oo, od, t_max, radius, z_min, z_max, phi_max):
    """Lightweight t-only sphere test, ray already in object space (the
    traversal hot loop; full attributes come from intersect_sphere in
    hit_record)."""
    a = dot(od, od)
    b = 2.0 * dot(oo, od)
    c = dot(oo, oo) - radius * radius
    ok, t0, t1 = _quadratic(a, b, c)

    def clip(t):
        p = oo + t[..., None] * od
        phi = _safe_atan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        z_ok = jnp.where(z_min > -radius, p[..., 2] >= z_min, True) & jnp.where(
            z_max < radius, p[..., 2] <= z_max, True
        )
        return z_ok & (phi <= phi_max)

    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & clip(t0)
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & clip(t1)
    hit = valid0 | valid1
    t = jnp.where(valid0, t0, t1)
    return {"hit": hit, "t": jnp.where(hit, t, jnp.inf)}


def intersect_cylinder_object(oo, od, t_max, radius, z_min, z_max, phi_max):
    a = od[..., 0] ** 2 + od[..., 1] ** 2
    b = 2.0 * (od[..., 0] * oo[..., 0] + od[..., 1] * oo[..., 1])
    c = oo[..., 0] ** 2 + oo[..., 1] ** 2 - radius * radius
    ok, t0, t1 = _quadratic(a, b, c)

    def clip(t):
        p = oo + t[..., None] * od
        phi = _safe_atan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        return (p[..., 2] >= z_min) & (p[..., 2] <= z_max) & (phi <= phi_max)

    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & clip(t0)
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & clip(t1)
    hit = valid0 | valid1
    t = jnp.where(valid0, t0, t1)
    return {"hit": hit, "t": jnp.where(hit, t, jnp.inf)}


def intersect_disk_object(oo, od, t_max, radius, inner_radius, height, phi_max):
    dz = jnp.where(od[..., 2] == 0.0, 1e-20, od[..., 2])
    t = (height - oo[..., 2]) / dz
    p = oo + t[..., None] * od
    dist2 = p[..., 0] ** 2 + p[..., 1] ** 2
    phi = _safe_atan2(p[..., 1], p[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2 * jnp.pi, phi)
    hit = (
        (od[..., 2] != 0.0)
        & (t > 0.0)
        & (t < t_max)
        & (dist2 <= radius * radius)
        & (dist2 >= inner_radius * inner_radius)
        & (phi <= phi_max)
    )
    return {"hit": hit, "t": jnp.where(hit, t, jnp.inf)}


def intersect_sphere(o, d, t_max, w2o, o2w, radius, z_min, z_max, phi_max):
    """Sphere::Intersect (sphere.cpp:70-236), batched & branch-free.

    o, d: world-space ray; w2o/o2w: [..., 4, 4]; scalars broadcast.
    Returns dict: hit, t, p_hit (world), ng (world), uv, p_error (world).
    """
    oo = xform_point(w2o, o)
    od = xform_vector(w2o, d)

    a = dot(od, od)
    b = 2.0 * dot(oo, od)
    c = dot(oo, oo) - radius * radius
    ok, t0, t1 = _quadratic(a, b, c)

    def clip_phi(p_hit):
        # Refine: project exactly to the sphere (sphere.cpp:139).
        p_hit = p_hit * (radius / jnp.maximum(length(p_hit), 1e-20))[..., None]
        x = jnp.where(
            (p_hit[..., 0] == 0.0) & (p_hit[..., 1] == 0.0),
            1e-5 * radius,
            p_hit[..., 0],
        )
        p_hit = p_hit.at[..., 0].set(x) if hasattr(p_hit, "at") else p_hit
        phi = _safe_atan2(p_hit[..., 1], p_hit[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        z_ok = jnp.where(
            (z_min > -radius), p_hit[..., 2] >= z_min, True
        ) & jnp.where((z_max < radius), p_hit[..., 2] <= z_max, True)
        return p_hit, phi, z_ok & (phi <= phi_max)

    # Try t0, fall back to t1 (sphere.cpp:128-158 clipping logic).
    full = (z_min <= -radius) & (z_max >= radius) & (phi_max >= 2.0 * jnp.pi - 1e-6)

    p0 = oo + t0[..., None] * od
    p0, phi0, ok0 = clip_phi(p0)
    p1 = oo + t1[..., None] * od
    p1, phi1, ok1 = clip_phi(p1)

    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & ok0
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & ok1
    hit = valid0 | valid1
    use0 = valid0
    t = jnp.where(use0, t0, t1)
    p_hit = jnp.where(use0[..., None], p0, p1)
    phi = jnp.where(use0, phi0, phi1)

    # Parametric uv (sphere.cpp:160-169).
    u = phi / phi_max
    theta = jnp.arccos(jnp.clip(p_hit[..., 2] / radius, -1.0, 1.0))
    theta_min = jnp.arccos(jnp.clip(z_max / radius, -1.0, 1.0))
    theta_max = jnp.arccos(jnp.clip(z_min / radius, -1.0, 1.0))
    v = (theta - theta_min) / jnp.maximum(theta_max - theta_min, 1e-20)
    uv = jnp.stack([u, v], axis=-1)

    # Object-space error bound gamma(5)*|pHit| (sphere.cpp:225).
    p_err_obj = gamma(5) * jnp.abs(p_hit)

    ng_obj = normalize(p_hit)
    # To world: point via o2w, normal via inverse-transpose = w2o^T.
    p_world = xform_point(o2w, p_hit)
    ng_world = normalize(
        vm.xform_normal_w2o(w2o, ng_obj)
    )
    # Transform error through o2w (geometry abs-matrix bound, transform.h:303).
    abs_m = jnp.abs(o2w[..., :3, :3])
    p_err_world = (
        jnp.sum(abs_m * (p_err_obj)[..., None, :], axis=-1)
        + gamma(3)
        * (
            jnp.sum(abs_m * jnp.abs(p_hit)[..., None, :], axis=-1)
            + jnp.abs(o2w[..., :3, 3])
        )
    )
    return {
        "hit": hit,
        "t": jnp.where(hit, t, jnp.inf),
        "p_hit": p_world,
        "ng": ng_world,
        "uv": uv,
        "p_error": p_err_world,
    }


def intersect_disk(o, d, t_max, w2o, o2w, radius, inner_radius, height, phi_max):
    """Disk::Intersect (disk.cpp:47-107)."""
    oo = xform_point(w2o, o)
    od = xform_vector(w2o, d)
    dz = jnp.where(od[..., 2] == 0.0, 1e-20, od[..., 2])
    t = (height - oo[..., 2]) / dz
    p_hit = oo + t[..., None] * od
    dist2 = p_hit[..., 0] ** 2 + p_hit[..., 1] ** 2
    phi = _safe_atan2(p_hit[..., 1], p_hit[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2 * jnp.pi, phi)
    hit = (
        (od[..., 2] != 0.0)
        & (t > 0.0)
        & (t < t_max)
        & (dist2 <= radius * radius)
        & (dist2 >= inner_radius * inner_radius)
        & (phi <= phi_max)
    )
    r_hit = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    u = phi / phi_max
    v = (radius - r_hit) / jnp.maximum(radius - inner_radius, 1e-20)
    ng_obj = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), p_hit.shape)
    p_world = xform_point(o2w, p_hit)
    ng_world = normalize(vm.xform_normal_w2o(w2o, ng_obj))
    return {
        "hit": hit,
        "t": jnp.where(hit, t, jnp.inf),
        "p_hit": p_world,
        "ng": ng_world,
        "uv": jnp.stack([u, v], axis=-1),
        "p_error": jnp.zeros_like(p_hit),
    }


def intersect_cylinder(o, d, t_max, w2o, o2w, radius, z_min, z_max, phi_max):
    """Cylinder::Intersect (cylinder.cpp:47-156)."""
    oo = xform_point(w2o, o)
    od = xform_vector(w2o, d)
    a = od[..., 0] ** 2 + od[..., 1] ** 2
    b = 2.0 * (od[..., 0] * oo[..., 0] + od[..., 1] * oo[..., 1])
    c = oo[..., 0] ** 2 + oo[..., 1] ** 2 - radius * radius
    ok, t0, t1 = _quadratic(a, b, c)

    def clip(t):
        p = oo + t[..., None] * od
        hit_r = jnp.sqrt(jnp.maximum(p[..., 0] ** 2 + p[..., 1] ** 2, 1e-20))
        p = p * jnp.stack(
            [radius / hit_r, radius / hit_r, jnp.ones_like(hit_r)], -1
        )
        phi = _safe_atan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
        okc = (p[..., 2] >= z_min) & (p[..., 2] <= z_max) & (phi <= phi_max)
        return p, phi, okc

    p0, phi0, ok0 = clip(t0)
    p1, phi1, ok1 = clip(t1)
    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & ok0
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & ok1
    hit = valid0 | valid1
    t = jnp.where(valid0, t0, t1)
    p_hit = jnp.where(valid0[..., None], p0, p1)
    phi = jnp.where(valid0, phi0, phi1)
    u = phi / phi_max
    v = (p_hit[..., 2] - z_min) / jnp.maximum(z_max - z_min, 1e-20)
    ng_obj = normalize(
        jnp.stack([p_hit[..., 0], p_hit[..., 1], jnp.zeros_like(phi)], -1)
    )
    p_world = xform_point(o2w, p_hit)
    ng_world = normalize(vm.xform_normal_w2o(w2o, ng_obj))
    p_err_obj = gamma(3) * jnp.abs(
        jnp.stack([p_hit[..., 0], p_hit[..., 1], jnp.zeros_like(phi)], -1)
    )
    abs_m = jnp.abs(o2w[..., :3, :3])
    p_err_world = jnp.sum(abs_m * (p_err_obj)[..., None, :], axis=-1) + gamma(3) * (
        jnp.sum(abs_m * jnp.abs(p_hit)[..., None, :], axis=-1)
        + jnp.abs(o2w[..., :3, 3])
    )
    return {
        "hit": hit,
        "t": jnp.where(hit, t, jnp.inf),
        "p_hit": p_world,
        "ng": ng_world,
        "uv": jnp.stack([u, v], axis=-1),
        "p_error": p_err_world,
    }


# ---------------------------------------------------------------------------
# Cone / paraboloid / hyperboloid (src/shapes/{cone,paraboloid,hyperboloid}.cpp)
#
# Params ride in the widened q_params[..., :8] slots:
#   cone:        [radius, height, phi_max, 0, ...]
#   paraboloid:  [radius, z_min, z_max, phi_max, ...]
#   hyperboloid: [ah, ch, z_min, z_max, phi_max, x1, y1, z1, x2, y2, z2]
#                (ah/ch pre-solved host-side with CreateHyperboloid's
#                degenerate-points nudge; p1/p2 drive uv)
# ---------------------------------------------------------------------------


def _world_attrs(o2w, w2o, p_hit, ng_obj, err_scale):
    """Object-space hit -> world point/normal/error (shared tail)."""
    p_world = xform_point(o2w, p_hit)
    ng_world = normalize(vm.xform_normal_w2o(w2o, ng_obj))
    p_err_obj = err_scale * jnp.abs(p_hit)
    abs_m = jnp.abs(o2w[..., :3, :3])
    p_err_world = jnp.sum(abs_m * (p_err_obj)[..., None, :], axis=-1) + gamma(3) * (
        jnp.sum(abs_m * jnp.abs(p_hit)[..., None, :], axis=-1)
        + jnp.abs(o2w[..., :3, 3])
    )
    return p_world, ng_world, p_err_world


def _cone_roots(oo, od, radius, height):
    k = (radius / jnp.where(height == 0.0, 1e-12, height)) ** 2
    ozh = oo[..., 2] - height
    a = od[..., 0] ** 2 + od[..., 1] ** 2 - k * od[..., 2] ** 2
    b = 2.0 * (od[..., 0] * oo[..., 0] + od[..., 1] * oo[..., 1]
               - k * od[..., 2] * ozh)
    c = oo[..., 0] ** 2 + oo[..., 1] ** 2 - k * ozh * ozh
    return _quadratic(a, b, c)


def intersect_cone_object(oo, od, t_max, par):
    """Cone t-only test (cone.cpp:47-137), ray in object space."""
    radius, height, phi_max = par[..., 0], par[..., 1], par[..., 2]
    ok, t0, t1 = _cone_roots(oo, od, radius, height)

    def clip(t):
        p = oo + t[..., None] * od
        phi = _safe_atan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        return (p[..., 2] >= 0.0) & (p[..., 2] <= height) & (phi <= phi_max)

    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & clip(t0)
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & clip(t1)
    hit = valid0 | valid1
    t = jnp.where(valid0, t0, t1)
    return {"hit": hit, "t": jnp.where(hit, t, jnp.inf)}


def intersect_cone(o, d, t_max, w2o, o2w, par):
    """Cone::Intersect with attributes (cone.cpp:47-161)."""
    radius, height, phi_max = par[..., 0], par[..., 1], par[..., 2]
    oo = xform_point(w2o, o)
    od = xform_vector(w2o, d)
    ok, t0, t1 = _cone_roots(oo, od, radius, height)

    def clip(t):
        p = oo + t[..., None] * od
        phi = _safe_atan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        okc = (p[..., 2] >= 0.0) & (p[..., 2] <= height) & (phi <= phi_max)
        return p, phi, okc

    p0, phi0, ok0 = clip(t0)
    p1, phi1, ok1 = clip(t1)
    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & ok0
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & ok1
    hit = valid0 | valid1
    t = jnp.where(valid0, t0, t1)
    p_hit = jnp.where(valid0[..., None], p0, p1)
    phi = jnp.where(valid0, phi0, phi1)
    u = phi / phi_max
    v = p_hit[..., 2] / height
    # dpdu/dpdv (cone.cpp:139-143); ng = dpdu x dpdv.
    one_m_v = jnp.maximum(1.0 - v, 1e-6)
    dpdu = jnp.stack(
        [-phi_max * p_hit[..., 1], phi_max * p_hit[..., 0],
         jnp.zeros_like(phi)], -1)
    dpdv = jnp.stack(
        [-p_hit[..., 0] / one_m_v, -p_hit[..., 1] / one_m_v,
         jnp.broadcast_to(height, phi.shape)], -1)
    ng_obj = normalize(cross(dpdu, dpdv))
    p_world, ng_world, p_err_world = _world_attrs(
        o2w, w2o, p_hit, ng_obj, gamma(7))
    return {
        "hit": hit,
        "t": jnp.where(hit, t, jnp.inf),
        "p_hit": p_world,
        "ng": ng_world,
        "uv": jnp.stack([u, v], axis=-1),
        "p_error": p_err_world,
    }


def _paraboloid_roots(oo, od, radius, z_max):
    k = z_max / jnp.maximum(radius * radius, 1e-20)
    a = k * (od[..., 0] ** 2 + od[..., 1] ** 2)
    b = 2.0 * k * (od[..., 0] * oo[..., 0] + od[..., 1] * oo[..., 1]) - od[..., 2]
    c = k * (oo[..., 0] ** 2 + oo[..., 1] ** 2) - oo[..., 2]
    return _quadratic(a, b, c)


def intersect_paraboloid_object(oo, od, t_max, par):
    """Paraboloid t-only test (paraboloid.cpp:48-135)."""
    radius, z_min, z_max, phi_max = (par[..., 0], par[..., 1],
                                     par[..., 2], par[..., 3])
    ok, t0, t1 = _paraboloid_roots(oo, od, radius, z_max)

    def clip(t):
        p = oo + t[..., None] * od
        phi = _safe_atan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        return (p[..., 2] >= z_min) & (p[..., 2] <= z_max) & (phi <= phi_max)

    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & clip(t0)
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & clip(t1)
    hit = valid0 | valid1
    t = jnp.where(valid0, t0, t1)
    return {"hit": hit, "t": jnp.where(hit, t, jnp.inf)}


def intersect_paraboloid(o, d, t_max, w2o, o2w, par):
    """Paraboloid::Intersect with attributes (paraboloid.cpp:48-158)."""
    radius, z_min, z_max, phi_max = (par[..., 0], par[..., 1],
                                     par[..., 2], par[..., 3])
    oo = xform_point(w2o, o)
    od = xform_vector(w2o, d)
    ok, t0, t1 = _paraboloid_roots(oo, od, radius, z_max)

    def clip(t):
        p = oo + t[..., None] * od
        phi = _safe_atan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        okc = (p[..., 2] >= z_min) & (p[..., 2] <= z_max) & (phi <= phi_max)
        return p, phi, okc

    p0, phi0, ok0 = clip(t0)
    p1, phi1, ok1 = clip(t1)
    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & ok0
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & ok1
    hit = valid0 | valid1
    t = jnp.where(valid0, t0, t1)
    p_hit = jnp.where(valid0[..., None], p0, p1)
    phi = jnp.where(valid0, phi0, phi1)
    u = phi / phi_max
    v = (p_hit[..., 2] - z_min) / jnp.maximum(z_max - z_min, 1e-20)
    z_safe = jnp.where(jnp.abs(p_hit[..., 2]) < 1e-8, 1e-8, p_hit[..., 2])
    dpdu = jnp.stack(
        [-phi_max * p_hit[..., 1], phi_max * p_hit[..., 0],
         jnp.zeros_like(phi)], -1)
    dpdv = jnp.stack(
        [p_hit[..., 0] / (2.0 * z_safe), p_hit[..., 1] / (2.0 * z_safe),
         jnp.ones_like(phi)], -1) * jnp.asarray(z_max - z_min)[..., None]
    ng_obj = normalize(cross(dpdu, dpdv))
    p_world, ng_world, p_err_world = _world_attrs(
        o2w, w2o, p_hit, ng_obj, gamma(9))
    return {
        "hit": hit,
        "t": jnp.where(hit, t, jnp.inf),
        "p_hit": p_world,
        "ng": ng_world,
        "uv": jnp.stack([u, v], axis=-1),
        "p_error": p_err_world,
    }


def _hyperboloid_coeffs(par):
    """(ah, ch) of ah(x^2+y^2) - ch z^2 = 1 (pre-solved host-side)."""
    return par[..., 0], par[..., 1]


def _hyperboloid_roots(oo, od, ah, ch):
    a = (ah * (od[..., 0] ** 2 + od[..., 1] ** 2) - ch * od[..., 2] ** 2)
    b = 2.0 * (ah * (od[..., 0] * oo[..., 0] + od[..., 1] * oo[..., 1])
               - ch * od[..., 2] * oo[..., 2])
    c = (ah * (oo[..., 0] ** 2 + oo[..., 1] ** 2)
         - ch * oo[..., 2] ** 2 - 1.0)
    return _quadratic(a, b, c)


def _hyperboloid_phi(p_hit, par):
    """pbrt's phi: angle of pHit relative to the profile point at its v
    (hyperboloid.cpp:122-130)."""
    z1, z2 = par[..., 7], par[..., 10]
    v = (p_hit[..., 2] - z1) / jnp.where(jnp.abs(z2 - z1) < 1e-12, 1e-12, z2 - z1)
    xr = (1.0 - v) * par[..., 5] + v * par[..., 8]
    yr = (1.0 - v) * par[..., 6] + v * par[..., 9]
    phi = _safe_atan2(
        p_hit[..., 1] * xr - p_hit[..., 0] * yr,
        p_hit[..., 0] * xr + p_hit[..., 1] * yr,
    )
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return phi, v


def intersect_hyperboloid_object(oo, od, t_max, par):
    """Hyperboloid t-only test (hyperboloid.cpp:48-140)."""
    phi_max = par[..., 4]
    ah, ch = _hyperboloid_coeffs(par)
    z_min = par[..., 2]
    z_max = par[..., 3]
    ok, t0, t1 = _hyperboloid_roots(oo, od, ah, ch)

    def clip(t):
        p = oo + t[..., None] * od
        phi, _ = _hyperboloid_phi(p, par)
        return (p[..., 2] >= z_min) & (p[..., 2] <= z_max) & (phi <= phi_max)

    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & clip(t0)
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & clip(t1)
    hit = valid0 | valid1
    t = jnp.where(valid0, t0, t1)
    return {"hit": hit, "t": jnp.where(hit, t, jnp.inf)}


def intersect_hyperboloid(o, d, t_max, w2o, o2w, par):
    """Hyperboloid::Intersect with attributes (hyperboloid.cpp:48-167)."""
    phi_max = par[..., 4]
    ah, ch = _hyperboloid_coeffs(par)
    z_min = par[..., 2]
    z_max = par[..., 3]
    oo = xform_point(w2o, o)
    od = xform_vector(w2o, d)
    ok, t0, t1 = _hyperboloid_roots(oo, od, ah, ch)

    def clip(t):
        p = oo + t[..., None] * od
        phi, v = _hyperboloid_phi(p, par)
        okc = (p[..., 2] >= z_min) & (p[..., 2] <= z_max) & (phi <= phi_max)
        return p, phi, v, okc

    p0, phi0, v0, ok0 = clip(t0)
    p1, phi1, v1, ok1 = clip(t1)
    valid0 = ok & (t0 > 0.0) & (t0 < t_max) & ok0
    valid1 = ok & (t1 > 0.0) & (t1 < t_max) & ok1
    hit = valid0 | valid1
    t = jnp.where(valid0, t0, t1)
    p_hit = jnp.where(valid0[..., None], p0, p1)
    phi = jnp.where(valid0, phi0, phi1)
    v = jnp.where(valid0, v0, v1)
    u = phi / phi_max
    # Normal from the implicit gradient (equivalent to dpdu x dpdv up to
    # orientation, hyperboloid.cpp:142-151).
    ng_obj = normalize(jnp.stack(
        [ah * p_hit[..., 0], ah * p_hit[..., 1], -ch * p_hit[..., 2]], -1))
    # Orient along pbrt's cross(dpdu,dpdv): outward for ah>0 surfaces.
    p_world, ng_world, p_err_world = _world_attrs(
        o2w, w2o, p_hit, ng_obj, gamma(9))
    return {
        "hit": hit,
        "t": jnp.where(hit, t, jnp.inf),
        "p_hit": p_world,
        "ng": ng_world,
        "uv": jnp.stack([u, v], axis=-1),
        "p_error": p_err_world,
    }
