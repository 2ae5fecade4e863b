"""Shared integrator machinery: NEE + MIS direct lighting.

TPU re-expression of core/integrator.cpp:54-215 (UniformSampleAllLights /
UniformSampleOneLight / EstimateDirect): the per-ray recursion becomes masked
batch kernels; VisibilityTester::Unoccluded becomes one batched shadow-ray
traversal; the BSDF-sampling MIS branch re-uses the closest-hit kernel and
compares the hit's area-light id with the sampled light.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import absdot, dot, normalize, offset_ray_origin, distance
from ..core import sampling as smp
from ..accel import traverse as tv
from ..lights import lights as lt
from ..materials import bsdf as bx
from .. import scene as sc

_SHADOW_EPS = 1.0 - 1e-4  # pbrt shadowEpsilon-scaled tMax (interaction.h:231)


def light_types_present(scene: sc.SceneArrays) -> tuple:
    import numpy as np

    return tuple(sorted(np.unique(np.asarray(scene.lights.light_type)).tolist()))


def occluded(scene, p, p_err, ng, p_light, quadric_types):
    """VisibilityTester::Unoccluded (light.cpp:56): shadow ray p -> p_light."""
    w = p_light - p
    o = offset_ray_origin(p, p_err, ng, w)
    d = p_light - o
    # Ray to tMax slightly below 1 in units of |d| (SpawnRayTo semantics).
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-20))
    dn = d / dist[..., None]
    return tv.intersect_any(
        scene, o, dn, dist * _SHADOW_EPS, quadric_types
    )


def estimate_direct(
    scene,
    rec,
    frame,
    mat,
    wo_local,
    light_idx,
    u_light,
    u_scattering,
    mask,
    mat_types,
    light_types,
    quadric_types,
):
    """EstimateDirect (integrator.cpp:108-215), specular=false.

    rec: hit record dict; frame: (ss, ts, ns); mat: per-lane material params;
    wo_local: wo in shading frame; light_idx [N]; u_* sample arrays;
    mask: lanes to evaluate.  Returns Ld [N,3].
    """
    ss, ts, ns = frame
    n = light_idx.shape[0]
    ld = jnp.zeros((n, 3), jnp.float32)

    # ---- light-sampling strategy ----
    s = lt.sample_li(scene, light_idx, rec["p"], u_light, light_types)
    wi_world = s["wi"]
    wi_local = bx.to_local(ss, ts, ns, wi_world)
    f, scattering_pdf = bx.eval_material(mat, wo_local, wi_local, mat_types)
    f = f * absdot(wi_world, ns)[..., None]
    usable = mask & (s["pdf"] > 0.0) & jnp.any(s["li"] > 0.0, -1) & jnp.any(f != 0.0, -1)
    occ = occluded(
        scene, rec["p"], rec["p_error"], rec["ng"], s["p_light"], quadric_types
    )
    li = jnp.where((usable & ~occ)[..., None], s["li"], 0.0)
    weight = jnp.where(
        s["is_delta"],
        1.0,
        smp.power_heuristic(1.0, s["pdf"], 1.0, scattering_pdf),
    )
    ld = ld + jnp.where(
        usable[..., None],
        f * li * (weight / jnp.maximum(s["pdf"], 1e-20))[..., None],
        0.0,
    )

    # ---- BSDF-sampling strategy (non-delta lights only) ----
    bs = bx.sample_material(mat, wo_local, u_scattering, mat_types)
    wi2_world = bx.to_world(ss, ts, ns, bs["wi"])
    f2 = bs["f"] * absdot(wi2_world, ns)[..., None]
    do_bsdf = mask & ~s["is_delta"] & bs["valid"]

    # Pdf from the *offset* origin, as pbrt's Shape::Pdf intersects a
    # SpawnRay'd (offset) ray — excludes the self-intersection root.
    o2 = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi2_world)
    light_pdf2 = lt.pdf_li(scene, light_idx, o2, wi2_world, light_types)
    # Specular samples skip the light-pdf MIS weight (integrator.cpp:179-183).
    weight2 = jnp.where(
        bs["is_specular"],
        1.0,
        smp.power_heuristic(1.0, bs["pdf"], 1.0, light_pdf2),
    )
    zero_light_pdf = (~bs["is_specular"]) & (light_pdf2 == 0.0)
    do_bsdf = do_bsdf & ~zero_light_pdf & (bs["pdf"] > 0.0)

    # Trace toward the light; only count emission if we hit *this* light.
    t2, prim2 = tv.intersect_closest(scene, o2, wi2_world, 1e30, quadric_types)
    hit2 = prim2 >= 0
    pid2 = jnp.clip(prim2, 0, scene.prim_arealight.shape[0] - 1)
    hit_light = jnp.where(hit2, scene.prim_arealight[pid2], -1)
    same_light = hit2 & (hit_light == light_idx)
    # Emitted radiance toward -wi2 from the hit light (area lights).
    rec2_ng = _cheap_hit_normal(scene, o2, wi2_world, t2, prim2, quadric_types)
    li2 = lt.area_light_emission(scene, hit_light, rec2_ng, -wi2_world)
    li2 = jnp.where(same_light[..., None], li2, 0.0)
    # Escaped rays: infinite-light Le (integrator.cpp:198).
    li2 = jnp.where(
        hit2[..., None], li2, lt.escaped_radiance(scene, wi2_world, light_types)
    )

    ld = ld + jnp.where(
        do_bsdf[..., None],
        f2 * li2 * (weight2 / jnp.maximum(bs["pdf"], 1e-20))[..., None],
        0.0,
    )
    return ld


def _cheap_hit_normal(scene, o, d, t, prim_id, quadric_types):
    """Geometric normal of a hit without the full hit_record (for Le)."""
    rec = tv.hit_record(scene, o, d, t, prim_id, quadric_types)
    return rec["ng"]


def sample_one_light(
    scene,
    rec,
    frame,
    mat,
    wo_local,
    u_select,
    u_light,
    u_scattering,
    mask,
    mat_types,
    light_types,
    quadric_types,
    pick=None,
):
    """UniformSampleOneLight (integrator.cpp:85-106): pick one light from the
    scene distribution (or a precomputed per-lane (light_idx, pmf) from the
    spatial grid, lightdistrib.cpp:135), estimate direct, divide by pmf."""
    if pick is not None:
        light_idx, pmf = pick
    else:
        light_idx, pmf, _ = smp.sample_discrete_1d(scene.light_distr, u_select)
    ld = estimate_direct(
        scene,
        rec,
        frame,
        mat,
        wo_local,
        light_idx,
        u_light,
        u_scattering,
        mask & (pmf > 0.0),
        mat_types,
        light_types,
        quadric_types,
    )
    return ld / jnp.maximum(pmf, 1e-20)[..., None]
