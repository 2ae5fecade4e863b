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
    tr_fn=None,
    isect_tr_fn=None,
    extra_ray=None,
    extra_live=None,
):
    """EstimateDirect (integrator.cpp:108-215), specular=false.

    rec: hit record dict; frame: (ss, ts, ns); mat: per-lane material params;
    wo_local: wo in shading frame; light_idx [N]; u_* sample arrays;
    mask: lanes to evaluate.  Returns Ld [N,3].

    handleMedia=true callers (volpath) pass tr_fn(p, p_err, ng, p_light) ->
    (occluded, Tr) for the shadow ray (VisibilityTester::Tr) and
    isect_tr_fn(o, d) -> (t, prim, Tr) for the BSDF-MIS ray
    (Scene::IntersectTr); both skip material-less medium boundaries.

    extra_ray=(o3, d3): a third independent ray set (the path integrator's
    next-bounce extension rays) folded into the same kernel launch; returns
    (ld, (t3, prim3)) instead of ld.  One launch per bounce instead of three.
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
    weight = jnp.where(
        s["is_delta"],
        1.0,
        smp.power_heuristic(1.0, s["pdf"], 1.0, scattering_pdf),
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

    # ---- one traversal for BOTH strategies ----
    # The shadow ray (VisibilityTester::Unoccluded) and the BSDF-MIS ray are
    # independent, so both ray sets ride ONE 2N-ray kernel launch (a bounce
    # previously cost three launches; launch overhead was a third of the
    # step); the shadow lanes carry a per-lane any-hit flag for first-hit
    # early exit inside the shared launch.
    extra_hit = None
    if tr_fn is None and isect_tr_fn is None:
        w_sh = s["p_light"] - rec["p"]
        o_sh = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], w_sh)
        d_sh = s["p_light"] - o_sh
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d_sh * d_sh, -1), 1e-20))
        dn_sh = d_sh / dist[..., None]
        # DEAD lanes get t_max = 0 so they fail the root slab test and exit
        # the traversal on their first iteration — otherwise every dead lane
        # (they keep their previous unit ray for masked-grad hygiene) walks
        # the full tree and widens its packet's visit union.  Their results
        # (prim = -1) are exactly what the masked consumers expect; by
        # bounce 4 <40% of lanes are alive, so this trims real work.
        live = mask.astype(jnp.float32)
        # Extension lanes live by the CALLER's aliveness (extra_live), not
        # the NEE mask: a live lane whose light pmf is 0 must still trace
        # its next-bounce ray.
        live3 = live if extra_live is None else extra_live.astype(jnp.float32)
        far = jnp.full((n,), 1e30, jnp.float32) * live3
        o_cat = [o_sh, o2]
        d_cat = [dn_sh, wi2_world]
        tm_cat = [dist * _SHADOW_EPS * live,
                  jnp.full((n,), 1e30, jnp.float32) * live]
        # Shadow lanes (first n) run any-hit: they exit traversal at the
        # first occluder (IntersectP early-out, bvh.cpp:702-738) while the
        # MIS/extension lanes in the same launch stay closest-hit.
        am_cat = [jnp.ones((n,), bool), jnp.zeros((n,), bool)]
        if extra_ray is not None:
            o3, d3 = extra_ray
            o_cat.append(o3)
            d_cat.append(d3)
            tm_cat.append(far)
            am_cat.append(jnp.zeros((n,), bool))
        t_cat, prim_cat = tv.intersect_closest(
            scene,
            jnp.concatenate(o_cat),
            jnp.concatenate(d_cat),
            jnp.concatenate(tm_cat),
            quadric_types,
            any_mask=jnp.concatenate(am_cat),
        )
        occ = prim_cat[:n] >= 0
        t2, prim2 = t_cat[n : 2 * n], prim_cat[n : 2 * n]
        if extra_ray is not None:
            extra_hit = (t_cat[2 * n :], prim_cat[2 * n :])
        trv = trv2 = None
    else:
        occ, trv = tr_fn(rec["p"], rec["p_error"], rec["ng"], s["p_light"])
        t2, prim2, trv2 = isect_tr_fn(o2, wi2_world)
        if extra_ray is not None:
            o3, d3 = extra_ray
            extra_hit = tv.intersect_closest(scene, o3, d3, 1e30, quadric_types)

    li = jnp.where((usable & ~occ)[..., None], s["li"], 0.0)
    if trv is not None:
        li = li * trv
    # Sanitized pdf on unusable lanes: a 0-pdf denominator would feed ~1e20
    # ratios into the backward pass (overflow -> NaN adjoints); the lanes are
    # masked out of the forward value either way.
    pdf_l = jnp.where(usable, s["pdf"], 1.0)
    ld = ld + jnp.where(
        usable[..., None],
        f * li * (weight / jnp.maximum(pdf_l, 1e-20))[..., None],
        0.0,
    )

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
    if trv2 is not None:
        li2 = li2 * trv2

    pdf_b = jnp.where(do_bsdf, bs["pdf"], 1.0)
    ld = ld + jnp.where(
        do_bsdf[..., None],
        f2 * li2 * (weight2 / jnp.maximum(pdf_b, 1e-20))[..., None],
        0.0,
    )
    if extra_ray is not None:
        return ld, extra_hit
    return ld


def _cheap_hit_normal(scene, o, d, t, prim_id, quadric_types):
    """Geometric normal of a hit WITHOUT the full hit_record — Le orientation
    (area_light_emission's two-sided test) only needs ng, so skip the
    re-intersection / uv / error-bound work: triangles = one [T,26] row
    gather + cross product; quadrics = implicit-gradient normals."""
    hit = prim_id >= 0
    pid = jnp.clip(prim_id, 0, scene.prim_meta.shape[0] - 1)
    meta = scene.prim_meta[pid]
    ptype = meta[..., 0]
    pidx = meta[..., 1]
    attr = scene.tri_attr[jnp.clip(pidx, 0, scene.tri_attr.shape[0] - 1)]
    e1 = attr[..., 3:6] - attr[..., 0:3]
    e2 = attr[..., 6:9] - attr[..., 0:3]
    from ..core.vecmath import cross, normalize

    ng = normalize(cross(e1, e2))
    # Orient to agree with shading normals where present (triangle.cpp:389;
    # n0 proxies the interpolated ns — identical sign for smooth meshes).
    has_n = attr[..., 24] > 0.0
    flip = has_n & (jnp.sum(ng * attr[..., 15:18], -1) < 0.0)
    ng = jnp.where(flip[..., None], -ng, ng)
    if quadric_types:
        from ..shapes import quadrics as quad
        from .. import scene as sc

        qp = scene.q_packed[jnp.clip(pidx, 0, scene.q_packed.shape[0] - 1)]
        w2o_rows = qp[..., :12].reshape(qp.shape[:-1] + (3, 4))
        par = qp[..., 12:24]
        # Object-space hit point from (o + t d) through w2o.
        p_w = o + jnp.where(jnp.isfinite(t), t, 0.0)[..., None] * d
        p_o = (
            jnp.einsum("...ij,...j->...i", w2o_rows[..., :3, :3], p_w)
            + w2o_rows[..., :3, 3]
        )
        # Implicit gradients per type (normalized below; world via w2o^T).
        zeros = jnp.zeros_like(p_o[..., 0])
        ng_o = ng
        for qt in quadric_types:
            if qt == sc.SHAPE_SPHERE:
                g = p_o
            elif qt == sc.SHAPE_CYLINDER:
                g = jnp.stack([p_o[..., 0], p_o[..., 1], zeros], -1)
            elif qt == sc.SHAPE_DISK:
                g = jnp.stack([zeros, zeros, jnp.ones_like(zeros)], -1)
            elif qt == sc.SHAPE_CONE:
                # x^2+y^2-k(z-h)^2: grad = (2x, 2y, -2k(z-h)).
                k = (par[..., 0] / jnp.maximum(par[..., 1], 1e-12)) ** 2
                g = jnp.stack(
                    [p_o[..., 0], p_o[..., 1],
                     -k * (p_o[..., 2] - par[..., 1])], -1)
            elif qt == sc.SHAPE_PARABOLOID:
                k = par[..., 2] / jnp.maximum(par[..., 0] ** 2, 1e-12)
                g = jnp.stack(
                    [2 * k * p_o[..., 0], 2 * k * p_o[..., 1],
                     -jnp.ones_like(zeros)], -1)
            else:  # hyperboloid: ah(x^2+y^2) - ch z^2
                g = jnp.stack(
                    [par[..., 0] * p_o[..., 0], par[..., 0] * p_o[..., 1],
                     -par[..., 1] * p_o[..., 2]], -1)
            gw = normalize(jnp.einsum(
                "...ji,...j->...i", w2o_rows[..., :3, :3], normalize(g)))
            ng_o = jnp.where((ptype == qt)[..., None], gw, ng_o)
        rev = scene.q_rev[jnp.clip(pidx, 0, scene.q_rev.shape[0] - 1)]
        is_q = ptype != sc.SHAPE_TRIANGLE
        ng_o = jnp.where((is_q & rev)[..., None], -ng_o, ng_o)
        ng = ng_o
    return jnp.where(hit[..., None], ng, 0.0)


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
    tr_fn=None,
    isect_tr_fn=None,
    extra_ray=None,
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
        tr_fn=tr_fn,
        isect_tr_fn=isect_tr_fn,
        extra_ray=extra_ray,
        extra_live=mask,
    )
    if extra_ray is not None:
        ld, extra_hit = ld
        return ld / jnp.maximum(pmf, 1e-20)[..., None], extra_hit
    return ld / jnp.maximum(pmf, 1e-20)[..., None]


# ---------------------------------------------------------------------------
# BSSRDF exit-point sampling (SeparableBSSRDF::Sample_Sp, bssrdf.cpp:248-330)
# ---------------------------------------------------------------------------

def sample_bssrdf_sp(scene, rec, frame, mat, u1, u2, quadric_types,
                     n_probe=4):
    """Sample a subsurface exit point around the entry point rec.

    pbrt walks an unbounded IntersectionChain along the probe segment
    (bssrdf.cpp:295-320); the wavefront version is a static n_probe-step
    re-intersection loop (hits beyond n_probe are dropped — fine for the
    1-3 crossings of typical closed meshes).

    Returns dict: ok, sp [N,3], pdf [N], nfound [N], and the exit-point
    record fields p/p_error/ns/ng/dpdu (arrays valid where ok).
    """
    from ..materials import bssrdf as bsx

    ss_ax, ts_ax, ns_ax = frame
    # Projection-axis pick (bssrdf.cpp:252-272): 1/2 ns, 1/4 ss, 1/4 ts.
    pick0 = u1 < 0.5
    pick1 = (u1 >= 0.5) & (u1 < 0.75)
    m0 = pick0[..., None]
    m1 = pick1[..., None]
    vx = jnp.where(m0, ss_ax, jnp.where(m1, ts_ax, ns_ax))
    vy = jnp.where(m0, ts_ax, jnp.where(m1, ns_ax, ss_ax))
    vz = jnp.where(m0, ns_ax, jnp.where(m1, ss_ax, ts_ax))
    u1r = jnp.where(pick0, u1 * 2.0,
                    jnp.where(pick1, (u1 - 0.5) * 4.0, (u1 - 0.75) * 4.0))
    # Spectral channel pick (bssrdf.cpp:274-277).
    ch = jnp.clip((u1r * 3.0).astype(jnp.int32), 0, 2)
    u1r = u1r * 3.0 - ch.astype(jnp.float32)
    lane = jnp.arange(u1.shape[0])
    sigma_t_ch = mat["ss_sigma_t"][lane, ch]
    rho_ch = mat["ss_rho"][lane, ch]
    tbl = mat["ss_table"]
    rn, dn_, pf, cd = (scene.bssrdf_rho_nodes, scene.bssrdf_radius_nodes,
                       scene.bssrdf_profile, scene.bssrdf_cdf)

    r = bsx.sample_sr(rn, dn_, pf, cd, tbl, sigma_t_ch, rho_ch, u2[..., 0])
    r_max = bsx.sample_sr(rn, dn_, pf, cd, tbl, sigma_t_ch, rho_ch,
                          jnp.full_like(u1, 0.999))
    ok = (r >= 0.0) & (r < r_max)
    phi = 2.0 * jnp.pi * u2[..., 1]
    l = 2.0 * jnp.sqrt(jnp.maximum(r_max * r_max - r * r, 0.0))

    p_start = (rec["p"]
               + r[..., None] * (vx * jnp.cos(phi)[..., None]
                                 + vy * jnp.sin(phi)[..., None])
               - 0.5 * l[..., None] * vz)
    p_target = p_start + l[..., None] * vz

    # Bounded probe walk collecting same-material hits.
    cur_o = p_start
    walking = ok
    nfound = jnp.zeros(u1.shape, jnp.int32)
    probe_hits = []
    for _ in range(n_probe):
        seg = p_target - cur_o
        dist = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg, -1), 1e-20))
        d = seg / dist[..., None]
        t, prim = tv.intersect_closest(
            scene, cur_o, d, dist * _SHADOW_EPS, quadric_types)
        hrec = tv.hit_record(scene, cur_o, d, t, prim, quadric_types)
        found = hrec["hit"] & walking
        match = found & (hrec["material"] == rec["material"])
        probe_hits.append((match, hrec))
        nfound = nfound + match.astype(jnp.int32)
        walking = found
        adv = offset_ray_origin(
            hrec["p"], hrec["p_error"], hrec["ng"], p_target - hrec["p"])
        cur_o = jnp.where(found[..., None], adv, cur_o)

    ok = ok & (nfound > 0)
    sel = jnp.clip((u1r * nfound.astype(jnp.float32)).astype(jnp.int32),
                   0, jnp.maximum(nfound - 1, 0))
    # Pick the sel-th matching hit.
    pi = {k: jnp.zeros_like(rec[k])
          for k in ("p", "p_error", "ns", "ng", "dpdu")}
    cum = jnp.zeros(u1.shape, jnp.int32)
    for match, hrec in probe_hits:
        use = match & (cum == sel)
        for k in pi:
            pi[k] = jnp.where(use[..., None], hrec[k], pi[k])
        cum = cum + match.astype(jnp.int32)

    dist_po = jnp.sqrt(jnp.maximum(
        jnp.sum((rec["p"] - pi["p"]) ** 2, -1), 1e-20))
    sp = bsx.sr_eval(rn, dn_, pf, tbl, mat["ss_sigma_t"], mat["ss_rho"],
                     dist_po)
    pdf = bsx.pdf_sp(rn, dn_, pf, scene.bssrdf_rho_eff, tbl,
                     mat["ss_sigma_t"], mat["ss_rho"],
                     rec["p"], ss_ax, ts_ax, ns_ax, pi["p"], pi["ng"])
    pdf = pdf / jnp.maximum(nfound.astype(jnp.float32), 1.0)
    ok = ok & (pdf > 0.0) & jnp.any(sp > 0.0, -1)
    return dict(ok=ok, sp=sp, pdf=pdf, nfound=nfound, **pi)
