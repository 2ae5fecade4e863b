"""Volumetric path integrator (integrators/volpath.cpp:55-189).

Wavefront re-expression: per bounce, lanes inside a medium run distance
sampling against the hit segment (homogeneous closed-form; grid delta
tracking); medium-scattered lanes do phase-function NEE + HG sampling while
surface lanes run the standard path-integrator vertex, all masked in
lockstep.  Per-lane current-medium ids track boundary crossings
(SpawnRay's GetMedium semantics, interaction.h).

Wavefront deviations from the reference (documented):
  * delta-tracking distance sampling draws its first K_TRACK=4 steps from
    sampler dims (grid.cpp:73-74 Get1D semantics); the data-dependent tail
    beyond that, and ratio-tracking Tr, use a counter-hash RNG (pbrt's
    consumption there is unbounded);
  * null-material boundary vertices consume a full bounce's dims;
  * shadow-ray Tr uses the vertex's medium along the whole segment
    (boundary-crossing Tr walk is a planned refinement of occluded_tr).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, dot, normalize, offset_ray_origin
from ..core import sampling as smp
from ..core import spectrum
from ..accel import traverse as tv
from ..lights import lights as lt
from ..materials import bsdf as bx
from ..media import media as md
from ..samplers import samplers as sa
from ..statics import SceneStatics, scene_statics
from .. import film as fm
from .. import scene as sc
from . import common
from .path import PathConfig, eval_scene_textures, make_pixel_grid


# Sampler dims consumed per bounce by grid-medium delta tracking (2 per
# step: distance + real/null acceptance); steps beyond fall back to hash.
K_TRACK = 4


def _medium_params(scene, med_id):
    mt = scene.media
    mid = jnp.clip(med_id, 0, mt.med_type.shape[0] - 1)
    valid = med_id >= 0
    return {
        "valid": valid,
        "mid": mid,
        "type": jnp.where(valid, mt.med_type[mid], -1),
        "sigma_a": jnp.where(valid[..., None], mt.sigma_a[mid], 0.0),
        "sigma_s": jnp.where(valid[..., None], mt.sigma_s[mid], 0.0),
        "g": jnp.where(valid, mt.g[mid], 0.0),
    }


def _sample_medium(scene, med, o, d, t_hit, u1, u2, key, statics,
                   u_track=None):
    """Dispatch Medium::Sample over medium types present."""
    n = o.shape[0]
    out_sampled = jnp.zeros((n,), bool)
    out_t = t_hit
    out_w = jnp.ones((n, 3), jnp.float32)
    if md.MEDIUM_HOMOGENEOUS in statics.medium_types:
        m = med["valid"] & (med["type"] == md.MEDIUM_HOMOGENEOUS)
        hs = md.homogeneous_sample(med["sigma_a"], med["sigma_s"], t_hit, u1, u2)
        out_sampled = jnp.where(m, hs["sampled_medium"], out_sampled)
        out_t = jnp.where(m, hs["t"], out_t)
        out_w = jnp.where(m[..., None], hs["weight"], out_w)
    if md.MEDIUM_GRID in statics.medium_types:
        m = med["valid"] & (med["type"] == md.MEDIUM_GRID)
        gs = md.grid_sample(scene.media, med["mid"], o, d, t_hit, key,
                            u_tab=u_track)
        out_sampled = jnp.where(m, gs["sampled_medium"], out_sampled)
        out_t = jnp.where(m, gs["t"], out_t)
        out_w = jnp.where(m[..., None], gs["weight"], out_w)
    return out_sampled, out_t, out_w


def _tr_along(scene, med, o, d, dist, key, statics):
    """Transmittance through the vertex's own medium over [0, dist]."""
    n = o.shape[0]
    tr = jnp.ones((n, 3), jnp.float32)
    if md.MEDIUM_HOMOGENEOUS in statics.medium_types:
        m = med["valid"] & (med["type"] == md.MEDIUM_HOMOGENEOUS)
        h = md.homogeneous_tr(med["sigma_a"] + med["sigma_s"], dist)
        tr = jnp.where(m[..., None], h, tr)
    if md.MEDIUM_GRID in statics.medium_types:
        m = med["valid"] & (med["type"] == md.MEDIUM_GRID)
        g = md.grid_tr(scene.media, med["mid"], o, d, dist, key + jnp.uint32(7))
        tr = jnp.where(m[..., None], g, tr)
    return tr


def _tr_walk_to(scene, o, dn, dist, cur_med, key, statics, max_seg=4):
    """VisibilityTester::Tr (core/light.cpp:47-67): walk the shadow segment
    [o, o + dn*dist], accumulating transmittance through each medium and
    crossing material-less boundary primitives (up to max_seg crossings);
    any material-bearing hit occludes.  Returns (occluded [N], tr [N,3]).

    Medium hand-off at a null boundary is interface-based (no normal
    needed): hitting a prim whose inside-medium equals the current medium
    means we exit to its outside medium, else we enter its inside."""
    n = dist.shape[0]
    tr = jnp.ones((n, 3), jnp.float32)
    occ = jnp.zeros((n,), bool)
    active = jnp.ones((n,), bool)
    rem = dist
    cur = cur_med
    oo = o
    for k in range(max_seg):
        t, prim = tv.intersect_closest(
            scene, oo, dn, rem * (1.0 - 1e-4), statics.quadric_types
        )
        hit = (prim >= 0) & active
        pid = jnp.clip(prim, 0, scene.prim_material.shape[0] - 1)
        has_mat = hit & (scene.prim_material[pid] >= 0)
        med = _medium_params(scene, cur)
        seg = jnp.where(hit, t, rem)
        tr = tr * jnp.where(
            active[..., None],
            _tr_along(scene, med, oo, dn, seg, key + jnp.uint32(29 * k + 3), statics),
            1.0,
        )
        occ = occ | has_mat
        m_in = scene.prim_medium_inside[pid]
        m_out = scene.prim_medium_outside[pid]
        new_med = jnp.where(cur == m_in, m_out, m_in)
        crossing = hit & ~has_mat
        cur = jnp.where(crossing, new_med, cur)
        adv = t * (1.0 + 1e-4) + 1e-6
        oo = jnp.where(crossing[..., None], oo + dn * adv[..., None], oo)
        rem = jnp.where(crossing, jnp.maximum(rem - adv, 0.0), rem)
        active = crossing
    # More crossings than max_seg: conservatively occlude (rare; bounded walk).
    occ = occ | active
    return occ, tr


def _intersect_tr(scene, o, dn, cur_med, key, statics, max_seg=4):
    """Scene::IntersectTr (core/scene.cpp:57-71): closest *material* surface
    along the ray, skipping null-boundary prims, accumulating transmittance.
    Returns (t [N] from o, prim [N] (-1 = none), tr [N,3])."""
    n = o.shape[0]
    tr = jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), bool)
    cur = cur_med
    oo = o
    t_base = jnp.zeros((n,), jnp.float32)
    t_out = jnp.full((n,), jnp.inf, jnp.float32)
    prim_out = jnp.full((n,), -1, jnp.int32)
    for k in range(max_seg):
        t, prim = tv.intersect_closest(scene, oo, dn, 1e30, statics.quadric_types)
        hit = (prim >= 0) & active
        pid = jnp.clip(prim, 0, scene.prim_material.shape[0] - 1)
        has_mat = hit & (scene.prim_material[pid] >= 0)
        med = _medium_params(scene, cur)
        seg = jnp.where(hit, t, jnp.float32(1e30))
        tr = tr * jnp.where(
            active[..., None],
            _tr_along(scene, med, oo, dn, seg, key + jnp.uint32(31 * k + 11), statics),
            1.0,
        )
        first_mat = has_mat & (prim_out < 0)
        prim_out = jnp.where(first_mat, prim, prim_out)
        t_out = jnp.where(first_mat, t_base + t, t_out)
        m_in = scene.prim_medium_inside[pid]
        m_out = scene.prim_medium_outside[pid]
        new_med = jnp.where(cur == m_in, m_out, m_in)
        crossing = hit & ~has_mat
        cur = jnp.where(crossing, new_med, cur)
        adv = t * (1.0 + 1e-4) + 1e-6
        oo = jnp.where(crossing[..., None], oo + dn * adv[..., None], oo)
        t_base = jnp.where(crossing, t_base + adv, t_base)
        active = crossing
    return t_out, prim_out, tr


def _medium_nee(scene, p, wo, g, med, cur_med, u_select, u_light, u_phase, mask, key, statics):
    """UniformSampleOneLight from a medium vertex (handleMedia=true,
    integrator.cpp:108-215 medium branch): phase f, Tr-weighted visibility
    via the boundary-crossing walk (VisibilityTester::Tr)."""
    light_idx, pmf, _ = smp.sample_discrete_1d(scene.light_distr, u_select)
    s = lt.sample_li(scene, light_idx, p, u_light, statics.light_types)
    ph = md.hg_p(dot(wo, s["wi"]), g)
    # Visibility with transmittance.
    w = s["p_light"] - p
    dist = jnp.sqrt(jnp.maximum(jnp.sum(w * w, -1), 1e-20))
    dn = w / dist[..., None]
    occ, tr = _tr_walk_to(
        scene, p + dn * 1e-3, dn, dist * (1.0 - 1e-3), cur_med,
        key + jnp.uint32(13), statics,
    )
    li = jnp.where((mask & ~occ & (s["pdf"] > 0))[..., None], s["li"] * tr, 0.0)
    weight = jnp.where(
        s["is_delta"], 1.0, smp.power_heuristic(1.0, s["pdf"], 1.0, ph)
    )
    ld = li * (ph * weight / jnp.maximum(s["pdf"], 1e-20))[..., None]
    # Phase-sampling MIS branch: IntersectTr toward the light (skips null
    # boundaries, scene.cpp:57-71).
    wi2, ph2 = md.hg_sample(wo, u_phase, g)
    light_pdf2 = lt.pdf_li(scene, light_idx, p, wi2, statics.light_types)
    weight2 = smp.power_heuristic(1.0, ph2, 1.0, light_pdf2)
    t2, prim2, tr2 = _intersect_tr(
        scene, p + wi2 * 1e-3, wi2, cur_med, key + jnp.uint32(17), statics
    )
    hit2 = prim2 >= 0
    pid2 = jnp.clip(prim2, 0, scene.prim_arealight.shape[0] - 1)
    hit_light = jnp.where(hit2, scene.prim_arealight[pid2], -1)
    same = hit2 & (hit_light == light_idx) & ~s["is_delta"]
    rec2 = tv.hit_record(scene, p, wi2, t2, prim2, statics.quadric_types)
    li2 = lt.area_light_emission(scene, hit_light, rec2["ng"], -wi2)
    ld = ld + jnp.where(
        (mask & same & (light_pdf2 > 0))[..., None],
        li2 * tr2 * weight2[..., None],  # f/pdf = 1 for HG exact sampling
        0.0,
    )
    return jnp.where(mask[..., None], ld / jnp.maximum(pmf, 1e-20)[..., None], 0.0)


def li_volpath(
    scene: sc.SceneArrays,
    o,
    d,
    sampler_cfg: sa.SamplerConfig,
    sampler_state,
    cfg: PathConfig,
    statics: SceneStatics,
    start_dim: int = 5,
):
    """Radiance with participating media.  Dimension schedule per bounce:
    2 (medium sample) + 5 (NEE) + 2 (phase/bsdf) + 1 RR after bounce 3;
    scenes with a grid medium add 2*K_TRACK tracking dims per bounce
    (the first K_TRACK+1 delta-tracking steps draw sampler dims, led by
    the medium-sample pair — see the u_track comment below)."""
    n = o.shape[0]
    L = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    specular_bounce = jnp.zeros((n,), bool)
    cur_med = jnp.broadcast_to(
        jnp.asarray(scene.camera_medium, jnp.int32), (n,)
    )
    dim = start_dim
    lane_key = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)

    for bounce in range(cfg.max_depth + 1):
        t, prim = tv.intersect_closest(scene, o, d, 1e30, statics.quadric_types)
        rec = tv.hit_record(scene, o, d, t, prim, statics.quadric_types)
        found = rec["hit"] & alive

        # ---- medium distance sampling (volpath.cpp:73-82), dims +0,+1 ----
        u_ch = sa.get_1d(sampler_cfg, sampler_state, dim)
        u_ds = sa.get_1d(sampler_cfg, sampler_state, dim + 1)
        dim += 2
        # Grid media: delta tracking consumes sampler dims for its first
        # K_TRACK+1 steps (pbrt draws Get1D per step, grid.cpp:73-74); the
        # data-dependent tail uses the counter-hash stream (bounded-schedule
        # truncation, module docstring).  u_ch/u_ds lead the table: a grid
        # lane's FIRST pbrt Get1D is its step-0 tracking draw at dim D —
        # the same dims a homogeneous lane spends on channel/distance — so
        # step 0 reads dims D, D+1 exactly as grid.cpp would.
        u_track = None
        if md.MEDIUM_GRID in statics.medium_types:
            u_track = jnp.stack(
                [u_ch, u_ds]
                + [sa.get_1d(sampler_cfg, sampler_state, dim + i)
                   for i in range(2 * K_TRACK)], axis=-1)
            dim += 2 * K_TRACK
        med = _medium_params(scene, cur_med)
        key_b = lane_key + jnp.uint32(bounce * 0x101)
        t_seg = jnp.where(rec["hit"], t, jnp.float32(1e30))
        in_medium, t_med, w_med = _sample_medium(
            scene, med, o, d, t_seg, u_ch, u_ds, key_b, statics,
            u_track=u_track,
        )
        in_medium = in_medium & alive & statics.has_media
        beta = jnp.where(alive[..., None], beta * w_med, beta)
        p_med = o + t_med[..., None] * d

        # ---- emitted radiance for surface lanes (not medium-scattered) ----
        count_le = (bounce == 0) | specular_bounce
        le_surf = lt.area_light_emission(scene, rec["arealight"], rec["ng"], rec["wo"])
        L = L + jnp.where(
            (found & ~in_medium & count_le)[..., None], beta * le_surf, 0.0
        )
        le_inf = lt.escaped_radiance(scene, d, statics.light_types)
        L = L + jnp.where(
            (alive & ~rec["hit"] & ~in_medium & count_le)[..., None],
            beta * le_inf,
            0.0,
        )

        alive = (found | in_medium) & alive
        if bounce >= cfg.max_depth:
            break

        # ---- NEE dims +2..+6 ; scatter dims +7,+8 ----
        u_select = sa.get_1d(sampler_cfg, sampler_state, dim)
        u_light = sa.get_2d(sampler_cfg, sampler_state, dim + 1)
        u_scatter = sa.get_2d(sampler_cfg, sampler_state, dim + 3)
        dim += 5
        u_dir = sa.get_2d(sampler_cfg, sampler_state, dim)
        dim += 2

        # Medium branch: phase NEE + HG direction.
        if statics.has_media:
            ld_med = _medium_nee(
                scene, p_med, rec["wo"], med["g"], med, cur_med,
                u_select, u_light, u_scatter, in_medium, key_b, statics,
            )
            L = L + jnp.where(in_medium[..., None], beta * ld_med, 0.0)
            wi_med, _ = md.hg_sample(rec["wo"], u_dir, med["g"])

        # Surface branch (same as path.py).
        tex_vals = eval_scene_textures(scene, rec, statics)
        mat = bx.gather_material(scene.materials, rec["material"], tex_vals, statics.mat_types, uv=rec["uv"])
        frame = bx.frame_from_rec(rec)
        ss, ts, ns = frame
        wo_local = bx.to_local(ss, ts, ns, rec["wo"])
        surf = alive & ~in_medium & rec["hit"]
        has_bsdf = surf & (rec["material"] >= 0)
        null_boundary = surf & (rec["material"] < 0)

        pick = None
        if cfg.light_strategy == "spatial" and scene.spatial_cdf is not None:
            from ..lights import lightdistrib as ldist

            pick = ldist.spatial_pick_light(
                scene.spatial_grid_res, scene.spatial_b0,
                scene.spatial_diag, scene.spatial_cdf, scene.spatial_pmf,
                rec["p"], u_select,
            )
        # handleMedia=true: shadow/BSDF-MIS rays carry transmittance and
        # cross material-less boundaries (VisibilityTester::Tr,
        # Scene::IntersectTr).  Compiled in only when media are present.
        tr_fn = isect_tr_fn = None
        if statics.has_media:
            def tr_fn(p_, perr_, ng_, p_light_, _med=cur_med, _k=key_b):
                w_ = p_light_ - p_
                o_ = offset_ray_origin(p_, perr_, ng_, w_)
                dvec = p_light_ - o_
                dist_ = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-20))
                dn_ = dvec / dist_[..., None]
                return _tr_walk_to(
                    scene, o_, dn_, dist_ * (1.0 - 1e-4), _med,
                    _k + jnp.uint32(41), statics,
                )

            def isect_tr_fn(o_, d_, _med=cur_med, _k=key_b):
                return _intersect_tr(
                    scene, o_, d_, _med, _k + jnp.uint32(43), statics
                )

        ld_surf = common.sample_one_light(
            scene, rec, frame, mat, wo_local, u_select, u_light, u_scatter,
            has_bsdf, statics.mat_types, statics.light_types,
            statics.quadric_types, pick=pick,
            tr_fn=tr_fn, isect_tr_fn=isect_tr_fn,
        )
        L = L + jnp.where(has_bsdf[..., None], beta * ld_surf, 0.0)

        bs = bx.sample_material(mat, wo_local, u_dir, statics.mat_types)
        wi_surf = bx.to_world(ss, ts, ns, bs["wi"])
        contrib = bs["f"] * (
            absdot(wi_surf, ns) / jnp.maximum(bs["pdf"], 1e-20)
        )[..., None]

        # Select next ray per lane class.
        if statics.has_media:
            new_d = jnp.where(in_medium[..., None], wi_med, wi_surf)
        else:
            new_d = wi_surf
        new_d = jnp.where(null_boundary[..., None], d, new_d)  # pass-through
        new_o_surf = offset_ray_origin(
            rec["p"], rec["p_error"], rec["ng"], new_d
        )
        new_o = jnp.where(in_medium[..., None], p_med, new_o_surf)

        ok_surf = has_bsdf & bs["valid"]
        beta = jnp.where(ok_surf[..., None], beta * contrib, beta)
        alive = alive & (in_medium | ok_surf | null_boundary)
        specular_bounce = jnp.where(surf, bs["is_specular"], False)

        # Medium transitions at boundaries (interaction.h GetMedium).
        pid = jnp.clip(prim, 0, scene.prim_medium_inside.shape[0] - 1)
        entering = dot(new_d, rec["ng"]) < 0.0
        boundary_med = jnp.where(
            entering, scene.prim_medium_inside[pid], scene.prim_medium_outside[pid]
        )
        crossed = (surf | null_boundary) & (
            dot(new_d, rec["ng"]) * dot(rec["wo"], rec["ng"]) < 0.0
        ) | null_boundary
        cur_med = jnp.where(crossed & rec["hit"], boundary_med, cur_med)

        o = new_o
        d = new_d

        # RR (dims +9) after bounce 3.
        if bounce > 3:
            u_rr = sa.get_1d(sampler_cfg, sampler_state, dim)
            dim += 1
            rr_beta_max = spectrum.max_component(beta)
            q = jnp.maximum(0.05, 1.0 - rr_beta_max)
            do_rr = rr_beta_max < cfg.rr_threshold
            die = do_rr & (u_rr < q)
            alive = alive & ~die
            beta = jnp.where(
                (do_rr & ~die)[..., None],
                beta / jnp.maximum(1.0 - q, 1e-6)[..., None],
                beta,
            )

    return L


def render(scene, camera, film_cfg, sampler_cfg, cfg=PathConfig(), filt=None):
    import functools

    from ..filters import make_filter
    from ..cameras import generate_rays

    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    statics = scene_statics(scene)
    if cfg.light_strategy == "spatial":
        from ..lights.lightdistrib import ensure_spatial_light_distribution

        scene = ensure_spatial_light_distribution(scene, statics.light_types)
    import jax as _jax
    scene = _jax.device_put(scene)  # one-time upload (see path.render)
    camera = _jax.device_put(camera)

    def batch(scene, camera, film_state, pixels, s):
        n = pixels.shape[0]
        state = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
        o, d, time, weight = generate_rays(camera, p_film, p_lens, time_u)
        L = li_volpath(scene, o, d, sampler_cfg, state, cfg, statics)
        bad = ~jnp.all(jnp.isfinite(L), -1) | jnp.any(L < 0.0, -1)
        L = jnp.where(bad[..., None], 0.0, L)
        return fm.add_samples(film_state, p_film, L, weight)

    step = jax.jit(batch)
    for s in range(sampler_cfg.spp):
        film_state = step(scene, camera, film_state, pixels, jnp.uint32(s))
    return fm.to_image(film_state)
