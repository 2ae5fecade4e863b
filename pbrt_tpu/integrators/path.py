"""Wavefront path integrator — THE core render loop.

TPU re-expression of PathIntegrator::Li (integrators/path.cpp:64-188) +
SamplerIntegrator::Render (integrator.cpp:228-339): pbrt's per-ray recursive
walk over tiles/threads becomes a bounce-major loop over a flat ray batch —
one (intersect -> shade+NEE -> next-ray) kernel sequence per bounce, all
lanes advancing in lockstep under live masks, statically unrolled so every
sampler dimension is a compile-time constant matching pbrt's consumption
order (camera dims 0-4; per bounce: 1D light select + 2D light + 2D bsdf-MIS
[UniformSampleOneLight, integrator.cpp:85], 2D bsdf sample [path.cpp:134],
1D Russian roulette after bounce 3 [path.cpp:178-184]).

Dimension schedule per bounce b (starting at dim 5):
  b in [0, 3]: 7 dims;  b >= 4: 8 dims (the RR draw).
"""
from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, dot, offset_ray_origin
from ..core import spectrum
from ..accel import traverse as tv
from ..lights import lights as lt
from ..materials import bsdf as bx
from ..samplers import samplers as sa
from ..statics import SceneStatics, scene_statics
from .. import film as fm
from .. import scene as sc
from . import common


@dataclasses.dataclass(frozen=True)
class PathConfig:
    max_depth: int = 5
    rr_threshold: float = 1.0
    light_strategy: str = "uniform"  # "uniform" | "power" | "spatial"
    # BSSRDF probe-walk depth (bounded IntersectionChain, bssrdf.cpp:295-320).
    ss_probe_depth: int = 4


def eval_scene_textures(scene, rec, statics: SceneStatics, duv=None):
    if not statics.has_textures:
        return None
    from ..textures.textures import evaluate_textures

    duvdx, duvdy = duv if duv is not None else (None, None)
    return evaluate_textures(
        scene.textures, rec["uv"], rec["p"], statics.tex_ids, statics.tex_meta,
        duvdx=duvdx, duvdy=duvdy,
    )


def li_path(
    scene: sc.SceneArrays,
    o,
    d,
    sampler_cfg: sa.SamplerConfig,
    sampler_state,
    cfg: PathConfig,
    statics: SceneStatics,
    start_dim: int = 5,
    count_rays: bool = False,
    ray_diffs=None,
    stats_out: bool = False,
    remat: bool = False,
):
    """Radiance along a batch of camera rays.  Returns L [N,3]
    (or (L, n_rays_traced) when count_rays — the Mrays/s denominator:
    closest-hit + shadow + MIS rays actually live per bounce, the analog of
    pbrt's ray-count stats, scene.cpp:40-43; or (L, counters) when stats_out
    — the full stats vector, utils/stats.py).

    remat=True wraps each bounce in jax.checkpoint: the backward pass
    re-traces ("replays") each bounce from its carry state instead of holding
    every bounce's activations live — O(1)-in-depth backward memory, the
    path-replay structure the differentiable renderer (parallel/diff.py)
    needs for killeroo-scale gradients."""
    from ..utils import stats as st

    quadric_types = statics.quadric_types
    light_types = statics.light_types
    mat_types = statics.mat_types
    n = o.shape[0]
    L = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    specular_bounce = jnp.zeros((n,), bool)
    eta_scale = jnp.ones((n,), jnp.float32)
    counters = st.zeros()
    counters = st.bump(counters, "Integrator/Camera rays traced", float(n))

    # Camera-ray closest hit; every later bounce's extension ray is traced
    # inside the SAME kernel launch as that bounce's shadow + MIS rays
    # (estimate_direct extra_ray) — one traversal launch per bounce.
    t, prim = tv.intersect_closest(scene, o, d, 1e30, quadric_types)
    # The bounce loop can fold the extension ray into the NEE launch only
    # when subsurface lanes can't relocate the exit point afterwards.
    merge_next = sc.MAT_SUBSURFACE not in mat_types

    carry = (L, beta, alive, specular_bounce, eta_scale, o, d, t, prim,
             counters)
    # Bounce loop: lax.scan over the interior bounces when possible (the
    # bounce body then compiles ONCE instead of max_depth times — round-3
    # verdict weak #2, compile time).  Bounce 0 (ray differentials +
    # camera-ray Le) and the final Le-only visit are peeled.  Scenes with
    # subsurface materials (+10 dims/bounce) and stateful samplers
    # (random/pss draw sequentially at trace time, so a traced-once scan
    # body would replay the same values every bounce) keep the unrolled
    # loop, which stays the reference implementation
    # (tests/test_scan_bounces.py asserts scan == unroll).
    use_scan = (
        sc.MAT_SUBSURFACE not in mat_types
        and sampler_cfg.name not in ("random", "pss")
        and cfg.max_depth >= 1
        and not _FORCE_UNROLL
    )
    if use_scan:
        # lax.scan traces its body even outside jit, so host-numpy scene
        # leaves must be jnp (identity on tracers under jit; an upload on
        # eager calls — same policy as traverse._device_scene).
        scene = jax.tree_util.tree_map(jnp.asarray, scene)
        # Bounce 0 joins the scan when it has nothing bounce-0-specific
        # (no camera ray differentials): the body then compiles ONCE for
        # all bounces instead of twice — a peeled body copy was ~15s of
        # the step's XLA compile (round-5 bisection).  The scan body's
        # camera-ray Le gate handles bounce==0 (traced index).
        fold0 = ray_diffs is None
        first_scan = 0 if fold0 else 1
        if not fold0:
            body0 = _make_bounce_body(
                0, start_dim, sampler_cfg, sampler_state, cfg, statics,
                merge_next, ray_diffs,
            )
            if remat:
                body0 = jax.checkpoint(body0)
            carry = body0(scene, carry)
        if cfg.max_depth >= first_scan + 1:
            sbody = _make_scan_body(
                sampler_cfg, sampler_state, cfg, statics, start_dim
            )
            if remat:
                sbody = jax.checkpoint(sbody)

            def step(c, b):
                return sbody(scene, c, b), None

            carry, _ = jax.lax.scan(
                step, carry,
                jnp.arange(first_scan, cfg.max_depth, dtype=jnp.int32),
            )
        last_body = _make_bounce_body(
            cfg.max_depth, 0, sampler_cfg, sampler_state, cfg, statics,
            merge_next, None,
        )
        carry = last_body(scene, carry)
    else:
        dim = start_dim
        for bounce in range(cfg.max_depth + 1):
            body = _make_bounce_body(
                bounce, dim, sampler_cfg, sampler_state, cfg, statics,
                merge_next, ray_diffs,
            )
            if remat and bounce < cfg.max_depth:
                body = jax.checkpoint(body)
            carry = body(scene, carry)
            dim += _dims_per_bounce(bounce, mat_types)

    L, counters = carry[0], carry[9]
    if stats_out:
        return L, counters
    if count_rays:
        return L, st.ray_total(counters)
    return L


# Debug escape hatch: force the statically-unrolled bounce loop (the
# reference implementation the scan path is equivalence-tested against).
_FORCE_UNROLL = os.environ.get("PBRT_TPU_UNROLL_BOUNCES", "0") == "1"


def _dims_per_bounce(bounce: int, mat_types) -> int:
    """Static sampler-dimension consumption of bounce `bounce` (docstring
    schedule): 5 NEE + 2 bsdf dims, +10 subsurface, +1 RR after bounce 3."""
    dims = 7
    if sc.MAT_SUBSURFACE in mat_types:
        dims += 10
    if bounce > 3:
        dims += 1
    return dims


def _make_bounce_body(
    bounce, dim, sampler_cfg, sampler_state, cfg, statics, merge_next,
    ray_diffs,
):
    """One bounce of the path walk as a pure carry->carry function, so the
    unrolled loop can wrap it in jax.checkpoint (path-replay backward)."""
    from ..utils import stats as st

    quadric_types = statics.quadric_types
    light_types = statics.light_types
    mat_types = statics.mat_types
    last = bounce >= cfg.max_depth

    def body(scene, carry):
        (L, beta, alive, specular_bounce, eta_scale, o, d, t, prim,
         counters) = carry
        dim_b = dim
        counters = st.bump(
            counters, "Intersections/Regular ray intersection tests", alive
        )
        rec = tv.hit_record(scene, o, d, t, prim, quadric_types)
        found = rec["hit"] & alive
        counters = st.bump(counters, "Integrator/Path vertices", found)

        # Emitted radiance at path vertex (path.cpp:91-101): only for camera
        # rays and rays leaving a specular bounce (others were MIS-counted).
        count_le = (bounce == 0) | specular_bounce
        le_surf = lt.area_light_emission(
            scene, rec["arealight"], rec["ng"], rec["wo"]
        )
        L = L + jnp.where(
            (found & count_le)[..., None], beta * le_surf, 0.0
        )
        le_inf = lt.escaped_radiance(scene, d, light_types)
        L = L + jnp.where(
            (alive & ~rec["hit"] & count_le)[..., None], beta * le_inf, 0.0
        )

        alive = found
        if last:
            return (L, beta, alive, specular_bounce, eta_scale, o, d, t,
                    prim, counters)

        # ---- shading setup ----
        # Camera rays carry differentials (bounce 0 only: pbrt's scattered
        # rays have hasDifferentials=false, path.cpp Li never re-derives
        # them), driving mip-level selection at the first hit.
        duv = None
        if bounce == 0 and ray_diffs is not None:
            duv = tv.uv_differentials(rec, *ray_diffs)
        tex_vals = eval_scene_textures(scene, rec, statics, duv=duv)
        mat = bx.gather_material(scene.materials, rec["material"], tex_vals, mat_types, uv=rec["uv"])
        frame = bx.frame_from_rec(rec)
        ss, ts, ns = frame
        wo_local = bx.to_local(ss, ts, ns, rec["wo"])
        has_bsdf = alive & (rec["material"] >= 0)

        # ---- NEE (dims +0..+4) ----
        u_select = sa.get_1d(sampler_cfg, sampler_state, dim_b)
        u_light = sa.get_2d(sampler_cfg, sampler_state, dim_b + 1)
        u_scatter = sa.get_2d(sampler_cfg, sampler_state, dim_b + 3)
        dim_b += 5
        counters = st.bump(
            counters, "Intersections/Shadow ray intersection tests",
            2.0 * jnp.sum(has_bsdf.astype(jnp.float32)),
        )
        counters = st.bump(counters, "Lights/Light samples taken", has_bsdf)
        pick = None
        if cfg.light_strategy == "spatial" and scene.spatial_cdf is not None:
            from ..lights import lightdistrib as ldist

            pick = ldist.spatial_pick_light(
                scene.spatial_grid_res, scene.spatial_b0,
                scene.spatial_diag, scene.spatial_cdf, scene.spatial_pmf,
                rec["p"], u_select,
            )
        # ---- BSDF sampling for the next bounce (dims +5,+6; drawn before
        # the NEE call so the extension ray can ride its kernel launch —
        # dim INDICES are unchanged, so the sample stream is identical) ----
        u_bsdf = sa.get_2d(sampler_cfg, sampler_state, dim_b)
        bs = bx.sample_material(mat, wo_local, u_bsdf, mat_types)
        wi_world = bx.to_world(ss, ts, ns, bs["wi"])
        o_next = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi_world)

        if merge_next:
            ld, (t_next, prim_next) = common.sample_one_light(
                scene, rec, frame, mat, wo_local,
                u_select, u_light, u_scatter,
                has_bsdf, mat_types, light_types, quadric_types, pick=pick,
                extra_ray=(o_next, wi_world),
            )
        else:
            ld = common.sample_one_light(
                scene, rec, frame, mat, wo_local,
                u_select, u_light, u_scatter,
                has_bsdf, mat_types, light_types, quadric_types, pick=pick,
            )
        L = L + jnp.where(has_bsdf[..., None], beta * ld, 0.0)
        dim_b += 2  # the u_bsdf dims (+5, +6) consumed above

        # Dead/invalid lanes (pdf=0) would otherwise feed a ~1e20 ratio into
        # the backward pass (overflow -> NaN adjoints); they die below, so
        # zero their contrib with a sanitized pdf.
        valid = has_bsdf & bs["valid"]
        pdf_s = jnp.where(valid, bs["pdf"], 1.0)
        contrib = (
            bs["f"]
            * (absdot(wi_world, ns) / jnp.maximum(pdf_s, 1e-20))[..., None]
        )
        contrib = jnp.where(valid[..., None], contrib, 0.0)
        alive = alive & valid
        beta = jnp.where(alive[..., None], beta * contrib, beta)
        specular_bounce = bs["is_specular"]
        # etaScale tracking for RR through glass (path.cpp:144-150).
        transmitted = bs["is_specular"] & (
            bs["wi"][..., 2] * wo_local[..., 2] < 0.0
        )
        et = mat["eta"]
        entering = wo_local[..., 2] > 0.0
        eta_fac = jnp.where(entering, et * et, 1.0 / jnp.maximum(et * et, 1e-12))
        eta_scale = jnp.where(transmitted, eta_scale * eta_fac, eta_scale)

        # Dead/invalid lanes keep their previous (unit) ray: a sampled
        # wi of exactly zero otherwise flows zero VECTORS into downstream
        # spherical helpers, whose sqrt(0)-class partials NaN the backward
        # pass even under masks (round-4 grad hunt).
        o = jnp.where(alive[..., None], o_next, o)
        d = jnp.where(alive[..., None], wi_world, d)

        # ---- Subsurface scattering (path.cpp:152-174): lanes that sampled
        # a transmission event on a BSSRDF material re-emerge at a sampled
        # exit point pi, with direct lighting + a diffuse (Sw) continuation.
        # Statically compiled out of scenes without subsurface materials;
        # when present it consumes 10 extra dims per bounce for every lane
        # (static schedule; pbrt consumes them only on subsurface paths). ----
        if sc.MAT_SUBSURFACE in mat_types:
            u_ss = sa.get_1d(sampler_cfg, sampler_state, dim_b)
            u_ss2 = sa.get_2d(sampler_cfg, sampler_state, dim_b + 1)
            u_sel2 = sa.get_1d(sampler_cfg, sampler_state, dim_b + 3)
            u_li2 = sa.get_2d(sampler_cfg, sampler_state, dim_b + 4)
            u_sc2 = sa.get_2d(sampler_cfg, sampler_state, dim_b + 6)
            u_bsdf2 = sa.get_2d(sampler_cfg, sampler_state, dim_b + 8)
            dim_b += 10
            crossed = bs["wi"][..., 2] * wo_local[..., 2] < 0.0
            do_ss = alive & (mat["type"] == sc.MAT_SUBSURFACE) & crossed
            spr = common.sample_bssrdf_sp(
                scene, rec, frame, mat, u_ss, u_ss2, quadric_types,
                n_probe=cfg.ss_probe_depth,
            )
            ok = do_ss & spr["ok"]
            counters = st.bump(
                counters, "Intersections/BSSRDF probe rays",
                cfg.ss_probe_depth * jnp.sum(do_ss.astype(jnp.float32)),
            )
            counters = st.bump(
                counters, "Intersections/Shadow ray intersection tests",
                2.0 * jnp.sum(ok.astype(jnp.float32)),
            )
            beta = jnp.where(
                ok[..., None],
                beta * spr["sp"] / jnp.maximum(spr["pdf"], 1e-20)[..., None],
                beta,
            )
            # S black / pdf 0 -> path dies (path.cpp:159).
            alive = alive & (~do_ss | ok)
            pi_rec = {
                "p": spr["p"], "p_error": spr["p_error"],
                "ns": spr["ns"], "ng": spr["ng"],
            }
            pi_frame = bx.make_frame(spr["ns"], spr["dpdu"])
            adapter = {
                "type": jnp.where(ok, sc.MAT_BSSRDF_ADAPTER, -1),
                "eta": mat["eta"],
            }
            # wo at pi is the shading normal (bssrdf.cpp:243): local (0,0,1).
            wo_pi = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32), wo_local.shape
            )
            pick2 = None
            if cfg.light_strategy == "spatial" and scene.spatial_cdf is not None:
                from ..lights import lightdistrib as ldist

                pick2 = ldist.spatial_pick_light(
                    scene.spatial_grid_res, scene.spatial_b0,
                    scene.spatial_diag, scene.spatial_cdf, scene.spatial_pmf,
                    spr["p"], u_sel2,
                )
            ld2 = common.sample_one_light(
                scene, pi_rec, pi_frame, adapter, wo_pi,
                u_sel2, u_li2, u_sc2,
                ok, (sc.MAT_BSSRDF_ADAPTER,), light_types, quadric_types,
                pick=pick2,
            )
            L = L + jnp.where(ok[..., None], beta * ld2, 0.0)
            # Indirect: sample the Sw adapter lobe (path.cpp:167-173).
            bs2 = bx.sample_material(
                adapter, wo_pi, u_bsdf2, (sc.MAT_BSSRDF_ADAPTER,)
            )
            wi2_world = bx.to_world(*pi_frame, bs2["wi"])
            contrib2 = bs2["f"] * (
                absdot(wi2_world, pi_frame[2])
                / jnp.maximum(bs2["pdf"], 1e-20)
            )[..., None]
            alive = alive & (~ok | (bs2["valid"] & jnp.any(bs2["f"] > 0, -1)))
            beta = jnp.where((ok & alive)[..., None], beta * contrib2, beta)
            specular_bounce = jnp.where(ok, False, specular_bounce)
            o = jnp.where(
                ok[..., None],
                offset_ray_origin(spr["p"], spr["p_error"], spr["ng"], wi2_world),
                o,
            )
            d = jnp.where(ok[..., None], wi2_world, d)

        # ---- Russian roulette (path.cpp:176-184), dim +7 after bounce 3 ----
        if bounce > 3:
            u_rr = sa.get_1d(sampler_cfg, sampler_state, dim_b)
            dim_b += 1
            rr_beta_max = spectrum.max_component(beta * eta_scale[..., None])
            q = jnp.maximum(0.05, 1.0 - rr_beta_max)
            do_rr = rr_beta_max < cfg.rr_threshold
            die = do_rr & (u_rr < q)
            counters = st.bump(
                counters, "Integrator/Russian-roulette terminations",
                die & alive,
            )
            alive = alive & ~die
            beta = jnp.where(
                (do_rr & ~die)[..., None],
                beta / jnp.maximum(1.0 - q, 1e-6)[..., None],
                beta,
            )

        # Next bounce's closest hit: already traced in the NEE launch, or
        # traced here when subsurface lanes may have relocated the ray.
        if merge_next:
            t, prim = t_next, prim_next
        else:
            t, prim = tv.intersect_closest(scene, o, d, 1e30, quadric_types)
        return (L, beta, alive, specular_bounce, eta_scale, o, d, t, prim,
                counters)

    return body


def _make_scan_body(sampler_cfg, sampler_state, cfg, statics, start_dim):
    """One INTERIOR bounce (1 <= bounce < max_depth) with a TRACED bounce
    index, for lax.scan: the same math as _make_bounce_body's non-last,
    non-subsurface path, with sampler dims computed from `bounce` by the
    closed-form schedule (7 dims/bounce + 1 RR dim per bounce after 3) and
    drawn via the *_dyn getters (bit-identical values for the stateless
    samplers; tests/test_scan_bounces.py).  Russian roulette is masked by
    bounce > 3 instead of statically omitted — the RR draw at dim_b+7 on
    earlier bounces is discarded, which is stream-neutral because the
    stateless samplers are pure functions of (index, dim)."""
    from ..utils import stats as st

    quadric_types = statics.quadric_types
    light_types = statics.light_types
    mat_types = statics.mat_types

    def body(scene, carry, bounce):
        (L, beta, alive, specular_bounce, eta_scale, o, d, t, prim,
         counters) = carry
        bounce = jnp.asarray(bounce, jnp.int32)
        dim_b = (
            jnp.int32(start_dim) + 7 * bounce + jnp.maximum(bounce - 4, 0)
        )
        counters = st.bump(
            counters, "Intersections/Regular ray intersection tests", alive
        )
        rec = tv.hit_record(scene, o, d, t, prim, quadric_types)
        found = rec["hit"] & alive
        counters = st.bump(counters, "Integrator/Path vertices", found)

        # Le for camera rays (traced bounce 0, when folded into the scan)
        # and rays leaving a specular bounce (path.cpp:91-101).
        count_le = (bounce == 0) | specular_bounce
        le_surf = lt.area_light_emission(
            scene, rec["arealight"], rec["ng"], rec["wo"]
        )
        L = L + jnp.where(
            (found & count_le)[..., None], beta * le_surf, 0.0
        )
        le_inf = lt.escaped_radiance(scene, d, light_types)
        L = L + jnp.where(
            (alive & ~rec["hit"] & count_le)[..., None], beta * le_inf, 0.0
        )
        alive = found

        # ---- shading setup (no ray differentials past bounce 0) ----
        tex_vals = eval_scene_textures(scene, rec, statics, duv=None)
        mat = bx.gather_material(
            scene.materials, rec["material"], tex_vals, mat_types,
            uv=rec["uv"],
        )
        frame = bx.frame_from_rec(rec)
        ss, ts, ns = frame
        wo_local = bx.to_local(ss, ts, ns, rec["wo"])
        has_bsdf = alive & (rec["material"] >= 0)

        # ---- NEE draws (dims +0..+4) + BSDF draw (+5,+6) ----
        u_select = sa.get_1d_dyn(sampler_cfg, sampler_state, dim_b)
        u_light = sa.get_2d_dyn(sampler_cfg, sampler_state, dim_b + 1)
        u_scatter = sa.get_2d_dyn(sampler_cfg, sampler_state, dim_b + 3)
        u_bsdf = sa.get_2d_dyn(sampler_cfg, sampler_state, dim_b + 5)
        counters = st.bump(
            counters, "Intersections/Shadow ray intersection tests",
            2.0 * jnp.sum(has_bsdf.astype(jnp.float32)),
        )
        counters = st.bump(counters, "Lights/Light samples taken", has_bsdf)
        pick = None
        if cfg.light_strategy == "spatial" and scene.spatial_cdf is not None:
            from ..lights import lightdistrib as ldist

            pick = ldist.spatial_pick_light(
                scene.spatial_grid_res, scene.spatial_b0,
                scene.spatial_diag, scene.spatial_cdf, scene.spatial_pmf,
                rec["p"], u_select,
            )
        bs = bx.sample_material(mat, wo_local, u_bsdf, mat_types)
        wi_world = bx.to_world(ss, ts, ns, bs["wi"])
        o_next = offset_ray_origin(
            rec["p"], rec["p_error"], rec["ng"], wi_world
        )
        ld, (t_next, prim_next) = common.sample_one_light(
            scene, rec, frame, mat, wo_local,
            u_select, u_light, u_scatter,
            has_bsdf, mat_types, light_types, quadric_types, pick=pick,
            extra_ray=(o_next, wi_world),
        )
        L = L + jnp.where(has_bsdf[..., None], beta * ld, 0.0)

        valid = has_bsdf & bs["valid"]
        pdf_s = jnp.where(valid, bs["pdf"], 1.0)
        contrib = (
            bs["f"]
            * (absdot(wi_world, ns) / jnp.maximum(pdf_s, 1e-20))[..., None]
        )
        contrib = jnp.where(valid[..., None], contrib, 0.0)
        alive = alive & valid
        beta = jnp.where(alive[..., None], beta * contrib, beta)
        specular_bounce = bs["is_specular"]
        transmitted = bs["is_specular"] & (
            bs["wi"][..., 2] * wo_local[..., 2] < 0.0
        )
        et = mat["eta"]
        entering = wo_local[..., 2] > 0.0
        eta_fac = jnp.where(
            entering, et * et, 1.0 / jnp.maximum(et * et, 1e-12)
        )
        eta_scale = jnp.where(transmitted, eta_scale * eta_fac, eta_scale)

        # Dead/invalid lanes keep their previous (unit) ray: a sampled
        # wi of exactly zero otherwise flows zero VECTORS into downstream
        # spherical helpers, whose sqrt(0)-class partials NaN the backward
        # pass even under masks (round-4 grad hunt).
        o = jnp.where(alive[..., None], o_next, o)
        d = jnp.where(alive[..., None], wi_world, d)

        # ---- Russian roulette, masked by bounce > 3 (path.cpp:176-184) ----
        u_rr = sa.get_1d_dyn(sampler_cfg, sampler_state, dim_b + 7)
        rr_beta_max = spectrum.max_component(beta * eta_scale[..., None])
        q = jnp.maximum(0.05, 1.0 - rr_beta_max)
        do_rr = (bounce > 3) & (rr_beta_max < cfg.rr_threshold)
        die = do_rr & (u_rr < q)
        counters = st.bump(
            counters, "Integrator/Russian-roulette terminations", die & alive
        )
        alive = alive & ~die
        beta = jnp.where(
            (do_rr & ~die)[..., None],
            beta / jnp.maximum(1.0 - q, 1e-6)[..., None],
            beta,
        )

        return (L, beta, alive, specular_bounce, eta_scale, o, d, t_next,
                prim_next, counters)

    return body


def make_pixel_grid(film_cfg: fm.FilmConfig):
    """All pixels in the cropped bounds as an [Npix, 2] int array."""
    px0, px1, py0, py1 = film_cfg.cropped_pixel_bounds
    xs, ys = np.meshgrid(np.arange(px0, px1), np.arange(py0, py1))
    return np.stack([xs.ravel(), ys.ravel()], -1).astype(np.int32)


def render_sample_batch(
    scene,
    camera,
    film_state,
    pixels,
    sample_num,
    sampler_cfg: sa.SamplerConfig,
    cfg: PathConfig,
    statics: SceneStatics,
    count_rays: bool = False,
    stats_out: bool = False,
    exact_table=None,
):
    """One sample per pixel: the jitted unit of work (SURVEY.md P1).

    pixels: [N,2] int32; sample_num: scalar int32.  exact_table [D,N]
    (optional): host-precomputed exact sample values, one contiguous
    lane-row per dimension — samplers read table[dim] instead of
    recomputing (samplers/exact_tables.py).
    """
    from ..utils import stats as st

    n = pixels.shape[0]
    state = sa.init_state(
        sampler_cfg, pixels, jnp.full((n,), sample_num, jnp.uint32)
    )
    if exact_table is not None:
        n_dims = 5 + sum(
            _dims_per_bounce(b, statics.mat_types)
            for b in range(cfg.max_depth)
        ) + 1
        if exact_table.shape[0] < n_dims:
            # Partial (PixelSampler) table: the remaining dims draw the
            # stateless equivalents (documented truncation — pbrt falls
            # back to a sequential per-tile RNG there, which lockstep
            # cannot reproduce; see exact_tables.pixel_exact_table).
            tail = jnp.stack(
                [sa.get_1d(sampler_cfg, state, dd)
                 for dd in range(exact_table.shape[0], n_dims)], 0
            )
            exact_table = jnp.concatenate([exact_table, tail], 0)
        state = dict(state, table=exact_table)
    elif sampler_cfg.name == "halton":
        # Precompute the batch's halton dims ONCE with the static per-dim
        # form (baked per-prime permutation constants; measured 200ms vs
        # 425ms for the scan body's dynamic-dim draws at 160k lanes) and
        # let every later get_* read table[:, dim].  Values are identical
        # either way (both are the same radical-inverse math).
        n_dims = 5 + sum(
            _dims_per_bounce(b, statics.mat_types) for b in range(cfg.max_depth)
        ) + 1
        tab = jnp.stack(
            [sa.get_1d(sampler_cfg, state, dd) for dd in range(n_dims)], 0
        )  # [D, N]: one contiguous row per dim
        state = dict(state, table=tab)
    p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
    from ..cameras import generate_ray_differentials

    o, d, time, weight, rx_o, rx_d, ry_o, ry_d = generate_ray_differentials(
        camera, p_film, p_lens, time_u, spp=sampler_cfg.spp
    )
    ray_diffs = (rx_o, rx_d, ry_o, ry_d) if statics.has_textures else None
    L, counters = li_path(
        scene, o, d, sampler_cfg, state, cfg, statics, ray_diffs=ray_diffs,
        stats_out=True,
    )
    # NaN/negative checks -> black (integrator.cpp:294-315).
    bad = ~jnp.all(jnp.isfinite(L), -1) | jnp.any(L < 0.0, -1)
    L = jnp.where(bad[..., None], 0.0, L)
    film = fm.add_samples(film_state, p_film, L, weight)
    counters = st.bump(counters, "Film/Samples added", float(n))
    if stats_out:
        return film, counters
    if count_rays:
        return film, st.ray_total(counters)
    return film


@functools.lru_cache(maxsize=None)
def _step_fn(sampler_cfg, cfg, statics, stats_out):
    """Module-level jitted sample-batch step, memoized on the static configs.

    render() used to build `jax.jit(functools.partial(...))` per call, so
    every render paid full XLA recompilation (the round-3 bench artifact:
    a second 32x32 render cost 26s).  All configs are frozen dataclasses /
    tuples, so they key an lru_cache; repeated renders (and the bench's
    warm/timed pair) now reuse one compiled executable.
    """
    return jax.jit(
        functools.partial(
            render_sample_batch, sampler_cfg=sampler_cfg, cfg=cfg,
            statics=statics, stats_out=stats_out,
        )
    )


def render(
    scene: sc.SceneArrays,
    camera,
    film_cfg: fm.FilmConfig,
    sampler_cfg: sa.SamplerConfig,
    cfg: PathConfig = PathConfig(),
    filt=None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
    count_rays: bool = False,
    stats_out: bool = False,
    progress=None,
):
    """Full render: host loop over sample batches (checkpointable epochs).

    count_rays=True also returns the traced-ray total (closest-hit + shadow
    + MIS rays actually live, the analog of pbrt's ray counters,
    scene.cpp:40-43) — the bench.py Mrays/s denominator.  stats_out=True
    returns (img, counters) with the full stats vector (utils/stats.py).
    progress: optional ProgressReporter updated once per spp batch."""
    from ..filters import make_filter
    from ..utils import checkpoint as ckpt
    from ..utils import stats as st

    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    statics = scene_statics(scene)
    if cfg.light_strategy == "spatial":
        from ..lights.lightdistrib import ensure_spatial_light_distribution

        scene = ensure_spatial_light_distribution(scene, statics.light_types)
    # One-time host->device upload.  SceneArrays leaves are numpy (build
    # stays host-side); passing them to jit directly re-uploads the whole
    # scene through the (remote) device tunnel EVERY call — measured ~300ms
    # per 17MB killeroo scene per step on the axon TPU.
    from ..utils.devcache import device_put_cached

    scene = device_put_cached(scene)
    camera = device_put_cached(camera)

    start = 0
    if checkpoint_path:
        film_state, start = ckpt.maybe_resume(checkpoint_path, film_state)

    want_aux = count_rays or stats_out
    step = _step_fn(sampler_cfg, cfg, statics, want_aux)
    exact = getattr(sampler_cfg, "exact", False)
    from ..samplers import exact_tables as xt

    pixel_exact = exact and sampler_cfg.name in xt.PIXEL_EXACT_SAMPLERS
    if exact and not pixel_exact and sampler_cfg.name != "halton":
        raise NotImplementedError(
            "exact-tables render mode covers halton (full-stream) and the "
            "PixelSamplers stratified/(0,2)/maxmin (array-backed dims; "
            "samplers/exact_tables.pixel_exact_table)"
        )
    if exact:
        pixels_np = np.asarray(pixels)
        n_dims = xt.n_dims_for(cfg, statics)
    counters = st.zeros()
    for s in range(start, sampler_cfg.spp):
        if exact:
            if pixel_exact:
                # Array-backed dims 0..9 bit-exact (pbrt per-tile RNG
                # order); render_sample_batch extends the table with the
                # stateless draws for the remaining dims.
                tab = jnp.asarray(xt.pixel_exact_table(
                    sampler_cfg.name, pixels_np, s, sampler_cfg.spp
                ))
            else:
                tab = jnp.asarray(
                    xt.halton_exact_table(sampler_cfg, pixels_np, s, n_dims).T
                )  # [D, N]
            out = step(scene, camera, film_state, pixels, jnp.uint32(s),
                       exact_table=tab)
        else:
            out = step(scene, camera, film_state, pixels, jnp.uint32(s))
        if want_aux:
            film_state, batch_counters = out
            counters = counters + batch_counters
        else:
            film_state = out
        if progress is not None:
            progress.update(s + 1 - start)
        if checkpoint_path and checkpoint_every and (s + 1) % checkpoint_every == 0:
            ckpt.save(checkpoint_path, film_state, s + 1)
    img = fm.to_image(film_state, scale=film_cfg.scale)
    if stats_out:
        return img, counters
    if count_rays:
        return img, float(st.ray_total(counters))
    return img


def material_types_present(scene: sc.SceneArrays) -> tuple:
    return tuple(
        sorted(np.unique(np.asarray(scene.materials.mat_type)).tolist())
    )
