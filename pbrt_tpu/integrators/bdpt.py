"""Bidirectional path tracer.

TPU re-expression of integrators/bdpt.{h,cpp}: pbrt's per-ray Vertex arrays
(bdpt.h:84-425) become per-depth dicts of flat [N,...] arrays held in python
lists — every (s,t) connection strategy is statically unrolled (s, t are
compile-time), so vertex lookups are list indexing, never dynamic gathers.

Structure mirrors the reference:
  * GenerateCameraSubpath / GenerateLightSubpath via a shared RandomWalk
    (bdpt.cpp:50-123) recording beta/pdfFwd/pdfRev/delta per vertex;
  * ConnectBDPT (bdpt.cpp:300+) per strategy: s=0 (camera path hits light),
    s=1 (light sampling), t=1 (camera sampling -> film splats), general
    s,t>=2 connections with G * visibility;
  * MISWeight (bdpt.cpp:230-294): the remapped pdfRev/pdfFwd ratio walk with
    the four strategy-specific pdfRev overrides (pbrt's ScopedAssignment
    juggling becomes explicit per-strategy values).

Round-1 scope (documented; NOTES.md): surface vertices only (no media),
infinite/env lights are not connected by light subpaths (escaped camera
rays contribute nothing through BDPT strategies); lights: point, spot,
distant, diffuse area (sphere/triangle); camera: perspective pinhole.

Sampler dimensions: camera subpath consumes the same 5 camera dims, then
per-bounce 2 (bsdf); light subpath: 1 (light pick) + 2 (pos) + 2 (dir) +
per-bounce 2.  Fixed schedule, deterministic per (pixel, sample).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, dot, normalize, offset_ray_origin
from ..core import sampling as smp
from ..accel import traverse as tv
from ..lights import lights as lt
from ..materials import bsdf as bx
from ..samplers import samplers as sa
from ..statics import SceneStatics, scene_statics
from .. import film as fm
from .. import scene as sc
from . import common


@dataclasses.dataclass(frozen=True)
class BDPTConfig:
    max_depth: int = 5


def _remap0(x):
    return jnp.where(x == 0.0, 1.0, x)


def _convert_density(pdf_sa, p_from, p_to, ng_to, to_is_surface):
    """Vertex::ConvertDensity (bdpt.h:150): solid angle -> area measure."""
    w = p_to - p_from
    d2 = jnp.maximum(jnp.sum(w * w, -1), 1e-12)
    inv_d2 = 1.0 / d2
    cos_f = jnp.where(
        to_is_surface,
        jnp.abs(dot(ng_to, w * jnp.sqrt(inv_d2)[..., None])),
        1.0,
    )
    return pdf_sa * cos_f * inv_d2


def _light_pick_pmf(scene, light_idx):
    d = scene.light_distr
    nl = d.func.shape[-1]
    li = jnp.clip(light_idx, 0, nl - 1)
    pmf = jnp.where(
        d.func_int > 0.0, d.func[li] / jnp.maximum(d.func_int * nl, 1e-30), 0.0
    )
    return jnp.where(light_idx >= 0, pmf, 0.0)


def _surface_vertex(scene, rec, beta, statics):
    """Vertex record for a surface hit."""
    mat = bx.gather_material(
        scene.materials, rec["material"], None, statics.mat_types, uv=rec["uv"]
    )
    return {
        "exists": rec["hit"],
        "p": rec["p"],
        "p_error": rec["p_error"],
        "ng": rec["ng"],
        "ns": rec["ns"],
        "dpdu": rec["dpdu"],
        "ss": rec["ss"],
        "uv": rec["uv"],
        "wo": rec["wo"],
        "mat": mat,
        "mat_id": rec["material"],
        "light_idx": rec["arealight"],  # light table row or -1
        "beta": beta,
        "pdf_fwd": jnp.zeros(rec["t"].shape, jnp.float32),
        "pdf_rev": jnp.zeros(rec["t"].shape, jnp.float32),
        "delta": jnp.zeros(rec["t"].shape, bool),
        "is_surface": jnp.ones(rec["t"].shape, bool),
    }


def _vertex_f(v, p_next, statics):
    """Vertex::f: BSDF value from v toward p_next (radiance transport)."""
    frame = bx.frame_from_rec(v)
    ss, ts_, ns = frame
    wo_l = bx.to_local(ss, ts_, ns, v["wo"])
    wi_w = normalize(p_next - v["p"])
    wi_l = bx.to_local(ss, ts_, ns, wi_w)
    f, _ = bx.eval_material(v["mat"], wo_l, wi_l, statics.mat_types)
    return f


def _vertex_pdf(v, p_prev, p_next, ng_next, next_is_surface, statics):
    """Vertex::Pdf (surface vertex): bsdf pdf(prev->v->next) in area measure
    at next."""
    frame = bx.frame_from_rec(v)
    ss, ts_, ns = frame
    wo_l = bx.to_local(ss, ts_, ns, normalize(p_prev - v["p"]))
    wi_l = bx.to_local(ss, ts_, ns, normalize(p_next - v["p"]))
    _, pdf_sa = bx.eval_material(v["mat"], wo_l, wi_l, statics.mat_types)
    return _convert_density(pdf_sa, v["p"], p_next, ng_next, next_is_surface)


def _random_walk(scene, o, d, beta, pdf_dir, n_steps, sampler_cfg, state,
                 dim0, statics, first_vertex_p, first_vertex_ng):
    """RandomWalk (bdpt.cpp:69-123): record up to n_steps surface vertices.

    Returns (vertices list, dims consumed).  pdf_rev of the walk's source
    vertex is returned via the first vertex dict key 'prev_pdf_rev'."""
    qt = statics.quadric_types
    verts = []
    dim = dim0
    pdf_fwd_sa = pdf_dir
    prev_p = first_vertex_p
    prev_ng = first_vertex_ng
    alive = jnp.any(beta != 0.0, -1) & (pdf_dir > 0.0)
    for b in range(n_steps):
        t, prim = tv.intersect_closest(scene, o, d, 1e30, qt)
        rec = tv.hit_record(scene, o, d, t, prim, qt)
        exists = rec["hit"] & alive & (rec["material"] >= 0)
        v = _surface_vertex(scene, rec, beta, statics)
        v["exists"] = exists
        v["pdf_fwd"] = jnp.where(
            exists,
            _convert_density(pdf_fwd_sa, prev_p, rec["p"], rec["ng"],
                             jnp.ones(t.shape, bool)),
            0.0,
        )
        # BSDF sample for the next step (2 dims).
        u = sa.get_2d(sampler_cfg, state, dim)
        dim += 2
        frame = bx.frame_from_rec(rec)
        ss, ts_, ns = frame
        wo_l = bx.to_local(ss, ts_, ns, rec["wo"])
        bs = bx.sample_material(v["mat"], wo_l, u, statics.mat_types)
        wi_w = bx.to_world(ss, ts_, ns, bs["wi"])
        v["delta"] = bs["is_specular"] & exists
        # Reverse pdf toward the previous vertex (bdpt.cpp:109-117).
        _, pdf_rev_sa = bx.eval_material(
            v["mat"], bs["wi"], wo_l, statics.mat_types
        )
        v["prev_pdf_rev"] = jnp.where(
            exists,
            _convert_density(pdf_rev_sa, rec["p"], prev_p, prev_ng,
                             jnp.ones(t.shape, bool)),
            0.0,
        )
        verts.append(v)

        contrib = bs["f"] * (
            absdot(wi_w, ns) / jnp.maximum(bs["pdf"], 1e-20)
        )[..., None]
        alive = exists & bs["valid"]
        beta = jnp.where(alive[..., None], beta * contrib, 0.0)
        pdf_fwd_sa = jnp.where(bs["is_specular"], bs["pdf"] * 0.0 + 1.0, bs["pdf"])
        pdf_fwd_sa = jnp.where(alive, pdf_fwd_sa, 0.0)
        prev_p = rec["p"]
        prev_ng = rec["ng"]
        o = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi_w)
        d = wi_w
    # Propagate prev_pdf_rev into pdf_rev of the predecessor.
    for i in range(1, len(verts)):
        verts[i - 1]["pdf_rev"] = verts[i]["prev_pdf_rev"]
    return verts, dim


def generate_camera_subpath(scene, camera, pixels, sampler_cfg, state, cfg,
                            statics):
    """(bdpt.cpp:50-64): camera vertex + (maxDepth+1)-step walk."""
    from ..cameras import generate_rays
    from ..cameras.cameras import camera_pdf_we

    n = pixels.shape[0]
    p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
    o, d, _, _ = generate_rays(camera, p_film, p_lens, time_u)
    _, pdf_dir = camera_pdf_we(camera, o, d)
    cam_v = {
        "exists": jnp.ones((n,), bool),
        "p": o,
        "ng": d,  # forward axis stand-in; camera vertex cos handled via We
        "beta": jnp.ones((n, 3), jnp.float32),
        "pdf_fwd": jnp.ones((n,), jnp.float32),
        "pdf_rev": jnp.zeros((n,), jnp.float32),
        "delta": jnp.zeros((n,), bool),
        "is_surface": jnp.zeros((n,), bool),
        "is_camera": True,
    }
    walk, dim = _random_walk(
        scene, o, d, jnp.ones((n, 3), jnp.float32), pdf_dir,
        cfg.max_depth + 1, sampler_cfg, state, 5, statics, o,
        jnp.zeros((n, 3), jnp.float32),
    )
    # pdf_rev of the camera vertex is never used by MIS (t>0 always ends at
    # i=1); keep zero.
    return [cam_v] + walk, dim, p_film


def generate_light_subpath(scene, n, sampler_cfg, state, cfg, statics, dim0):
    """(bdpt.cpp:66-123): pick a light, Sample_Le, walk maxDepth steps."""
    u_pick = sa.get_1d(sampler_cfg, state, dim0)
    u_pos = sa.get_2d(sampler_cfg, state, dim0 + 1)
    u_dir = sa.get_2d(sampler_cfg, state, dim0 + 3)
    dim = dim0 + 5
    light_idx, pmf, _ = smp.sample_discrete_1d(scene.light_distr, u_pick)
    le = lt.sample_le(scene, light_idx, u_pos, u_dir, statics.light_types)
    pdf_pos = le["pdf_pos"]
    pdf_dir = le["pdf_dir"]
    nl = le["n_light"]
    cos_e = jnp.abs(dot(nl, le["d"]))
    beta0 = le["le"] * jnp.ones((n, 3), jnp.float32)
    denom = jnp.maximum(pmf * pdf_pos * pdf_dir, 1e-20)
    beta1 = le["le"] * (cos_e / denom)[..., None]
    light_v = {
        "exists": (pdf_pos > 0.0) & (pmf > 0.0),
        "p": le["o"],
        "ng": nl,
        "beta": beta0 / jnp.maximum(pmf * pdf_pos, 1e-20)[..., None],
        "pdf_fwd": pmf * pdf_pos,
        "pdf_rev": jnp.zeros((n,), jnp.float32),
        # Vertex::delta marks specular-BSDF vertices only; a light's
        # positional delta-ness is IsDeltaLight, checked separately at the
        # path end (bdpt.cpp MISWeight's deltaLightvertex).
        "delta": jnp.zeros((n,), bool),
        "is_delta_light": le["is_delta_pos"],
        "is_surface": jnp.zeros((n,), bool),
        "light_idx": light_idx,
        "pdf_dir0": pdf_dir,
        "is_light": True,
    }
    o = le["o"] + nl * 1e-4  # offset off the light surface
    walk, dim = _random_walk(
        scene, o, le["d"], beta1, pdf_dir, cfg.max_depth, sampler_cfg,
        state, dim, statics, le["o"], nl,
    )
    if walk:
        light_v["pdf_rev"] = walk[0]["prev_pdf_rev"]
    return [light_v] + walk, dim


def _g_term(scene, va_p, va_perr, va_ng, va_ns, vb_p, vb_ns, qt):
    """G(va <-> vb) with visibility (bdpt.cpp:228-240).  The shadow ray
    spawns from va with its reconstruction error bounds + geometric normal
    (SurfaceInteraction::SpawnRayTo semantics) — zero bounds caused ~50%
    false self-occlusion on curved surfaces."""
    d = vb_p - va_p
    d2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
    w = d / jnp.sqrt(d2)[..., None]
    g = jnp.abs(dot(va_ns, w)) * jnp.abs(dot(vb_ns, w)) / d2
    occ = common.occluded(scene, va_p, va_perr, va_ng, vb_p, qt)
    return jnp.where(occ, 0.0, g)


def _mis_weight(scene, cam_vs, light_vs, s, t, overrides, statics):
    """MISWeight (bdpt.cpp:230-294) for static (s, t) with the pdfRev
    overrides dict {(side, index): value}."""
    if s + t == 2:
        return jnp.ones(cam_vs[0]["pdf_fwd"].shape, jnp.float32)

    def pr(side, vs, i):
        if (side, i) in overrides:
            return overrides[(side, i)]
        return vs[i]["pdf_rev"]

    def delta(vs, i):
        return vs[i]["delta"]

    n = cam_vs[0]["pdf_fwd"].shape[0]
    sum_ri = jnp.zeros((n,), jnp.float32)
    ri = jnp.ones((n,), jnp.float32)
    for i in range(t - 1, 0, -1):
        ri = ri * _remap0(pr("c", cam_vs, i)) / _remap0(cam_vs[i]["pdf_fwd"])
        nd = ~delta(cam_vs, i) & ~delta(cam_vs, i - 1)
        sum_ri = sum_ri + jnp.where(nd, ri, 0.0)
    ri = jnp.ones((n,), jnp.float32)
    for i in range(s - 1, -1, -1):
        ri = ri * _remap0(pr("l", light_vs, i)) / _remap0(light_vs[i]["pdf_fwd"])
        if i > 0:
            dl = delta(light_vs, i - 1)
        else:
            dl = light_vs[0].get(
                "is_delta_light",
                light_vs[0]["delta"],
            )
        sum_ri = sum_ri + jnp.where(~delta(light_vs, i) & ~dl, ri, 0.0)
    return 1.0 / (1.0 + sum_ri)


def li_bdpt(scene, camera, pixels, sampler_cfg, state, cfg: BDPTConfig,
            statics: SceneStatics):
    """All-(s,t) BDPT estimate for one sample batch.

    Returns (L [N,3] for t>=2 strategies, splat list [(p_raster, value)]
    for t==1 strategies, p_film [N,2])."""
    qt = statics.quadric_types
    cam_vs, dim_c, p_film = generate_camera_subpath(
        scene, camera, pixels, sampler_cfg, state, cfg, statics
    )
    light_vs, _ = generate_light_subpath(
        scene, pixels.shape[0], sampler_cfg, state, cfg, statics, dim_c
    )
    # Extra dims for s==1 light sampling and strategy-local draws.
    n = pixels.shape[0]
    L = jnp.zeros((n, 3), jnp.float32)
    splats = []
    t_max = cfg.max_depth + 2
    s_max = cfg.max_depth + 1

    for t in range(1, t_max + 1):
        for s in range(0, s_max + 1):
            depth = t + s - 2
            if depth < 0 or depth > cfg.max_depth:
                continue
            if t == 1 and s == 1:
                continue  # direct light-to-lens: skipped like pbrt
            contrib, weight, raster = _connect(
                scene, camera, cam_vs, light_vs, s, t, sampler_cfg, state,
                cfg, statics, qt,
            )
            if contrib is None:
                continue
            wc = contrib * weight[..., None]
            if t == 1:
                splats.append((raster, wc))
            else:
                L = L + wc
    return L, splats, p_film


def _connect(scene, camera, cam_vs, light_vs, s, t, sampler_cfg, state, cfg,
             statics, qt):
    """ConnectBDPT (bdpt.cpp:300+) for one static strategy."""
    from ..cameras.cameras import camera_sample_wi

    n = cam_vs[0]["pdf_fwd"].shape[0]
    zero = jnp.zeros((n, 3), jnp.float32)

    if s == 0:
        # Camera path alone; cam_vs[t-1] must lie on a light.
        if t < 2:
            return None, None, None
        pt = cam_vs[t - 1]
        is_l = pt["exists"] & (pt["light_idx"] >= 0)
        le = lt.area_light_emission(
            scene, pt["light_idx"], pt["ng"], pt["wo"]
        )
        contrib = jnp.where(is_l[..., None], pt["beta"] * le, zero)
        # Overrides: pt.pdfRev = PdfLightOrigin; ptMinus.pdfRev = PdfLight.
        ptm = cam_vs[t - 2]
        pmf = _light_pick_pmf(scene, pt["light_idx"])
        w_dir = normalize(ptm["p"] - pt["p"])
        pdf_pos, pdf_dir = lt.pdf_le(
            scene, pt["light_idx"], pt["p"], pt["ng"], w_dir,
            statics.light_types,
        )
        over = {
            ("c", t - 1): pmf * pdf_pos,
            ("c", t - 2): _convert_density(
                pdf_dir, pt["p"], ptm["p"], ptm["ng"], ptm["is_surface"]
            ),
        }
        w = _mis_weight(scene, cam_vs, light_vs, s, t, over, statics)
        w = jnp.where(jnp.any(contrib != 0.0, -1), w, 0.0)
        return contrib, w, None

    if t == 1:
        # Connect light vertex s-1 to the camera lens; splat.
        qs = light_vs[s - 1]
        if s < 2:
            return None, None, None  # s==1,t==1 skipped above
        cs = camera_sample_wi(camera, qs["p"])
        f_q = _vertex_f(qs, cs["p_cam"], statics)
        occ = common.occluded(
            scene, qs["p"], qs["p_error"], qs["ng"], cs["p_cam"], qt
        )
        ok = qs["exists"] & cs["valid"] & (cs["pdf"] > 0.0) & ~occ
        contrib = jnp.where(
            ok[..., None],
            qs["beta"] * f_q * cs["we"]
            * (absdot(cs["wi"], qs["ns"]) / jnp.maximum(cs["pdf"], 1e-20))[..., None],
            zero,
        )
        # Overrides: pt(=camera sampled vertex) not in arrays; the camera
        # vertex's pdf toward qs:
        qsm = light_vs[s - 2]
        from ..cameras.cameras import camera_pdf_we

        _, pdf_dir_c = camera_pdf_we(camera, cs["p_cam"], -cs["wi"])
        over = {
            ("l", s - 1): _convert_density(
                pdf_dir_c, cs["p_cam"], qs["p"], qs["ng"], qs["is_surface"]
            ),
            ("l", s - 2): _vertex_pdf(
                qs, cs["p_cam"], qsm["p"], qsm["ng"], qsm["is_surface"],
                statics,
            ),
        }
        # Camera-side: only the (virtual) camera vertex -> no camera-side
        # terms in the MIS walk (t=1: loop range empty).
        w = _mis_weight(scene, cam_vs, light_vs, s, t, over, statics)
        w = jnp.where(jnp.any(contrib != 0.0, -1), w, 0.0)
        return contrib, w, cs["p_raster"]

    pt = cam_vs[t - 1]
    ptm = cam_vs[t - 2] if t >= 2 else None

    if s == 1:
        # Sample a light from pt (bdpt.cpp:338-360): new sampled vertex.
        u_sel = sa.get_1d(sampler_cfg, state, 200 + 3 * t)
        u_l = sa.get_2d(sampler_cfg, state, 201 + 3 * t)
        light_idx, pmf, _ = smp.sample_discrete_1d(scene.light_distr, u_sel)
        sl = lt.sample_li(scene, light_idx, pt["p"], u_l, statics.light_types)
        occ = common.occluded(
            scene, pt["p"], pt["p_error"], pt["ng"], sl["p_light"], qt
        )
        f_p = _vertex_f(pt, sl["p_light"], statics)
        ok = (
            pt["exists"] & (sl["pdf"] > 0.0) & (pmf > 0.0) & ~occ
        )
        contrib = jnp.where(
            ok[..., None],
            pt["beta"] * f_p * sl["li"]
            * (absdot(sl["wi"], pt["ns"]) / jnp.maximum(pmf * sl["pdf"], 1e-20))[
                ..., None
            ],
            zero,
        )
        # Sampled light vertex q: pdfFwd = PdfLightOrigin (pos pdf * pmf).
        # Build a 1-element light path substitute for MIS.
        w_to_pt = normalize(pt["p"] - sl["p_light"])
        # Light's normal at the sampled point: approximate from sample_li
        # (delta lights: direction; area: true normal not returned — use
        # direction toward ref as pbrt's cos source via pdf_le below).
        pdf_pos, pdf_dir = lt.pdf_le(
            scene, light_idx, sl["p_light"],
            jnp.where(sl["is_delta"][..., None], -sl["wi"], -sl["wi"]),
            w_to_pt, statics.light_types,
        )
        q_sampled = {
            "exists": ok,
            "p": sl["p_light"],
            "ng": -sl["wi"],
            "beta": sl["li"] / jnp.maximum(sl["pdf"] * pmf, 1e-20)[..., None],
            "pdf_fwd": pmf * pdf_pos,
            "pdf_rev": jnp.zeros((n,), jnp.float32),
            "delta": jnp.zeros((n,), bool),
            "is_surface": ~sl["is_delta"],
            "is_delta_light": sl["is_delta"],
            "light_idx": light_idx,
        }
        sub_light = [q_sampled]
        over = {
            ("l", 0): _vertex_pdf(
                pt, ptm["p"], sl["p_light"], -sl["wi"], ~sl["is_delta"],
                statics,
            ),
            ("c", t - 1): _convert_density(
                pdf_dir, sl["p_light"], pt["p"], pt["ng"], pt["is_surface"]
            ),
            ("c", t - 2): _vertex_pdf(
                pt, sl["p_light"], ptm["p"], ptm["ng"], ptm["is_surface"],
                statics,
            ),
        }
        w = _mis_weight(scene, cam_vs, sub_light, s, t, over, statics)
        w = jnp.where(jnp.any(contrib != 0.0, -1), w, 0.0)
        return contrib, w, None

    # ---- general s >= 2, t >= 2 connection ----
    qs = light_vs[s - 1]
    qsm = light_vs[s - 2]
    ok = pt["exists"] & qs["exists"]
    f_p = _vertex_f(pt, qs["p"], statics)
    f_q = _vertex_f(qs, pt["p"], statics)
    g = _g_term(
        scene, qs["p"], qs["p_error"], qs["ng"], qs["ns"], pt["p"], pt["ns"],
        qt,
    )
    contrib = jnp.where(
        ok[..., None], qs["beta"] * f_q * g[..., None] * f_p * pt["beta"], zero
    )
    over = {
        ("c", t - 1): _vertex_pdf(
            qs, qsm["p"], pt["p"], pt["ng"], pt["is_surface"], statics
        ),
        ("c", t - 2): _vertex_pdf(
            pt, qs["p"], ptm["p"], ptm["ng"], ptm["is_surface"], statics
        ),
        ("l", s - 1): _vertex_pdf(
            pt, ptm["p"], qs["p"], qs["ng"], qs["is_surface"], statics
        ),
        ("l", s - 2): _vertex_pdf(
            qs, pt["p"], qsm["p"], qsm["ng"], qsm["is_surface"], statics
        ),
    }
    w = _mis_weight(scene, cam_vs, light_vs, s, t, over, statics)
    w = jnp.where(jnp.any(contrib != 0.0, -1), w, 0.0)
    return contrib, w, None


def render_sample_batch(scene, camera, film_state, pixels, sample_num,
                        sampler_cfg, cfg: BDPTConfig, statics):
    n = pixels.shape[0]
    state = sa.init_state(
        sampler_cfg, pixels, jnp.full((n,), sample_num, jnp.uint32)
    )
    L, splats, p_film = li_bdpt(
        scene, camera, pixels, sampler_cfg, state, cfg, statics
    )
    bad = ~jnp.all(jnp.isfinite(L), -1)
    L = jnp.where(bad[..., None], 0.0, L)
    film_state = fm.add_samples(film_state, p_film, L)
    for raster, v in splats:
        good = jnp.all(jnp.isfinite(v), -1)
        film_state = fm.add_splats(
            film_state, raster, jnp.where(good[..., None], v, 0.0)
        )
    return film_state


def render(scene, camera, film_cfg, sampler_cfg, cfg: BDPTConfig = BDPTConfig(),
           filt=None):
    """BDPT render driver (film splats scaled by 1/spp at output,
    bdpt.cpp:380-392)."""
    from ..filters import make_filter

    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    from .path import make_pixel_grid

    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    statics = scene_statics(scene)
    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    step = jax.jit(
        functools.partial(
            render_sample_batch, sampler_cfg=sampler_cfg, cfg=cfg,
            statics=statics,
        )
    )
    for s in range(sampler_cfg.spp):
        film_state = step(scene, camera, film_state, pixels, jnp.uint32(s))
    return fm.to_image(
        film_state, scale=film_cfg.scale, splat_scale=1.0 / sampler_cfg.spp
    )
