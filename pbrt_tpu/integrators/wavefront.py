"""Streaming wavefront path integrator: persistent lane pool with compaction
by refill (SURVEY.md P4; the reference's analog is the dynamic tile queue +
work stealing of core/parallel.cpp:139-178).

Design (Laine-style wavefront, TPU-first):
  * A fixed pool of N lanes; each lane owns one (pixel, sample) path at a
    time.  Every iteration advances every live lane by ONE bounce; lanes
    whose path terminates scatter their radiance into the film and are
    immediately REFILLED with a fresh camera sample from a global work
    counter — so traversal launches stay ~full instead of decaying with
    path survival (li_path's lockstep loop measured <40% live after
    bounce 2).
  * The loop body is compiled ONCE and driven by lax.while_loop — compile
    time is O(1) in depth instead of O(max_depth) (li_path unrolls).
  * Per-lane sampler dimension cursors replicate pbrt's CONDITIONAL
    consumption exactly (path.cpp): the 5 NEE dims are skipped at
    specular-only vertices (path.cpp:117-131), and the RR dim is consumed
    only when rrBeta < threshold at bounces > 3 (path.cpp:176-184) — a
    per-lane schedule no static dim layout can express.

Per iteration, two traversal launches (measured in round 1: merging to one
bought only ~5%, so clarity wins):
  A. NEE shadow + BSDF-MIS rays (2N, estimate_direct's batch);
  B. extension rays for survivors + camera rays for refilled lanes (N).

Subsurface materials fall back to li_path (the probe walk relocates exit
points mid-bounce; see path.py).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, offset_ray_origin
from ..core import spectrum
from ..accel import traverse as tv
from ..lights import lights as lt
from ..materials import bsdf as bx
from ..samplers import samplers as sa
from ..statics import SceneStatics, scene_statics
from .. import film as fm
from .. import scene as sc
from ..utils import stats as st
from . import common
from .path import PathConfig, eval_scene_textures, make_pixel_grid


def _refill(state, scene, camera, sampler_cfg, statics, pixels):
    """Assign fresh (pixel, sample) work to dead lanes (film already
    scattered).  Work ids are sample-major: id = s * n_pix + pix_row, so
    consecutive lanes get consecutive pixels (coherent rays + film scatter).
    """
    n = state["alive"].shape[0]
    n_pix = pixels.shape[0]
    total = state["total"]
    dead = ~state["alive"]
    rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
    new_id = state["next_work"] + rank
    take = dead & (new_id < total)
    n_taken = jnp.sum(take.astype(jnp.int32))

    pix_row = new_id % n_pix
    snum = (new_id // n_pix).astype(jnp.uint32)
    pix = pixels[jnp.clip(pix_row, 0, n_pix - 1)]

    fresh = sa.init_state(sampler_cfg, pix, snum)
    p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, fresh, pix)
    from ..cameras import generate_ray_differentials

    o, d, _time, w, rx_o, rx_d, ry_o, ry_d = generate_ray_differentials(
        camera, p_film, p_lens, time_u, spp=sampler_cfg.spp
    )

    def merge(old, new):
        return jnp.where(
            take.reshape(take.shape + (1,) * (old.ndim - 1)), new, old
        )

    out = dict(state)
    out["sampler"] = jax.tree_util.tree_map(merge, state["sampler"], fresh)
    out["o"] = merge(state["o"], o)
    out["d"] = merge(state["d"], d)
    out["p_film"] = merge(state["p_film"], p_film)
    out["cam_w"] = merge(state["cam_w"], w)
    out["L"] = merge(state["L"], jnp.zeros((n, 3), jnp.float32))
    out["beta"] = merge(state["beta"], jnp.ones((n, 3), jnp.float32))
    out["eta_scale"] = merge(state["eta_scale"], jnp.ones((n,), jnp.float32))
    out["specular"] = merge(state["specular"], jnp.zeros((n,), bool))
    out["bounce"] = merge(state["bounce"], jnp.zeros((n,), jnp.int32))
    out["dim"] = merge(state["dim"], jnp.full((n,), 5, jnp.int32))
    out["alive"] = state["alive"] | take
    out["fresh"] = take
    out["next_work"] = state["next_work"] + n_taken
    if "rx_o" in state:
        out["rx_o"] = merge(state["rx_o"], rx_o)
        out["rx_d"] = merge(state["rx_d"], rx_d)
        out["ry_o"] = merge(state["ry_o"], ry_o)
        out["ry_d"] = merge(state["ry_d"], ry_d)
    return out


def _iteration(state, scene, camera, sampler_cfg, cfg, statics, pixels):
    """One wavefront step: shade current hits, NEE, next rays, film-scatter
    finished lanes, refill, trace."""
    quadric_types = statics.quadric_types
    light_types = statics.light_types
    mat_types = statics.mat_types
    n = state["alive"].shape[0]

    alive = state["alive"]
    o, d = state["o"], state["d"]
    L, beta = state["L"], state["beta"]
    bounce, dim = state["bounce"], state["dim"]

    counters = state["counters"]
    rec = tv.hit_record(scene, o, d, state["t"], state["prim"], quadric_types)
    found = rec["hit"] & alive
    counters = st.bump(counters, "Integrator/Path vertices", found)

    # Le at the vertex / escaped radiance (path.cpp:91-108).
    count_le = (bounce == 0) | state["specular"]
    le_surf = lt.area_light_emission(scene, rec["arealight"], rec["ng"], rec["wo"])
    L = L + jnp.where((found & count_le)[..., None], beta * le_surf, 0.0)
    le_inf = lt.escaped_radiance(scene, d, light_types)
    L = L + jnp.where((alive & ~rec["hit"] & count_le)[..., None], beta * le_inf, 0.0)

    was_live = alive
    alive = found & (bounce < cfg.max_depth)

    # ---- shading setup ----
    duv = None
    if "rx_o" in state:
        at_cam = (bounce == 0)[..., None]
        z3 = jnp.zeros_like(state["rx_o"])
        duv = tv.uv_differentials(
            rec,
            jnp.where(at_cam, state["rx_o"], z3),
            jnp.where(at_cam, state["rx_d"], z3),
            jnp.where(at_cam, state["ry_o"], z3),
            jnp.where(at_cam, state["ry_d"], z3),
        )
    tex_vals = eval_scene_textures(scene, rec, statics, duv=duv)
    mat = bx.gather_material(scene.materials, rec["material"], tex_vals, mat_types, uv=rec["uv"])
    frame = bx.frame_from_rec(rec)
    ss, ts, ns = frame
    wo_local = bx.to_local(ss, ts, ns, rec["wo"])
    has_bsdf = alive & (rec["material"] >= 0)
    nonspec = bx.count_nonspecular(mat, mat_types) & has_bsdf

    # ---- sample draws at per-lane dims (pbrt consumption order) ----
    u_select = sa.get_1d_dyn(sampler_cfg, state["sampler"], dim)
    u_light = sa.get_2d_dyn(sampler_cfg, state["sampler"], dim + 1)
    u_scatter = sa.get_2d_dyn(sampler_cfg, state["sampler"], dim + 3)
    dim_bsdf = jnp.where(nonspec, dim + 5, dim)
    u_bsdf = sa.get_2d_dyn(sampler_cfg, state["sampler"], dim_bsdf)
    dim = dim_bsdf + 2

    pick = None
    if cfg.light_strategy == "spatial" and scene.spatial_cdf is not None:
        from ..lights import lightdistrib as ldist

        pick = ldist.spatial_pick_light(
            scene.spatial_grid_res, scene.spatial_b0,
            scene.spatial_diag, scene.spatial_cdf, scene.spatial_pmf,
            rec["p"], u_select,
        )

    # ---- BSDF sample -> candidate next ray ----
    bs = bx.sample_material(mat, wo_local, u_bsdf, mat_types)
    wi_world = bx.to_world(ss, ts, ns, bs["wi"])
    o_next = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi_world)

    # ---- NEE (launch A: shadow + MIS rays) ----
    ld = common.sample_one_light(
        scene, rec, frame, mat, wo_local,
        u_select, u_light, u_scatter,
        nonspec, mat_types, light_types, quadric_types, pick=pick,
    )
    L = L + jnp.where(nonspec[..., None], beta * ld, 0.0)
    counters = st.bump(
        counters, "Intersections/Shadow ray intersection tests",
        2.0 * jnp.sum(nonspec.astype(jnp.float32)),
    )
    counters = st.bump(counters, "Lights/Light samples taken", nonspec)

    # ---- path continuation ----
    contrib = (
        bs["f"] * (absdot(wi_world, ns) / jnp.maximum(bs["pdf"], 1e-20))[..., None]
    )
    alive = alive & has_bsdf & bs["valid"]
    beta = jnp.where(alive[..., None], beta * contrib, beta)
    specular = bs["is_specular"]
    transmitted = bs["is_specular"] & (bs["wi"][..., 2] * wo_local[..., 2] < 0.0)
    et = mat["eta"]
    entering = wo_local[..., 2] > 0.0
    eta_fac = jnp.where(entering, et * et, 1.0 / jnp.maximum(et * et, 1e-12))
    eta_scale = jnp.where(transmitted, state["eta_scale"] * eta_fac, state["eta_scale"])

    # ---- Russian roulette (path.cpp:176-184): dim consumed CONDITIONALLY ----
    u_rr = sa.get_1d_dyn(sampler_cfg, state["sampler"], dim)
    rr_beta_max = spectrum.max_component(beta * eta_scale[..., None])
    do_rr = (bounce > 3) & (rr_beta_max < cfg.rr_threshold) & alive
    q = jnp.maximum(0.05, 1.0 - rr_beta_max)
    die = do_rr & (u_rr < q)
    counters = st.bump(
        counters, "Integrator/Russian-roulette terminations", die
    )
    alive = alive & ~die
    beta = jnp.where(
        (do_rr & ~die)[..., None], beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta
    )
    dim = jnp.where(do_rr, dim + 1, dim)

    # ---- film scatter for finished lanes ----
    finished = was_live & ~alive
    bad = ~jnp.all(jnp.isfinite(L), -1) | jnp.any(L < 0.0, -1)
    L_out = jnp.where(bad[..., None], 0.0, L)
    film = fm.add_samples(
        state["film"], state["p_film"], L_out, state["cam_w"], mask=finished
    )
    counters = st.bump(counters, "Film/Samples added", finished)

    new_state = dict(
        state,
        film=film,
        alive=alive,
        L=L,
        beta=beta,
        eta_scale=eta_scale,
        specular=specular,
        bounce=bounce + 1,
        dim=dim,
        o=jnp.where(alive[..., None], o_next, o),
        d=jnp.where(alive[..., None], wi_world, d),
        counters=counters,
    )

    # ---- refill + launch B (extension + fresh camera rays) ----
    new_state = _refill(new_state, scene, camera, sampler_cfg, statics, pixels)
    trace = new_state["alive"]
    t, prim = tv.intersect_closest(
        scene,
        new_state["o"],
        new_state["d"],
        jnp.where(trace, 1e30, -1.0),
        quadric_types,
    )
    new_state["t"] = t
    new_state["prim"] = jnp.where(trace, prim, -1)
    c = new_state["counters"]
    c = st.bump(c, "Intersections/Regular ray intersection tests", trace)
    c = st.bump(c, "Integrator/Camera rays traced", new_state["fresh"])
    new_state["counters"] = c
    del new_state["fresh"]
    return new_state


def _initial_state(scene, camera, film_state, sampler_cfg, statics, pixels, total, n_lanes, start=0):
    n = n_lanes
    z3 = jnp.zeros((n, 3), jnp.float32)
    dummy_pix = jnp.zeros((n, 2), jnp.int32)
    state = {
        "film": film_state,
        "alive": jnp.zeros((n,), bool),
        "o": z3,
        "d": jnp.concatenate([jnp.zeros((n, 2), jnp.float32), jnp.ones((n, 1), jnp.float32)], -1),
        "t": jnp.zeros((n,), jnp.float32),
        "prim": jnp.full((n,), -1, jnp.int32),
        "L": z3,
        "beta": jnp.ones((n, 3), jnp.float32),
        "eta_scale": jnp.ones((n,), jnp.float32),
        "specular": jnp.zeros((n,), bool),
        "bounce": jnp.zeros((n,), jnp.int32),
        "dim": jnp.full((n,), 5, jnp.int32),
        "p_film": jnp.zeros((n, 2), jnp.float32),
        "cam_w": jnp.zeros((n,), jnp.float32),
        "sampler": sa.init_state(sampler_cfg, dummy_pix, jnp.zeros((n,), jnp.uint32)),
        "next_work": jnp.zeros((), jnp.int32) + jnp.asarray(start, jnp.int32),
        "total": jnp.asarray(total, jnp.int32),
        "counters": st.zeros(),
    }
    if statics.has_textures:
        state.update(rx_o=z3, rx_d=z3, ry_o=z3, ry_d=z3)
    # Initial fill + first closest-hit.
    state = _refill(state, scene, camera, sampler_cfg, statics, pixels)
    trace = state["alive"]
    t, prim = tv.intersect_closest(
        scene, state["o"], state["d"], jnp.where(trace, 1e30, -1.0),
        statics.quadric_types,
    )
    state["t"] = t
    state["prim"] = jnp.where(trace, prim, -1)
    c = state["counters"]
    c = st.bump(c, "Intersections/Regular ray intersection tests", trace)
    c = st.bump(c, "Integrator/Camera rays traced", state["fresh"])
    state["counters"] = c
    del state["fresh"]
    return state


@functools.lru_cache(maxsize=None)
def _superstep_fn(sampler_cfg, cfg, statics):
    """Module-level jitted k-iteration superstep, memoized on static configs
    (same recompile-per-render fix as path._step_fn; `pixels` is a traced
    argument, not a closure capture, so renders of equal shape share one
    compiled executable)."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def superstep(scene, camera, state, pixels, k):
        def body(_, s):
            return _iteration(s, scene, camera, sampler_cfg, cfg, statics,
                              pixels)
        return jax.lax.fori_loop(0, k, body, state)

    return superstep


@functools.lru_cache(maxsize=None)
def _init_fn(sampler_cfg, statics, n_lanes):
    @jax.jit
    def init(scene, camera, film_state, pixels, total, start):
        return _initial_state(
            scene, camera, film_state, sampler_cfg, statics, pixels,
            total=total, n_lanes=n_lanes, start=start,
        )

    return init


def render(
    scene: sc.SceneArrays,
    camera,
    film_cfg: fm.FilmConfig,
    sampler_cfg: sa.SamplerConfig,
    cfg: PathConfig = PathConfig(),
    filt=None,
    n_lanes: int = 1 << 17,
    iters_per_step: int = 8,
    count_rays: bool = False,
    stats_out: bool = False,
    progress=None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
):
    """Full wavefront render.  Returns the image (plus stats when count_rays
    or stats_out).

    checkpoint_path/_every: the loop state dict (film + lane pool + work
    counter) IS the complete render state, so a checkpoint is one pytree
    snapshot every `checkpoint_every` supersteps; resume reloads it and
    continues the host loop (utils/checkpoint.py save_state/load_state).
    progress: optional ProgressReporter; work units are (pixel, sample)
    paths retired (next_work minus in-flight lanes)."""
    from ..filters import make_filter
    from ..utils import checkpoint as ckpt

    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    statics = scene_statics(scene)
    if sc.MAT_SUBSURFACE in statics.mat_types:
        from . import path as pt

        return pt.render(scene, camera, film_cfg, sampler_cfg, cfg, filt,
                         count_rays=count_rays, stats_out=stats_out,
                         progress=progress)
    if cfg.light_strategy == "spatial":
        from ..lights.lightdistrib import ensure_spatial_light_distribution

        scene = ensure_spatial_light_distribution(scene, statics.light_types)
    from ..utils.devcache import device_put_cached

    scene = device_put_cached(scene)
    camera = device_put_cached(camera)

    n_pix = int(pixels.shape[0])
    total = n_pix * sampler_cfg.spp
    n_lanes = min(n_lanes, max(total, 1024))

    superstep = _superstep_fn(sampler_cfg, cfg, statics)
    init = _init_fn(sampler_cfg, statics, n_lanes)
    state = init(scene, camera, film_state, pixels,
                 jnp.asarray(total, jnp.int32), jnp.asarray(0, jnp.int32))
    if checkpoint_path:
        state = ckpt.maybe_resume_state(checkpoint_path, state)
    steps = 0
    while True:
        state = superstep(scene, camera, state, pixels, k=iters_per_step)
        steps += 1
        nw = int(state["next_work"])
        alive_n = int(jnp.sum(state["alive"]))
        if progress is not None:
            progress.update(max(nw - alive_n, 0))
        if checkpoint_path and checkpoint_every and steps % checkpoint_every == 0:
            ckpt.save_state(checkpoint_path, state)
        if nw >= total and alive_n == 0:
            break
    img = fm.to_image(state["film"], scale=film_cfg.scale)
    if stats_out:
        return img, state["counters"]
    if count_rays:
        return img, float(st.ray_total(state["counters"]))
    return img


# ---------------------------------------------------------------------------
# Multi-device render (SURVEY.md P1/P3): the SAME wavefront, shard_map'd over
# a ("rays",) mesh.  Each shard owns a disjoint work range [base, lim) and a
# private lane pool + film partial; no cross-shard communication happens
# inside the loop (paths are embarrassingly parallel), and the film partials
# are summed once at the end (the psum analog of pbrt's MergeFilmTile,
# film.cpp:117).  Work ids are identical to the single-device render, so the
# result is shard-count-invariant (P8) modulo film float-add order.
# ---------------------------------------------------------------------------

def render_sharded(
    scene: sc.SceneArrays,
    camera,
    film_cfg: fm.FilmConfig,
    sampler_cfg: sa.SamplerConfig,
    cfg: PathConfig = PathConfig(),
    filt=None,
    mesh=None,
    axis: str = "rays",
    n_lanes_per_shard: int = 1 << 15,
    iters_per_step: int = 8,
    count_rays: bool = False,
):
    import math

    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from ..filters import make_filter

    assert mesh is not None
    D = int(math.prod(mesh.devices.shape))
    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    statics = scene_statics(scene)
    if cfg.light_strategy == "spatial":
        from ..lights.lightdistrib import ensure_spatial_light_distribution

        scene = ensure_spatial_light_distribution(scene, statics.light_types)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)

    n_pix = int(pixels.shape[0])
    total = n_pix * sampler_cfg.spp
    base = jnp.asarray([i * total // D for i in range(D)], jnp.int32)
    lim = jnp.asarray([(i + 1) * total // D for i in range(D)], jnp.int32)

    # Multi-host (P7, parallel/multihost.py): every process runs this same
    # function over the GLOBAL mesh; arrays must be placed with explicit
    # global shardings (local eager arrays are not addressable across
    # processes), and reductions over sharded state must happen inside jit
    # with replicated outputs.
    multi = jax.process_count() > 1
    from jax.sharding import NamedSharding

    axis_spec = P(axis) if isinstance(axis, str) else P(tuple(axis))
    if multi:
        repl = NamedSharding(mesh, P())
        shard1 = NamedSharding(mesh, axis_spec)
        scene = jax.device_put(scene, repl)
        camera = jax.device_put(camera, repl)
        film_state = jax.device_put(film_state, repl)
        pixels = jax.device_put(pixels, repl)
        base = jax.device_put(np.asarray(base), shard1)
        lim = jax.device_put(np.asarray(lim), shard1)

    def _wrap(st):
        """Per-shard scalars/film get a leading length-1 axis for shard_map."""
        out = dict(st)
        out["film"] = jax.tree_util.tree_map(lambda x: x[None], st["film"])
        for k in ("next_work", "total", "counters"):
            out[k] = st[k][None]
        return out

    def _unwrap(st):
        out = dict(st)
        out["film"] = jax.tree_util.tree_map(lambda x: x[0], st["film"])
        for k in ("next_work", "total", "counters"):
            out[k] = st[k][0]
        return out

    def _state_specs(st):
        return jax.tree_util.tree_map(lambda _: P(axis), st)

    def local_init(base_s, lim_s):
        st = _initial_state(
            scene, camera, film_state, sampler_cfg, statics, pixels,
            total=lim_s[0], n_lanes=n_lanes_per_shard, start=base_s[0],
        )
        return _wrap(st)

    init_sharded = shard_map(
        local_init, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=None,  # filled below after tracing structure
        check_rep=False,
    )
    # shard_map needs concrete out_specs: build them from a host-side
    # structural template (cheap: tiny arrays only).
    template = jax.eval_shape(lambda b, l: local_init(b, l), base[:1], lim[:1])
    out_specs = jax.tree_util.tree_map(lambda _: P(axis), template)
    init_sharded = shard_map(
        local_init, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=out_specs, check_rep=False,
    )

    it = functools.partial(
        _iteration, scene=scene, camera=camera,
        sampler_cfg=sampler_cfg, cfg=cfg, statics=statics, pixels=pixels,
    )

    def local_superstep(st):
        st = _unwrap(st)
        for _ in range(1):
            st = jax.lax.fori_loop(0, iters_per_step, lambda _, s: it(s), st)
        return _wrap(st)

    superstep = jax.jit(
        shard_map(
            local_superstep, mesh=mesh,
            in_specs=(out_specs,), out_specs=out_specs, check_rep=False,
        )
    )

    # Done-check + final merge as jitted REPLICATED reductions so they work
    # identically on a single process and across a multi-host cluster (the
    # cross-shard sums become XLA collectives over ICI/DCN).
    repl_out = NamedSharding(mesh, P())
    done_fn = jax.jit(
        lambda s_, lm: jnp.all(s_["next_work"] >= lm)
        & ~jnp.any(s_["alive"]),
        out_shardings=repl_out,
    )

    def _merge(s_):
        film = fm.FilmState(
            weighted_sum=jnp.sum(s_["film"].weighted_sum, axis=0),
            weight_sum=jnp.sum(s_["film"].weight_sum, axis=0),
            splat=jnp.sum(s_["film"].splat, axis=0),
            x0=film_state.x0, y0=film_state.y0,
            filter_table=film_state.filter_table,
            inv_radius=film_state.inv_radius,
            footprint=film_state.footprint,
            max_sample_luminance=film_state.max_sample_luminance,
        )
        img = fm.to_image(film, scale=film_cfg.scale)
        return img, st.ray_total(jnp.sum(s_["counters"], axis=0))

    merge_fn = jax.jit(_merge, out_shardings=(repl_out, repl_out))

    state = jax.jit(init_sharded)(base, lim)
    while True:
        state = superstep(state)
        if bool(np.asarray(done_fn(state, lim))):
            break
    img, n_rays = merge_fn(state)
    img = np.asarray(img)
    if count_rays:
        return img, float(n_rays)
    return img
