"""Stochastic progressive photon mapping.

TPU re-expression of integrators/sppm.cpp: the reference's lock-free hashed
linked-list photon grid (sppm.cpp:63-110, atomic CAS pushes) becomes a
sort-by-cell + binary-search layout (SURVEY.md §3.3 "photon map as
sort-by-cell + segment reduction instead of atomics"):

  per iteration (one jit):
    1. camera pass — wavefront wal to the first diffuse hit: store visible
       points (p, wo, beta, material) per pixel + NEE direct light Ld
       (sppm.cpp:135-239);
    2. photon pass — Sample_Le light rays, maxDepth-bounce walk; each
       surface hit is hashed into a STATIC uniform grid (cell size fixed by
       the initial radius; radii only shrink, so 27-neighborhood search
       stays conservative-correct), photon hits sorted by cell id;
    3. gather — each visible point scans the 27 neighbor cells' sorted
       segments (fori_loop over the dynamic max segment length),
       accumulating Phi for photons within its CURRENT radius;
    4. SPPM radius/flux update (sppm.cpp:417-443): n' = n + alpha*m,
       r' = r*sqrt(n'/(n+m)), tau' = (tau + beta*Phi) * r'^2/r^2.

Final image: Ld/iterations + tau / (N_photons_total * pi * r^2)
(sppm.cpp:445-466).  Photon RNG: counter-hash streams per (iteration,
photon) — deterministic, but not pbrt's cross-iteration Halton sequence
(documented deviation).
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
from ..samplers.samplers import SamplerConfig
from ..samplers import samplers as sa
from ..statics import scene_statics
from .. import film as fm
from . import common

HASH_BITS = 18
N_CELLS = 1 << HASH_BITS


@dataclasses.dataclass(frozen=True)
class SPPMConfig:
    max_depth: int = 5
    n_iterations: int = 16
    photons_per_iteration: int = -1  # -1: = pixel count (sppm.cpp default)
    initial_radius: float = 1.0
    alpha: float = 0.6666667  # 2/3 (sppm.cpp:420)


def _hash_cell(ix, iy, iz):
    """(sppm.cpp:77-82 hash): spatial hash into N_CELLS buckets."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(73856093)
        ^ iy.astype(jnp.uint32) * jnp.uint32(19349663)
        ^ iz.astype(jnp.uint32) * jnp.uint32(83492791)
    )
    return (h & jnp.uint32(N_CELLS - 1)).astype(jnp.int32)


def _cell_of(p, inv_cell):
    q = jnp.floor(p * inv_cell).astype(jnp.int32)
    return q


def _camera_pass(scene, camera, pixels, s_cfg, sample_num, cfg, statics):
    """Trace to the first diffuse vertex; NEE direct light along the way
    (sppm.cpp:135-239).  Returns (vp dict, Ld [N,3])."""
    qt = statics.quadric_types
    n = pixels.shape[0]
    state = sa.init_state(s_cfg, pixels, jnp.full((n,), sample_num, jnp.uint32))
    p_film, tu, pl = sa.get_camera_sample(s_cfg, state, pixels)
    from ..cameras import generate_rays

    o, d, _, _ = generate_rays(camera, p_film, pl, tu)
    beta = jnp.ones((n, 3), jnp.float32)
    Ld = jnp.zeros((n, 3), jnp.float32)
    vp = {
        "exists": jnp.zeros((n,), bool),
        "p": jnp.zeros((n, 3), jnp.float32),
        "wo": jnp.zeros((n, 3), jnp.float32),
        "beta": jnp.zeros((n, 3), jnp.float32),
        "ns": jnp.zeros((n, 3), jnp.float32),
        "dpdu": jnp.zeros((n, 3), jnp.float32),
        "ss": jnp.zeros((n, 3), jnp.float32),
        "mat_id": jnp.full((n,), -1, jnp.int32),
        "uv": jnp.zeros((n, 2), jnp.float32),
    }
    alive = jnp.ones((n,), bool)
    specular = jnp.ones((n,), bool)
    dim = 5
    for bounce in range(cfg.max_depth):
        t, prim = tv.intersect_closest(scene, o, d, 1e30, qt)
        rec = tv.hit_record(scene, o, d, t, prim, qt)
        found = rec["hit"] & alive & (rec["material"] >= 0)
        # Emitted radiance on specular/first hits.
        le = lt.area_light_emission(scene, rec["arealight"], rec["ng"], rec["wo"])
        Ld = Ld + jnp.where((found & specular)[..., None], beta * le, 0.0)

        mat = bx.gather_material(
            scene.materials, rec["material"], None, statics.mat_types,
            uv=rec["uv"],
        )
        frame = bx.frame_from_rec(rec)
        ss, ts_, ns = frame
        wo_l = bx.to_local(ss, ts_, ns, rec["wo"])

        # NEE at every vertex (sppm.cpp:175-183).
        u_sel = sa.get_1d(s_cfg, state, dim)
        u_li = sa.get_2d(s_cfg, state, dim + 1)
        u_sc = sa.get_2d(s_cfg, state, dim + 3)
        dim += 5
        ld = common.sample_one_light(
            scene, rec, frame, mat, wo_l, u_sel, u_li, u_sc, found,
            statics.mat_types, statics.light_types, qt,
        )
        Ld = Ld + jnp.where(found[..., None], beta * ld, 0.0)

        # Diffuse hit -> this is the visible point; specular -> continue.
        mt = mat["type"]
        from ..scene import MAT_GLASS, MAT_MIRROR

        is_spec_mat = (mt == MAT_MIRROR) | (
            (mt == MAT_GLASS) & ~mat["is_rough"]
        )
        make_vp = found & ~is_spec_mat & ~vp["exists"]
        for k in ("p", "wo", "ns", "dpdu", "ss"):
            src = {"p": rec["p"], "wo": rec["wo"], "ns": rec["ns"],
                   "dpdu": rec["dpdu"], "ss": rec["ss"]}[k]
            vp[k] = jnp.where(make_vp[..., None], src, vp[k])
        vp["uv"] = jnp.where(make_vp[..., None], rec["uv"], vp["uv"])
        vp["beta"] = jnp.where(make_vp[..., None], beta, vp["beta"])
        vp["mat_id"] = jnp.where(make_vp, rec["material"], vp["mat_id"])
        vp["exists"] = vp["exists"] | make_vp

        # Specular continuation.
        u_b = sa.get_2d(s_cfg, state, dim)
        dim += 2
        bs = bx.sample_material(mat, wo_l, u_b, statics.mat_types)
        wi_w = bx.to_world(ss, ts_, ns, bs["wi"])
        cont = found & is_spec_mat & bs["valid"]
        beta = jnp.where(
            cont[..., None],
            beta * bs["f"] * (absdot(wi_w, ns) / jnp.maximum(bs["pdf"], 1e-20))[..., None],
            beta,
        )
        specular = cont
        alive = cont
        o = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi_w)
        d = wi_w
    return vp, Ld


def _photon_pass(scene, n_photons, it, cfg, statics, key):
    """Light walk recording photon hits (sppm.cpp:303-415).

    Returns dict of flat photon-hit arrays [n_photons * max_depth]."""
    qt = statics.quadric_types
    k = jax.random.fold_in(key, it)
    u = jax.random.uniform(k, (n_photons, 5 + 2 * cfg.max_depth))
    light_idx, pmf, _ = smp.sample_discrete_1d(scene.light_distr, u[:, 0])
    le = lt.sample_le(
        scene, light_idx, u[:, 1:3], u[:, 3:5], statics.light_types
    )
    denom = jnp.maximum(pmf * le["pdf_pos"] * le["pdf_dir"], 1e-20)
    beta = le["le"] * (jnp.abs(dot(le["n_light"], le["d"])) / denom)[..., None]
    o = le["o"] + le["n_light"] * 1e-4
    d = le["d"]
    alive = jnp.any(beta > 0.0, -1)

    hits_p, hits_wo, hits_beta = [], [], []
    for b in range(cfg.max_depth):
        t, prim = tv.intersect_closest(scene, o, d, 1e30, qt)
        rec = tv.hit_record(scene, o, d, t, prim, qt)
        found = rec["hit"] & alive & (rec["material"] >= 0)
        # Photons deposit only AFTER the first bounce (direct light is
        # handled by NEE in the camera pass, sppm.cpp:352-358).
        if b > 0:
            hits_p.append(jnp.where(found[..., None], rec["p"], 1e18))
            hits_wo.append(rec["wo"])
            hits_beta.append(jnp.where(found[..., None], beta, 0.0))
        mat = bx.gather_material(
            scene.materials, rec["material"], None, statics.mat_types,
            uv=rec["uv"],
        )
        frame = bx.frame_from_rec(rec)
        ss, ts_, ns = frame
        wo_l = bx.to_local(ss, ts_, ns, rec["wo"])
        ub = u[:, 5 + 2 * b : 7 + 2 * b]
        bs = bx.sample_material(mat, wo_l, ub, statics.mat_types)
        wi_w = bx.to_world(ss, ts_, ns, bs["wi"])
        bnew = beta * bs["f"] * (
            absdot(wi_w, ns) / jnp.maximum(bs["pdf"], 1e-20)
        )[..., None]
        # RR on photon weight (sppm.cpp:389-397).
        q = jnp.maximum(
            0.0, 1.0 - jnp.max(bnew, -1) / jnp.maximum(jnp.max(beta, -1), 1e-12)
        )
        u_rr = jax.random.uniform(jax.random.fold_in(k, 1000 + b), (n_photons,))
        die = u_rr < q
        beta = jnp.where(die[..., None], 0.0, bnew / jnp.maximum(1.0 - q, 1e-6)[..., None])
        alive = found & bs["valid"] & ~die
        o = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi_w)
        d = wi_w
    if not hits_p:
        z = jnp.zeros((1, 3), jnp.float32)
        return {"p": z + 1e18, "wo": z, "beta": z * 0.0}
    return {
        "p": jnp.concatenate(hits_p),
        "wo": jnp.concatenate(hits_wo),
        "beta": jnp.concatenate(hits_beta),
    }


def _gather(scene, vp, radius, photons, inv_cell, statics):
    """Per-VP 27-cell gather over cell-sorted photon hits.  Returns
    (Phi [N,3], M [N])."""
    ph_p = photons["p"]
    cell = _cell_of(ph_p, inv_cell)
    cell_id = _hash_cell(cell[:, 0], cell[:, 1], cell[:, 2])
    order = jnp.argsort(cell_id)
    cid_s = cell_id[order]
    p_s = ph_p[order]
    wo_s = photons["wo"][order]
    b_s = photons["beta"][order]
    np_tot = ph_p.shape[0]

    n = vp["p"].shape[0]
    Phi = jnp.zeros((n, 3), jnp.float32)
    M = jnp.zeros((n,), jnp.float32)
    mat = bx.gather_material(
        scene.materials, vp["mat_id"], None, statics.mat_types, uv=vp["uv"]
    )
    frame = bx.frame_from_rec(vp)
    ss, ts_, ns = frame
    wo_l = bx.to_local(ss, ts_, ns, vp["wo"])
    vcell = _cell_of(vp["p"], inv_cell)
    r2 = radius * radius

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                cid = _hash_cell(
                    vcell[:, 0] + dx, vcell[:, 1] + dy, vcell[:, 2] + dz
                )
                start = jnp.searchsorted(cid_s, cid, side="left")
                end = jnp.searchsorted(cid_s, cid, side="right")
                max_len = jnp.max(end - start)

                def body(j, acc):
                    Phi, M = acc
                    idx = jnp.clip(start + j, 0, np_tot - 1)
                    valid = (start + j) < end
                    pp = p_s[idx]
                    dd = vp["p"] - pp
                    d2 = jnp.sum(dd * dd, -1)
                    near = valid & (d2 <= r2) & vp["exists"]
                    wi_l = bx.to_local(ss, ts_, ns, wo_s[idx])
                    f, _ = bx.eval_material(mat, wo_l, wi_l, statics.mat_types)
                    contrib = f * b_s[idx]
                    Phi = Phi + jnp.where(near[..., None], contrib, 0.0)
                    M = M + near.astype(jnp.float32)
                    return (Phi, M)

                Phi, M = jax.lax.fori_loop(0, max_len, body, (Phi, M))
    return Phi, M


def render(scene, camera, film_cfg, cfg: SPPMConfig = SPPMConfig(), filt=None,
           seed: int = 0):
    """SPPMIntegrator::Render (sppm.cpp:111-466)."""
    res = film_cfg.full_resolution
    xr, yr = res
    statics = scene_statics(scene)
    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    from .path import make_pixel_grid

    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    n = pixels.shape[0]
    n_photons = cfg.photons_per_iteration
    if n_photons <= 0:
        n_photons = n
    s_cfg = SamplerConfig("halton", max(cfg.n_iterations, 1), res)
    key = jax.random.PRNGKey(seed)
    inv_cell = 1.0 / (2.0 * cfg.initial_radius)

    radius = jnp.full((n,), cfg.initial_radius, jnp.float32)
    n_vp = jnp.zeros((n,), jnp.float32)  # accumulated photon count N
    tau = jnp.zeros((n, 3), jnp.float32)
    Ld_sum = jnp.zeros((n, 3), jnp.float32)

    @jax.jit
    def iteration(scene, camera, it, radius, n_vp, tau, Ld_sum):
        vp, Ld = _camera_pass(scene, camera, pixels, s_cfg, it, cfg, statics)
        photons = _photon_pass(scene, n_photons, it, cfg, statics, key)
        Phi, M = _gather(scene, vp, radius, photons, inv_cell, statics)
        # SPPM update (sppm.cpp:417-443).
        has = M > 0
        n_new = n_vp + cfg.alpha * M
        r_new = jnp.where(
            has, radius * jnp.sqrt(n_new / jnp.maximum(n_vp + M, 1e-6)), radius
        )
        tau_new = jnp.where(
            has[..., None],
            (tau + vp["beta"] * Phi) * (r_new * r_new / jnp.maximum(radius * radius, 1e-12))[..., None],
            tau,
        )
        return radius * 0 + r_new, jnp.where(has, n_new, n_vp), tau_new, Ld_sum + Ld

    for it in range(cfg.n_iterations):
        radius, n_vp, tau, Ld_sum = iteration(
            scene, camera, jnp.uint32(it), radius, n_vp, tau, Ld_sum
        )

    np_total = cfg.n_iterations * n_photons
    L = Ld_sum / cfg.n_iterations + tau / (
        np_total * jnp.pi * jnp.maximum(radius * radius, 1e-12)
    )[..., None]
    img = np.zeros((yr, xr, 3), np.float32)
    px = np.asarray(pixels)
    img[px[:, 1], px[:, 0]] = np.asarray(L)
    return img
