"""Whitted integrator (integrators/whitted.cpp:44): classic ray tracing —
direct lighting from every light (no MIS) + specular reflection/transmission
recursion, as a wavefront loop.  The per-light loop is a static unroll over
the scene's light count."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, dot, offset_ray_origin
from ..accel import traverse as tv
from ..lights import lights as lt
from ..materials import bsdf as bx
from ..samplers import samplers as sa
from ..statics import scene_statics
from .. import film as fm
from . import common
from .path import eval_scene_textures, make_pixel_grid
from .direct import DirectLightingConfig


def li_whitted(scene, o, d, sampler_cfg, sampler_state, cfg, statics, start_dim=5):
    n = o.shape[0]
    n_lights = scene.lights.light_type.shape[0]
    L = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    dim = start_dim

    for depth in range(cfg.max_depth + 1):
        t, prim = tv.intersect_closest(scene, o, d, 1e30, statics.quadric_types)
        rec = tv.hit_record(scene, o, d, t, prim, statics.quadric_types)
        found = rec["hit"] & alive

        le_surf = lt.area_light_emission(scene, rec["arealight"], rec["ng"], rec["wo"])
        L = L + jnp.where(found[..., None], beta * le_surf, 0.0)
        le_inf = lt.escaped_radiance(scene, d, statics.light_types)
        L = L + jnp.where((alive & ~rec["hit"])[..., None], beta * le_inf, 0.0)
        alive = found
        if depth >= cfg.max_depth:
            break

        tex_vals = eval_scene_textures(scene, rec, statics)
        mat = bx.gather_material(scene.materials, rec["material"], tex_vals, statics.mat_types, uv=rec["uv"])
        ss, ts, ns = bx.frame_from_rec(rec)
        wo_local = bx.to_local(ss, ts, ns, rec["wo"])
        has_bsdf = alive & (rec["material"] >= 0)

        # Direct from EVERY light (whitted.cpp:77-92) — one 2D sample each.
        for li_i in range(n_lights):
            u_l = sa.get_2d(sampler_cfg, sampler_state, dim)
            dim += 2
            lidx = jnp.full((n,), li_i, jnp.int32)
            s = lt.sample_li(scene, lidx, rec["p"], u_l, statics.light_types)
            wi_local = bx.to_local(ss, ts, ns, s["wi"])
            f, _ = bx.eval_material(mat, wo_local, wi_local, statics.mat_types)
            f = f * absdot(s["wi"], ns)[..., None]
            usable = has_bsdf & (s["pdf"] > 0.0) & jnp.any(f != 0.0, -1)
            occ = common.occluded(
                scene, rec["p"], rec["p_error"], rec["ng"], s["p_light"],
                statics.quadric_types,
            )
            L = L + jnp.where(
                (usable & ~occ)[..., None],
                beta * f * s["li"] / jnp.maximum(s["pdf"], 1e-20)[..., None],
                0.0,
            )

        # Specular continuation.
        u_b = sa.get_2d(sampler_cfg, sampler_state, dim)
        dim += 2
        bs = bx.sample_material(mat, wo_local, u_b, statics.mat_types)
        cont = has_bsdf & bs["is_specular"] & bs["valid"]
        wi_world = bx.to_world(ss, ts, ns, bs["wi"])
        beta = jnp.where(
            cont[..., None],
            beta * bs["f"] * (absdot(wi_world, ns) / jnp.maximum(bs["pdf"], 1e-20))[..., None],
            beta,
        )
        alive = cont
        o = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi_world)
        d = wi_world

    return L


def render(scene, camera, film_cfg, sampler_cfg, cfg=DirectLightingConfig(), filt=None):
    from ..filters import make_filter
    from ..cameras import generate_rays

    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    statics = scene_statics(scene)
    import jax as _jax
    scene = _jax.device_put(scene)  # one-time upload (see path.render)
    camera = _jax.device_put(camera)

    def batch(scene, camera, film_state, pixels, s):
        n = pixels.shape[0]
        state = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
        o, d, time, weight = generate_rays(camera, p_film, p_lens, time_u)
        L = li_whitted(scene, o, d, sampler_cfg, state, cfg, statics)
        bad = ~jnp.all(jnp.isfinite(L), -1) | jnp.any(L < 0.0, -1)
        L = jnp.where(bad[..., None], 0.0, L)
        return fm.add_samples(film_state, p_film, L, weight)

    step = jax.jit(batch)
    for s in range(sampler_cfg.spp):
        film_state = step(scene, camera, film_state, pixels, jnp.uint32(s))
    return fm.to_image(film_state)
