"""Ambient-occlusion integrator (integrators/ao.cpp:45-53).

Cosine- or uniform-hemisphere occlusion probes from the first hit — the
two-kernel bring-up renderer."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, dot, face_forward, offset_ray_origin
from ..core import sampling as smp
from ..accel import traverse as tv
from ..materials import bsdf as bx
from ..samplers import samplers as sa
from .. import film as fm
from . import common


@dataclasses.dataclass(frozen=True)
class AOConfig:
    cos_sample: bool = True
    n_samples: int = 64
    max_dist: float = 1e30


def li_ao(scene, o, d, sampler_cfg, sampler_state, cfg, statics, start_dim=5):
    quadric_types = statics.quadric_types
    t, prim = tv.intersect_closest(scene, o, d, 1e30, quadric_types)
    rec = tv.hit_record(scene, o, d, t, prim, quadric_types)
    # Face-forward the normal toward wo (ao.cpp:60).
    n_s = face_forward(rec["ns"], rec["wo"])
    frame = bx.make_frame(n_s, rec["dpdu"])
    ss, ts, ns = frame

    total = jnp.zeros((o.shape[0],), jnp.float32)
    dim = start_dim
    for s in range(cfg.n_samples):
        u = sa.get_2d(sampler_cfg, sampler_state, dim)
        dim += 2
        if cfg.cos_sample:
            wi_l = smp.cosine_sample_hemisphere(u)
            pdf = smp.cosine_hemisphere_pdf(jnp.abs(wi_l[..., 2]))
        else:
            wi_l = smp.uniform_sample_hemisphere(u)
            pdf = jnp.full_like(total, smp.uniform_hemisphere_pdf())
        wi = bx.to_world(ss, ts, ns, wi_l)
        o2 = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi)
        occ = tv.intersect_any(scene, o2, wi, cfg.max_dist, quadric_types)
        contrib = jnp.where(
            rec["hit"] & ~occ & (pdf > 0.0),
            dot(wi, ns) / jnp.maximum(pdf, 1e-12) / jnp.pi,
            0.0,
        )
        total = total + contrib
    v = total / cfg.n_samples
    return jnp.stack([v, v, v], -1)


def render(scene, camera, film_cfg, sampler_cfg, cfg=AOConfig(), filt=None):
    from ..filters import make_filter
    from .path import make_pixel_grid

    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    from ..statics import scene_statics

    statics = scene_statics(scene)
    import jax as _jax
    scene = _jax.device_put(scene)  # one-time upload (see path.render)
    camera = _jax.device_put(camera)

    def batch(scene, camera, film_state, pixels, s):
        n = pixels.shape[0]
        state = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
        from ..cameras import generate_rays

        o, d, time, weight = generate_rays(camera, p_film, p_lens, time_u)
        L = li_ao(scene, o, d, sampler_cfg, state, cfg, statics)
        return fm.add_samples(film_state, p_film, L, weight)

    step = jax.jit(batch)
    for s in range(sampler_cfg.spp):
        film_state = step(scene, camera, film_state, pixels, jnp.uint32(s))
    return fm.to_image(film_state)
