"""DirectLighting integrator (integrators/directlighting.{h,cpp}).

One-bounce NEE (+specular recursion via the shared wavefront loop with
max_depth and no indirect diffuse).  Both strategies:

* "one"  — UniformSampleOneLight (integrator.cpp:85-106).
* "all"  — UniformSampleAllLights (integrator.cpp:54-84) with the
  GlobalSampler sample-array semantics (sampler.cpp:136-196): per light j,
  TWO 2D arrays (uLight, uScattering) of n_samples[j] elements live at
  dims (5+4j, 5+4j+2); array element (s, k) draws at global sample index
  s*n_j + k; regular Get dims resume at arrayEndDim = 5 + 4*nLights.
  n_samples rounds up to a power of two for sobol/(0,2)/maxmin
  (Sampler::RoundCount, sobol.cpp:69).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, offset_ray_origin
from ..accel import traverse as tv
from ..lights import lights as lt
from ..materials import bsdf as bx
from ..samplers import samplers as sa
from .. import film as fm
from .. import scene as sc
from . import common


@dataclasses.dataclass(frozen=True)
class DirectLightingConfig:
    max_depth: int = 5  # specular bounce depth
    strategy: str = "one"  # "one" | "all"


def li_direct(
    scene, o, d, sampler_cfg, sampler_state, cfg, statics, start_dim=5,
    pixels=None, sample_num=None, light_ns=(),
):
    """Li for direct lighting: emitted + NEE (+ specular chain).

    For strategy "all", `pixels`/`sample_num`/`light_ns` drive the
    sample-array draws (see module docstring); light_ns is the STATIC tuple
    of per-light sample counts."""
    mat_types = statics.mat_types
    light_types = statics.light_types
    quadric_types = statics.quadric_types
    n = o.shape[0]
    L = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    specular = jnp.ones((n,), bool)  # camera ray counts Le like specular
    use_all = cfg.strategy == "all" and light_ns and pixels is not None
    dim = start_dim
    if use_all:
        # Regular dims resume after the array block (GlobalSampler::Get2D
        # skip, sampler.cpp:186-196).
        dim = start_dim + 4 * len(light_ns)

    for depth in range(cfg.max_depth + 1):
        t, prim = tv.intersect_closest(scene, o, d, 1e30, quadric_types)
        rec = tv.hit_record(scene, o, d, t, prim, quadric_types)
        found = rec["hit"] & alive

        le_surf = lt.area_light_emission(scene, rec["arealight"], rec["ng"], rec["wo"])
        L = L + jnp.where((found & specular)[..., None], beta * le_surf, 0.0)
        le_inf = lt.escaped_radiance(scene, d, light_types)
        L = L + jnp.where(
            (alive & ~rec["hit"] & specular)[..., None], beta * le_inf, 0.0
        )
        alive = found
        if depth >= cfg.max_depth:
            break

        from .path import eval_scene_textures

        tex_vals = eval_scene_textures(scene, rec, statics)
        mat = bx.gather_material(scene.materials, rec["material"], tex_vals, mat_types, uv=rec["uv"])
        frame = bx.frame_from_rec(rec)
        ss, ts, ns = frame
        wo_local = bx.to_local(ss, ts, ns, rec["wo"])
        has_bsdf = alive & (rec["material"] >= 0)

        # Only the first non-specular vertex accumulates NEE.
        first_diffuse = has_bsdf & specular
        if use_all and depth == 0:
            # UniformSampleAllLights: every light, n_j array samples each,
            # averaged (integrator.cpp:54-84).  Arrays are consumed once
            # per path (deeper vertices would hit pbrt's exhausted-array
            # Get2D fallback, which the specular chain never does for NEE).
            ld = jnp.zeros((n, 3), jnp.float32)
            for j, nj in enumerate(light_ns):
                d_light = start_dim + 4 * j
                d_scat = start_dim + 4 * j + 2
                acc = jnp.zeros((n, 3), jnp.float32)
                for k in range(nj):
                    s_arr = sa.init_state(
                        sampler_cfg, pixels,
                        jnp.full(
                            (n,),
                            sample_num * jnp.uint32(nj) + jnp.uint32(k),
                            jnp.uint32,
                        ),
                    )
                    u_l = sa.get_2d(sampler_cfg, s_arr, d_light)
                    u_s = sa.get_2d(sampler_cfg, s_arr, d_scat)
                    acc = acc + common.estimate_direct(
                        scene, rec, frame, mat, wo_local,
                        jnp.full((n,), j, jnp.int32), u_l, u_s,
                        first_diffuse, mat_types, light_types, quadric_types,
                    )
                ld = ld + acc / float(nj)
            L = L + jnp.where(first_diffuse[..., None], beta * ld, 0.0)
        elif use_all:
            # Exhausted-array fallback (integrator.cpp:66-73): one regular
            # Get2D pair per light.
            ld = jnp.zeros((n, 3), jnp.float32)
            for j in range(len(light_ns)):
                u_l = sa.get_2d(sampler_cfg, sampler_state, dim)
                u_s = sa.get_2d(sampler_cfg, sampler_state, dim + 2)
                dim += 4
                ld = ld + common.estimate_direct(
                    scene, rec, frame, mat, wo_local,
                    jnp.full((n,), j, jnp.int32), u_l, u_s,
                    first_diffuse, mat_types, light_types, quadric_types,
                )
            L = L + jnp.where(first_diffuse[..., None], beta * ld, 0.0)
        else:
            u_select = sa.get_1d(sampler_cfg, sampler_state, dim)
            u_light = sa.get_2d(sampler_cfg, sampler_state, dim + 1)
            u_scatter = sa.get_2d(sampler_cfg, sampler_state, dim + 3)
            dim += 5
            ld = common.sample_one_light(
                scene, rec, frame, mat, wo_local, u_select, u_light,
                u_scatter, first_diffuse, mat_types, light_types,
                quadric_types,
            )
            L = L + jnp.where(first_diffuse[..., None], beta * ld, 0.0)

        # Specular continuation (SamplerIntegrator::SpecularReflect/Transmit).
        u_bsdf = sa.get_2d(sampler_cfg, sampler_state, dim)
        dim += 2
        bs = bx.sample_material(mat, wo_local, u_bsdf, mat_types)
        cont = alive & bs["is_specular"] & bs["valid"]
        wi_world = bx.to_world(ss, ts, ns, bs["wi"])
        beta = jnp.where(
            cont[..., None],
            beta * bs["f"] * (absdot(wi_world, ns) / jnp.maximum(bs["pdf"], 1e-20))[..., None],
            beta,
        )
        alive = cont
        specular = cont
        o = offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi_world)
        d = wi_world

    return L


def render(scene, camera, film_cfg, sampler_cfg, cfg=DirectLightingConfig(), filt=None):
    from ..filters import make_filter
    from .path import make_pixel_grid
    from ..statics import scene_statics

    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    statics = scene_statics(scene)
    light_ns = ()
    if cfg.strategy == "all":
        ns = np.asarray(scene.lights.n_samples).astype(int)
        if sampler_cfg.name in ("sobol", "zerotwosequence", "maxmin"):
            # Sampler::RoundCount -> RoundUpPow2 (sobol.cpp:69).
            ns = np.array([1 << max(0, int(x - 1).bit_length()) for x in ns])
        light_ns = tuple(int(max(x, 1)) for x in ns)
    import jax as _jax
    scene = _jax.device_put(scene)  # one-time upload (see path.render)
    camera = _jax.device_put(camera)

    def batch(scene, camera, film_state, pixels, s):
        n = pixels.shape[0]
        state = sa.init_state(sampler_cfg, pixels, jnp.full((n,), s, jnp.uint32))
        p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
        from ..cameras import generate_rays

        o, d, time, weight = generate_rays(camera, p_film, p_lens, time_u)
        L = li_direct(scene, o, d, sampler_cfg, state, cfg, statics,
                      pixels=pixels, sample_num=s, light_ns=light_ns)
        bad = ~jnp.all(jnp.isfinite(L), -1) | jnp.any(L < 0.0, -1)
        L = jnp.where(bad[..., None], 0.0, L)
        return fm.add_samples(film_state, p_film, L, weight)

    step = jax.jit(batch)
    for s in range(sampler_cfg.spp):
        film_state = step(scene, camera, film_state, pixels, jnp.uint32(s))
    return fm.to_image(film_state)
