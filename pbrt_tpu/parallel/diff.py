"""Differentiable rendering: pixel gradients w.r.t. scene parameters.

Path-replay backprop stance (SURVEY.md §7): discrete events — BVH hit ids,
traversal t's, lobe choices, RR decisions, light picks — are detached
(stop_gradient at the traversal boundary, integer ids naturally
non-differentiable); gradients flow through every continuous factor (BSDF f,
Le, light pdfs, filter weights, camera rays) of the *same* paths, re-derived
differentiably from the scene arrays by hit_record's re-intersection.  This
matches the north star: pixel gradients w.r.t. materials / lights / camera.

`render_grad_step` is the "training step" analog: one sample batch forward +
VJP into a chosen parameter subset, with gradients reduced over the ray axis
(an all-reduce XLA inserts when the step is sharded over the rays mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import scene as sc
from ..samplers import samplers as sa


def render_batch_radiance(
    scene, camera, pixels, sample_num, sampler_cfg, path_cfg, statics
):
    """Forward: per-pixel radiance L [N,3] for one sample batch."""
    from ..integrators.path import li_path
    from ..cameras import generate_rays

    n = pixels.shape[0]
    state = sa.init_state(
        sampler_cfg, pixels, jnp.full((n,), sample_num, jnp.uint32)
    )
    p_film, time_u, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
    o, d, time, weight = generate_rays(camera, p_film, p_lens, time_u)
    L = li_path(scene, o, d, sampler_cfg, state, path_cfg, statics)
    bad = ~jnp.all(jnp.isfinite(L), -1)
    return jnp.where(bad[..., None], 0.0, L)


def render_grad_step(
    scene, camera, pixels, sample_num, grad_weights, sampler_cfg, path_cfg,
    statics,
):
    """One differentiable render step.

    grad_weights: [N,3] adjoint per pixel-sample (e.g. dLoss/dL) — for a plain
    loss `sum(L * w)`.  Returns (L, grads) where grads is a pytree with the
    same structure as (materials.kd, materials.ks, lights.L): the scene
    parameters we differentiate in round 1.
    """

    def loss_fn(params):
        kd, ks, light_L = params
        mats = scene.materials.replace(kd=kd, ks=ks)
        lights = scene.lights.replace(L=light_L)
        s2 = scene.replace(materials=mats, lights=lights)
        L = render_batch_radiance(
            s2, camera, pixels, sample_num, sampler_cfg, path_cfg, statics
        )
        return jnp.sum(L * grad_weights), L

    params = (scene.materials.kd, scene.materials.ks, scene.lights.L)
    (loss, L), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return L, {"kd": grads[0], "ks": grads[1], "light_L": grads[2]}
