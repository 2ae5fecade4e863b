"""Differentiable rendering: pixel gradients w.r.t. materials, lights, and
the camera.

Estimator stance (SURVEY.md §7 differentiability): discrete events — BVH hit
ids, traversal t's (stop_gradient at the traversal boundary), lobe choices,
RR decisions, light picks — are detached; gradients flow through every
continuous factor (BSDF f, cosines, Le, pdfs, filter weights, camera rays) of
the *same* paths.  hit_record re-derives the intersection differentiably for
the fixed hit id, so the whole estimator is an exact derivative of the
deterministic render function at a fixed sample sequence — which is what the
finite-difference tests (tests/test_grad.py) check it against.

Backward memory (path replay): li_path(remat=True) wraps each bounce in
jax.checkpoint, so the backward pass *replays* each bounce from its carry
state (o, d, beta, sampler cursor) instead of holding every bounce's
activations live — O(1)-in-depth backward memory, which is what lets
killeroo-scale batches run fwd+bwd (bench.py "grad" detail, the
north-star fwd+bwd Mrays/s metric).

`render_grad_step` is the "training step" analog: one sample batch forward +
VJP into the parameter set {materials.kd, materials.ks, materials.roughness,
lights.L, camera (pose + projection + lens)}, with gradients reduced over the
ray axis (an all-reduce XLA inserts when the step is sharded over the rays
mesh).  The reference has no equivalent (pbrt-v3 is forward-only); the
north star (BASELINE.json) sets the contract.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import scene as sc
from ..samplers import samplers as sa

# Parameter-set keys accepted by render_grad_step.
MATERIAL_PARAMS = ("kd", "ks", "roughness")
LIGHT_PARAMS = ("light_L",)
CAMERA_PARAMS = ("camera",)
DEFAULT_PARAMS = MATERIAL_PARAMS + LIGHT_PARAMS + CAMERA_PARAMS


def extract_params(scene, camera, names=DEFAULT_PARAMS):
    """The differentiable parameter pytree for a (scene, camera) pair."""
    out = {}
    for nm in names:
        if nm in MATERIAL_PARAMS:
            out[nm] = getattr(scene.materials, nm)
        elif nm == "light_L":
            out[nm] = scene.lights.L
        elif nm == "camera":
            out[nm] = {
                "camera_to_world": camera.camera_to_world,
                "raster_to_camera": camera.raster_to_camera,
                "lens_radius": camera.lens_radius,
                "focal_distance": camera.focal_distance,
            }
        else:
            raise ValueError(f"unknown grad param {nm!r}")
    return out


def apply_params(scene, camera, params):
    """Re-insert a parameter pytree into (scene, camera)."""
    mat_updates = {k: v for k, v in params.items() if k in MATERIAL_PARAMS}
    if mat_updates:
        scene = scene.replace(materials=scene.materials.replace(**mat_updates))
    if "light_L" in params:
        scene = scene.replace(lights=scene.lights.replace(L=params["light_L"]))
    if "camera" in params:
        camera = camera.replace(**params["camera"])
    return scene, camera


def render_batch_radiance(
    scene, camera, pixels, sample_num, sampler_cfg, path_cfg, statics,
    remat: bool = False,
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
    L = li_path(
        scene, o, d, sampler_cfg, state, path_cfg, statics, remat=remat
    )
    bad = ~jnp.all(jnp.isfinite(L), -1)
    return jnp.where(bad[..., None], 0.0, L)


def render_grad_step(
    scene, camera, pixels, sample_num, grad_weights, sampler_cfg, path_cfg,
    statics, param_names=DEFAULT_PARAMS, remat: bool = True,
):
    """One differentiable render step.

    grad_weights: [N,3] adjoint per pixel-sample (e.g. dLoss/dL) — for a
    plain loss `sum(L * w)`.  Returns (L, grads) where grads is a dict keyed
    by param_names; "camera" maps to a dict of CameraParams leaf gradients
    (pose matrix, projection matrix, lens radius, focal distance).
    """

    def loss_fn(params):
        s2, cam2 = apply_params(scene, camera, params)
        L = render_batch_radiance(
            s2, cam2, pixels, sample_num, sampler_cfg, path_cfg, statics,
            remat=remat,
        )
        return jnp.sum(L * grad_weights), L

    params = extract_params(scene, camera, param_names)
    (loss, L), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return L, grads
