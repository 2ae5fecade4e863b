"""Metropolis light transport (PSSMLT over BDPT).

TPU re-expression of integrators/mlt.{h,cpp}: pbrt's per-chain MLTSampler
(lazily-mutated PrimarySample vector, large/small steps, mlt.cpp:53-124)
becomes a [C, D] primary-sample matrix — each batch lane is one independent
Markov chain (SURVEY.md: "chains = batch lanes").  The BDPT target function
is evaluated through the "pss" passthrough sampler, so L(X) reuses the whole
bidirectional machinery unchanged.

Differences vs the reference (documented):
  * pbrt picks ONE (s,t) strategy per mutation (uniform over t) and scales
    by nStrategies; here L(X) evaluates the full MIS-weighted strategy sum
    for the chain's depth — same expectation, strictly lower variance.
  * Mutations use jax.random (threefry) streams per (chain, step) rather
    than pbrt's per-chain PCG32 — MLT output is stochastic either way.
  * No lazy per-dimension mutation bookkeeping: the whole X row mutates
    each step (the vector is short: ~5 + 7*(depth+2) dims).

Bootstrap (mlt.cpp:177-202): nBootstrap X draws per depth, b = mean
luminance * (maxDepth+1); chains start from bootstrap picks via inverse-CDF.
Mutation loop (mlt.cpp:204-280): Metropolis accept min(1, Ly/Lx), BOTH
candidate images splatted with weights a/(y) per pbrt's estimator, final
splat scale b / mutationsPerPixel.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..samplers.samplers import SamplerConfig
from ..samplers import samplers as sa
from ..statics import scene_statics
from .. import film as fm
from . import bdpt as bd


@dataclasses.dataclass(frozen=True)
class MLTConfig:
    max_depth: int = 5
    n_bootstrap: int = 4096
    n_chains: int = 1024
    mutations_per_pixel: int = 4
    sigma: float = 0.01
    large_step_prob: float = 0.3


def _n_dims(max_depth):
    # camera: 5 + 2*(maxDepth+1); light: 5 + 2*maxDepth; PLUS the s==1
    # strategies' light-sampling draws at dims 200+3t (bdpt._connect) —
    # those dims MUST be part of the mutated vector or the s=1 estimator
    # integrates a frozen slice (11% bright bias measured).
    return 200 + 3 * (max_depth + 3) + 4


def _luminance(v):
    return 0.212671 * v[..., 0] + 0.715160 * v[..., 1] + 0.072169 * v[..., 2]


def _eval_L(scene, camera, X, chain_key, depth, cfg, statics, res):
    """L(X) for paths of exactly `depth` via the BDPT strategy sum.

    Returns (rasters [K][C,2], values [K][C,3], lum [C])."""
    n = X.shape[0]
    xr, yr = res
    # Film position from the first two dims, spanning the whole image
    # (MLTSampler stream 0 dims 0-1).
    fx = X[:, 0] * xr
    fy = X[:, 1] * yr
    pixels = jnp.stack(
        [jnp.clip(fx.astype(jnp.int32), 0, xr - 1),
         jnp.clip(fy.astype(jnp.int32), 0, yr - 1)], -1
    )
    X2 = X.at[:, 0].set(jnp.clip(fx - pixels[:, 0], 0.0, 1.0 - 1e-6))
    X2 = X2.at[:, 1].set(jnp.clip(fy - pixels[:, 1], 0.0, 1.0 - 1e-6))
    s_cfg = SamplerConfig("pss", 1, res)
    state = {"x": X2, "chain_key": chain_key}

    bcfg = bd.BDPTConfig(max_depth=cfg.max_depth)
    cam_vs, dim_c, p_film = bd.generate_camera_subpath(
        scene, camera, pixels, s_cfg, state, bcfg, statics
    )
    light_vs, _ = bd.generate_light_subpath(
        scene, n, s_cfg, state, bcfg, statics, dim_c
    )
    rasters, values = [], []
    L_film = jnp.zeros((n, 3), jnp.float32)
    t_max = depth + 2
    for t in range(1, t_max + 1):
        s = depth + 2 - t
        if s < 0 or (t == 1 and s == 1):
            continue
        contrib, weight, raster = bd._connect(
            scene, camera, cam_vs, light_vs, s, t, s_cfg, state, bcfg,
            statics, statics.quadric_types,
        )
        if contrib is None:
            continue
        wc = contrib * weight[..., None]
        wc = jnp.where(jnp.all(jnp.isfinite(wc), -1)[..., None], wc, 0.0)
        if t == 1:
            rasters.append(raster)
            values.append(wc)
        else:
            L_film = L_film + wc
    rasters.append(p_film)
    values.append(L_film)
    lum = sum(_luminance(v) for v in values)
    return rasters, values, lum


def render(scene, camera, film_cfg, cfg: MLTConfig = MLTConfig(), filt=None,
           seed: int = 0):
    """MLTIntegrator::Render (mlt.cpp:165-280)."""
    from ..filters import make_filter

    filt = filt or make_filter(film_cfg.filter_name)
    res = film_cfg.full_resolution
    xr, yr = res
    statics = scene_statics(scene)
    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    D = _n_dims(cfg.max_depth)
    n_depths = cfg.max_depth + 1
    key0 = jax.random.PRNGKey(seed)

    # ---- bootstrap: b per depth (mlt.cpp:177-202) ----
    C = cfg.n_chains
    boot_per_depth = max(cfg.n_bootstrap // n_depths, C)
    b_sum = 0.0
    seeds = []  # (depth, X0 rows)
    lums_all = []
    Xs_all = []
    depths_all = []
    for depth in range(n_depths):
        kd = jax.random.fold_in(key0, depth)
        X = jax.random.uniform(kd, (boot_per_depth, D), jnp.float32)
        ck = jnp.uint32(depth * 7919 + 13)
        f = jax.jit(
            functools.partial(
                _eval_L, depth=depth, cfg=cfg, statics=statics, res=res
            ),
            static_argnames=(),
        )
        _, _, lum = f(scene, camera, X, ck, )
        lum = np.asarray(lum)
        lum = np.where(np.isfinite(lum), lum, 0.0)
        b_sum += lum.mean()
        lums_all.append(lum)
        Xs_all.append(np.asarray(X))
        depths_all.append(depth)
    b = b_sum  # = sum over depths of E[lum_d] (pbrt: b/nBootstrap*(maxD+1))

    # ---- chains: pick (depth, X0) by bootstrap luminance ----
    all_lum = np.concatenate(lums_all)
    probs = all_lum / max(all_lum.sum(), 1e-12)
    rs = np.random.RandomState(seed + 1)
    picks = rs.choice(len(all_lum), size=C, p=probs)
    depth_of_pick = picks // boot_per_depth
    row_of_pick = picks % boot_per_depth

    film_state = fm.make_film_state(film_cfg, filt)
    n_mut_total = cfg.mutations_per_pixel * xr * yr
    n_steps = max(n_mut_total // C, 1)

    # Run each depth's chains separately (depth is static in the program).
    splat = jnp.zeros((yr, xr, 3), jnp.float32)
    for depth in range(n_depths):
        sel = depth_of_pick == depth
        n_d = int(sel.sum())
        if n_d == 0:
            continue
        X0 = jnp.asarray(
            np.stack([Xs_all[depth][r] for r in row_of_pick[sel]])
        )
        ck = jnp.uint32(depth * 7919 + 13)
        eval_fn = functools.partial(
            _eval_L, depth=depth, cfg=cfg, statics=statics, res=res
        )

        def step(carry, i):
            X, lum, rasters, values, splat, key = carry
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            large = jax.random.uniform(k1, (X.shape[0],)) < cfg.large_step_prob
            fresh = jax.random.uniform(k2, X.shape)
            perturb = X + cfg.sigma * jax.random.normal(k3, X.shape)
            perturb = perturb - jnp.floor(perturb)  # wrap to [0,1)
            Xp = jnp.where(large[:, None], fresh, perturb)
            r_p, v_p, lum_p = eval_fn(scene, camera, Xp, ck)
            a = jnp.clip(lum_p / jnp.maximum(lum, 1e-12), 0.0, 1.0)
            accept = jax.random.uniform(k4, (X.shape[0],)) < a
            # Splat both candidates (mlt.cpp:254-263).
            for rr, vv in zip(r_p, v_p):
                w = (a / jnp.maximum(lum_p, 1e-12))[:, None]
                splat = _splat(splat, rr, vv * w, res)
            for rr, vv in zip(rasters, values):
                w = ((1.0 - a) / jnp.maximum(lum, 1e-12))[:, None]
                splat = _splat(splat, rr, vv * w, res)
            X = jnp.where(accept[:, None], Xp, X)
            lum = jnp.where(accept, lum_p, lum)
            rasters = [
                jnp.where(accept[:, None], rp, rc)
                for rp, rc in zip(r_p, rasters)
            ]
            values = [
                jnp.where(accept[:, None], vp, vc)
                for vp, vc in zip(v_p, values)
            ]
            return (X, lum, rasters, values, splat, key), 0

        r0, v0, lum0 = jax.jit(eval_fn)(scene, camera, X0, ck)
        carry = (X0, lum0, r0, v0, splat, jax.random.fold_in(key0, 1000 + depth))

        @jax.jit
        def run(carry):
            carry, _ = jax.lax.scan(step, carry, jnp.arange(n_steps))
            return carry

        carry = run(carry)
        splat = carry[4]

    total_mut = n_steps * C
    scale = b / max(cfg.mutations_per_pixel, 1) * (
        n_mut_total / max(total_mut, 1)
    )
    img = splat * scale
    return np.asarray(img)


def _splat(splat, raster, v, res):
    xr, yr = res
    xi = jnp.clip(raster[:, 0].astype(jnp.int32), 0, xr - 1)
    yi = jnp.clip(raster[:, 1].astype(jnp.int32), 0, yr - 1)
    good = jnp.all(jnp.isfinite(v), -1) & jnp.all(jnp.isfinite(raster), -1)
    v = jnp.where(good[:, None], v, 0.0)
    return splat.at[yi, xi].add(v)
