#!/usr/bin/env python
"""Probe: why is an isolated shadow trace 90x slower than camera-ray
closest-hit?  Times intersect_any / intersect_closest on the SAME ray sets
(camera rays vs hit-point->up shadow rays), sort on/off."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import bench as B
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.samplers import samplers as sa
from pbrt_tpu.integrators.path import make_pixel_grid
from pbrt_tpu.statics import scene_statics
from pbrt_tpu import film as fm
from pbrt_tpu.cameras import generate_rays
from pbrt_tpu.accel import traverse as tv
from pbrt_tpu.ops import pallas_bvh as pk


def timeit(name, fn, *args, reps=3):
    t0 = time.time(); out = jax.block_until_ready(fn(*args)); c = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.time()-t0)/reps*1e3:9.1f} ms  (compile {c:.0f}s)")
    return out


def main():
    scene, camera = B.build_scene()
    statics = scene_statics(scene)
    qt = statics.quadric_types
    film_cfg = fm.FilmConfig(full_resolution=B.RES)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))[:40960]
    n = pixels.shape[0]
    cfgS = SamplerConfig("sobol", 8, B.RES)
    state = sa.init_state(cfgS, pixels, jnp.zeros((n,), jnp.uint32))
    p_film, tu, p_lens = sa.get_camera_sample(cfgS, state, pixels)
    o, d = jax.jit(lambda: generate_rays(camera, p_film, p_lens, tu)[:2])()

    f_closest = jax.jit(lambda s, o, d: tv.intersect_closest(s, o, d, 1e30, qt))
    t, prim = timeit("closest camera rays", f_closest, scene, o, d)
    rec = jax.jit(lambda s, o, d, t, p: tv.hit_record(s, o, d, t, p, qt))(
        tv._device_scene(scene), o, d, t, prim
    )
    p_hit = jax.block_until_ready(rec["p"])
    ng = rec["ng"]

    # Shadow-style rays: origin = hit points, direction up.
    so = np.asarray(p_hit) + 1e-3 * np.asarray(ng)
    sd = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    so = jnp.asarray(so); sd = jnp.asarray(sd)

    f_any = jax.jit(lambda s, o, d, tm: tv.intersect_any(s, o, d, tm, qt))
    timeit("any up-rays tmax=10", f_any, scene, so, sd, jnp.full((n,), 10.0))
    timeit("closest up-rays", f_closest, scene, so, sd)

    f_nosort = jax.jit(
        lambda s, o, d: pk.intersect_kernel_with_quadrics(
            tv._device_scene(s), o, d, 1e30, qt, sort=False
        )
    )
    timeit("closest up-rays NOSORT", f_nosort, scene, so, sd)

    # The exact occluded() call shape: toward a point light position.
    p_l = jnp.asarray(np.array([0.0, 5.0, 8.0], np.float32)) + jnp.zeros((n, 3))
    from pbrt_tpu.integrators import common
    f_occ = jax.jit(
        lambda s, p, pe, ng, pl: common.occluded(s, p, pe, ng, pl, qt)
    )
    timeit("occluded() to light point", f_occ, scene, rec["p"], rec["p_error"], ng, p_l)


if __name__ == "__main__":
    main()
