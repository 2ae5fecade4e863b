"""lax.scan bounce loop == statically-unrolled bounce loop (path.py).

The scan body (_make_scan_body) re-derives every sampler dimension from the
traced bounce index and draws via the *_dyn getters; the unrolled loop
(_make_bounce_body at static dims) is the reference implementation.  Per-ray
radiance must agree to XLA-refusion tolerance on scenes exercising diffuse,
specular (count_le), and RR (depth > 4) paths.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu import scene as sc
from pbrt_tpu import film as fm
from pbrt_tpu.cameras import make_perspective_camera, generate_rays
from pbrt_tpu.core import transform as tf
from pbrt_tpu.integrators import path as pt
from pbrt_tpu.samplers import samplers as sa
from pbrt_tpu.samplers.samplers import SamplerConfig

RES = (16, 16)


def _scene_with_specular():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.4, 0.3), sigma=0.0)
    b.add_sphere(tf.identity(), 2.0, material=m, reverse_orientation=True)
    g = b.add_material(sc.MAT_GLASS, kr=(1, 1, 1), kt=(1, 1, 1), eta=1.5)
    b.add_sphere(tf.translate(0.0, 0.0, 1.0), 0.3, material=g)
    b.add_point_light(tf.translate(0.5, 0.5, 0.0), (np.pi, np.pi, np.pi))
    m2 = b.add_material(sc.MAT_MATTE, kd=(0.0, 0.0, 0.0))
    b.add_emissive_sphere(
        tf.translate(-0.4, 0.4, 0.8), 0.2, L=(3.0, 2.0, 1.0), material=m2
    )
    return b.build()


def _li_both(scene, sampler_name, max_depth, spp_sample=0):
    cam = make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), RES, fov_deg=60.0
    )
    import jax

    scene = jax.device_put(scene)
    statics = pt.scene_statics(scene)
    scfg = SamplerConfig(sampler_name, 4, RES)
    cfg = pt.PathConfig(max_depth=max_depth)
    pixels = jnp.asarray(pt.make_pixel_grid(fm.FilmConfig(full_resolution=RES)))
    n = pixels.shape[0]
    state = sa.init_state(
        scfg, pixels, jnp.full((n,), spp_sample, jnp.uint32)
    )
    p_film, time_u, p_lens = sa.get_camera_sample(scfg, state, pixels)
    o, d, _t, _w = generate_rays(cam, p_film, p_lens, time_u)

    prev = pt._FORCE_UNROLL
    try:
        pt._FORCE_UNROLL = False
        l_scan = np.asarray(
            jax.jit(
                lambda s, oo, dd: pt.li_path(
                    s, oo, dd, scfg, state, cfg, statics
                )
            )(scene, o, d)
        )
        pt._FORCE_UNROLL = True
        l_unroll = np.asarray(
            jax.jit(
                lambda s, oo, dd: pt.li_path(
                    s, oo, dd, scfg, state, cfg, statics
                )
            )(scene, o, d)
        )
    finally:
        pt._FORCE_UNROLL = prev
    return l_scan, l_unroll


@pytest.mark.parametrize("sampler", ["halton", "sobol", "zerotwosequence"])
def test_scan_equals_unroll(sampler):
    # Tolerance is XLA-refusion class: the two loops are differently-fused
    # programs, so individual float ops round differently by a few ulp;
    # since round 5 folds bounce 0 into the scan too, every bounce is
    # differently fused and the depth-6 chaos amplification reaches
    # ~6e-4 rel on a handful of elements (measured 3 of 768); a
    # sampler-dimension mismatch would show up as wholesale divergence.
    scene = _scene_with_specular()
    l_scan, l_unroll = _li_both(scene, sampler, max_depth=6)
    np.testing.assert_allclose(l_scan, l_unroll, rtol=2e-3, atol=2e-5)


def test_scan_equals_unroll_depth1():
    scene = _scene_with_specular()
    l_scan, l_unroll = _li_both(scene, "sobol", max_depth=1)
    np.testing.assert_allclose(l_scan, l_unroll, rtol=2e-6, atol=2e-6)
