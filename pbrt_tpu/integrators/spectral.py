"""Spectral (SampledSpectrum) render mode — pbrt's PBRT_SAMPLED_SPECTRUM
build (CMakeLists.txt:20, spectrum.h:48-515) as a render-time choice.

pbrt switches its whole Spectrum typedef at compile time; here the N-sample
machinery (core/sampled_spectrum.py) LIFTS a scene's RGB coefficients to
N-bin spectra at scene compile (Smits FromRGB, exactly pbrt's conversion
when an RGB scene is rendered spectrally), renders the path integral with
[..., N] radiance arrays, and converts the spectral film to XYZ -> RGB —
the same observable pipeline as the reference's sampled build on RGB-
specified scenes.

Scope: matte materials + point/diffuse-area(sphere,triangle) lights — the
analytic-scene tier (src/tests/analytic_scenes.cpp) that pbrt itself uses
to validate its spectral build; the RGB engines remain the production path
(film accumulation and texture machinery are 3-channel).  The channel
count N is a config argument (default 60 = nSpectralSamples).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, offset_ray_origin
from ..core import sampled_spectrum as ss
from ..accel import traverse as tv
from ..lights import lights as lt
from ..materials import bsdf as bx
from ..samplers import samplers as sa
from ..statics import scene_statics
from .. import film as fm
from .. import scene as sc
from ..core.sampling import INV_PI
from . import common


@dataclasses.dataclass(frozen=True)
class SpectralConfig:
    max_depth: int = 5
    n_samples: int = ss.N_SPECTRAL_SAMPLES


def lift_scene_spectra(scene: sc.SceneArrays, n: int):
    """Host-side: material kd -> reflectance spectra [M, n], light L ->
    illuminant spectra [L, n] (Spectrum::FromRGB per type,
    spectrum.cpp:26-123)."""
    kd = np.asarray(scene.materials.kd)
    light_l = np.asarray(scene.lights.L)
    kd_s = ss.from_rgb(kd, "reflectance", n).astype(np.float32)
    l_s = np.zeros((light_l.shape[0], n), np.float32)
    for i in range(light_l.shape[0]):
        # pbrt lifts an RGB emitter with the illuminant basis scaled so the
        # lifted spectrum's luminance matches the RGB luminance.
        spec = ss.from_rgb(light_l[i], "illuminant", n)
        y_rgb = float(
            0.212671 * light_l[i][0]
            + 0.715160 * light_l[i][1]
            + 0.072169 * light_l[i][2]
        )
        y_s = float(ss.y_luminance(spec, n))
        l_s[i] = (spec * (y_rgb / y_s if y_s > 0 else 0.0)).astype(np.float32)
    return jnp.asarray(kd_s), jnp.asarray(l_s)


def render(scene, camera, film_cfg, sampler_cfg, cfg: SpectralConfig = SpectralConfig(),
           filt=None):
    """Spectral render driver; returns an RGB image (XYZ->RGB of the
    spectral estimate)."""
    from ..filters import make_filter
    from ..cameras import generate_rays
    from .path import make_pixel_grid

    statics = scene_statics(scene)
    for t in statics.mat_types:
        if t not in (sc.MAT_MATTE,):
            raise NotImplementedError(
                "spectral mode covers the analytic-scene tier (matte); "
                f"material type {t} present"
            )
    n = cfg.n_samples
    kd_s, l_s = lift_scene_spectra(scene, n)
    xyz_bins = jnp.asarray(ss.cie_xyz_bins(n), jnp.float32)  # [3, n]
    xyz_scale = jnp.float32(
        (ss.SAMPLED_LAMBDA_END - ss.SAMPLED_LAMBDA_START)
        / (ss.CIE_Y_INTEGRAL * n)
    )
    xyz2rgb = jnp.asarray(ss._XYZ2RGB, jnp.float32)

    filt = filt or make_filter(film_cfg.filter_name)
    film_state = fm.make_film_state(film_cfg, filt)
    pixels = jnp.asarray(make_pixel_grid(film_cfg))
    scene_d = jax.device_put(scene)
    qt, ltypes, mtypes = (
        statics.quadric_types, statics.light_types, statics.mat_types,
    )

    def sample_batch(scene, camera, film_state, pixels, s_num, kd_s, l_s):
        npix = pixels.shape[0]
        state = sa.init_state(
            sampler_cfg, pixels, jnp.full((npix,), s_num, jnp.uint32)
        )
        p_film, tu, p_lens = sa.get_camera_sample(sampler_cfg, state, pixels)
        o, d, _, w = generate_rays(camera, p_film, p_lens, tu)
        t, prim = tv.intersect_closest(scene, o, d, 1e30, qt)
        L = jnp.zeros((npix, n), jnp.float32)
        beta = jnp.ones((npix, n), jnp.float32)
        alive = jnp.ones((npix,), bool)
        dim = 5
        for bounce in range(cfg.max_depth + 1):
            rec = tv.hit_record(scene, o, d, t, prim, qt)
            found = rec["hit"] & alive
            # Le at vertex (area lights; spectral table).
            ali = rec["arealight"]
            le_s = jnp.where(
                (found & (ali >= 0))[..., None],
                l_s[jnp.clip(ali, 0, l_s.shape[0] - 1)],
                0.0,
            )
            if bounce == 0:
                L = L + beta * le_s
            alive = found
            if bounce >= cfg.max_depth:
                break
            mat = bx.gather_material(
                scene.materials, rec["material"], None, mtypes, uv=rec["uv"]
            )
            frame = bx.frame_from_rec(rec)
            sxv, tsv, nsv = frame
            has = alive & (rec["material"] >= 0)
            kd_lane = kd_s[jnp.clip(rec["material"], 0, kd_s.shape[0] - 1)]

            u_sel = sa.get_1d(sampler_cfg, state, dim)
            u_li = sa.get_2d(sampler_cfg, state, dim + 1)
            u_bs = sa.get_2d(sampler_cfg, state, dim + 3)
            dim += 5
            # NEE: geometry/pdf via the RGB machinery; radiance spectral.
            from ..core import sampling as smp

            light_idx, pmf, _ = smp.sample_discrete_1d(
                scene.light_distr, u_sel
            )
            sl = lt.sample_li(scene, light_idx, rec["p"], u_li, ltypes)
            occ = common.occluded(
                scene, rec["p"], rec["p_error"], rec["ng"], sl["p_light"], qt
            )
            li_spec = l_s[jnp.clip(light_idx, 0, l_s.shape[0] - 1)]
            # Spectral light radiance keeps sample_li's masking (emit side,
            # zero-radiance) encoded in its RGB value: scale by (rgb != 0).
            li_on = jnp.any(sl["li"] > 0.0, -1)
            cos_i = absdot(sl["wi"], nsv)
            usable = has & ~occ & (sl["pdf"] > 0.0) & li_on
            pdf_s = jnp.where(usable, sl["pdf"] * pmf, 1.0)
            f_spec = kd_lane * INV_PI  # matte, sigma=0
            L = L + jnp.where(
                usable[..., None],
                beta * f_spec * li_spec * (cos_i / jnp.maximum(pdf_s, 1e-20))[..., None],
                0.0,
            )
            # Cosine-sampled continuation.
            wi_l = bx._cosine_sample_wi(
                bx.to_local(sxv, tsv, nsv, rec["wo"]), u_bs
            )
            wi_w = bx.to_world(sxv, tsv, nsv, wi_l)
            pdf_b = bx.cosine_pdf(bx.to_local(sxv, tsv, nsv, rec["wo"]), wi_l)
            contrib = f_spec * (
                absdot(wi_w, nsv) / jnp.maximum(pdf_b, 1e-20)
            )[..., None]
            alive = alive & has & (pdf_b > 0.0)
            beta = jnp.where(alive[..., None], beta * contrib, beta)
            o = jnp.where(
                alive[..., None],
                offset_ray_origin(rec["p"], rec["p_error"], rec["ng"], wi_w),
                o,
            )
            d = jnp.where(alive[..., None], wi_w, d)
            t, prim = tv.intersect_closest(scene, o, d, 1e30, qt)

        # Spectral -> XYZ -> RGB (spectrum.h:249-259, film.cpp:169-254).
        xyz = jnp.einsum("ps,cs->pc", L, xyz_bins) * xyz_scale
        rgb = jnp.einsum("rc,pc->pr", xyz2rgb, xyz)
        bad = ~jnp.all(jnp.isfinite(rgb), -1)
        rgb = jnp.where(bad[..., None], 0.0, rgb)
        return fm.add_samples(film_state, p_film, rgb, w)

    step = jax.jit(sample_batch)
    camera_d = jax.device_put(camera)
    for s in range(sampler_cfg.spp):
        film_state = step(
            scene_d, camera_d, film_state, pixels, jnp.uint32(s), kd_s, l_s
        )
    return fm.to_image(film_state, scale=film_cfg.scale)
