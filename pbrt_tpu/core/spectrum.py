"""RGB spectra as trailing `[..., 3]` array axes.

pbrt's default build renders in RGBSpectrum (reference: core/spectrum.h:48-515
with N=3); the film converts to XYZ for accumulation and back to RGB on write
(film.cpp:169-254).  Here a spectrum is simply the last axis of a float32
array — all arithmetic is ordinary jnp broadcasting.  SampledSpectrum (N=60)
is a later config constant; the API below keeps the channel count symbolic.
"""
from __future__ import annotations

import jax.numpy as jnp

N_CHANNELS = 3

# Standard sRGB/D65 conversion matrices (spectrum.h:56-66 RGBToXYZ/XYZToRGB).
_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    jnp.float32,
)
_XYZ2RGB = jnp.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ],
    jnp.float32,
)


def rgb_to_xyz(rgb):
    return jnp.sum(_RGB2XYZ * rgb[..., None, :], axis=-1)


def xyz_to_rgb(xyz):
    return jnp.sum(_XYZ2RGB * xyz[..., None, :], axis=-1)


def luminance(rgb):
    """y() — the Y row of RGBToXYZ (spectrum.h:508)."""
    return (
        0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]
    )


def is_black(rgb):
    return jnp.all(rgb == 0.0, axis=-1)


def max_component(rgb):
    return jnp.max(rgb, axis=-1)


def clamp_nonneg(rgb):
    return jnp.maximum(rgb, 0.0)


def gamma_correct(v):
    """sRGB encode (imageio.cpp:98 GammaCorrect) for 8-bit outputs."""
    return jnp.where(
        v <= 0.0031308, 12.92 * v, 1.055 * jnp.power(jnp.maximum(v, 1e-10), 1.0 / 2.4) - 0.055
    )


def inverse_gamma_correct(v):
    """(imageio.cpp:105 InverseGammaCorrect)."""
    return jnp.where(v <= 0.04045, v / 12.92, jnp.power((v + 0.055) / 1.055, 2.4))
