"""Perlin gradient noise + FBm/Turbulence (core/texture.cpp:164-264).

Classic improved-Perlin permutation table (public domain constants, stored
in data/noise_perm.npy); smoothstep-quintic weights; octave sums with the
same 0.5-lambda/1.99-omega defaults as pbrt's FBm/Turbulence.
All functions are vectorized over [..., 3] points — pure VPU math.
"""
from __future__ import annotations

import functools
from pathlib import Path

import numpy as np
import jax.numpy as jnp

_DATA = Path(__file__).resolve().parent.parent / "data" / "noise_perm.npy"


@functools.cache
def _perm() -> np.ndarray:
    p = np.load(_DATA)
    return np.concatenate([p, p]).astype(np.int32)  # doubled, as pbrt


def _grad(ix, iy, iz, dx, dy, dz):
    perm = jnp.asarray(_perm())
    h = perm[perm[perm[ix] + iy] + iz] & 15
    u = jnp.where(h < 8, dx, dy)
    v = jnp.where(h < 4, dy, jnp.where((h == 12) | (h == 14), dx, dz))
    u = jnp.where((h & 1) != 0, -u, u)
    v = jnp.where((h & 2) != 0, -v, v)
    return u + v


def _noise_weight(t):
    t3 = t * t * t
    t4 = t3 * t
    return 6.0 * t4 * t - 15.0 * t4 + 10.0 * t3


def noise(p):
    """pbrt's Noise(Point3f) (texture.cpp:160-199), in [-1, 1]."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    iz = jnp.floor(z).astype(jnp.int32)
    dx = x - ix
    dy = y - iy
    dz = z - iz
    ix = ix & 255
    iy = iy & 255
    iz = iz & 255
    w000 = _grad(ix, iy, iz, dx, dy, dz)
    w100 = _grad(ix + 1, iy, iz, dx - 1, dy, dz)
    w010 = _grad(ix, iy + 1, iz, dx, dy - 1, dz)
    w110 = _grad(ix + 1, iy + 1, iz, dx - 1, dy - 1, dz)
    w001 = _grad(ix, iy, iz + 1, dx, dy, dz - 1)
    w101 = _grad(ix + 1, iy, iz + 1, dx - 1, dy, dz - 1)
    w011 = _grad(ix, iy + 1, iz + 1, dx, dy - 1, dz - 1)
    w111 = _grad(ix + 1, iy + 1, iz + 1, dx - 1, dy - 1, dz - 1)
    wx = _noise_weight(dx)
    wy = _noise_weight(dy)
    wz = _noise_weight(dz)

    def lerp(t, a, b):
        return a + t * (b - a)

    x00 = lerp(wx, w000, w100)
    x10 = lerp(wx, w010, w110)
    x01 = lerp(wx, w001, w101)
    x11 = lerp(wx, w011, w111)
    y0 = lerp(wy, x00, x10)
    y1 = lerp(wy, x01, x11)
    return lerp(wz, y0, y1)


def fbm(p, dpdx_len=0.0, dpdy_len=0.0, omega=0.5, max_octaves=6):
    """FBm (texture.cpp:201-219).  Antialiased octave clamping uses the
    texture-space footprint length when ray differentials are available
    (0.0 -> full octaves)."""
    # n = clamp(-1 - 0.5*log2(len2), 0, maxOctaves) — with no differentials
    # use max_octaves outright.
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    lam = 1.0
    o = 1.0
    for i in range(max_octaves):
        total = total + o * noise(lam * p)
        lam *= 1.99
        o *= omega
    return total


def turbulence(p, omega=0.5, max_octaves=6):
    """Turbulence (texture.cpp:221-249): sum of |noise|."""
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    lam = 1.0
    o = 1.0
    for i in range(max_octaves):
        total = total + o * jnp.abs(noise(lam * p))
        lam *= 1.99
        o *= omega
    return total
