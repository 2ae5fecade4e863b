"""Texture table + batched evaluation.

TPU re-expression of src/textures/ (2309 LoC) + core/texture.{h,cpp}: pbrt's
Texture<T> virtual DAG becomes a SoA table evaluated sequentially in
topological order (children have smaller ids — enforced by the builder), then
gathered per lane by texture id.  Image maps live in one flat HBM atlas with
per-texture (offset, w, h) and mip level offsets; lookups are vectorized
gathers (MIPMap, mipmap.h:63-118 — trilinear/EWA filtering arrives with ray
differentials; level-0 bilinear until then).

Types: constant, scale, mix, checkerboard (2D), uv, fbm, wrinkled, windy,
marble, dots, imagemap, bilerp.

Image maps are full MIPMaps (mipmap.h:63-118): the host builds a pow-2
Lanczos-resampled pyramid (MIPMap ctor, mipmap.cpp:88-169) packed into the
flat atlas with per-level (offset, w, h) in `mip_meta`; the device lookup is
width-driven trilinear (MIPMap::Lookup(st, width), mipmap.h:95-101) or
anisotropic filtering along the ellipse major axis (the EWA path,
mipmap.h:103-118 — expressed as N fixed trilinear taps instead of a
data-dependent ellipse raster, the TPU-friendly equivalent).  Screen-space
(dudx,dvdx,dudy,dvdy) come from camera ray differentials
(SurfaceInteraction::ComputeDifferentials, interaction.cpp:160-220).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass
from . import noise as pn

TEX_CONSTANT = 0
TEX_SCALE = 1
TEX_MIX = 2
TEX_CHECKER = 3
TEX_UV = 4
TEX_FBM = 5
TEX_WRINKLED = 6
TEX_WINDY = 7
TEX_MARBLE = 8
TEX_DOTS = 9
TEX_IMAGEMAP = 10
TEX_BILERP = 11

MAX_MIP_LEVELS = 16


@pytree_dataclass
class TextureTable:
    tex_type: jnp.ndarray  # [T]
    c1: jnp.ndarray  # [T,3] first constant (or tex1 fallback)
    c2: jnp.ndarray  # [T,3]
    child1: jnp.ndarray  # [T] sub-texture id or -1
    child2: jnp.ndarray  # [T]
    # 2D mapping (UVMapping2D, texture.h:79): su, sv, du, dv
    map2d: jnp.ndarray  # [T,4]
    w2t: jnp.ndarray  # [T,4,4] 3D texture-space transform
    fparams: jnp.ndarray  # [T,4] misc (octaves/omega/variation...)
    gamma_scale: jnp.ndarray  # [T] post scale
    # image atlas
    atlas: jnp.ndarray  # [A,3]
    img_offset: jnp.ndarray  # [T]
    img_w: jnp.ndarray  # [T]
    img_h: jnp.ndarray  # [T]
    # mip pyramid: per texture, per level (offset, w, h); level 0 == img_*.
    mip_meta: jnp.ndarray  # [T, MAX_MIP_LEVELS, 3] int32
    n_levels: jnp.ndarray  # [T] int32


def empty_table() -> "HostTextureTable":
    return HostTextureTable()


# Image-map wrap modes (mipmap.h:50 ImageWrap), stored in fparams[2].
WRAP_REPEAT = 0
WRAP_BLACK = 1
WRAP_CLAMP = 2


def _lanczos(x, tau=2.0):
    """Lanczos windowed sinc (texture.cpp:28 Lanczos), the MIPMap resample
    reconstruction filter (mipmap.h:137 resampleWeights, filterwidth=2)."""
    x = np.abs(x)
    s = np.where(x < 1e-5, 1.0, np.sin(np.pi * x) / np.maximum(np.pi * x, 1e-20))
    w = np.where(
        x < 1e-5, 1.0,
        np.sin(np.pi * x / tau) / np.maximum(np.pi * x / tau, 1e-20),
    )
    return np.where(x > tau, 0.0, s * w)


def _resample_axis(img, new_n, axis):
    """Separable pow-2 upsample along one axis (MIPMap::resampleWeights,
    mipmap.cpp:88-108): 4 Lanczos taps per output texel, weights normalized,
    clamp boundary."""
    old_n = img.shape[axis]
    if old_n == new_n:
        return img
    centers = (np.arange(new_n) + 0.5) * old_n / new_n
    first = np.floor(centers - 2.0 + 0.5).astype(np.int64)
    offs = np.arange(4)
    idx = first[:, None] + offs[None, :]  # [new_n, 4]
    w = _lanczos((idx + 0.5 - centers[:, None]) / 2.0)
    w /= np.sum(w, axis=1, keepdims=True)
    idx = np.clip(idx, 0, old_n - 1)
    moved = np.moveaxis(img, axis, 0)  # [old_n, ...]
    out = np.einsum("nk,nk...->n...", w.astype(np.float32), moved[idx])
    return np.moveaxis(out, 0, axis)


def _next_pow2(n):
    return 1 << max(0, int(np.ceil(np.log2(max(n, 1)))))


def build_pyramid(img: np.ndarray) -> list[np.ndarray]:
    """MIPMap ctor (mipmap.cpp:88-169): resample to pow-2 resolution with a
    Lanczos-2 filter, then box-average successive half-res levels down to
    1x1."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    w2, h2 = _next_pow2(w), _next_pow2(h)
    if (w2, h2) != (w, h):
        img = _resample_axis(img, w2, 1)
        img = _resample_axis(img, h2, 0)
        h, w = h2, w2
    levels = [img]
    while w > 1 or h > 1:
        nw, nh = max(w // 2, 1), max(h // 2, 1)
        prev = levels[-1]
        # pbrt Texel() clamps (default wrap for pyramid build is repeat but
        # halving pow-2 never reads out of bounds); 4-tap average
        # (mipmap.cpp:158-166).
        px = prev if w == 1 else prev.reshape(h, nw, 2, 3).mean(axis=2)
        if h > 1:
            px = px.reshape(nh, 2, nw, 3).mean(axis=1)
        levels.append(px.astype(np.float32))
        w, h = nw, nh
    return levels


class HostTextureTable:
    """Host-side accumulator; freeze() -> TextureTable."""

    def __init__(self):
        self.rows: list[dict] = []
        self.atlas = [np.zeros((1, 3), np.float32)]
        self.atlas_size = 1

    def add(self, tex_type, c1=(0, 0, 0), c2=(0, 0, 0), child1=-1, child2=-1,
            map2d=(1.0, 1.0, 0.0, 0.0), w2t=None, fparams=(0, 0, 0, 0),
            image=None) -> int:
        row = dict(
            tex_type=tex_type,
            c1=np.asarray(c1, np.float32).reshape(3) if np.ndim(c1) else np.full(3, c1, np.float32),
            c2=np.asarray(c2, np.float32).reshape(3) if np.ndim(c2) else np.full(3, c2, np.float32),
            child1=child1, child2=child2,
            map2d=np.asarray(map2d, np.float32),
            w2t=np.eye(4, dtype=np.float32) if w2t is None else np.asarray(w2t, np.float32),
            fparams=np.asarray(fparams, np.float32),
            img_offset=0, img_w=0, img_h=0,
            mip_meta=np.zeros((MAX_MIP_LEVELS, 3), np.int64), n_levels=0,
        )
        if image is not None:
            img = np.asarray(image, np.float32)
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, -1)
            levels = build_pyramid(img)[:MAX_MIP_LEVELS]
            row["n_levels"] = len(levels)
            for li, lvl in enumerate(levels):
                h, w = lvl.shape[:2]
                row["mip_meta"][li] = (self.atlas_size, w, h)
                if li == 0:
                    row["img_offset"] = self.atlas_size
                    row["img_w"] = w
                    row["img_h"] = h
                self.atlas.append(lvl.reshape(-1, 3))
                self.atlas_size += h * w
        self.rows.append(row)
        return len(self.rows) - 1

    def freeze(self) -> TextureTable:
        rows = self.rows or [dict(
            tex_type=TEX_CONSTANT, c1=np.zeros(3, np.float32),
            c2=np.zeros(3, np.float32), child1=-1, child2=-1,
            map2d=np.array([1, 1, 0, 0], np.float32),
            w2t=np.eye(4, dtype=np.float32),
            fparams=np.zeros(4, np.float32), img_offset=0, img_w=0, img_h=0,
            mip_meta=np.zeros((MAX_MIP_LEVELS, 3), np.int64), n_levels=0,
        )]

        def col(k):
            return np.stack([np.asarray(r[k]) for r in rows])

        return TextureTable(
            tex_type=jnp.asarray(col("tex_type").astype(np.int32)),
            c1=jnp.asarray(col("c1")),
            c2=jnp.asarray(col("c2")),
            child1=jnp.asarray(col("child1").astype(np.int32)),
            child2=jnp.asarray(col("child2").astype(np.int32)),
            map2d=jnp.asarray(col("map2d")),
            w2t=jnp.asarray(col("w2t")),
            fparams=jnp.asarray(col("fparams")),
            gamma_scale=jnp.asarray(np.ones(len(rows), np.float32)),
            atlas=jnp.asarray(np.concatenate(self.atlas)),
            img_offset=jnp.asarray(col("img_offset").astype(np.int32)),
            img_w=jnp.asarray(col("img_w").astype(np.int32)),
            img_h=jnp.asarray(col("img_h").astype(np.int32)),
            mip_meta=jnp.asarray(col("mip_meta").astype(np.int32)),
            n_levels=jnp.asarray(col("n_levels").astype(np.int32)),
        )


def _bilinear_at(table: TextureTable, off, w, h, uv, wrap: int):
    """Bilinear lookup given per-lane (offset, w, h) — one mip level
    (MIPMap::triangle, mipmap.cpp:171-183).  `wrap` is static
    (ImageWrap, mipmap.h:50)."""
    wf = jnp.maximum(w, 1).astype(jnp.float32)
    hf = jnp.maximum(h, 1).astype(jnp.float32)
    # pbrt v-flip: image rows top-down, v=0 at bottom (imagemap convention).
    x = uv[..., 0] * wf - 0.5
    y = (1.0 - uv[..., 1]) * hf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    def fetch(xi, yi):
        if wrap == WRAP_CLAMP:
            xi = jnp.clip(xi, 0, jnp.maximum(w - 1, 0))
            yi = jnp.clip(yi, 0, jnp.maximum(h - 1, 0))
            inside = jnp.ones(xi.shape, bool)
        elif wrap == WRAP_BLACK:
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi = jnp.clip(xi, 0, jnp.maximum(w - 1, 0))
            yi = jnp.clip(yi, 0, jnp.maximum(h - 1, 0))
        else:  # repeat
            xi = jnp.mod(xi, jnp.maximum(w, 1))
            yi = jnp.mod(yi, jnp.maximum(h, 1))
            inside = jnp.ones(xi.shape, bool)
        v = table.atlas[off + yi * w + xi]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = fetch(x0, y0)
    v10 = fetch(x0 + 1, y0)
    v01 = fetch(x0, y0 + 1)
    v11 = fetch(x0 + 1, y0 + 1)
    return (
        (1 - fx)[..., None] * ((1 - fy)[..., None] * v00 + fy[..., None] * v01)
        + fx[..., None] * ((1 - fy)[..., None] * v10 + fy[..., None] * v11)
    )


def _bilinear_lookup(table: TextureTable, t: int, uv, wrap: int = WRAP_REPEAT):
    """Level-0 bilinear image lookup (the no-differentials fast path)."""
    return _bilinear_at(
        table, table.img_offset[t], table.img_w[t], table.img_h[t], uv, wrap
    )


def _bilinear_level(table: TextureTable, t: int, uv, level, wrap: int):
    """Bilinear at a per-lane integer mip level."""
    meta = table.mip_meta[t, level]  # [N, 3]
    return _bilinear_at(
        table, meta[..., 0], meta[..., 1], meta[..., 2], uv, wrap
    )


def _trilinear_lookup(table, t, uv, width, n_levels: int, wrap: int):
    """MIPMap::Lookup(st, width) (mipmap.cpp:187-199): level =
    nLevels-1+log2(max(width,eps)), lerp between the two bracketing levels."""
    level = (n_levels - 1) + jnp.log2(jnp.maximum(width, 1e-8))
    level = jnp.clip(level, 0.0, n_levels - 1)
    l0 = jnp.floor(level).astype(jnp.int32)
    dl = (level - l0)[..., None]
    v0 = _bilinear_level(table, t, uv, l0, wrap)
    v1 = _bilinear_level(
        table, t, uv, jnp.minimum(l0 + 1, n_levels - 1), wrap
    )
    return (1.0 - dl) * v0 + dl * v1


_ANISO_TAPS = 8


def _aniso_lookup(table, t, uv, dst0, dst1, n_levels: int, wrap: int,
                  max_aniso: float):
    """EWA-equivalent anisotropic filtering (MIPMap::Lookup(st, dst0, dst1) +
    EWA, mipmap.cpp:203-260): clamp ellipse eccentricity to maxAnisotropy,
    pick the level where the minor axis spans ~1 texel, then integrate along
    the major axis.  The data-dependent ellipse raster of EWA() becomes
    _ANISO_TAPS fixed trilinear taps with Gaussian (alpha=2) weights — same
    footprint and falloff, static control flow for XLA."""
    len0 = jnp.sqrt(jnp.sum(dst0 * dst0, -1))
    len1 = jnp.sqrt(jnp.sum(dst1 * dst1, -1))
    swap = len1 > len0
    major = jnp.where(swap[..., None], dst1, dst0)
    major_len = jnp.where(swap, len1, len0)
    minor_len = jnp.where(swap, len0, len1)
    # Clamp eccentricity (mipmap.cpp:208-214).
    scale_minor = major_len / jnp.maximum(minor_len * max_aniso, 1e-20)
    minor_len = jnp.where(
        (minor_len * max_aniso < major_len) & (minor_len > 0.0),
        minor_len * scale_minor, minor_len,
    )
    taps = (jnp.arange(_ANISO_TAPS, dtype=jnp.float32) + 0.5) / _ANISO_TAPS * 2.0 - 1.0
    wts = jnp.exp(-2.0 * taps * taps) - jnp.exp(-2.0)
    wts = wts / jnp.sum(wts)
    out = 0.0
    for i in range(_ANISO_TAPS):
        st_i = uv + major * taps[i]
        out = out + wts[i] * _trilinear_lookup(
            table, t, st_i, jnp.maximum(minor_len, 1e-8), n_levels, wrap
        )
    return out


def evaluate_textures(table: TextureTable, uv, p_world, active_ids=None,
                      tex_meta=None, duvdx=None, duvdy=None):
    """Evaluate every texture row for the batch; returns [T, N, 3].

    Children must have smaller ids (the scene compiler guarantees this), so a
    single forward pass resolves the DAG.  `active_ids` (static tuple) limits
    evaluation to rows actually referenced by materials.  `tex_meta` is the
    STATIC per-row (type, child1, child2, fparams, n_levels) control-flow
    info (SceneStatics); required under jit (the device arrays are tracers
    there).  `duvdx`/`duvdy` ([N,2], optional) are the screen-space uv
    differentials (interaction.cpp:160-220) driving mip selection; None means
    no differentials (inner bounces) -> level-0 bilinear, matching pbrt's
    width-0 lookups on rays without differentials.
    """
    import numpy as np_

    T = int(table.tex_type.shape[0])
    n = uv.shape[0]
    if tex_meta is not None:
        ttypes = [m[0] for m in tex_meta]
        child1 = [m[1] for m in tex_meta]
        child2 = [m[2] for m in tex_meta]
        fparams = [m[3] for m in tex_meta]
        n_levels = [m[4] if len(m) > 4 else 0 for m in tex_meta]
    else:
        ttypes = np_.asarray(table.tex_type)
        child1 = np_.asarray(table.child1)
        child2 = np_.asarray(table.child2)
        fparams = np_.asarray(table.fparams)
        n_levels = np_.asarray(table.n_levels)
    needed = set(range(T)) if active_ids is None else set(active_ids)
    # include children transitively
    frontier = list(needed)
    while frontier:
        t = frontier.pop()
        for c in (child1[t], child2[t]):
            if c >= 0 and c not in needed:
                needed.add(int(c))
                frontier.append(int(c))

    vals = [None] * T
    zeros = jnp.zeros((n, 3), jnp.float32)
    for t in range(T):
        if t not in needed:
            vals[t] = zeros
            continue
        tt = int(ttypes[t])
        m = table.map2d[t]
        st = jnp.stack(
            [uv[..., 0] * m[0] + m[2], uv[..., 1] * m[1] + m[3]], -1
        )
        p_tex = jnp.einsum(
            "ij,nj->ni", table.w2t[t, :3, :3], p_world
        ) + table.w2t[t, :3, 3]

        def child(cid):
            return vals[int(cid)] if cid >= 0 else None

        if tt == TEX_CONSTANT:
            v = jnp.broadcast_to(table.c1[t], (n, 3))
        elif tt == TEX_SCALE:
            a = child(child1[t])
            a = a if a is not None else jnp.broadcast_to(table.c1[t], (n, 3))
            b = child(child2[t])
            b = b if b is not None else jnp.broadcast_to(table.c2[t], (n, 3))
            v = a * b
        elif tt == TEX_MIX:
            a = child(child1[t])
            a = a if a is not None else jnp.broadcast_to(table.c1[t], (n, 3))
            b = child(child2[t])
            b = b if b is not None else jnp.broadcast_to(table.c2[t], (n, 3))
            amt = float(fparams[t][0])
            v = (1.0 - amt) * a + amt * b
        elif tt == TEX_CHECKER:
            a = child(child1[t])
            a = a if a is not None else jnp.broadcast_to(table.c1[t], (n, 3))
            b = child(child2[t])
            b = b if b is not None else jnp.broadcast_to(table.c2[t], (n, 3))
            par = (
                jnp.floor(st[..., 0]).astype(jnp.int32)
                + jnp.floor(st[..., 1]).astype(jnp.int32)
            ) % 2
            v = jnp.where((par == 0)[..., None], a, b)
        elif tt == TEX_UV:
            v = jnp.stack(
                [st[..., 0] % 1.0, st[..., 1] % 1.0, jnp.zeros(n)], -1
            )
        elif tt == TEX_FBM:
            octaves = int(fparams[t][0]) or 6
            omega = float(fparams[t][1]) or 0.5
            v = pn.fbm(p_tex, omega=omega, max_octaves=octaves)[..., None].repeat(3, -1)
        elif tt == TEX_WRINKLED:
            octaves = int(fparams[t][0]) or 6
            omega = float(fparams[t][1]) or 0.5
            v = pn.turbulence(p_tex, omega=omega, max_octaves=octaves)[..., None].repeat(3, -1)
        elif tt == TEX_WINDY:
            # windy.h: FBm(0.1*p) * |FBm(p)|
            strength = pn.fbm(0.1 * p_tex, max_octaves=3)
            height = pn.fbm(p_tex, max_octaves=6)
            v = (jnp.abs(strength) * height)[..., None].repeat(3, -1)
        elif tt == TEX_MARBLE:
            # marble.h: sin + spline through marble colors.
            scale = float(fparams[t][2]) or 1.0
            variation = float(fparams[t][3]) or 0.2
            octaves = int(fparams[t][0]) or 8
            omega = float(fparams[t][1]) or 0.5
            marble = p_tex[..., 1] * scale + variation * pn.fbm(
                scale * p_tex, omega=omega, max_octaves=octaves
            )
            tt_ = 0.5 + 0.5 * jnp.sin(marble)
            c = jnp.asarray(
                [
                    [0.58, 0.58, 0.6], [0.58, 0.58, 0.6], [0.58, 0.58, 0.6],
                    [0.5, 0.5, 0.5], [0.6, 0.59, 0.58], [0.58, 0.58, 0.6],
                    [0.58, 0.58, 0.6], [0.2, 0.2, 0.33], [0.58, 0.58, 0.6],
                ],
                jnp.float32,
            )
            nc = c.shape[0] - 3
            first = jnp.clip((tt_ * nc).astype(jnp.int32), 0, nc - 1)
            tloc = tt_ * nc - first.astype(jnp.float32)
            c0 = c[first]
            c1_ = c[first + 1]
            c2_ = c[first + 2]
            c3_ = c[first + 3]
            # pbrt's repeated lerp spline (marble.h:79-87).
            s0 = (1 - tloc)[..., None] * c0 + tloc[..., None] * c1_
            s1 = (1 - tloc)[..., None] * c1_ + tloc[..., None] * c2_
            s2 = (1 - tloc)[..., None] * c2_ + tloc[..., None] * c3_
            s0 = (1 - tloc)[..., None] * s0 + tloc[..., None] * s1
            s1 = (1 - tloc)[..., None] * s1 + tloc[..., None] * s2
            v = 1.5 * ((1 - tloc)[..., None] * s0 + tloc[..., None] * s1)
        elif tt == TEX_DOTS:
            a = child(child1[t])
            a = a if a is not None else jnp.broadcast_to(table.c1[t], (n, 3))  # inside
            b = child(child2[t])
            b = b if b is not None else jnp.broadcast_to(table.c2[t], (n, 3))
            s_cell = jnp.floor(st[..., 0] + 0.5)
            t_cell = jnp.floor(st[..., 1] + 0.5)
            cell = jnp.stack([s_cell, t_cell, jnp.zeros(n)], -1)
            has_dot = pn.noise(cell + 0.5) > 0.0
            rad = 0.35
            maxshift = 0.5 - rad
            cx = s_cell + maxshift * pn.noise(cell + jnp.asarray([1.5, 2.8, 0.0]))
            cy = t_cell + maxshift * pn.noise(cell + jnp.asarray([4.5, 9.8, 0.0]))
            ds = st[..., 0] - cx
            dt = st[..., 1] - cy
            inside = has_dot & (ds * ds + dt * dt < rad * rad)
            v = jnp.where(inside[..., None], a, b)
        elif tt == TEX_IMAGEMAP:
            # fparams: (trilerp, maxanisotropy, wrap, _) — imagemap.h:51-104.
            wrap = int(fparams[t][2])
            nl = int(n_levels[t])
            if duvdx is None or duvdy is None or nl <= 1:
                v = _bilinear_lookup(table, t, st, wrap)
            else:
                # UVMapping2D::Map scales differentials by (su, sv)
                # (texture.cpp:44-56).
                dstdx = duvdx * m[:2]
                dstdy = duvdy * m[:2]
                if int(fparams[t][0]):  # "trilinear" true
                    width = 2.0 * jnp.maximum(
                        jnp.max(jnp.abs(dstdx), -1), jnp.max(jnp.abs(dstdy), -1)
                    )
                    v = _trilinear_lookup(table, t, st, width, nl, wrap)
                else:
                    ma = float(fparams[t][1]) or 8.0
                    v = _aniso_lookup(table, t, st, dstdx, dstdy, nl, wrap, ma)
            v = v * table.c1[t]
        elif tt == TEX_BILERP:
            # bilerp.h: corner values v00=c1, v11=c2 (v01/v10 in fparams-ish);
            # simplified: lerp between c1 and c2 by uv.
            fx = st[..., 0] % 1.0
            fy = st[..., 1] % 1.0
            v = ((1 - fx) * (1 - fy) + fx * fy)[..., None] * table.c1[t] + (
                (1 - fx) * fy + fx * (1 - fy)
            )[..., None] * table.c2[t]
        else:
            v = zeros
        vals[t] = v
    return jnp.stack(vals)  # [T, N, 3]


def gather_texture(values, tex_id, constant):
    """Per-lane parameter resolve: texture value if tex_id >= 0 else const."""
    tid = jnp.clip(tex_id, 0, values.shape[0] - 1)
    lane = jnp.arange(tex_id.shape[0])
    tex_v = values[tid, lane]
    return jnp.where((tex_id >= 0)[..., None], tex_v, constant)
