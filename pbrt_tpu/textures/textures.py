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


def empty_table() -> "HostTextureTable":
    return HostTextureTable()


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
        )
        if image is not None:
            img = np.asarray(image, np.float32)
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, -1)
            h, w = img.shape[:2]
            row["img_offset"] = self.atlas_size
            row["img_w"] = w
            row["img_h"] = h
            self.atlas.append(img.reshape(-1, 3))
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
        )


def _bilinear_lookup(table: TextureTable, t: int, uv):
    """Level-0 bilinear image lookup with repeat wrap (mipmap.h triangle())."""
    w = table.img_w[t]
    h = table.img_h[t]
    off = table.img_offset[t]
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
        xi = jnp.mod(xi, jnp.maximum(w, 1))
        yi = jnp.mod(yi, jnp.maximum(h, 1))
        return table.atlas[off + yi * w + xi]

    v00 = fetch(x0, y0)
    v10 = fetch(x0 + 1, y0)
    v01 = fetch(x0, y0 + 1)
    v11 = fetch(x0 + 1, y0 + 1)
    return (
        (1 - fx)[..., None] * ((1 - fy)[..., None] * v00 + fy[..., None] * v01)
        + fx[..., None] * ((1 - fy)[..., None] * v10 + fy[..., None] * v11)
    )


def evaluate_textures(table: TextureTable, uv, p_world, active_ids=None,
                      tex_meta=None):
    """Evaluate every texture row for the batch; returns [T, N, 3].

    Children must have smaller ids (the scene compiler guarantees this), so a
    single forward pass resolves the DAG.  `active_ids` (static tuple) limits
    evaluation to rows actually referenced by materials.  `tex_meta` is the
    STATIC per-row (type, child1, child2) control-flow info (SceneStatics);
    required under jit (the device arrays are tracers there).
    """
    import numpy as np_

    T = int(table.tex_type.shape[0])
    n = uv.shape[0]
    if tex_meta is not None:
        ttypes = [m[0] for m in tex_meta]
        child1 = [m[1] for m in tex_meta]
        child2 = [m[2] for m in tex_meta]
        fparams = [m[3] for m in tex_meta]
    else:
        ttypes = np_.asarray(table.tex_type)
        child1 = np_.asarray(table.child1)
        child2 = np_.asarray(table.child2)
        fparams = np_.asarray(table.fparams)
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
            v = _bilinear_lookup(table, t, st) * table.c1[t]
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
