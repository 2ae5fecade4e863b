"""Film: filtered radiance accumulation into image arrays.

TPU re-expression of core/film.{h,cpp}: pbrt accumulates per-tile under a
mutex with a 16x16 filter LUT (film.h:121-152, film.cpp:66-76, 117); here the
film is a dense `f32[H, W, ...]` pytree updated with masked scatter-adds from
flat sample batches — the whole image is one "tile", and cross-device merge is
a `psum` (SURVEY.md P3).

Parity notes (SURVEY.md §7):
  * filter weights come from the LUT discretization, not analytic evaluation;
  * XYZ accumulation: pbrt converts RGB->XYZ at AddSample (film.h:121) and
    back at WriteImage (film.cpp:169-254).  Both conversions are linear, so
    accumulating in RGB and converting never (RGB in == RGB out) is
    mathematically identical up to f32 rounding; we accumulate RGB directly.
  * sample bounds extend pixel bounds by filter radius around +0.5 centers
    (film.cpp:77-84).
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from .core.pytree import pytree_dataclass, static_field
from .core import spectrum
from .filters import Filter

FILTER_TABLE_WIDTH = 16  # film.h:91 filterTableWidth


@dataclasses.dataclass(frozen=True)
class FilmConfig:
    """Host-side film description (core/film.h Film)."""

    full_resolution: tuple  # (xres, yres)
    crop_window: tuple = (0.0, 1.0, 0.0, 1.0)  # (x0, x1, y0, y1)
    filter_name: str = "box"
    filter_radius: tuple = (0.5, 0.5)
    scale: float = 1.0
    max_sample_luminance: float = float("inf")
    diagonal_m: float = 0.035

    @property
    def cropped_pixel_bounds(self):
        """(film.cpp:53-60): pixel bounds after crop."""
        xr, yr = self.full_resolution
        x0, x1, y0, y1 = self.crop_window
        px0 = int(math.ceil(xr * x0))
        px1 = min(int(math.ceil(xr * x1)), xr)
        py0 = int(math.ceil(yr * y0))
        py1 = min(int(math.ceil(yr * y1)), yr)
        return (px0, px1, py0, py1)

    @property
    def sample_bounds(self):
        """(film.cpp:77-84 GetSampleBounds) pixel bounds grown by radius."""
        px0, px1, py0, py1 = self.cropped_pixel_bounds
        rx, ry = self.filter_radius
        return (
            int(math.floor(px0 + 0.5 - rx)),
            int(math.ceil(px1 - 0.5 + rx)),
            int(math.floor(py0 + 0.5 - ry)),
            int(math.ceil(py1 - 0.5 + ry)),
        )


@pytree_dataclass
class FilmState:
    """Device-side accumulation arrays.

    weighted_sum: [H, W, 3] sum of filterWeight * L (RGB)
    weight_sum:   [H, W]    sum of filterWeight (film.h Pixel::filterWeightSum)
    splat:        [H, W, 3] unweighted splats (film.cpp:142 AddSplat)
    """

    weighted_sum: jnp.ndarray
    weight_sum: jnp.ndarray
    splat: jnp.ndarray
    # Static footprint/geometry config baked into the jitted update:
    x0: int = static_field(default=0)
    y0: int = static_field(default=0)
    filter_table: jnp.ndarray = None
    inv_radius: jnp.ndarray = None
    footprint: int = static_field(default=1)
    # True when every filter-LUT entry is identical (box): add_samples then
    # skips the per-cell LUT gather (values unchanged).
    lut_constant: bool = static_field(default=False)
    max_sample_luminance: jnp.ndarray = None  # film.h:124 firefly clamp


def build_filter_table(filt: Filter) -> np.ndarray:
    """16x16 LUT of filter values at cell centers (film.cpp:66-76)."""
    w = FILTER_TABLE_WIDTH
    rx, ry = filt.radius
    ys, xs = np.meshgrid(
        (np.arange(w) + 0.5) * ry / w, (np.arange(w) + 0.5) * rx / w, indexing="ij"
    )
    return filt.evaluate(xs.ravel(), ys.ravel()).reshape(w, w).astype(np.float32)


def make_film_state(config: FilmConfig, filt: Filter) -> FilmState:
    px0, px1, py0, py1 = config.cropped_pixel_bounds
    w = px1 - px0
    h = py1 - py0
    rx, ry = filt.radius
    # Worst-case pixels covered per axis: floor(pd + r) - ceil(pd - r) + 1.
    footprint = int(math.floor(2 * max(rx, ry))) + 1
    return FilmState(
        weighted_sum=jnp.zeros((h, w, 3), jnp.float32),
        weight_sum=jnp.zeros((h, w), jnp.float32),
        splat=jnp.zeros((h, w, 3), jnp.float32),
        x0=px0,
        y0=py0,
        filter_table=jnp.asarray(build_filter_table(filt)),
        lut_constant=bool(
            (lambda t: np.all(t == t.flat[0]))(build_filter_table(filt))
        ),
        inv_radius=jnp.asarray([1.0 / rx, 1.0 / ry], jnp.float32),
        footprint=footprint,
        max_sample_luminance=jnp.float32(
            config.max_sample_luminance
            if math.isfinite(config.max_sample_luminance) else 3.4e38
        ),
    )


def add_samples(state: FilmState, p_film, L, sample_weight=None, mask=None):
    """FilmTile::AddSample (film.h:121-152) over a flat sample batch.

    p_film: [N, 2] continuous film coords; L: [N, 3] RGB radiance;
    sample_weight: [N] camera ray weights; mask: [N] live-sample mask.
    """
    n = p_film.shape[0]
    if sample_weight is None:
        sample_weight = jnp.ones((n,), jnp.float32)
    if mask is None:
        mask = jnp.ones((n,), bool)

    h, w = state.weight_sum.shape
    ftw = FILTER_TABLE_WIDTH

    # NaN / inf / negative radiance -> black (integrator.cpp:294-315 contract
    # is enforced by the integrator; film clamps luminance here, film.h:124).
    lum = spectrum.luminance(L)
    L = jnp.where(jnp.isfinite(lum)[..., None], L, 0.0)
    # maxSampleLuminance firefly clamp (film.h:124-125): scale L so its
    # luminance does not exceed the configured bound.
    ml = state.max_sample_luminance
    over = lum > ml
    L = jnp.where(over[..., None], L * (ml / jnp.maximum(lum, 1e-12))[..., None], L)

    pd = p_film - 0.5  # discrete coords (film.h:126)
    radius = 1.0 / state.inv_radius
    p0 = jnp.ceil(pd - radius).astype(jnp.int32)
    F = state.footprint
    fo = jnp.arange(F, dtype=jnp.int32)

    # Per-axis filter table offsets for each footprint cell (film.h:134-145).
    px = p0[:, 0:1] + fo[None, :]  # [N, F]
    py = p0[:, 1:2] + fo[None, :]
    fx = jnp.minimum(
        jnp.abs((px.astype(jnp.float32) - pd[:, 0:1]) * state.inv_radius[0] * ftw)
        .astype(jnp.int32),
        ftw - 1,
    )
    fy = jnp.minimum(
        jnp.abs((py.astype(jnp.float32) - pd[:, 1:2]) * state.inv_radius[1] * ftw)
        .astype(jnp.int32),
        ftw - 1,
    )
    in_x = jnp.abs(px.astype(jnp.float32) - pd[:, 0:1]) <= radius[0]
    in_y = jnp.abs(py.astype(jnp.float32) - pd[:, 1:2]) <= radius[1]

    # Cross product of footprint cells: [N, F, F]
    if state.lut_constant:
        # Box filter: every LUT entry is the same value, so the per-cell
        # [N,F,F] table gather (per-element gathers cost ~10ns on this
        # backend — round-5 measurement) collapses to a broadcast scalar.
        wxy = jnp.broadcast_to(
            state.filter_table[0, 0], (n, F, F)
        )
    else:
        wxy = state.filter_table[fy[:, :, None], fx[:, None, :]]  # [N, Fy, Fx]
    ix = px[:, None, :] - state.x0  # [N, 1, Fx] broadcast
    iy = py[:, :, None] - state.y0
    valid = (
        mask[:, None, None]
        & in_x[:, None, :]
        & in_y[:, :, None]
        & (ix >= 0)
        & (ix < w)
        & (iy >= 0)
        & (iy < h)
    )
    wgt = jnp.where(valid, wxy * sample_weight[:, None, None], 0.0)
    ixc = jnp.clip(ix, 0, w - 1) + jnp.zeros_like(iy)
    iyc = jnp.clip(iy, 0, h - 1) + jnp.zeros_like(ix)

    # Scatter with the MULTI-DIM [N,F,F] index/source operands directly:
    # a `.reshape(-1)` on a scatter operand sends this backend's compiler
    # down a pathological path (+50s compile PER reshaped operand; measured
    # round 4: reshaped film scatter 161s vs 7s multi-dim — the single
    # largest piece of the render step's compile time).
    flat_idx = iyc * w + ixc  # [N, F, F]
    contrib = wgt[..., None] * L[:, None, None, :]  # [N, F, F, 3]
    weighted = state.weighted_sum.reshape(-1, 3).at[flat_idx].add(contrib)
    weights = state.weight_sum.reshape(-1).at[flat_idx].add(wgt)
    return state.replace(
        weighted_sum=weighted.reshape(h, w, 3), weight_sum=weights.reshape(h, w)
    )


def add_splats(state: FilmState, p_film, v, mask=None):
    """Film::AddSplat (film.cpp:142) — unfiltered additive splats."""
    h, w = state.weight_sum.shape
    ix = jnp.floor(p_film[:, 0]).astype(jnp.int32) - state.x0
    iy = jnp.floor(p_film[:, 1]).astype(jnp.int32) - state.y0
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    if mask is not None:
        valid = valid & mask
    lum = spectrum.luminance(v)
    v = jnp.where((jnp.isfinite(lum) & valid)[..., None], v, 0.0)
    flat_idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    splat = state.splat.reshape(-1, 3).at[flat_idx].add(v)
    return state.replace(splat=splat.reshape(h, w, 3))


def to_image(state: FilmState, scale: float = 1.0, splat_scale: float = 1.0):
    """Film::WriteImage (film.cpp:169-254): normalize + splats + scale."""
    inv_w = jnp.where(
        state.weight_sum > 0.0, 1.0 / jnp.maximum(state.weight_sum, 1e-30), 0.0
    )
    rgb = jnp.maximum(state.weighted_sum * inv_w[..., None], 0.0)
    rgb = rgb + splat_scale * state.splat
    return rgb * scale


def merge(a: FilmState, b: FilmState) -> FilmState:
    """Film::MergeFilmTile analog — film states are additive."""
    return a.replace(
        weighted_sum=a.weighted_sum + b.weighted_sum,
        weight_sum=a.weight_sum + b.weight_sum,
        splat=a.splat + b.splat,
    )
