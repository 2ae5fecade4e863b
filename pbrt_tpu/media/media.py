"""Participating media: homogeneous + density-grid, HG phase function.

TPU re-expression of core/medium.{h,cpp} + src/media/: media become a SoA
table {type, sigma_a, sigma_s, g, grid atlas}; Medium::Sample and Medium::Tr
become masked batch kernels.  Homogeneous uses the closed forms
(homogeneous.cpp:44-77: channel-uniform exponential distance sampling with
the pdf averaged over channels); the grid medium uses delta tracking for
sampling and ratio tracking for Tr (grid.cpp:62-112) as bounded lax loops
with a counter-hashed PCG-style RNG (pbrt consumes an unbounded number of
sampler dims there; a stateless counter RNG is the wavefront equivalent).

Henyey-Greenstein phase function: p/Sample_p (medium.h:50-101, medium.cpp HG).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import vecmath as vm

from ..core.pytree import pytree_dataclass
from ..core.vecmath import coordinate_system, dot, normalize, vec
from ..core.sampling import INV_4PI

MEDIUM_NONE = -1
MEDIUM_HOMOGENEOUS = 0
MEDIUM_GRID = 1

_INV_2_32 = 2.3283064365386963e-10


@pytree_dataclass
class MediumTable:
    med_type: jnp.ndarray  # [M] i32
    sigma_a: jnp.ndarray  # [M,3]
    sigma_s: jnp.ndarray  # [M,3]
    g: jnp.ndarray  # [M]
    # grid media
    w2m: jnp.ndarray  # [M,4,4] world -> medium (unit-cube) space
    grid_offset: jnp.ndarray  # [M]
    grid_nx: jnp.ndarray  # [M]
    grid_ny: jnp.ndarray  # [M]
    grid_nz: jnp.ndarray  # [M]
    inv_max_density: jnp.ndarray  # [M]
    density_atlas: jnp.ndarray  # [A]


class HostMediumTable:
    def __init__(self):
        self.rows: list[dict] = []
        self.atlas = [np.zeros(1, np.float32)]
        self.size = 1

    def add_homogeneous(self, sigma_a, sigma_s, g=0.0) -> int:
        self.rows.append(
            dict(
                med_type=MEDIUM_HOMOGENEOUS,
                sigma_a=np.asarray(sigma_a, np.float32),
                sigma_s=np.asarray(sigma_s, np.float32),
                g=float(g),
                w2m=np.eye(4, dtype=np.float32),
                grid_offset=0, grid_nx=0, grid_ny=0, grid_nz=0,
                inv_max_density=0.0,
            )
        )
        return len(self.rows) - 1

    def add_grid(self, sigma_a, sigma_s, g, nx, ny, nz, density, w2m=None) -> int:
        density = np.asarray(density, np.float32).reshape(-1)
        assert density.size == nx * ny * nz
        off = self.size
        self.atlas.append(density)
        self.size += density.size
        self.rows.append(
            dict(
                med_type=MEDIUM_GRID,
                sigma_a=np.asarray(sigma_a, np.float32),
                sigma_s=np.asarray(sigma_s, np.float32),
                g=float(g),
                w2m=np.eye(4, dtype=np.float32) if w2m is None else np.asarray(w2m, np.float32),
                grid_offset=off, grid_nx=nx, grid_ny=ny, grid_nz=nz,
                inv_max_density=1.0 / max(float(density.max()), 1e-9),
            )
        )
        return len(self.rows) - 1

    def freeze(self) -> MediumTable:
        rows = self.rows or [
            dict(
                med_type=MEDIUM_HOMOGENEOUS,
                sigma_a=np.zeros(3, np.float32),
                sigma_s=np.zeros(3, np.float32),
                g=0.0, w2m=np.eye(4, dtype=np.float32),
                grid_offset=0, grid_nx=0, grid_ny=0, grid_nz=0,
                inv_max_density=0.0,
            )
        ]

        def col(k):
            return np.stack([np.asarray(r[k]) for r in rows])

        return MediumTable(
            med_type=jnp.asarray(col("med_type").astype(np.int32)),
            sigma_a=jnp.asarray(col("sigma_a")),
            sigma_s=jnp.asarray(col("sigma_s")),
            g=jnp.asarray(col("g").astype(np.float32)),
            w2m=jnp.asarray(col("w2m")),
            grid_offset=jnp.asarray(col("grid_offset").astype(np.int32)),
            grid_nx=jnp.asarray(col("grid_nx").astype(np.int32)),
            grid_ny=jnp.asarray(col("grid_ny").astype(np.int32)),
            grid_nz=jnp.asarray(col("grid_nz").astype(np.int32)),
            inv_max_density=jnp.asarray(col("inv_max_density").astype(np.float32)),
            density_atlas=jnp.asarray(np.concatenate(self.atlas)),
        )


# ---------------------------------------------------------------------------
# Henyey-Greenstein phase function (medium.h:50-101)
# ---------------------------------------------------------------------------

def hg_p(cos_theta, g):
    """PhaseHG (medium.h:62)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / (denom * jnp.sqrt(jnp.maximum(denom, 1e-8)))


def hg_sample(wo, u, g):
    """HenyeyGreenstein::Sample_p (medium.cpp:92-116).

    Returns (wi, pdf=p).  Note pbrt's convention: the sampled angle is
    relative to wo with cosTheta flipped (dot(wi, wo) = -cosTheta... see
    medium.cpp:104 SphericalDirection(-wo base)).
    """
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3 * jnp.sign(g + 1e-9), g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 + g_safe - 2.0 * g_safe * u[..., 0])
    cos_theta_g = -(1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    cos_theta = jnp.where(
        jnp.abs(g) < 1e-3, 1.0 - 2.0 * u[..., 0], cos_theta_g
    )
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u[..., 1]
    v1, v2 = coordinate_system(wo)
    wi = (
        (sin_theta * jnp.cos(phi))[..., None] * v1
        + (sin_theta * jnp.sin(phi))[..., None] * v2
        + cos_theta[..., None] * wo
    )
    return wi, hg_p(cos_theta, g)


# ---------------------------------------------------------------------------
# Counter-hash RNG for tracking loops
# ---------------------------------------------------------------------------

def _mix(x):
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _rand(key, ctr):
    return jnp.minimum(
        _mix(key ^ _mix(ctr)).astype(jnp.float32) * jnp.float32(_INV_2_32),
        0.99999994,
    )


# ---------------------------------------------------------------------------
# Homogeneous medium (media/homogeneous.cpp)
# ---------------------------------------------------------------------------

def homogeneous_tr(sigma_t, dist):
    """Tr = exp(-sigma_t * d) (homogeneous.cpp:44)."""
    return jnp.exp(-jnp.clip(sigma_t * dist[..., None], 0.0, 80.0))


def homogeneous_sample(sigma_a, sigma_s, t_max, u_channel, u_dist):
    """HomogeneousMedium::Sample (homogeneous.cpp:49-77).

    Returns dict: sampled_medium (bool), t, tr_weight [N,3] (beta multiplier
    = Tr * sigma_s / pdf for medium events, Tr / pdf for surface events).
    """
    sigma_t = sigma_a + sigma_s
    channel = jnp.clip((u_channel * 3).astype(jnp.int32), 0, 2)
    sig_c = vm.component3(sigma_t, channel)  # select, not per-lane gather
    dist = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-10)) / jnp.maximum(sig_c, 1e-20)
    t = jnp.minimum(dist, t_max)
    sampled_medium = (dist < t_max) & (sig_c > 0.0)
    tr = jnp.exp(-jnp.clip(sigma_t * t[..., None], 0.0, 80.0))
    # pdf averaged over channels (homogeneous.cpp:66-76).
    density = jnp.where(sampled_medium[..., None], sigma_t * tr, tr)
    pdf = jnp.mean(density, axis=-1)
    pdf = jnp.where(pdf == 0.0, 1.0, pdf)
    w = tr / pdf[..., None]
    w = jnp.where(sampled_medium[..., None], w * sigma_s, w)
    return {"sampled_medium": sampled_medium, "t": t, "weight": w}


# ---------------------------------------------------------------------------
# Grid medium (media/grid.cpp) — delta/ratio tracking
# ---------------------------------------------------------------------------

def _grid_density(med: MediumTable, mid, p_med):
    """Trilinear density lookup in medium space [0,1]^3 (grid.cpp:46-60)."""
    nx = med.grid_nx[mid]
    ny = med.grid_ny[mid]
    nz = med.grid_nz[mid]
    off = med.grid_offset[mid]
    ps = jnp.stack(
        [
            p_med[..., 0] * nx.astype(jnp.float32) - 0.5,
            p_med[..., 1] * ny.astype(jnp.float32) - 0.5,
            p_med[..., 2] * nz.astype(jnp.float32) - 0.5,
        ],
        -1,
    )
    pi = jnp.floor(ps).astype(jnp.int32)
    d = ps - pi

    def at(dx, dy, dz):
        x = pi[..., 0] + dx
        y = pi[..., 1] + dy
        z = pi[..., 2] + dz
        ok = (
            (x >= 0) & (x < nx) & (y >= 0) & (y < ny) & (z >= 0) & (z < nz)
        )
        idx = off + (z * ny + y) * nx + x
        idx = jnp.clip(idx, 0, med.density_atlas.shape[0] - 1)
        return jnp.where(ok, med.density_atlas[idx], 0.0)

    def lerp(t, a, b):
        return a + t * (b - a)

    d00 = lerp(d[..., 0], at(0, 0, 0), at(1, 0, 0))
    d10 = lerp(d[..., 0], at(0, 1, 0), at(1, 1, 0))
    d01 = lerp(d[..., 0], at(0, 0, 1), at(1, 0, 1))
    d11 = lerp(d[..., 0], at(0, 1, 1), at(1, 1, 1))
    d0 = lerp(d[..., 1], d00, d10)
    d1 = lerp(d[..., 1], d01, d11)
    return lerp(d[..., 2], d0, d1)


def grid_sample(med: MediumTable, mid, o, dvec, t_max, key, max_steps=256,
                u_tab=None):
    """GridDensityMedium::Sample (grid.cpp:62-87) — delta tracking.

    o, dvec in world; transformed by w2m per lane.  sigma_t is scalar
    (pbrt requires spectrally-uniform sigma_t for the grid medium).
    Returns dict: sampled_medium, t (world units), weight [N,3].

    u_tab [N, 2K] (optional): sampler-dim uniforms for the first K tracking
    steps (pbrt draws sampler.Get1D() per step, grid.cpp:73-74); steps
    beyond K fall back to the counter-hash stream (bounded-schedule
    truncation — pbrt's consumption there is data-dependent/unbounded).
    Per-draw alignment caveat: this loop consumes 2 table uniforms per
    step unconditionally, while pbrt breaks out of the loop on escape
    (t >= tMax) BEFORE its second Get1D — so a lane whose step escapes
    consumes 1 dim where we consume 2, and later steps' dims shift by one
    on that lane.  Alignment is exact only up to a lane's first escaping
    step; beyond it the table dims serve stratification, not per-draw
    parity.
    """
    w2m = med.w2m[mid]
    om = vm.xform_point(w2m, o)
    dm = vm.xform_vector(w2m, dvec)
    sigma_t_rgb = med.sigma_a[mid] + med.sigma_s[mid]
    sigma_t = sigma_t_rgb[..., 0]
    inv_max_d = med.inv_max_density[mid]
    sigma_s = med.sigma_s[mid]

    # Ray-unit-cube overlap [t0, t1] in world-t units (medium space shares
    # parameterization since dm is the transformed direction).
    inv_dm = 1.0 / jnp.where(jnp.abs(dm) < 1e-12, 1e-12, dm)
    ta = (0.0 - om) * inv_dm
    tb = (1.0 - om) * inv_dm
    t0 = jnp.max(jnp.minimum(ta, tb), -1)
    t1 = jnp.min(jnp.maximum(ta, tb), -1)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, t_max)
    in_medium = t0 < t1

    def body(state):
        t, done, hit_med, ctr = state
        u1 = _rand(key, ctr)
        u2 = _rand(key, ctr + jnp.uint32(0x9999))
        if u_tab is not None:
            k2 = u_tab.shape[1]
            idx = jnp.minimum(ctr[0], jnp.uint32(k2 - 2)).astype(jnp.int32)
            in_tab = ctr[0] < k2  # ctr advances 2 per step
            u1 = jnp.where(in_tab, jax.lax.dynamic_index_in_dim(
                u_tab, idx, 1, keepdims=False), u1)
            u2 = jnp.where(in_tab, jax.lax.dynamic_index_in_dim(
                u_tab, idx + 1, 1, keepdims=False), u2)
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-10)) * inv_max_d / jnp.maximum(
            sigma_t, 1e-20
        )
        escaped = t_new >= t1
        p = om + t_new[..., None] * dm
        dens = _grid_density(med, mid, p)
        real = u2 < dens * inv_max_d
        newly_done = (~done) & (escaped | real)
        hit_med = jnp.where((~done) & real & ~escaped, True, hit_med)
        t = jnp.where(done, t, t_new)
        return (t, done | newly_done, hit_med, ctr + jnp.uint32(2))

    def cond(state):
        _, done, _, ctr = state
        return jnp.any(~done) & (ctr[0] < 2 * max_steps)

    n = o.shape[0]
    ctr0 = jnp.zeros((n,), jnp.uint32)
    t_init = jnp.where(in_medium, t0, t1)
    done0 = ~in_medium
    state = (t_init, done0, jnp.zeros((n,), bool), ctr0)
    t, done, hit_med, _ = jax.lax.while_loop(cond, body, state)

    weight = jnp.where(
        hit_med[..., None],
        sigma_s / jnp.maximum(sigma_t, 1e-20)[..., None],
        jnp.ones((n, 3), jnp.float32),
    )
    return {"sampled_medium": hit_med, "t": jnp.minimum(t, t_max), "weight": weight}


def grid_tr(med: MediumTable, mid, o, dvec, t_max, key, max_steps=256):
    """GridDensityMedium::Tr (grid.cpp:89-112) — ratio tracking."""
    w2m = med.w2m[mid]
    om = vm.xform_point(w2m, o)
    dm = vm.xform_vector(w2m, dvec)
    sigma_t = (med.sigma_a[mid] + med.sigma_s[mid])[..., 0]
    inv_max_d = med.inv_max_density[mid]

    inv_dm = 1.0 / jnp.where(jnp.abs(dm) < 1e-12, 1e-12, dm)
    ta = (0.0 - om) * inv_dm
    tb = (1.0 - om) * inv_dm
    t0 = jnp.maximum(jnp.max(jnp.minimum(ta, tb), -1), 0.0)
    t1 = jnp.minimum(jnp.min(jnp.maximum(ta, tb), -1), t_max)
    in_medium = t0 < t1

    def body(state):
        t, tr, done, ctr = state
        u1 = _rand(key, ctr + jnp.uint32(0x5555))
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-10)) * inv_max_d / jnp.maximum(
            sigma_t, 1e-20
        )
        escaped = t_new >= t1
        p = om + t_new[..., None] * dm
        dens = _grid_density(med, mid, p)
        tr_new = tr * (1.0 - jnp.maximum(0.0, dens * inv_max_d))
        tr = jnp.where(done | escaped, tr, tr_new)
        t = jnp.where(done, t, t_new)
        return (t, tr, done | escaped, ctr + jnp.uint32(1))

    def cond(state):
        _, _, done, ctr = state
        return jnp.any(~done) & (ctr[0] < max_steps)

    n = o.shape[0]
    state = (
        jnp.where(in_medium, t0, t1),
        jnp.ones((n,), jnp.float32),
        ~in_medium,
        jnp.zeros((n,), jnp.uint32),
    )
    _, tr, _, _ = jax.lax.while_loop(cond, body, state)
    return tr[..., None].repeat(3, -1)
