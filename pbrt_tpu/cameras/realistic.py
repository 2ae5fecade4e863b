"""Realistic (lens-system) camera.

TPU re-expression of cameras/realistic.cpp:50-635: the per-ray recursive
lens walk becomes a fixed-length vectorized loop over the element stack —
every lane traces film->scene through the same E spherical/aperture
interfaces (ideal VPU shape: the loop body is pure elementwise math).

Host-side at build: thick-lens focusing (realistic.cpp:387-464) and the
exit-pupil bounds table (realistic.cpp:468-521, 64 radial zones x MC
sampling of the rear element plane) — both reuse the same jnp trace on the
CPU backend.

Lens description rows follow pbrt's .dat convention:
  curvature_radius  thickness  eta  aperture_diameter   (mm, film-side last)
A curvature radius of 0 marks the aperture stop.  `DGAUSS_50MM` is the
double-Gauss f/2 50mm design printed in the PBRT book (public data), used
when a scene omits `lensfile`.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field
from ..core import transform as tf
from ..core.vecmath import normalize, vec

# curvature radius, thickness, ior, aperture diameter (mm) — scene-to-film
# order, exactly the .dat row order pbrt reads (realistic.cpp:50-85).
DGAUSS_50MM = np.array(
    [
        [29.475, 3.76, 1.67, 25.2],
        [84.83, 0.12, 1.0, 25.2],
        [19.275, 4.025, 1.67, 23.0],
        [40.77, 3.275, 1.699, 23.0],
        [12.75, 5.705, 1.0, 18.0],
        [0.0, 4.5, 0.0, 17.1],
        [-14.495, 1.18, 1.603, 17.0],
        [40.77, 6.065, 1.658, 20.0],
        [-20.385, 0.19, 1.0, 20.0],
        [437.065, 3.22, 1.717, 20.0],
        [-39.73, 0.0, 1.0, 20.0],
    ],
    np.float64,
)

N_PUPIL_ZONES = 64


@pytree_dataclass
class RealisticParams:
    camera_to_world: jnp.ndarray = None  # [4,4]
    # Element table film-to-scene order (reversed .dat), meters:
    # [E, 5]: curvature_radius, z_pos (apex z, camera space), eta_ratio
    # placeholderless ior, aperture_radius, is_stop
    curvature: jnp.ndarray = None  # [E]
    element_z: jnp.ndarray = None  # [E] apex z of each interface
    eta: jnp.ndarray = None  # [E] ior of the medium scene-side of interface
    aperture_r: jnp.ndarray = None  # [E]
    exit_pupil: jnp.ndarray = None  # [Z, 4] x0 y0 x1 y1 on rear plane
    rear_z: jnp.ndarray = None  # [] z of rear element (film side)
    film_diag: jnp.ndarray = None  # [] meters
    shutter_open: jnp.ndarray = None
    shutter_close: jnp.ndarray = None
    full_resolution: tuple = static_field(default=(0, 0))
    n_elements: int = static_field(default=0)


def _trace_film_to_scene(params, o, d):
    """TraceLensesFromFilm (realistic.cpp:310-385): rays start film-side
    (z > rear_z region, travelling -z through the stack toward the scene).
    Returns (ok, o_out, d_out) in camera space (pbrt's z-flip applied by the
    caller)."""
    n_el = params.n_elements
    ok = jnp.ones(o.shape[:-1], bool)
    for i in range(n_el - 1, -1, -1):  # film -> scene
        r = params.curvature[i]
        zc = params.element_z[i]
        is_stop = r == 0.0
        # Intersect: flat plane for the stop, sphere otherwise.
        t_flat = (zc - o[..., 2]) / jnp.where(d[..., 2] == 0, 1e-12, d[..., 2])
        center = zc + r
        center_v = jnp.stack(
            [jnp.zeros_like(o[..., 0]), jnp.zeros_like(o[..., 0]),
             jnp.full_like(o[..., 0], center)], -1,
        )
        oc = o - center_v
        b = jnp.sum(oc * d, -1)
        c = jnp.sum(oc * oc, -1) - r * r
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        # Choose near/far root by ray direction & curvature sign
        # (realistic.cpp:157-168 IntersectSphericalElement: useCloser).
        use_closer = (d[..., 2] > 0.0) ^ (r < 0.0)
        t_sph = jnp.where(use_closer, -b - sq, -b + sq)
        t = jnp.where(is_stop, t_flat, t_sph)
        ok = ok & (jnp.where(is_stop, t_flat > 0, (disc >= 0) & (t > 0)))
        p = o + t[..., None] * d
        r2 = p[..., 0] ** 2 + p[..., 1] ** 2
        ok = ok & (r2 <= params.aperture_r[i] ** 2)
        # Refract at glass interfaces.
        nrm = normalize(p - center_v)
        nrm = jnp.where((jnp.sum(nrm * -d, -1) < 0.0)[..., None], -nrm, nrm)
        # Row i's ior is the medium between surfaces i and i+1, i.e. the
        # FILM side of surface i; the scene side is row i-1's
        # (realistic.cpp:341-346 etaI/etaT).
        eta_i = jnp.where(params.eta[i] != 0.0, params.eta[i], 1.0)
        if i > 0:
            eta_t = jnp.where(params.eta[i - 1] != 0.0, params.eta[i - 1], 1.0)
        else:
            eta_t = jnp.float32(1.0)
        etar = eta_i / eta_t
        cos_i = jnp.sum(nrm * -d, -1)
        sin2_t = etar * etar * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
        tir = sin2_t >= 1.0
        cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
        d_new = normalize(
            etar[..., None] * d + (etar * cos_i - cos_t)[..., None] * nrm
        )
        refract_here = (~is_stop) & (jnp.abs(etar - 1.0) > 1e-5)
        ok = ok & ~(refract_here & tir)
        d = jnp.where(refract_here[..., None] & ok[..., None], d_new, d)
        o = jnp.where(ok[..., None], p, o)
    return ok, o, d


def _build_pupil_and_focus(lens_mm, film_diag_m, focus_distance):
    """Host: focusing (thick-lens, realistic.cpp:387-464) + exit-pupil
    zones (realistic.cpp:468-521).  All in meters, camera space with the
    film plane at z=0 and elements at z<0 (pbrt's convention)."""
    lens = np.asarray(lens_mm, np.float64).copy()
    lens[:, 0] *= 1e-3
    lens[:, 1] *= 1e-3
    lens[:, 3] *= 1e-3 / 2.0  # diameter -> radius

    def element_zs(lens):
        # Film at z=0, elements at z<0: apex z of interface i accumulates
        # thicknesses film->scene (TraceLensesFromFilm walks
        # elementZ -= thickness from 0, realistic.cpp:310-320).
        z = np.zeros(len(lens))
        cur = 0.0
        for i in range(len(lens) - 1, -1, -1):
            cur -= lens[i, 1]
            z[i] = cur
        return z

    # Paraxial focusing (FocusThickLens, realistic.cpp:387-464, done here
    # with ray-transfer matrices): find the rear air gap d_i that images an
    # object at focus_distance onto the film.  State (y, u); refraction at a
    # surface of power phi = (n' - n)/R: u' = u - y*phi; translation t in
    # medium n: y' = y + t*u (angles non-reduced, so divide by n via the
    # translation in actual angle: u constant, y' = y + t*u).
    M = np.eye(2)
    n_cur = 1.0  # scene side is air
    total_len = lens[:, 1].sum()
    for i in range(len(lens)):  # scene -> film
        r = lens[i, 0]
        n_next = lens[i, 2] if lens[i, 2] != 0.0 else n_cur
        if r != 0.0:
            phi = (n_next - n_cur) / r
            # Refraction in (y, n*u) reduced convention.
            M = np.array([[1.0, 0.0], [-phi, 1.0]]) @ M
        t = lens[i, 1]
        if i < len(lens) - 1 and t > 0:
            M = np.array([[1.0, t / n_next], [0.0, 1.0]]) @ M
        n_cur = n_next
    d_o = max(focus_distance - total_len, 0.1)
    num = M[0, 0] * d_o + M[0, 1]
    den = M[1, 0] * d_o + M[1, 1]
    d_i = -num / den if abs(den) > 1e-12 else 0.05
    if not (1e-4 < d_i < 1.0):
        d_i = 0.05  # fall back to 50mm flange distance
    lens[-1, 1] = d_i
    zs = element_zs(lens)
    params = _to_params(lens, zs, None, film_diag_m)

    # Exit-pupil bounds per film-radius zone (realistic.cpp:468-521).
    rear_z = zs[-1]
    rear_r = lens[-1, 3]
    zones = np.zeros((N_PUPIL_ZONES, 4), np.float32)
    rs = np.random.RandomState(7)
    half_diag = 0.5 * film_diag_m
    S = 1024
    with jax.default_device(jax.devices("cpu")[0]):
        for zi in range(N_PUPIL_ZONES):
            r0 = zi / N_PUPIL_ZONES * half_diag
            r1 = (zi + 1) / N_PUPIL_ZONES * half_diag
            x_film = r0 + (r1 - r0) * rs.rand(S)
            px = (rs.rand(S, 2) * 2 - 1) * rear_r * 1.5
            o = np.stack([x_film, np.zeros(S), np.zeros(S)], -1)
            d = np.stack(
                [px[:, 0] - x_film, px[:, 1], np.full(S, rear_z)], -1
            )
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            ok, _, _ = _trace_film_to_scene(
                params, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
            )
            ok = np.asarray(ok)
            if ok.sum() == 0:
                zones[zi] = [-rear_r, -rear_r, rear_r, rear_r]
                continue
            good = px[ok]
            pad = 2.0 * rear_r * 1.5 / np.sqrt(S)
            zones[zi] = [
                good[:, 0].min() - pad, good[:, 1].min() - pad,
                good[:, 0].max() + pad, good[:, 1].max() + pad,
            ]
    return lens, zs, zones


def _to_params(lens, zs, zones, film_diag_m, c2w=None, res=(1, 1),
               shutter=(0.0, 1.0)):
    return RealisticParams(
        camera_to_world=jnp.asarray(
            np.eye(4, dtype=np.float32) if c2w is None else c2w
        ),
        curvature=jnp.asarray(lens[:, 0], jnp.float32),
        element_z=jnp.asarray(zs, jnp.float32),
        eta=jnp.asarray(lens[:, 2], jnp.float32),
        aperture_r=jnp.asarray(lens[:, 3], jnp.float32),
        exit_pupil=jnp.asarray(
            zones if zones is not None else np.zeros((N_PUPIL_ZONES, 4), np.float32)
        ),
        rear_z=jnp.float32(zs[-1]),
        film_diag=jnp.float32(film_diag_m),
        shutter_open=jnp.float32(shutter[0]),
        shutter_close=jnp.float32(shutter[1]),
        full_resolution=tuple(res),
        n_elements=len(lens),
    )


def make_realistic_camera(
    camera_to_world: tf.Transform,
    resolution,
    lens_data=None,
    film_diag_mm: float = 35.0,
    focus_distance: float = 10.0,
    shutter_open: float = 0.0,
    shutter_close: float = 1.0,
):
    lens_mm = DGAUSS_50MM if lens_data is None else np.asarray(lens_data)
    film_diag_m = film_diag_mm * 1e-3
    lens, zs, zones = _build_pupil_and_focus(lens_mm, film_diag_m, focus_distance)
    return _to_params(
        lens, zs, zones, film_diag_m,
        c2w=np.asarray(camera_to_world.m, np.float32),
        res=resolution, shutter=(shutter_open, shutter_close),
    )


def generate_rays_realistic(cam: RealisticParams, p_film, p_lens, time_u):
    """RealisticCamera::GenerateRay (realistic.cpp:575-635)."""
    n = p_film.shape[0]
    xr, yr = cam.full_resolution
    # Film sample -> physical film plane point (film is rotated 180deg:
    # realistic.cpp:583-586 uses (1 - s.pFilm/res) scaled by the diagonal).
    aspect = yr / xr
    diag = cam.film_diag
    x_extent = diag / jnp.sqrt(1.0 + aspect * aspect)
    y_extent = x_extent * aspect
    sx = (0.5 - p_film[:, 0] / xr) * x_extent
    sy = (p_film[:, 1] / yr - 0.5) * y_extent
    r_film = jnp.sqrt(sx * sx + sy * sy)
    zone = jnp.clip(
        (r_film / (0.5 * diag) * N_PUPIL_ZONES).astype(jnp.int32),
        0, N_PUPIL_ZONES - 1,
    )
    zb = cam.exit_pupil[zone]  # [N,4]
    px = zb[:, 0] + p_lens[:, 0] * (zb[:, 2] - zb[:, 0])
    py = zb[:, 1] + p_lens[:, 1] * (zb[:, 3] - zb[:, 1])
    area = jnp.maximum((zb[:, 2] - zb[:, 0]) * (zb[:, 3] - zb[:, 1]), 0.0)
    # Rotate pupil point by the film point's azimuth (SampleExitPupil,
    # realistic.cpp:524-541 + 597).
    sin_a = jnp.where(r_film > 1e-9, sy / jnp.maximum(r_film, 1e-9), 0.0)
    cos_a = jnp.where(r_film > 1e-9, sx / jnp.maximum(r_film, 1e-9), 1.0)
    lx = cos_a * px - sin_a * py
    ly = sin_a * px + cos_a * py
    o = jnp.stack([sx, sy, jnp.zeros((n,), jnp.float32)], -1)
    target = jnp.stack([lx, ly, jnp.full((n,), cam.rear_z)], -1)
    d = normalize(target - o)
    ok, oo, dd = _trace_film_to_scene(cam, o, d)
    # Into camera space looking down +z... pbrt flips to -z scene side then
    # CameraToWorld; our camera convention matches perspective: +z forward.
    oo = oo * jnp.asarray([1.0, 1.0, -1.0])
    dd = dd * jnp.asarray([1.0, 1.0, -1.0])
    from .cameras import _xform_point, _xform_vector

    o_w = _xform_point(cam.camera_to_world, oo)
    d_w = _xform_vector(cam.camera_to_world, dd)
    d_w = normalize(d_w)
    time = cam.shutter_open + time_u * (cam.shutter_close - cam.shutter_open)
    cos_t = jnp.abs(d[..., 2])
    # Simple weighting (realistic.cpp:603-633): cos^4 * A_pupil / rear_z^2.
    w = jnp.where(
        ok,
        (cos_t ** 4) * area / jnp.maximum(cam.rear_z * cam.rear_z, 1e-12),
        0.0,
    )
    # Normalize weights so an all-pass pupil gives ~1 on axis (keeps film
    # exposure comparable to the projective cameras).
    w_axis = (
        jnp.maximum(area, 1e-12) / jnp.maximum(cam.rear_z * cam.rear_z, 1e-12)
    )
    w = jnp.where(w_axis > 0, w / jnp.maximum(w_axis, 1e-12), w)
    return o_w, d_w, time, w
