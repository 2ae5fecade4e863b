"""Batched camera ray generation.

TPU re-expression of src/cameras/: pbrt's Camera::GenerateRay runs once per
sample behind a virtual call (camera.h:50-77, perspective.cpp:69-95); here a
camera is a parameter pytree plus one pure function mapping a flat batch of
film/lens/time samples to world-space rays — an elementwise VPU program.

Projective matrix plumbing (camera.h ProjectiveCamera ctor): the host builds
RasterToCamera = CameraToScreen^-1 . ScreenToRaster^-1 once in float64 and
bakes f32 matrices into the pytree.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field
from ..core import transform as tf
from ..core import sampling as smp
from ..core import vecmath as vm
from ..core.vecmath import normalize, vec

CAM_PERSPECTIVE = 0
CAM_ORTHOGRAPHIC = 1
CAM_ENVIRONMENT = 2


@pytree_dataclass
class CameraParams:
    cam_type: int = static_field(default=CAM_PERSPECTIVE)
    raster_to_camera: jnp.ndarray = None  # [4,4]
    camera_to_world: jnp.ndarray = None  # [4,4]
    lens_radius: jnp.ndarray = None  # []
    focal_distance: jnp.ndarray = None  # []
    shutter_open: jnp.ndarray = None
    shutter_close: jnp.ndarray = None
    full_resolution: tuple = static_field(default=(0, 0))


def _screen_window(aspect: float, screen=None):
    """Default screen window (api.cpp:1716 region / camera.cpp semantics)."""
    if screen is not None:
        return screen
    if aspect > 1.0:
        return (-aspect, aspect, -1.0, 1.0)
    return (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)


def _raster_to_screen(resolution, screen):
    x0, x1, y0, y1 = screen
    xr, yr = resolution
    # ScreenToRaster = Scale(res) . Scale(1/(x1-x0), 1/(y0-y1)) . Translate(-x0, -y1)
    # (camera.h ProjectiveCamera ctor); note the y flip.
    s2r = (
        tf.scale(xr, yr, 1.0)
        @ tf.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
        @ tf.translate(-x0, -y1, 0.0)
    )
    return s2r.inverse


def make_perspective_camera(
    camera_to_world: tf.Transform,
    resolution,
    fov_deg: float = 90.0,
    screen=None,
    lens_radius: float = 0.0,
    focal_distance: float = 1e6,
    shutter_open: float = 0.0,
    shutter_close: float = 1.0,
) -> CameraParams:
    """(cameras/perspective.cpp:43-95 PerspectiveCamera)."""
    aspect = resolution[0] / resolution[1]
    screen = _screen_window(aspect, screen)
    cam_to_screen = tf.perspective(fov_deg, 1e-2, 1000.0)
    raster_to_screen = _raster_to_screen(resolution, screen)
    raster_to_camera = tf.Transform(
        cam_to_screen.m_inv @ raster_to_screen.m,
        raster_to_screen.m_inv @ cam_to_screen.m,
    )
    return CameraParams(
        cam_type=CAM_PERSPECTIVE,
        raster_to_camera=jnp.asarray(raster_to_camera.m),
        camera_to_world=jnp.asarray(camera_to_world.m),
        lens_radius=jnp.float32(lens_radius),
        focal_distance=jnp.float32(focal_distance),
        shutter_open=jnp.float32(shutter_open),
        shutter_close=jnp.float32(shutter_close),
        full_resolution=tuple(resolution),
    )


def perspective_raster_to_camera(fov_deg, resolution, screen=None,
                                 znear=1e-2, zfar=1000.0):
    """raster->camera matrix as a *differentiable* function of fov
    (transform.cpp:238 Perspective composed with the ProjectiveCamera ctor
    plumbing) — jnp ops only, so jax.grad flows through fov_deg.  Use with
    `cam.replace(raster_to_camera=...)` to make field-of-view a trainable
    camera parameter (north star: pixel gradients w.r.t. the camera)."""
    aspect = resolution[0] / resolution[1]
    scr = _screen_window(aspect, screen)
    r2s = np.asarray(_raster_to_screen(resolution, scr).m, np.float32)
    persp = jnp.asarray(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, zfar / (zfar - znear), -zfar * znear / (zfar - znear)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        jnp.float32,
    )
    inv_tan = 1.0 / jnp.tan(jnp.radians(fov_deg) / 2.0)
    s = jnp.diag(jnp.stack([inv_tan, inv_tan,
                            jnp.float32(1.0), jnp.float32(1.0)]))
    cam_to_screen = s @ persp
    # raster_to_camera = (cam_to_screen)^-1 @ raster_to_screen.
    return jnp.linalg.inv(cam_to_screen) @ r2s


def make_orthographic_camera(
    camera_to_world: tf.Transform,
    resolution,
    screen=None,
    lens_radius: float = 0.0,
    focal_distance: float = 1e6,
    shutter_open: float = 0.0,
    shutter_close: float = 1.0,
) -> CameraParams:
    """(cameras/orthographic.cpp)."""
    aspect = resolution[0] / resolution[1]
    screen = _screen_window(aspect, screen)
    cam_to_screen = tf.orthographic(0.0, 1.0)
    raster_to_screen = _raster_to_screen(resolution, screen)
    raster_to_camera = tf.Transform(
        cam_to_screen.m_inv @ raster_to_screen.m,
        raster_to_screen.m_inv @ cam_to_screen.m,
    )
    return CameraParams(
        cam_type=CAM_ORTHOGRAPHIC,
        raster_to_camera=jnp.asarray(raster_to_camera.m),
        camera_to_world=jnp.asarray(camera_to_world.m),
        lens_radius=jnp.float32(lens_radius),
        focal_distance=jnp.float32(focal_distance),
        shutter_open=jnp.float32(shutter_open),
        shutter_close=jnp.float32(shutter_close),
        full_resolution=tuple(resolution),
    )


def make_environment_camera(
    camera_to_world: tf.Transform,
    resolution,
    shutter_open: float = 0.0,
    shutter_close: float = 1.0,
) -> CameraParams:
    """(cameras/environment.cpp:43) equirect sphere rays."""
    return CameraParams(
        cam_type=CAM_ENVIRONMENT,
        raster_to_camera=jnp.eye(4),
        camera_to_world=jnp.asarray(camera_to_world.m),
        lens_radius=jnp.float32(0.0),
        focal_distance=jnp.float32(1e6),
        shutter_open=jnp.float32(shutter_open),
        shutter_close=jnp.float32(shutter_close),
        full_resolution=tuple(resolution),
    )


def _xform_point(m, p):
    # Mul+sum, not `@`: dot_general runs in bf16 passes on TPU by default,
    # which would quantize every camera ray to 8 mantissa bits.
    return vm.xform_point(m, p)


def _xform_vector(m, v):
    return vm.xform_vector(m, v)


def generate_rays(cam, p_film, p_lens, time_u):
    """Camera::GenerateRay over a batch.

    p_film: [N, 2] raster-space sample positions (CameraSample::pFilm);
    p_lens: [N, 2] in [0,1)^2; time_u: [N] in [0,1).
    Returns (o[N,3], d[N,3], time[N], weight[N]).
    """
    from .realistic import RealisticParams, generate_rays_realistic

    if isinstance(cam, RealisticParams):
        return generate_rays_realistic(cam, p_film, p_lens, time_u)
    n = p_film.shape[0]
    time = cam.shutter_open + time_u * (cam.shutter_close - cam.shutter_open)
    if cam.cam_type == CAM_ENVIRONMENT:
        # (environment.cpp:43-57): equirect theta/phi from raster coords.
        xr, yr = cam.full_resolution
        theta = jnp.pi * p_film[:, 1] / yr
        phi = 2.0 * jnp.pi * p_film[:, 0] / xr
        d = vec(
            jnp.sin(theta) * jnp.cos(phi),
            jnp.cos(theta),
            jnp.sin(theta) * jnp.sin(phi),
        )
        o = jnp.zeros((n, 3), jnp.float32)
        o = _xform_point(cam.camera_to_world, o)
        d = _xform_vector(cam.camera_to_world, d)
        return o, d, time, jnp.ones((n,), jnp.float32)

    p_raster = jnp.concatenate(
        [p_film, jnp.zeros((n, 1), jnp.float32)], axis=-1
    )
    p_cam_h = _xform_point(cam.raster_to_camera, p_raster)
    w = (
        jnp.sum(cam.raster_to_camera[3, :3] * p_raster, axis=-1)
        + cam.raster_to_camera[3, 3]
    )
    p_cam = p_cam_h / w[..., None]

    if cam.cam_type == CAM_PERSPECTIVE:
        o = jnp.zeros((n, 3), jnp.float32)
        d = normalize(p_cam)
    else:  # orthographic
        o = p_cam
        d = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)
        )

    # Thin-lens depth of field (perspective.cpp:76-95).
    def with_lens(o, d):
        pl = cam.lens_radius * smp.concentric_sample_disk(p_lens)
        ft = cam.focal_distance / d[:, 2]
        p_focus = o + ft[:, None] * d
        o2 = jnp.concatenate([pl, jnp.zeros((n, 1), jnp.float32)], axis=-1)
        d2 = normalize(p_focus - o2)
        return o2, d2

    has_lens = cam.lens_radius > 0.0
    o_l, d_l = with_lens(o, d)
    o = jnp.where(has_lens, o_l, o)
    d = jnp.where(has_lens, d_l, d)

    o = _xform_point(cam.camera_to_world, o)
    d = _xform_vector(cam.camera_to_world, d)
    return o, d, time, jnp.ones((n,), jnp.float32)


def generate_ray_differentials(cam, p_film, p_lens, time_u, spp: int = 1):
    """Camera::GenerateRayDifferential (camera.cpp:68-85): regenerate the ray
    at pFilm+(1,0) and pFilm+(0,1) with the same lens/time samples (the
    generic fallback every camera shares; PerspectiveCamera's analytic
    override, perspective.cpp:122-148, computes the identical values), then
    ScaleDifferentials(1/sqrt(spp)) (integrator.cpp:290, geometry.h:1124).

    Returns (o, d, time, weight, rx_o, rx_d, ry_o, ry_d).
    """
    o, d, time, w = generate_rays(cam, p_film, p_lens, time_u)
    dxf = jnp.asarray([1.0, 0.0], jnp.float32)
    dyf = jnp.asarray([0.0, 1.0], jnp.float32)
    rx_o, rx_d, _, _ = generate_rays(cam, p_film + dxf, p_lens, time_u)
    ry_o, ry_d, _, _ = generate_rays(cam, p_film + dyf, p_lens, time_u)
    import math

    s = 1.0 / math.sqrt(max(int(spp), 1))
    rx_o = o + (rx_o - o) * s
    ry_o = o + (ry_o - o) * s
    rx_d = d + (rx_d - d) * s
    ry_d = d + (ry_d - d) * s
    return o, d, time, w, rx_o, rx_d, ry_o, ry_d


# ---------------------------------------------------------------------------
# BDPT camera importance (perspective.cpp:185-260: We / Pdf_We / Sample_Wi).
# Perspective only (pbrt likewise implements these on PerspectiveCamera).
# ---------------------------------------------------------------------------

def _image_plane_area(cam):
    """Area A of the image rectangle projected onto the z=1 plane
    (perspective.cpp:64-68)."""
    xr, yr = cam.full_resolution
    p_min = _xform_point(
        cam.raster_to_camera, jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    )[0]
    p_max = _xform_point(
        cam.raster_to_camera,
        jnp.asarray([[float(xr), float(yr), 0.0]], jnp.float32),
    )[0]
    p_min = p_min / p_min[2]
    p_max = p_max / p_max[2]
    return jnp.abs((p_max[0] - p_min[0]) * (p_max[1] - p_min[1]))


def camera_pdf_we(cam, o_w, d_w):
    """PerspectiveCamera::Pdf_We (perspective.cpp:214-248): (pdf_pos,
    pdf_dir) of generating a ray (o, d).  Pinhole: pdf_pos is a delta
    (returned as 1)."""
    w2c = jnp.linalg.inv(cam.camera_to_world)
    d_c = _xform_vector(w2c, d_w)
    cos_t = d_c[..., 2]
    a = _image_plane_area(cam)
    # Check the direction lands on the film (project to z=1, to raster).
    p_focus = d_c / jnp.maximum(cos_t, 1e-9)[..., None]
    c2r = jnp.linalg.inv(cam.raster_to_camera)
    p_raster = _xform_point(c2r, p_focus)
    xr, yr = cam.full_resolution
    on_film = (
        (cos_t > 1e-6)
        & (p_raster[..., 0] >= 0) & (p_raster[..., 0] < xr)
        & (p_raster[..., 1] >= 0) & (p_raster[..., 1] < yr)
    )
    pdf_dir = jnp.where(on_film, 1.0 / (a * cos_t ** 3), 0.0)
    pdf_pos = jnp.where(on_film, 1.0, 0.0)
    return pdf_pos, pdf_dir


def camera_sample_wi(cam, ref_p):
    """PerspectiveCamera::Sample_Wi (perspective.cpp:250-260) for a pinhole
    lens: deterministic connection to the camera position.

    Returns dict: wi [N,3] (ref -> camera), pdf [N] (solid angle), we [N,3]
    (importance), p_raster [N,2], p_cam [N,3] (lens point, world),
    valid [N]."""
    n = ref_p.shape[0]
    cam_p = _xform_point(
        cam.camera_to_world, jnp.zeros((n, 3), jnp.float32)
    )
    d = cam_p - ref_p
    dist2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = d / dist[..., None]
    # Lens normal = camera forward axis (+z in camera space).
    fwd = _xform_vector(
        cam.camera_to_world,
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)),
    )
    cos_t = jnp.sum(-wi * normalize(fwd), -1)
    # We: 1/(A cos^4) inside the frustum (perspective.cpp:185-211).
    w2c = jnp.linalg.inv(cam.camera_to_world)
    d_c = _xform_vector(w2c, -wi)
    cz = jnp.maximum(d_c[..., 2], 1e-9)
    p_focus = d_c / cz[..., None]
    c2r = jnp.linalg.inv(cam.raster_to_camera)
    p_raster = _xform_point(c2r, p_focus)[..., :2]
    xr, yr = cam.full_resolution
    on_film = (
        (d_c[..., 2] > 1e-6)
        & (p_raster[..., 0] >= 0) & (p_raster[..., 0] < xr)
        & (p_raster[..., 1] >= 0) & (p_raster[..., 1] < yr)
    )
    a = _image_plane_area(cam)
    we_scalar = jnp.where(on_film, 1.0 / (a * jnp.maximum(cos_t, 1e-9) ** 4), 0.0)
    we = we_scalar[..., None] * jnp.ones((n, 3), jnp.float32)
    # Pinhole lens: pdf = dist^2 / cos (delta position).
    pdf = jnp.where(on_film, dist2 / jnp.maximum(cos_t, 1e-9), 0.0)
    return {
        "wi": wi, "pdf": pdf, "we": we, "p_raster": p_raster,
        "p_cam": cam_p, "valid": on_film,
    }
