from .cameras import (
    CameraParams,
    make_perspective_camera,
    make_orthographic_camera,
    make_environment_camera,
    generate_rays,
    generate_ray_differentials,
)

__all__ = [
    "CameraParams",
    "make_perspective_camera",
    "make_orthographic_camera",
    "make_environment_camera",
    "generate_rays",
    "generate_ray_differentials",
]
