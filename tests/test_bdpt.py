"""BDPT vs path-integrator agreement (the analytic_scenes.cpp:255-410
cross-integrator pattern: same scene, different integrators, same answer).
"""
import numpy as np

from pbrt_tpu import scene as sc, film as fm
from pbrt_tpu.core import transform as tf
from pbrt_tpu.integrators import bdpt, path as pt
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import make_perspective_camera

RES = (20, 20)


def _render_pair(scene, cam, spp, depth):
    film_cfg = fm.FilmConfig(full_resolution=RES)
    img_p = np.asarray(
        pt.render(scene, cam, film_cfg, SamplerConfig("sobol", spp, RES),
                  pt.PathConfig(max_depth=depth))
    )
    img_b = np.asarray(
        bdpt.render(scene, cam, film_cfg, SamplerConfig("sobol", spp, RES),
                    bdpt.BDPTConfig(max_depth=depth))
    )
    return img_p, img_b


def test_bdpt_matches_path_area_light():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.6, 0.6, 0.6))
    b.add_triangle_mesh(
        [[0, 1, 2], [2, 3, 0]],
        [[-6, -6, 0], [6, -6, 0], [6, 6, 0], [-6, 6, 0]], material=m,
    )
    b.add_triangle_mesh(
        [[0, 1, 2], [2, 3, 0]],
        [[-6, -6, 6], [6, -6, 6], [6, 6, 6], [-6, 6, 6]], material=m,
    )
    b.add_emissive_sphere(tf.translate(0, 0, 4), 0.6, L=(12, 12, 12), material=m)
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0, -9, 2], [0, 0, 1], [0, 0, 1]), RES, fov_deg=55.0
    )
    img_p, img_b = _render_pair(scene, cam, 64, 3)
    rel = abs(img_p.mean() - img_b.mean()) / img_p.mean()
    assert rel < 0.05, f"BDPT vs path mean differ by {rel:.3f}"
    per_pix = np.abs(img_p - img_b).mean() / img_p.mean()
    assert per_pix < 0.15, f"per-pixel diff {per_pix:.3f}"


def test_bdpt_matches_path_point_light():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5))
    b.add_triangle_mesh(
        [[0, 1, 2], [2, 3, 0]],
        [[-6, -6, 0], [6, -6, 0], [6, 6, 0], [-6, 6, 0]], material=m,
    )
    b.add_point_light(tf.translate(1, 0, 3), (20, 20, 20))
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0, -8, 3], [0, 0, 0], [0, 0, 1]), RES, fov_deg=50.0
    )
    img_p, img_b = _render_pair(scene, cam, 32, 3)
    rel = abs(img_p.mean() - img_b.mean()) / img_p.mean()
    assert rel < 0.05, f"BDPT vs path mean differ by {rel:.3f}"
