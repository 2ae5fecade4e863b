"""MLT + SPPM vs path-integrator agreement, and the tool suite."""
import subprocess
import sys

import numpy as np
import pytest

from pbrt_tpu import scene as sc, film as fm
from pbrt_tpu.core import transform as tf
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import make_perspective_camera

RES = (16, 16)


def _scene():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.6, 0.6, 0.6))
    b.add_triangle_mesh(
        [[0, 1, 2], [2, 3, 0]],
        [[-6, -6, 0], [6, -6, 0], [6, 6, 0], [-6, 6, 0]], material=m,
    )
    b.add_emissive_sphere(tf.translate(0, 0, 4), 0.6, L=(12, 12, 12), material=m)
    return b.build()


def _cam():
    return make_perspective_camera(
        tf.look_at([0, -9, 2], [0, 0, 1], [0, 0, 1]), RES, fov_deg=55.0
    )


@pytest.fixture(scope="module")
def path_ref():
    from pbrt_tpu.integrators import path as pt

    return np.asarray(
        pt.render(_scene(), _cam(), fm.FilmConfig(full_resolution=RES),
                  SamplerConfig("sobol", 96, RES), pt.PathConfig(max_depth=2))
    )


def test_sppm_matches_path(path_ref):
    from pbrt_tpu.integrators import sppm

    img = sppm.render(
        _scene(), _cam(), fm.FilmConfig(full_resolution=RES),
        sppm.SPPMConfig(max_depth=2, n_iterations=10, initial_radius=0.5),
    )
    rel = abs(img.mean() - path_ref.mean()) / path_ref.mean()
    corr = np.corrcoef(img.ravel(), path_ref.ravel())[0, 1]
    assert rel < 0.12, f"SPPM mean off by {rel:.3f}"
    assert corr > 0.95, f"SPPM correlation {corr:.3f}"


def test_mlt_matches_path(path_ref):
    from pbrt_tpu.integrators import mlt

    img = mlt.render(
        _scene(), _cam(), fm.FilmConfig(full_resolution=RES),
        mlt.MLTConfig(max_depth=2, n_bootstrap=6144, n_chains=384,
                      mutations_per_pixel=16),
        seed=3,
    )
    rel = abs(img.mean() - path_ref.mean()) / path_ref.mean()
    corr = np.corrcoef(img.ravel(), path_ref.ravel())[0, 1]
    assert rel < 0.15, f"MLT mean off by {rel:.3f}"
    assert corr > 0.9, f"MLT correlation {corr:.3f}"


def test_imgtool_roundtrip(tmp_path):
    from pbrt_tpu.utils import imageio as iio
    from pbrt_tpu.tools import imgtool

    a = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    pa = str(tmp_path / "a.pfm")
    pb = str(tmp_path / "b.pfm")
    iio.write_image(pa, a)
    iio.write_image(pb, a + 0.25)
    assert imgtool.main(["info", pa]) == 0
    assert imgtool.main(["diff", pa, pa]) == 0
    assert imgtool.main(["diff", pa, pb, "--tolerance", "0.1"]) == 1
    out = str(tmp_path / "c.pfm")
    assert imgtool.main(["convert", pa, out, "--scale", "2.0"]) == 0
    np.testing.assert_allclose(iio.read_image(out), a * 2.0, rtol=1e-5)


def test_imgtool_makesky(tmp_path):
    from pbrt_tpu.tools import imgtool
    from pbrt_tpu.utils import imageio as iio

    out = str(tmp_path / "sky.pfm")
    assert imgtool.main(
        ["makesky", "--outfile", out, "--resolution", "64",
         "--elevation", "30"]
    ) == 0
    img = np.asarray(iio.read_image(out))
    h = img.shape[0]
    assert img.shape == (32, 64, 3)
    upper = img[: h // 2]
    assert upper.mean() > 0.1, "sky hemisphere should be bright"
    assert np.isfinite(img).all()
    # Horizon rows brighter than zenith for low turbidity (Rayleigh-ish).
    assert img[h // 2 - 2].mean() > img[1].mean() * 0.5


def test_obj2pbrt_renders(tmp_path):
    from pbrt_tpu.tools import obj2pbrt
    from pbrt_tpu.sceneio import parse_pbrt_string

    obj = tmp_path / "q.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3\nf 1 3 4\n"
    )
    out = tmp_path / "q.pbrt"
    obj2pbrt.convert(str(obj), str(out))
    setup = parse_pbrt_string(out.read_text())
    scene = setup.build_scene()
    assert np.asarray(scene.tri_indices).shape[0] >= 2


def test_cyhair2pbrt(tmp_path):
    import struct

    from pbrt_tpu.tools import cyhair2pbrt
    from pbrt_tpu.sceneio import parse_pbrt_string

    hp = tmp_path / "t.hair"
    with open(hp, "wb") as f:
        f.write(b"HAIR")
        f.write(struct.pack("<IIIIff", 1, 4, 2 | 4, 3, 0.1, 0.5))
        f.write(struct.pack("<fff", 0.5, 0.3, 0.1))
        f.write(b"\0" * 88)
        pts = np.arange(12, dtype="<f4").reshape(4, 3) * 0.1
        f.write(pts.tobytes())
        f.write((np.ones(4, "<f4") * 0.05).tobytes())
    out = tmp_path / "t.pbrt"
    cyhair2pbrt.convert(str(hp), str(out))
    setup = parse_pbrt_string(out.read_text())
    scene = setup.build_scene()
    assert np.asarray(scene.tri_indices).shape[0] > 0
