"""--cat/--toply scene reformatters (pbrt.cpp:92-97 print branches):
round-trip — reformatted output must parse to an equivalent scene."""
import io
import os

import numpy as np

from pbrt_tpu.sceneio.cat import cat_file, CatAPI
from pbrt_tpu.sceneio.parser import (
    tokenize, _TokenStream, parse_tokens, parse_pbrt_string,
)

SCENE = """
# comment stripped
LookAt 0 0 5  0 0 0  0 1 0
Camera "perspective" "float fov" [30]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Sampler "sobol" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
WorldBegin
AttributeBegin
  Material "matte" "color Kd" [.5 .5 .5]
  Shape "trianglemesh" "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
AttributeBegin
  AreaLightSource "area" "color L" [4 4 4]
  Shape "sphere" "float radius" [0.5]
AttributeEnd
WorldEnd
"""


def _cat_string(text, to_ply=False, ply_dir="."):
    out = io.StringIO()
    api = CatAPI(out=out, to_ply=to_ply, ply_dir=ply_dir)
    parse_tokens(_TokenStream(tokenize(text)), api)
    return out.getvalue()


def test_cat_roundtrip():
    formatted = _cat_string(SCENE)
    # Comments stripped, directives preserved.
    assert "#" not in formatted
    for d in ("LookAt", "Camera", "Film", "Sampler", "Integrator",
              "WorldBegin", "AttributeBegin", "Shape", "AreaLightSource",
              "WorldEnd"):
        assert d in formatted, d
    # The reformatted text must itself parse into an equivalent scene.
    s1 = parse_pbrt_string(SCENE).build_scene()
    s2 = parse_pbrt_string(formatted).build_scene()
    np.testing.assert_allclose(
        np.asarray(s1.tri_p), np.asarray(s2.tri_p), rtol=1e-6
    )
    assert s1.prim_type.shape == s2.prim_type.shape


def test_toply_roundtrip(tmp_path):
    formatted = _cat_string(SCENE, to_ply=True, ply_dir=str(tmp_path))
    assert "plymesh" in formatted and "trianglemesh" not in formatted
    ply = tmp_path / "mesh_00001.ply"
    assert ply.exists()
    # Parse the reformatted scene from the sidecar dir: same triangle count.
    s1 = parse_pbrt_string(SCENE).build_scene()
    s2 = parse_pbrt_string(formatted, cwd=str(tmp_path)).build_scene()
    assert s1.tri_indices.shape == s2.tri_indices.shape
    np.testing.assert_allclose(
        np.sort(np.asarray(s1.tri_p), 0), np.sort(np.asarray(s2.tri_p), 0),
        rtol=1e-5,
    )
