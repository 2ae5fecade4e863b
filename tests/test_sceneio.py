"""Scene compiler tests: tokenizer/parser/api against killeroo-simple.

Golden numbers (prim counts etc.) are structural facts of the scene file
(scenes/killeroo-simple.pbrt + geometry/killeroo.pbrt)."""
import numpy as np
import pytest

from pbrt_tpu.sceneio import parse_pbrt_string, parse_pbrt_file

SIMPLE_SCENE = """
LookAt 0 0 5  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [32] "integer yresolution" [24]
Sampler "sobol" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
WorldBegin
AttributeBegin
  Material "matte" "color Kd" [.5 .4 .3]
  Shape "sphere" "float radius" [1]
AttributeEnd
AttributeBegin
  Translate 0 5 0
  AreaLightSource "area" "color L" [10 10 10]
  Shape "sphere" "float radius" [.5]
AttributeEnd
Shape "trianglemesh" "point P" [-5 -2 -5  5 -2 -5  5 -2 5  -5 -2 5]
  "integer indices" [0 1 2 2 3 0]
LightSource "point" "color I" [3 3 3] "point from" [0 4 0]
WorldEnd
"""


def test_parse_simple_scene():
    setup = parse_pbrt_string(SIMPLE_SCENE)
    assert setup.camera_name == "perspective"
    assert setup.resolution == (32, 24)
    assert setup.sampler_name == "sobol"
    assert setup.make_sampler_config().spp == 4
    assert setup.make_integrator_config().max_depth == 3

    b = setup.scene_builder
    # 2 spheres + 2 floor triangles.
    assert len(b.quadrics) == 2
    assert b._n_tris == 2
    assert len(b.lights) == 2  # area + point
    scene = setup.build_scene()
    assert scene.prim_type.shape[0] == 4


def test_camera_transform_lookat():
    setup = parse_pbrt_string(SIMPLE_SCENE)
    c2w = setup.camera_to_world
    eye = c2w.apply_point(np.zeros(3))
    np.testing.assert_allclose(eye, [0, 0, 5], atol=1e-5)
    # Camera looks toward origin: +z camera axis maps to -z world.
    d = c2w.apply_vector(np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-5)


def test_attribute_stack_restores_state():
    s = parse_pbrt_string(
        """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Material "matte" "color Kd" [1 0 0]
AttributeBegin
  Material "matte" "color Kd" [0 1 0]
  Shape "sphere" "float radius" [1]
AttributeEnd
Shape "sphere" "float radius" [2]
WorldEnd
"""
    )
    b = s.scene_builder
    scene = s.build_scene()
    mats = np.asarray(scene.materials.kd)
    # First sphere green, second red.
    m1 = b.prims[0].material
    m2 = b.prims[1].material
    np.testing.assert_allclose(mats[m1], [0, 1, 0])
    np.testing.assert_allclose(mats[m2], [1, 0, 0])


def test_parse_killeroo():
    setup = parse_pbrt_file("/root/reference/scenes/killeroo-simple.pbrt")
    assert setup.resolution == (700, 700)
    assert setup.sampler_name == "halton"
    assert setup.make_sampler_config().spp == 8
    b = setup.scene_builder
    # 1 area-light sphere; 2 ground/back quads (4 tris); 2 killeroo instances.
    assert len(b.quadrics) == 1
    assert len(b.lights) == 1
    assert b._n_tris > 10000  # two killeroo meshes
    scene = setup.build_scene()
    assert scene.bvh_min.shape[0] > 1000
    # Plastic + matte materials present.
    from pbrt_tpu import scene as sc

    mt = set(np.asarray(scene.materials.mat_type).tolist())
    assert sc.MAT_PLASTIC in mt and sc.MAT_MATTE in mt


def test_object_instancing():
    s = parse_pbrt_string(
        """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
ObjectBegin "tri"
  Shape "trianglemesh" "point P" [0 0 0 1 0 0 0 1 0] "integer indices" [0 1 2]
ObjectEnd
ObjectInstance "tri"
Translate 5 0 0
ObjectInstance "tri"
WorldEnd
"""
    )
    b = s.scene_builder
    # Runtime instancing (round 5): ONE shared object-space triangle row,
    # two TransformedPrimitive instances — no vertex duplication
    # (primitive.h:99-127; the old flattening duplicated verts).
    assert b._n_tris == 1
    assert len(b.instances) == 2
    assert len(b.inst_tri) == 2
    # Second instance's instance-to-world carries the +5 x translation.
    i2w = b.instances[1][12:24].reshape(3, 4)
    assert abs(i2w[0, 3] - 5.0) < 1e-5
    scene = s.build_scene()
    # Transformed world bounds reach the translated instance.
    assert float(np.asarray(scene.bvh_max)[0, 0]) >= 6.0 - 1e-4
