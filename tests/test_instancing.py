"""Runtime instancing (TransformedPrimitive, core/primitive.h:99-127).

Mesh templates share vertex/attr rows across instances; traversal
transforms rays into object space per lane.  Checks: image equivalence
vs the flattened (vertex-duplicating) formulation, the no-duplication
memory property, and the ObjectBegin/Instance parser path.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu import scene as sc
from pbrt_tpu import film as fm
from pbrt_tpu.cameras import make_perspective_camera
from pbrt_tpu.core import transform as tf
from pbrt_tpu.integrators import path as pt
from pbrt_tpu.samplers.samplers import SamplerConfig

RES = (32, 32)

QUAD_I = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
QUAD_P = np.array(
    [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]],
    np.float32,
)
XFS = [
    tf.translate(-0.9, 0.0, 3.0),
    tf.translate(0.9, 0.3, 3.5) @ tf.rotate_z(40.0),
    tf.translate(0.0, -0.6, 4.0) @ tf.scale(1.5, 0.7, 1.0),
]


def _render(scene):
    cam = make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), RES, fov_deg=60.0
    )
    return np.asarray(
        pt.render(
            scene, cam, fm.FilmConfig(full_resolution=RES),
            SamplerConfig("halton", 2, RES), pt.PathConfig(max_depth=2),
        )
    )


def _common(b):
    mf = b.add_material(sc.MAT_MATTE, kd=(0.4, 0.4, 0.4))
    b.add_triangle_mesh(
        np.array([[0, 1, 2], [0, 2, 3]]),
        np.array([[-6, -6, 6], [6, -6, 6], [6, 6, 6], [-6, 6, 6]], np.float32),
        material=mf,
    )
    b.add_point_light(tf.translate(0.0, 2.0, 0.0), (30.0, 30.0, 30.0))


def _build_instanced():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.7, 0.3, 0.2))
    b.begin_mesh_template()
    b.add_triangle_mesh(QUAD_I, QUAD_P, material=m)
    tmpl = b.end_mesh_template()
    for x in XFS:
        b.add_mesh_instance(tmpl, x)
    _common(b)
    return b.build()


def _build_flattened():
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.7, 0.3, 0.2))
    for x in XFS:
        b.add_triangle_mesh(QUAD_I, QUAD_P, object_to_world=x, material=m)
    _common(b)
    return b.build()


def test_instanced_matches_flattened_image():
    img_i = _render(_build_instanced())
    img_f = _render(_build_flattened())
    # Different arithmetic (ray transformed vs vertices pre-transformed):
    # agreement is numerical, not bit-exact.
    np.testing.assert_allclose(img_i, img_f, rtol=2e-3, atol=2e-4)


def test_instancing_shares_vertex_rows():
    si = _build_instanced()
    sf = _build_flattened()
    # template quad = 2 tri-attr rows (+2 floor) vs 3x duplicated.
    assert si.tri_attr.shape[0] == sf.tri_attr.shape[0] - 4
    assert si.inst_tri.shape == (6, 2)
    assert si.inst_xf.shape == (3, 24)


def test_object_instance_parser_path(tmp_path):
    from pbrt_tpu.sceneio import parse_pbrt_string

    scene_txt = """
    LookAt 0 0 0  0 0 1  0 1 0
    Camera "perspective" "float fov" [60]
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "halton" "integer pixelsamples" [2]
    Integrator "path" "integer maxdepth" [2]
    WorldBegin
    LightSource "point" "color I" [30 30 30] "point from" [0 2 0]
    Material "matte" "color Kd" [.7 .3 .2]
    ObjectBegin "card"
      Shape "trianglemesh"
        "point P" [-0.5 -0.5 0  0.5 -0.5 0  0.5 0.5 0  -0.5 0.5 0]
        "integer indices" [0 1 2 0 2 3]
    ObjectEnd
    AttributeBegin
      Translate -0.9 0 3
      ObjectInstance "card"
    AttributeEnd
    AttributeBegin
      Translate 0.9 0.3 3.5
      ObjectInstance "card"
    AttributeEnd
    Material "matte" "color Kd" [.4 .4 .4]
    Shape "trianglemesh"
      "point P" [-6 -6 6  6 -6 6  6 6 6  -6 6 6]
      "integer indices" [0 1 2 0 2 3]
    WorldEnd
    """
    setup = parse_pbrt_string(scene_txt)
    scene = setup.build_scene()
    assert scene.inst_tri is not None and scene.inst_tri.shape[0] == 4
    cam = setup.make_camera()
    film_cfg, filt = setup.make_film_config()
    img = pt.render(
        scene, cam, film_cfg, setup.make_sampler_config(),
        setup.make_integrator_config(), filt=filt,
    )
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.mean() > 1e-3
