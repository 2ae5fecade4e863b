"""Texture subsystem tests (src/textures/ analog)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.textures import textures as tx
from pbrt_tpu.textures import noise as pn


def test_checkerboard_parity():
    t = tx.HostTextureTable()
    cid = t.add(tx.TEX_CHECKER, c1=(1, 1, 1), c2=(0, 0, 0))
    table = t.freeze()
    uv = jnp.asarray([[0.25, 0.25], [1.25, 0.25], [1.25, 1.25], [0.25, 1.25]])
    p = jnp.zeros((4, 3))
    vals = tx.evaluate_textures(table, uv, p)
    v = np.asarray(vals[cid, :, 0])
    np.testing.assert_array_equal(v, [1, 0, 1, 0])


def test_scale_of_checker_dag():
    t = tx.HostTextureTable()
    c = t.add(tx.TEX_CHECKER, c1=(1, 1, 1), c2=(0.5, 0.5, 0.5))
    s = t.add(tx.TEX_SCALE, c2=(2.0, 2.0, 2.0), child1=c)
    table = t.freeze()
    uv = jnp.asarray([[0.25, 0.25], [1.25, 0.25]])
    vals = tx.evaluate_textures(table, uv, jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(vals[s, :, 0]), [2.0, 1.0])


def test_noise_range_and_smoothness():
    rs = np.random.RandomState(0)
    p = jnp.asarray(rs.randn(1000, 3) * 10, jnp.float32)
    n = np.asarray(pn.noise(p))
    assert (np.abs(n) <= 1.0 + 1e-4).all()
    assert n.std() > 0.05  # actually varies
    # Continuity: small perturbation -> small change.
    n2 = np.asarray(pn.noise(p + 1e-4))
    assert np.abs(n - n2).max() < 0.01


def test_noise_zero_at_integers():
    """Classic Perlin noise vanishes at lattice points."""
    p = jnp.asarray([[0, 0, 0], [1, 2, 3], [-4, 5, -6]], jnp.float32)
    np.testing.assert_allclose(np.asarray(pn.noise(p)), 0.0, atol=1e-6)


def test_imagemap_bilinear():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = 1.0  # top-left
    t = tx.HostTextureTable()
    tid = t.add(tx.TEX_IMAGEMAP, c1=(1, 1, 1), image=img)
    table = t.freeze()
    # v=1 maps to image top (v-flip); texel centers at (0.25,0.75) etc.
    uv = jnp.asarray([[0.25, 0.75], [0.75, 0.75], [0.25, 0.25]])
    vals = tx.evaluate_textures(table, uv, jnp.zeros((3, 3)))
    v = np.asarray(vals[tid, :, 0])
    np.testing.assert_allclose(v, [1.0, 0.0, 0.0], atol=1e-5)


def test_material_texture_binding_in_scene():
    from pbrt_tpu.sceneio import parse_pbrt_string
    from pbrt_tpu.statics import scene_statics

    s = parse_pbrt_string(
        """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Texture "checks" "spectrum" "checkerboard"
  "float uscale" [8] "float vscale" [8]
  "rgb tex1" [1 0 0] "rgb tex2" [0 0 1]
Material "matte" "texture Kd" "checks"
Shape "trianglemesh" "point P" [-1 -1 0 1 -1 0 1 1 0 -1 1 0]
  "float uv" [0 0 1 0 1 1 0 1] "integer indices" [0 1 2 2 3 0]
WorldEnd
"""
    )
    scene = s.build_scene()
    st = scene_statics(scene)
    assert st.has_textures
    assert int(np.asarray(scene.materials.kd_tex)[-1]) >= 0
