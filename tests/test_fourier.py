"""FourierBSDF tests.

Golden values from the reference's own smoke test (tests/fourierbsdf.cpp
TEST(BSDFs, Fourier), which evaluates roughgold_alpha_0.2.bsdf — serialized
in the test binary; extracted here to pbrt_tpu/data/roughgold_alpha_0.2.bsdf)
plus sampling-consistency checks in the hair.cpp:197 style.
"""
import os

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.materials import fourier as fz

DATA = os.path.join(os.path.dirname(__file__), "..", "pbrt_tpu", "data",
                    "roughgold_alpha_0.2.bsdf")
Y_WEIGHT = np.array([0.212671, 0.715160, 0.072169])


def _norm(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def _table():
    return fz.read_bsdf(DATA)


def test_read_header():
    tbl = _table()
    assert (tbl.n_mu, tbl.m_max, tbl.n_channels) == (58, 172, 3)
    assert tbl.eta == 1.0
    assert tbl.a.shape[0] == 41502 + 3 * 172  # nCoeffs + pad


def test_golden_eval_and_pdf():
    """Reference goldens (fourierbsdf.cpp:17317-17325), Importance mode."""
    tbl = _table()
    wo = jnp.asarray([_norm([-0.5, -0.5, 0.8])])
    wi = jnp.asarray([_norm([0.4, 0.52, 0.7])])
    f, pdf = fz.table_f(tbl, wo, wi, radiance=False)
    np.testing.assert_allclose(np.asarray(f)[0] @ Y_WEIGHT, 2.679294,
                               rtol=1e-3)
    np.testing.assert_allclose(float(pdf[0]), 2.438230, rtol=1e-3)
    _, pdf_rev = fz.table_f(tbl, wo=wi, wi=wo, radiance=False)
    np.testing.assert_allclose(float(pdf_rev[0]), 2.503326, rtol=1e-3)


def test_golden_sample():
    """Sample_f goldens (fourierbsdf.cpp:17327-17335)."""
    tbl = _table()
    wo = jnp.asarray([_norm([-0.5, -0.5, 0.8])])
    s = fz.table_sample(tbl, wo, jnp.asarray([[0.1, 0.8]]), radiance=False)
    np.testing.assert_allclose(np.asarray(s["f"])[0] @ Y_WEIGHT, 2.596391,
                               rtol=1e-3)
    np.testing.assert_allclose(float(s["pdf"][0]), 1.855472, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(s["wi"])[0], [0.539052, 0.617347, 0.572980], atol=1e-4)


def test_sample_pdf_eval_consistency():
    """Sample_f's returned (f, pdf) must agree with f()/Pdf() re-evaluated
    at the sampled direction (BxDF contract, reflection.h:221-246)."""
    tbl = _table()
    n = 256
    rng = np.random.default_rng(3)
    wo = _norm([0.3, -0.2, 0.93])
    wo_b = jnp.asarray(np.broadcast_to(wo, (n, 3)).copy())
    u = jnp.asarray(rng.random((n, 2), np.float32))
    s = fz.table_sample(tbl, wo_b, u, radiance=False)
    f_re, pdf_re = fz.table_f(tbl, wo_b, s["wi"], radiance=False)
    ok = np.asarray(s["pdf"]) > 1e-3
    np.testing.assert_allclose(
        np.asarray(s["pdf"])[ok], np.asarray(pdf_re)[ok], rtol=2e-2)
    fy_s = np.asarray(s["f"]) @ Y_WEIGHT
    fy_re = np.asarray(f_re) @ Y_WEIGHT
    big = ok & (fy_re > 1e-3)
    np.testing.assert_allclose(fy_s[big], fy_re[big], rtol=2e-2)


def test_importance_vs_uniform_reflectance():
    """Importance-sampled hemispherical reflectance estimate must match the
    uniform-hemisphere estimate (importance-consistency, hair.cpp pattern)."""
    tbl = _table()
    n = 4096
    rng = np.random.default_rng(11)
    wo = _norm([0.0, 0.4, 0.92])
    wo_b = jnp.asarray(np.broadcast_to(wo, (n, 3)).copy())
    # importance: E[f cos / pdf]
    u = jnp.asarray(rng.random((n, 2), np.float32))
    s = fz.table_sample(tbl, wo_b, u, radiance=False)
    fy = np.asarray(s["f"]) @ Y_WEIGHT
    cos_i = np.abs(np.asarray(s["wi"])[:, 2])
    pdf = np.asarray(s["pdf"])
    est_imp = np.mean(np.where(pdf > 0, fy * cos_i / np.maximum(pdf, 1e-20), 0.0))
    # uniform hemisphere below the surface (gold reflects into -z given the
    # table's muI = cos(theta(-wi)) convention: sampled wi has wi.z > 0 when
    # wo.z > 0? use whichever hemisphere sampling actually lands in)
    z_sign = np.sign(np.median(np.asarray(s["wi"])[:, 2]))
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 2] = z_sign * np.abs(v[:, 2])
    f_u, _ = fz.table_f(tbl, wo_b, jnp.asarray(v), radiance=False)
    fy_u = np.asarray(f_u) @ Y_WEIGHT
    est_uni = np.mean(fy_u * np.abs(v[:, 2])) * 2 * np.pi
    np.testing.assert_allclose(est_imp, est_uni, rtol=0.1)


def test_dispatch_through_material_table():
    """MAT_FOURIER lanes route through sample_material/eval_material."""
    from pbrt_tpu import scene as sc
    from pbrt_tpu.materials import bsdf as bx

    b = sc.SceneBuilder()
    b.add_material(sc.MAT_FOURIER, fourier_file=DATA)
    b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5))
    b.add_sphere(__import__("pbrt_tpu.core.transform", fromlist=["tf"]).identity(), 1.0, material=0)
    scene = b.build()
    assert len(scene.materials.fourier) == 1
    n = 64
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    mat = bx.gather_material(scene.materials, ids, None,
                             (sc.MAT_FOURIER, sc.MAT_MATTE))
    wo = jnp.broadcast_to(jnp.asarray(_norm([0.2, 0.1, 0.97])), (n, 3))
    u = jnp.asarray(rng.random((n, 2), np.float32))
    s = bx.sample_material(mat, wo, u, (sc.MAT_FOURIER, sc.MAT_MATTE))
    assert np.isfinite(np.asarray(s["f"])).all()
    assert np.isfinite(np.asarray(s["pdf"])).all()
    is_f = np.asarray(ids) == 0
    assert (np.asarray(s["pdf"])[is_f] > 0).mean() > 0.8
    f, pdf = bx.eval_material(mat, wo, s["wi"], (sc.MAT_FOURIER, sc.MAT_MATTE))
    assert np.isfinite(np.asarray(f)).all() and np.isfinite(np.asarray(pdf)).all()


def test_parse_fourier_pbrt():
    """'Material \"fourier\"' wires a FourierTable through the scene API."""
    from pbrt_tpu.sceneio.parser import parse_pbrt_string
    from pbrt_tpu import scene as sc

    txt = f'''
Camera "perspective"
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Material "fourier" "string bsdffile" ["{os.path.abspath(DATA)}"]
Shape "sphere" "float radius" [1]
LightSource "point" "rgb I" [1 1 1]
WorldEnd
'''
    setup = parse_pbrt_string(txt)
    scene = setup.build_scene()
    mt = np.asarray(scene.materials.mat_type)
    assert (mt == sc.MAT_FOURIER).any()
    assert len(scene.materials.fourier) == 1
    assert scene.materials.fourier[0].n_mu == 58
