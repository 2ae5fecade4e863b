"""SampledSpectrum machinery + spectral render mode (spectrum.h:48-515).

Unit layer: resampling against brute-force numeric integration, RGB
round-trips through the Smits basis, blackbody physics, copper SPD
conversion.  Integration layer: the spectral render of the analytic furnace
scene matches its RGB render within the spectral-lift tolerance (pbrt's own
sampled build differs from its RGB build by the same basis-approximation
error).
"""
import numpy as np
import pytest

from pbrt_tpu.core import sampled_spectrum as ss


def test_average_spectrum_samples_matches_numeric():
    lam = np.array([400.0, 500.0, 600.0, 700.0])
    vals = np.array([1.0, 3.0, 2.0, 4.0])
    # numeric integration of the piecewise-linear SPD
    xs = np.linspace(430.0, 650.0, 200001)
    ys = np.interp(xs, lam, vals)
    want = np.trapezoid(ys, xs) / (650.0 - 430.0)
    got = float(ss.average_spectrum_samples(lam, vals, 430.0, 650.0))
    assert abs(got - want) < 1e-4


def test_average_extrapolates_with_edge_clamp():
    lam = np.array([500.0, 600.0])
    vals = np.array([2.0, 4.0])
    # range entirely below the SPD: constant edge value (spectrum.cpp:74).
    assert float(ss.average_spectrum_samples(lam, vals, 400.0, 450.0)) == 2.0
    assert float(ss.average_spectrum_samples(lam, vals, 650.0, 700.0)) == 4.0


def test_cie_y_integral_consistency():
    # sum(CIE_Y) * dl ~ CIE_Y_integral (spectrum.h:95).
    t = ss._tables()
    approx = np.trapezoid(t["CIE_Y"], t["CIE_lambda"])
    assert abs(approx - ss.CIE_Y_INTEGRAL) / ss.CIE_Y_INTEGRAL < 1e-3


@pytest.mark.parametrize("rgb", [(0.2, 0.5, 0.8), (0.9, 0.1, 0.3), (0.5, 0.5, 0.5)])
def test_rgb_spectrum_roundtrip(rgb):
    s = ss.from_rgb(np.asarray(rgb), "reflectance")
    assert (s >= 0).all()
    back = ss.to_rgb(s)
    # Smits-basis approximation tolerance (pbrt's own FromRGB/ToRGB error).
    np.testing.assert_allclose(back, rgb, atol=0.12, rtol=0.25)


def test_luminance_of_lifted_illuminant():
    spec = ss.from_rgb(np.array([1.0, 1.0, 1.0]), "illuminant")
    y = float(ss.y_luminance(spec))
    assert 0.7 < y < 1.2


def test_blackbody_wien_peak():
    lam = np.linspace(200.0, 3000.0, 4000)
    for temp in (3000.0, 6500.0):
        le = ss.blackbody(lam, temp)
        peak = lam[np.argmax(le)]
        wien = 2.8977721e-3 / temp * 1e9
        assert abs(peak - wien) < 2.0, (temp, peak, wien)
        bn = ss.blackbody_normalized(lam, temp)
        assert abs(bn.max() - 1.0) < 1e-3


def test_copper_eta_k_close_to_reference_values():
    # metal.cpp's FromSampled conversion of the measured Cu data; the values
    # the reference's RGB build uses (printed by pbrt: ~0.2/0.92/1.10 eta).
    eta, k = ss.copper_eta_k_rgb()
    np.testing.assert_allclose(eta, [0.2004, 0.9240, 1.1022], atol=0.02)
    np.testing.assert_allclose(k, [3.9129, 2.4528, 2.1421], atol=0.05)


def test_spd_param_roundtrip_through_paramset():
    from pbrt_tpu.sceneio.paramset import ParamSet

    # constant-1 SPD over the visible range -> white-ish reflectance.
    ps = ParamSet({"Kd": ("spectrum", [400.0, 1.0, 550.0, 1.0, 700.0, 1.0])})
    rgb = ps.find_one_spectrum("Kd", None)
    assert rgb.shape == (3,)
    assert np.all(rgb > 0.85) and np.all(rgb < 1.25)


def test_blackbody_param():
    from pbrt_tpu.sceneio.paramset import ParamSet

    ps = ParamSet({"L": ("blackbody", [6500.0, 2.0])})
    rgb = ps.find_one_spectrum("L", None)
    # 6500K is near-white: channels within ~35% of each other, scaled by 2.
    assert rgb.max() / rgb.min() < 1.6
    assert rgb.max() > 1.0


def test_spectral_furnace_matches_rgb():
    """Analytic furnace (matte sphere interior + point light): the N=60
    spectral render must agree with the RGB path render within the
    spectral-lift tolerance."""
    import jax.numpy as jnp
    from pbrt_tpu import scene as sc, film as fm
    from pbrt_tpu.core import transform as tf
    from pbrt_tpu.cameras import make_perspective_camera
    from pbrt_tpu.integrators import path as pt
    from pbrt_tpu.integrators import spectral as sp
    from pbrt_tpu.samplers.samplers import SamplerConfig

    RES = (12, 12)
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5), sigma=0.0)
    b.add_sphere(tf.identity(), 1.0, material=m)
    b.add_point_light(tf.identity(), (np.pi, np.pi, np.pi))
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), RES, fov_deg=60.0
    )
    film_cfg = fm.FilmConfig(full_resolution=RES)
    scfg = SamplerConfig("sobol", 16, RES)
    img_rgb = np.asarray(
        pt.render(scene, cam, film_cfg, scfg, pt.PathConfig(max_depth=6))
    )
    img_spec = np.asarray(
        sp.render(scene, cam, film_cfg, scfg, sp.SpectralConfig(max_depth=6))
    )
    expected = 1.0 - 0.5 ** 6
    assert abs(img_rgb.mean() - expected) < 0.03
    # Spectral vs RGB: basis-approximation + independent-mc tolerance.
    assert abs(img_spec.mean() - img_rgb.mean()) < 0.08, (
        img_spec.mean(), img_rgb.mean(),
    )
    # Channels stay near-neutral for a neutral scene.
    ch = img_spec.reshape(-1, 3).mean(0)
    assert ch.max() / max(ch.min(), 1e-6) < 1.35, ch
