"""Media tests: HG normalization + sampling match (src/tests/hg.cpp pattern),
homogeneous Beer-Lambert attenuation end-to-end via volpath."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.media import media as md


def test_hg_normalization():
    """Integral of p over the sphere = 1 for several g (hg.cpp:17-36)."""
    for g in (-0.6, 0.0, 0.3, 0.8):
        nt, np_ = 64, 128
        theta = (np.arange(nt) + 0.5) * np.pi / nt
        cos_t = np.cos(theta)
        # p depends only on angle between wo and wi; wo = +z.
        p = np.asarray(md.hg_p(jnp.asarray(cos_t, jnp.float32), g))
        integral = float(
            (p * np.sin(theta)).sum() * (np.pi / nt) * 2 * np.pi
        )
        assert abs(integral - 1.0) < 1e-2, (g, integral)


def test_hg_sampling_matches_pdf():
    """Sampled cos-theta histogram vs analytic pdf (hg.cpp:38-74)."""
    g = 0.5
    rs = np.random.RandomState(0)
    u = jnp.asarray(rs.rand(200000, 2), jnp.float32)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (200000, 3))
    wi, p = md.hg_sample(wo, u, jnp.float32(g))
    cos_t = np.asarray(wi[:, 2])  # dot(wo, wi)
    hist, edges = np.histogram(cos_t, bins=32, range=(-1, 1), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    # density over cos-theta: pdf(cos) = 2*pi*p_HG(cos)
    want = 2 * np.pi * np.asarray(md.hg_p(jnp.asarray(centers, jnp.float32), g))
    np.testing.assert_allclose(hist, want, rtol=0.1)


def test_homogeneous_sample_distribution():
    """Distance sampling expectation: weight is unbiased for Tr * sigma_s."""
    sigma_a = jnp.full((50000, 3), 0.5)
    sigma_s = jnp.full((50000, 3), 1.5)
    rs = np.random.RandomState(1)
    u1 = jnp.asarray(rs.rand(50000), jnp.float32)
    u2 = jnp.asarray(rs.rand(50000), jnp.float32)
    t_max = jnp.full((50000,), 1.0)
    s = md.homogeneous_sample(sigma_a, sigma_s, t_max, u1, u2)
    # E[weight * 1{surface}] = Tr(t_max); sigma_t = 2.
    surf_w = np.where(
        np.asarray(s["sampled_medium"])[:, None], 0.0, np.asarray(s["weight"])
    )
    np.testing.assert_allclose(surf_w.mean(0), np.exp(-2.0), rtol=0.02)


def test_beer_lambert_volpath():
    """Camera inside an absorbing-only global medium looking at an emissive
    sphere shell: L = Le * exp(-sigma_a * d)."""
    from pbrt_tpu import scene as sc, film as fm
    from pbrt_tpu.core import transform as tf
    from pbrt_tpu.cameras import make_perspective_camera
    from pbrt_tpu.integrators import volpath as vp
    from pbrt_tpu.integrators.path import PathConfig
    from pbrt_tpu.samplers.samplers import SamplerConfig

    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.0, 0.0, 0.0))
    b.add_emissive_sphere(
        tf.identity(), 2.0, L=(4.0, 4.0, 4.0), material=m, two_sided=True
    )
    sigma_a = 0.7
    b.camera_medium = b.media.add_homogeneous(
        (sigma_a,) * 3, (0.0, 0.0, 0.0), 0.0
    )
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), (8, 8), fov_deg=30.0
    )
    img = np.asarray(
        vp.render(
            scene, cam, fm.FilmConfig(full_resolution=(8, 8)),
            SamplerConfig("sobol", 16, (8, 8)), PathConfig(max_depth=2),
        )
    )
    # Rays hit the shell at distance ~2 (center rays exactly 2).
    expected = 4.0 * np.exp(-sigma_a * 2.0)
    np.testing.assert_allclose(img.mean(), expected, rtol=0.03)


def test_scattering_fog_brightens_toward_equilibrium():
    """Isotropic scattering with albedo 1 in a furnace: radiance stays Le
    (scattering neither creates nor destroys energy)."""
    from pbrt_tpu import scene as sc, film as fm
    from pbrt_tpu.core import transform as tf
    from pbrt_tpu.cameras import make_perspective_camera
    from pbrt_tpu.integrators import volpath as vp
    from pbrt_tpu.integrators.path import PathConfig
    from pbrt_tpu.samplers.samplers import SamplerConfig

    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.0, 0.0, 0.0))
    b.add_emissive_sphere(
        tf.identity(), 2.0, L=(1.0, 1.0, 1.0), material=m, two_sided=True
    )
    b.camera_medium = b.media.add_homogeneous(
        (0.0, 0.0, 0.0), (0.8, 0.8, 0.8), 0.0
    )
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), (8, 8), fov_deg=30.0
    )
    img = np.asarray(
        vp.render(
            scene, cam, fm.FilmConfig(full_resolution=(8, 8)),
            SamplerConfig("sobol", 32, (8, 8)), PathConfig(max_depth=16),
        )
    )
    # Pure scattering in a closed furnace: L == Le = 1 (up to truncation).
    assert abs(img.mean() - 1.0) < 0.06, img.mean()


def test_grid_density_lookup():
    t = md.HostMediumTable()
    d = np.zeros((4, 4, 4), np.float32)
    d[2, 2, 2] = 8.0  # [z, y, x]
    mid = t.add_grid((0.1,) * 3, (0.9,) * 3, 0.0, 4, 4, 4, d)
    table = t.freeze()
    # Voxel (2,2,2) center in unit-cube coords = (2.5/4, 2.5/4, 2.5/4).
    p = jnp.asarray([[2.5 / 4, 2.5 / 4, 2.5 / 4], [0.1, 0.1, 0.1]])
    mid_arr = jnp.asarray([mid, mid])
    dens = np.asarray(md._grid_density(table, mid_arr, p))
    assert abs(dens[0] - 8.0) < 1e-4
    assert dens[1] == 0.0
