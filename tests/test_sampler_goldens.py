"""Sampler parity vs sequences dumped from the reference pbrt-v3 binary.

The goldens in refgold/goldens/ were produced by refgold/sampler_dump.cpp
compiled against the reference source (see refgold/build_reference.sh):
for each sampler, pixels of three 2x2 blocks of a 64x64 image, 16 spp,
the stream in pbrt's consumption order (camera dims 0-4 = pFilm/time/pLens,
then 10 Get2D pairs, then 10 Get1D values) -> [12, 16, 35] f32.

halton/sobol are the bit-exact parity samplers (GlobalSampler bit math,
core/sampler.cpp:136-196); stratified/(0,2)/maxmin/random are stateless
re-expressions with documented deviations (samplers/samplers.py:16-23) and
are NOT golden-compared here.
"""
import pathlib

import numpy as np
import pytest

from pbrt_tpu.samplers import samplers as S

GOLD = pathlib.Path(__file__).resolve().parent.parent / "refgold" / "goldens"

PIXELS = []
for ox, oy in ((0, 0), (17, 5), (60, 62)):
    for dy in range(2):
        for dx in range(2):
            PIXELS.append((min(ox + dx, 63), min(oy + dy, 63)))
PIXELS = np.array(PIXELS, np.int32)  # [12, 2]
SPP = 16
NUM2D = 10
NUM1D = 10
STRIDE = 5 + 2 * NUM2D + NUM1D


def _load(name):
    p = GOLD / f"sampler_{name}.f32"
    if not p.exists():
        pytest.skip(f"golden {p} missing (run refgold/build_reference.sh)")
    return np.fromfile(p, "<f4").reshape(len(PIXELS), SPP, STRIDE)


def _our_stream(name):
    """Reproduce the dump-tool stream with our stateless samplers."""
    import jax.numpy as jnp

    cfg = S.SamplerConfig(name=name, spp=SPP, resolution=(64, 64))
    pix = np.repeat(PIXELS, SPP, axis=0)  # [12*16, 2]
    snum = np.tile(np.arange(SPP, dtype=np.int32), len(PIXELS))
    state = S.init_state(cfg, jnp.asarray(pix), jnp.asarray(snum))
    cols = []
    p_film, time, p_lens = S.get_camera_sample(cfg, state, jnp.asarray(pix))
    cols += [p_film[:, 0], p_film[:, 1], time, p_lens[:, 0], p_lens[:, 1]]
    dim = 5
    for _ in range(NUM2D):
        u = S.get_2d(cfg, state, dim)
        cols += [u[:, 0], u[:, 1]]
        dim += 2
    for _ in range(NUM1D):
        cols.append(S.get_1d(cfg, state, dim))
        dim += 1
    out = np.stack([np.asarray(c) for c in cols], axis=-1)
    return out.reshape(len(PIXELS), SPP, STRIDE)


@pytest.mark.parametrize("name", ["sobol", "halton"])
def test_stream_matches_reference(name):
    gold = _load(name)
    ours = _our_stream(name)
    # Bit-exact for sobol; halton's radical inverse accumulates in f32 on
    # TPU vs double in the reference -> allow 2 ulp (~2.4e-7 absolute).
    tol = 0.0 if name == "sobol" else 3e-7
    np.testing.assert_allclose(ours, gold, rtol=0, atol=tol)


def _exact_stream(name):
    """Reproduce the dump stream with the host-side EXACT PixelSampler
    emulator (samplers/pixel_exact.py): one sampler instance, StartPixel per
    pixel in dump order, default-constructed PCG32 — the reference binary's
    configuration (refgold/sampler_dump.cpp)."""
    from pbrt_tpu.samplers import pixel_exact as px

    n1d = NUM1D + 2 * NUM2D + 5
    n2d = n1d
    if name == "random":
        rng = px.PCG32(0)  # RandomSampler(SPP) -> rng(seed=0)
        out = np.empty((len(PIXELS), SPP, STRIDE), np.float32)
        for i, (x, y) in enumerate(PIXELS):
            for s in range(SPP):
                vals = [rng.uniform_float() for _ in range(STRIDE)]
                # pFilm = pixel + Get2D()
                vals[0] = np.float32(np.float32(x) + vals[0])
                vals[1] = np.float32(np.float32(y) + vals[1])
                out[i, s] = vals
        return out
    s1, s2 = px.exact_pixel_tables(
        name, PIXELS, SPP, n1d, n2d, seed=None, strat_xy=(4, 4)
    )
    out = np.empty((len(PIXELS), SPP, STRIDE), np.float32)
    for i, (x, y) in enumerate(PIXELS):
        for s in range(SPP):
            cols = []
            # GetCameraSample: pFilm = p + Get2D (2D dim 0), time (1D dim 0),
            # pLens (2D dim 1) — core/sampler.cpp:46-52.
            cols += [np.float32(np.float32(x) + s2[i, 0, s, 0]),
                     np.float32(np.float32(y) + s2[i, 0, s, 1])]
            cols.append(s1[i, 0, s])
            cols += [s2[i, 1, s, 0], s2[i, 1, s, 1]]
            for d in range(NUM2D):
                cols += [s2[i, 2 + d, s, 0], s2[i, 2 + d, s, 1]]
            for d in range(NUM1D):
                cols.append(s1[i, 1 + d, s])
            out[i, s] = cols
    return out


@pytest.mark.parametrize(
    "name", ["stratified", "zerotwosequence", "maxmindist", "random"]
)
def test_pixel_sampler_exact_stream(name):
    """BIT-EXACT parity for the PixelSampler family via the host emulator —
    closes the 6/6 sampler-parity gap (the render path's stateless
    equivalents remain distribution-matched, documented in samplers.py;
    exact tables are available to the renderer via
    pixel_exact.exact_pixel_tables)."""
    gold = _load(name)
    ours = _exact_stream(name)
    np.testing.assert_array_equal(ours, gold)


@pytest.mark.parametrize("name", ["sobol", "halton"])
def test_raw_dimension_table(name):
    """SampleDimension(idx, dim) for dims 2..31, idx 0..255 (dims 0-1 are
    pixel-relative and covered by the stream test above)."""
    import jax.numpy as jnp
    from pbrt_tpu.core import lowdiscrepancy as ld

    p = GOLD / f"{name}_dims.f32"
    if not p.exists():
        pytest.skip("golden missing")
    gold = np.fromfile(p, "<f4").reshape(32, 256)
    idx = np.arange(256, dtype=np.uint32)
    for dim in range(2, 32):
        if name == "sobol":
            ours = np.asarray(
                ld.sobol_sample_float64idx(
                    jnp.zeros_like(jnp.asarray(idx)), jnp.asarray(idx), dim
                )
            )
            np.testing.assert_array_equal(ours, gold[dim], err_msg=f"dim {dim}")
        else:
            perms = ld.radical_inverse_permutations().astype(np.int32)
            off = int(ld.PRIME_SUMS[dim])
            pr = int(ld.PRIMES[dim])
            ours = np.asarray(
                ld.scrambled_radical_inverse(
                    dim, jnp.asarray(idx), jnp.asarray(perms[off : off + pr])
                )
            )
            np.testing.assert_allclose(
                ours, gold[dim], rtol=0, atol=3e-7, err_msg=f"dim {dim}"
            )


def test_halton_exact_tables_bit_match_reference():
    """samplers/exact_tables.py (f64-exact host tables, the `exact` render
    mode) must reproduce the reference binary's halton stream BIT-EXACTLY —
    unlike the in-graph f32 radical inverse (<=2 ulp above), this path does
    the double accumulate the reference does (lowdiscrepancy.h:50-140)."""
    from pbrt_tpu.samplers import exact_tables as xt

    gold = _load("halton")
    cfg = S.SamplerConfig(name="halton", spp=SPP, resolution=(64, 64))
    out = np.empty((len(PIXELS), SPP, STRIDE), np.float32)
    for s in range(SPP):
        tab = xt.halton_exact_table(cfg, PIXELS, s, STRIDE)  # [12, 35]
        row = tab.copy()
        row[:, 0] += PIXELS[:, 0]  # pFilm = pixel + Get2D (sampler.cpp:46)
        row[:, 1] += PIXELS[:, 1]
        out[:, s, :] = row
    np.testing.assert_array_equal(out, gold)


def test_pixel_exact_render_mode_stratified():
    """Round 5: exact_pixel_tables is a real RENDER mode — the table
    feeds dims 0-9 from the per-tile sequential-RNG streams (bit-exact
    class, golden-tested via pixel_exact.py) and the render consumes it.
    Checks the tile/seed/order mapping against a direct emulator call and
    that the end-to-end render runs and stays estimator-consistent."""
    import dataclasses

    import jax.numpy as jnp

    from pbrt_tpu import scene as sc
    from pbrt_tpu import film as fm
    from pbrt_tpu.cameras import make_perspective_camera
    from pbrt_tpu.core import transform as tf
    from pbrt_tpu.integrators import path as pt
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.samplers import exact_tables as xt
    from pbrt_tpu.samplers.pixel_exact import exact_pixel_tables

    res = (24, 20)  # 2x2 tiles (16-wide tiles; ragged right/bottom)
    pixels = pt.make_pixel_grid(fm.FilmConfig(full_resolution=res))
    tab = xt.pixel_exact_table("stratified", pixels, 1, 4)
    assert tab.shape == (xt.N_PIXEL_TABLE_DIMS, pixels.shape[0])
    # Tile (1,0): seed = 0*2 + 1 = 1; its first pixel (x=16, y=0) is the
    # first StartPixel of that clone.
    s1, s2 = exact_pixel_tables(
        "stratified", np.array([[16, 0]]), 4, 4, 4, seed=1
    )
    row = np.nonzero((pixels[:, 0] == 16) & (pixels[:, 1] == 0))[0][0]
    np.testing.assert_array_equal(tab[0, row], s2[0, 0, 1, 0])
    np.testing.assert_array_equal(tab[2, row], s1[0, 0, 1])
    np.testing.assert_array_equal(tab[8:10, row], s2[0, 3, 1])

    # e2e: stratified exact render vs stateless render agree at the
    # estimator level (same sampler family, different streams).
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE, kd=(0.5, 0.5, 0.5))
    b.add_sphere(tf.identity(), 2.0, material=m, reverse_orientation=True)
    b.add_point_light(tf.translate(0.3, 0.3, 0.0), (3.0, 3.0, 3.0))
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), res, fov_deg=60.0
    )
    cfg = pt.PathConfig(max_depth=2)
    scfg = SamplerConfig("stratified", 4, res)
    img_plain = np.asarray(pt.render(
        scene, cam, fm.FilmConfig(full_resolution=res), scfg, cfg
    ))
    img_exact = np.asarray(pt.render(
        scene, cam, fm.FilmConfig(full_resolution=res),
        dataclasses.replace(scfg, exact=True), cfg,
    ))
    assert np.isfinite(img_exact).all()
    assert abs(img_exact.mean() - img_plain.mean()) < 0.05 * img_plain.mean()
