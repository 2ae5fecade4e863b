"""Low-discrepancy verification, mirroring src/tests/sampling.cpp's strategy:
golden radical-inverse values, Sobol elementary-interval stratification, and
pixel-index inversion consistency."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import lowdiscrepancy as ld


def _scalar_radical_inverse(base: int, a: int) -> float:
    inv_base = 1.0 / base
    reversed_digits = 0
    inv_base_n = 1.0
    while a:
        a, digit = divmod(a, base)
        reversed_digits = reversed_digits * base + digit
        inv_base_n *= inv_base
    return min(reversed_digits * inv_base_n, ld.ONE_MINUS_EPSILON)


def test_radical_inverse_base2_is_bit_reversal():
    a = jnp.arange(64, dtype=jnp.uint32)
    got = np.asarray(ld.radical_inverse(0, a))
    want = [_scalar_radical_inverse(2, int(i)) for i in range(64)]
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_radical_inverse_odd_bases():
    for base_index in [1, 2, 3, 10, 100, 999]:
        base = int(ld.PRIMES[base_index])
        a = jnp.array([0, 1, 2, 17, 1234, 987654], dtype=jnp.uint32)
        got = np.asarray(ld.radical_inverse(base_index, a))
        want = [_scalar_radical_inverse(base, int(x)) for x in np.asarray(a)]
        np.testing.assert_allclose(got, want, rtol=2e-6)


def test_scrambled_radical_inverse_identity_perm():
    # With the identity permutation, scrambled == plain + the perm[0] tail
    # correction (which is 0 for identity since perm[0]==0).
    base_index = 2  # base 5
    perm = jnp.arange(5, dtype=jnp.int32)
    a = jnp.array([0, 1, 7, 23, 125], dtype=jnp.uint32)
    got = np.asarray(ld.scrambled_radical_inverse(base_index, a, perm))
    want = np.asarray(ld.radical_inverse(base_index, a))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_permutation_table_is_valid():
    perms = ld.radical_inverse_permutations()
    assert perms.shape[0] == int(ld.PRIMES.sum())
    off = 0
    for p in ld.PRIMES[:20]:
        seg = perms[off : off + p]
        assert sorted(seg.tolist()) == list(range(int(p)))
        off += int(p)


def test_sobol_first_dimension_is_van_der_corput():
    # Dimension 0 of the Joe-Kuo matrices is the van der Corput sequence.
    idx = jnp.arange(16, dtype=jnp.uint32)
    got = np.asarray(ld.sobol_sample_float(idx, 0))
    want = [_scalar_radical_inverse(2, int(i)) for i in range(16)]
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_sobol_2d_elementary_intervals():
    """Every dyadic box of area 1/16 contains exactly one of 16 points
    (the (0,2)-sequence property; sampling.cpp:303 pattern)."""
    n = 16
    idx = jnp.arange(n, dtype=jnp.uint32)
    x = np.asarray(ld.sobol_sample_float(idx, 0))
    y = np.asarray(ld.sobol_sample_float(idx, 1))
    for log_bx in range(5):
        log_by = 4 - log_bx
        bx, by = 1 << log_bx, 1 << log_by
        count = np.zeros((bx, by), np.int32)
        np.add.at(count, ((x * bx).astype(int), (y * by).astype(int)), 1)
        assert (count == 1).all(), (bx, by, count)


def test_sobol_interval_to_index_lands_in_pixel():
    m = 4  # 16x16 image
    res = 1 << m
    for frame in [0, 1, 5]:
        px = jnp.arange(res, dtype=jnp.uint32).repeat(res)
        py = jnp.tile(jnp.arange(res, dtype=jnp.uint32), res)
        hi, lo = ld.sobol_interval_to_index(
            m, jnp.full_like(px, frame), px, py
        )
        x = np.asarray(ld.sobol_sample_float64idx(hi, lo, 0))
        y = np.asarray(ld.sobol_sample_float64idx(hi, lo, 1))
        np.testing.assert_array_equal((x * res).astype(int), np.asarray(px))
        np.testing.assert_array_equal((y * res).astype(int), np.asarray(py))


def test_sobol_interval_to_index_unique_per_frame():
    m = 3
    res = 1 << m
    px = jnp.arange(res, dtype=jnp.uint32).repeat(res)
    py = jnp.tile(jnp.arange(res, dtype=jnp.uint32), res)
    seen = set()
    for frame in range(4):
        hi, lo = ld.sobol_interval_to_index(m, jnp.full_like(px, frame), px, py)
        for h, l in zip(np.asarray(hi), np.asarray(lo)):
            key = (int(h) << 32) | int(l)
            assert key not in seen
            seen.add(key)


def test_scrambled_radical_inverse_fast_bit_exact():
    """The digit-pair-table form (round-5 perf: half the gathers) must be
    BIT-identical to the per-digit reference form on every dim class:
    small primes, the pair-table range, and the >509 fallback."""
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, 2**32, 4096, dtype=np.uint32))
    perms = ld.radical_inverse_permutations().astype(np.int32)
    for d in [2, 5, 17, 41, 67, 96, 97, 200]:  # PRIMES[96]=509, [97]=521
        off = int(ld.PRIME_SUMS[d])
        p = int(ld.PRIMES[d])
        ref = ld.scrambled_radical_inverse(d, a, jnp.asarray(perms[off:off + p]))
        fast = ld.scrambled_radical_inverse_fast(d, a)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fast))
