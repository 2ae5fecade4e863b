"""PCG32 parity: vectorized (hi,lo)-pair implementation vs scalar reference.

Mirrors the determinism contract of core/rng.h:61-118 — Halton permutation
tables and sampler fallbacks depend on bit-exact PCG32.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import rng


def test_default_stream_matches_scalar():
    # Known first outputs of default-seeded PCG32 via the scalar model.
    s = rng.ScalarPcg32()
    expected = [s.uniform_uint32() for _ in range(8)]
    # Vectorized: default seeding path isn't exposed; emulate via state init.
    state = (
        jnp.full((1,), rng.PCG32_DEFAULT_STATE >> 32, jnp.uint32),
        jnp.full((1,), rng.PCG32_DEFAULT_STATE & 0xFFFFFFFF, jnp.uint32),
        jnp.full((1,), rng.PCG32_DEFAULT_STREAM >> 32, jnp.uint32),
        jnp.full((1,), rng.PCG32_DEFAULT_STREAM & 0xFFFFFFFF, jnp.uint32),
    )
    got = []
    for _ in range(8):
        state, bits = rng.next_uint32(state)
        got.append(int(bits[0]))
    assert got == expected


def test_set_sequence_matches_scalar():
    seqs = [0, 1, 7, 12345, 2**31 + 3]
    state = rng.make(jnp.array(seqs, dtype=jnp.uint32))
    for step in range(16):
        state, bits = rng.next_uint32(state)
        for i, seq in enumerate(seqs):
            s = rng.ScalarPcg32(seq)
            for _ in range(step):
                s.uniform_uint32()
            assert int(bits[i]) == s.uniform_uint32(), (seq, step)


def test_uniform_float_range_and_match():
    state = rng.make(jnp.arange(64, dtype=jnp.uint32))
    state, f = rng.next_float(state)
    f = np.asarray(f)
    assert (f >= 0).all() and (f < 1.0).all()
    s = rng.ScalarPcg32(5)
    assert abs(float(f[5]) - s.uniform_float()) < 1e-9


def test_scalar_shuffle_deterministic():
    s1 = rng.ScalarPcg32()
    s2 = rng.ScalarPcg32()
    a = s1.shuffle(list(range(13)))
    b = s2.shuffle(list(range(13)))
    assert a == b
    assert sorted(a) == list(range(13))
