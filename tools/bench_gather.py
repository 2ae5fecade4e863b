"""Microbenchmark: XLA gather strategies on TPU.

Diagnoses the traversal bottleneck: per-step row gathers from node/prim
tables.  Compares plain gather, sorted-indices gather, and padded-row
variants to pick the fastest device-side lookup primitive.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    fn(*args).block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    out.block_until_ready()
    return (time.time() - t0) / n


def main():
    rs = np.random.RandomState(0)
    N = 160_000
    for M, C in [(131072, 8), (131072, 16), (8192, 8)]:
        table = jnp.asarray(rs.rand(M, C), jnp.float32)
        idx = jnp.asarray(rs.randint(0, M, N), jnp.int32)

        f_gather = jax.jit(lambda t, i: jnp.sum(t[i], axis=-1))
        dt = timeit(f_gather, table, idx)
        print(f"plain gather   M={M} C={C}: {dt*1e3:8.2f} ms "
              f"({N*C*4/dt/1e9:6.1f} GB/s)", flush=True)

        f_sorted = jax.jit(
            lambda t, i: jnp.sum(
                jnp.take(t, jnp.sort(i), axis=0, indices_are_sorted=True),
                axis=-1,
            )
        )
        dt = timeit(f_sorted, table, idx)
        print(f"sorted gather  M={M} C={C}: {dt*1e3:8.2f} ms", flush=True)

    # one-hot matmul gather at small M
    M, C = 2048, 8
    table = jnp.asarray(rs.rand(M, C), jnp.float32)
    idx = jnp.asarray(rs.randint(0, M, N), jnp.int32)

    def onehot_gather(t, i):
        oh = jax.nn.one_hot(i, M, dtype=jnp.bfloat16)
        return jnp.sum(oh @ t.astype(jnp.bfloat16), axis=-1)

    dt = timeit(jax.jit(onehot_gather), table, idx)
    print(f"one-hot matmul M={M} C={C}: {dt*1e3:8.2f} ms", flush=True)

    # full sort of 8 payload arrays (the reshard cost for sort-based designs)
    keys = jnp.asarray(rs.randint(0, 1 << 20, N), jnp.int32)
    payload = [jnp.asarray(rs.rand(N), jnp.float32) for _ in range(8)]

    def do_sort(k, *p):
        out = jax.lax.sort((k,) + p, dimension=0)
        return out[1]

    dt = timeit(jax.jit(do_sort), keys, *payload)
    print(f"sort 160k keys + 8 payloads: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
