#!/usr/bin/env python
"""Probe: elementwise-chain throughput vs array layout on the axon TPU.

Hypothesis (round-5 perf hunt): the shading path's ~0.9s/batch residual is
layout waste — [N,3] f32 arrays put 3 in the LANE dimension (last dim), so
every VPU op uses 3/128 lanes and every materialized intermediate pads
42x in HBM.  If true, a [3,N] (planar) layout or a Pallas-fused kernel
should run the same math ~10-40x faster, and the fix is to re-lay-out the
hot shading structs, not to hand-schedule.

Times a ~60-op vec3 elementwise chain (normalize / dot / cross / where
masks — the shape of hit_record+BSDF math) at N=160k in three forms:
  A. [N,3] arrays (current package layout)
  B. [3,N] planar arrays
  C. [3,N] planar fused into one Pallas kernel
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 160 * 1024


def chain_rows(p, d, ns, t):
    """~60-op vec3 chain; axis=-1 form (works for [N,3] with axis -1)."""
    for _ in range(6):
        w = p - d * t[..., None]
        l2 = jnp.sum(w * w, axis=-1, keepdims=True)
        w = w / jnp.sqrt(jnp.where(l2 > 0, l2, 1.0))
        c = jnp.cross(w, ns)
        dt = jnp.sum(c * d, axis=-1)
        m = dt > 0.0
        p = jnp.where(m[..., None], p + 0.1 * c, p - 0.05 * w)
        ns = jnp.where(m[..., None], ns, -ns)
        t = jnp.abs(dt) + 0.5 * t
    return p, t


def chain_planar(p, d, ns, t):
    """Same chain on [3,N] planar arrays (axis=0), cross written out."""
    for _ in range(6):
        w = p - d * t[None, :]
        l2 = jnp.sum(w * w, axis=0, keepdims=True)
        w = w / jnp.sqrt(jnp.where(l2 > 0, l2, 1.0))
        cx = w[1] * ns[2] - w[2] * ns[1]
        cy = w[2] * ns[0] - w[0] * ns[2]
        cz = w[0] * ns[1] - w[1] * ns[0]
        c = jnp.stack([cx, cy, cz])
        dt = jnp.sum(c * d, axis=0)
        m = dt > 0.0
        p = jnp.where(m[None, :], p + 0.1 * c, p - 0.05 * w)
        ns = jnp.where(m[None, :], ns, -ns)
        t = jnp.abs(dt) + 0.5 * t
    return p, t


def pallas_fused(p, d, ns, t):
    """Chain C: planar inputs blocked over lanes inside one Pallas kernel."""
    B = 8 * 1024  # lanes per block

    def kernel(p_ref, d_ref, ns_ref, t_ref, po_ref, to_ref):
        pp, tt = chain_planar(p_ref[:], d_ref[:], ns_ref[:], t_ref[0])
        po_ref[:] = pp
        to_ref[0] = tt

    grid = (N // B,)
    vec = pl.BlockSpec((3, B), lambda i: (0, i), memory_space=pltpu.VMEM)
    scl = pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec, vec, vec, scl],
        out_specs=[vec, scl],
        out_shape=[
            jax.ShapeDtypeStruct((3, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
    )(p, d, ns, t.reshape(1, N))


def timeit(name, fn, *args, reps=20):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    per = (time.time() - t0) / reps
    print(f"{name:24s} {per*1e3:8.2f} ms/call  (compile {comp:.1f}s)")
    return per


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    ns = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    t = jnp.asarray(rng.random(N), jnp.float32)
    pT, dT, nsT = p.T, d.T, ns.T
    pT, dT, nsT, t = map(jax.block_until_ready, (pT, dT, nsT, t))

    a = timeit("A [N,3] rows", jax.jit(chain_rows), p, d, ns, t)
    b = timeit("B [3,N] planar", jax.jit(chain_planar), pT, dT, nsT, t)
    c = timeit("C [3,N] pallas-fused", jax.jit(pallas_fused), pT, dT, nsT, t)
    print(f"speedups vs A: planar {a/b:.1f}x, pallas {a/c:.1f}x")


if __name__ == "__main__":
    main()
