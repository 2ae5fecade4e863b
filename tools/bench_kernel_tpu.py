#!/usr/bin/env python
"""Real-chip validation + timing of the Pallas packet BVH kernel.

Builds an icosphere-tessellation scene (pure triangles), traces camera-like
coherent rays and hash-scrambled incoherent rays through both the XLA
wavefront loop and the packet kernel, compares hits, and times both.

Usage: python tools/bench_kernel_tpu.py [n_tris_exp] [n_rays]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def icosphere(subdiv=5):
    """Geodesic sphere triangles (~20*4^subdiv tris)."""
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    for _ in range(subdiv):
        vlist = list(verts)
        cache = {}

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = verts[a] + verts[b]
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m)
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.array(vlist)
        faces = np.array(new_faces, np.int64)
    return verts.astype(np.float32), faces.astype(np.int32)


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 40960

    from pbrt_tpu import scene as sc
    from pbrt_tpu.accel import traverse as tv
    from pbrt_tpu.ops import pallas_bvh as pk
    from pbrt_tpu.core import transform as tf

    print("backend:", jax.default_backend(), jax.devices())
    verts, faces = icosphere(subdiv)
    print(f"tris: {faces.shape[0]}")
    b = sc.SceneBuilder()
    m = b.add_material(sc.MAT_MATTE)
    b.add_triangle_mesh(faces, verts, material=m)
    b.add_point_light(tf.identity(), (1.0, 1.0, 1.0))
    t0 = time.time()
    scene = b.build()
    print(f"scene build {time.time()-t0:.2f}s; nodes {scene.nodes_packed.shape[0]}")
    scene = jax.device_put(jax.tree_util.tree_map(jnp.asarray, scene))

    rng = np.random.default_rng(7)
    # coherent: camera at z=3 shooting a jittered grid at the sphere
    side = int(np.sqrt(n_rays))
    px = (np.mgrid[0:side, 0:side].reshape(2, -1).T + rng.random((side * side, 2))) / side
    n = px.shape[0]
    o_c = np.broadcast_to(np.array([0, 0, 3.0], np.float32), (n, 3)).copy()
    d_c = np.stack([
        (px[:, 0] - 0.5) * 1.2, (px[:, 1] - 0.5) * 1.2, -np.ones(n)
    ], -1).astype(np.float32)
    d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)
    # incoherent: random origins in shell, random dirs
    o_i = rng.normal(size=(n, 3)).astype(np.float32)
    o_i = 2.0 * o_i / np.linalg.norm(o_i, axis=1, keepdims=True)
    d_i = rng.normal(size=(n, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)

    def run_xla(o, d):
        return tv._traverse(scene, o, d, 1e30, (), any_hit=False)

    def run_kernel(o, d):
        return pk.intersect_kernel_with_quadrics(scene, o, d, 1e30, ())

    jx = jax.jit(run_xla)
    jk = jax.jit(run_kernel)

    for name, o, d in (("coherent", o_c, d_c), ("incoherent", o_i, d_i)):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        t0 = time.time()
        tx, px_ = jax.block_until_ready(jx(o, d))
        print(f"[{name}] xla compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        tk, pk_ = jax.block_until_ready(jk(o, d))
        print(f"[{name}] kernel compile+run {time.time()-t0:.1f}s")
        # compare
        tx_n, px_n = np.asarray(tx), np.asarray(px_)
        tk_n, pk_n = np.asarray(tk), np.asarray(pk_)
        hit_agree = np.mean((px_n >= 0) == (pk_n >= 0))
        both = (px_n >= 0) & (pk_n >= 0)
        t_close = np.mean(np.abs(tx_n[both] - tk_n[both]) < 1e-3 * np.maximum(tx_n[both], 1.0)) if both.any() else 1.0
        print(f"[{name}] hit agreement {hit_agree:.5f}, t close {t_close:.5f}, hits {np.mean(px_n>=0):.3f}")
        for label, fn in (("xla", jx), ("kernel", jk)):
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                jax.block_until_ready(fn(o, d))
            dt = (time.time() - t0) / reps
            print(f"[{name}] {label}: {dt*1e3:.1f} ms = {n/dt/1e6:.3f} Mrays/s")


if __name__ == "__main__":
    main()
