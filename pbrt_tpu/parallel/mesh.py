"""Mesh & sharding policy: ray data-parallelism over the device mesh.

TPU-native replacement for pbrt's thread pool (core/parallel.cpp, SURVEY.md
§2.5 P1-P8): the image's flat ray/pixel batch shards over a 1-D `("rays",)`
mesh (2-D ("hosts","rays") across pods); the scene pytree is replicated into
every chip's HBM (P5 — killeroo-class scenes fit); film accumulation happens
per-shard and merges with one `psum` over ICI (P3).

Determinism (P8): sample indices derive from (pixel, sampleNum) only — global
pixel-major numbering — so output is bitwise independent of shard count
(tested in tests/test_multichip.py).

The "communication backend" is XLA's compiled collectives; this module is the
mesh/sharding policy plus reshard utilities, not a wire protocol.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, arr):
    """Place a [N, ...] per-ray array sharded over the ray axis."""
    return jax.device_put(arr, ray_sharding(mesh))


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (scene, camera, film) onto every device."""
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(arr, multiple: int, axis=0, fill=0):
    """Pad the ray axis so it divides the mesh evenly; returns (arr, n_valid)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, rem)
    return np.pad(np.asarray(arr), pad_width, constant_values=fill), n
