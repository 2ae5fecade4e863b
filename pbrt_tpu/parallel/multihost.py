"""Multi-host distributed runtime (SURVEY.md §5.8, P7).

pbrt-v3 has no inter-process story at all — its parallelism ends at one
machine's thread pool (core/parallel.cpp:45-59).  The TPU-native replacement
is the standard JAX SPMD recipe: every host runs the SAME program;
`jax.distributed.initialize` wires the processes into one runtime; the
device mesh spans all hosts as ("hosts", "rays") — the hosts axis maps to
DCN (one process per host), the rays axis to the chips behind each host
(ICI) — and the wavefront render shards its work ids over BOTH axes.  Film
merge (P3) and the done-check are jitted reductions, so XLA inserts the
cross-host collectives; there is no hand-written wire protocol.

Scaling harness: tools/bench_scaling.py runs this module at 1..N simulated
processes (CPU devices) and reports rays/s scaling efficiency against the
north star's >= 80 % bar (BASELINE.json).  Shard invariance (P8) is asserted
in tests/test_multihost.py: the 2-process image must equal the 1-process
image bit-for-bit.
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """jax.distributed.initialize from args or PBRT_TPU_* env vars.

    No-op when neither args nor env are present (single-process run).  On a
    real TPU pod each host calls this with its slice coordinates (or relies
    on the TPU runtime's automatic cluster detection); the CPU scaling
    harness passes them explicitly.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "PBRT_TPU_COORDINATOR"
    )
    if num_processes is None and "PBRT_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["PBRT_TPU_NUM_PROCESSES"])
    if process_id is None and "PBRT_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PBRT_TPU_PROCESS_ID"])
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def global_mesh(axes=("hosts", "rays")) -> Mesh:
    """The all-devices mesh: [n_processes, devices_per_process].

    Row i holds process i's local devices, so the "hosts" axis crosses DCN
    and the "rays" axis stays on each host's ICI — collectives over "rays"
    never leave the host.
    """
    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.array(devs).reshape(n_proc, -1)
    return Mesh(arr, axes)


def render(scene, camera, film_cfg, sampler_cfg, cfg, filt=None,
           n_lanes_per_shard: int = 1 << 12, iters_per_step: int = 4,
           count_rays: bool = False):
    """The production wavefront render over the full ("hosts","rays") mesh.

    Work ids are split over both mesh axes (hosts x local chips); the film
    partial sum at the end is the only cross-host communication.
    """
    from ..integrators import wavefront as wf

    mesh = global_mesh()
    return wf.render_sharded(
        scene, camera, film_cfg, sampler_cfg, cfg, filt,
        mesh=mesh, axis=("hosts", "rays"),
        n_lanes_per_shard=n_lanes_per_shard, iters_per_step=iters_per_step,
        count_rays=count_rays,
    )
