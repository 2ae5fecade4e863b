"""Statistics counters + pbrt-style end-of-render report.

TPU re-expression of core/stats.{h,cpp}: pbrt's thread-local STAT_* counters
merged into a global accumulator (stats.h:283-356, parallel.cpp:337) become a
device-side int64-ish f32 counter vector indexed by counter id, accumulated
inside the jitted render step and `psum`-merged across shards; the host
pretty-printer groups by category exactly like PrintStats (stats.cpp:79-187).

Profiling phases (stats.h:142-190's 47 categories) map to
`jax.named_scope`/`jax.profiler` trace annotations — see utils/profiling.py.
"""
from __future__ import annotations

import collections

import jax.numpy as jnp

# Counter registry: id -> "Category/Title" (pbrt's STATS_* naming).
COUNTERS = [
    "Integrator/Camera rays traced",
    "Intersections/Regular ray intersection tests",
    "Intersections/Shadow ray intersection tests",
    "Intersections/BSSRDF probe rays",
    "Integrator/Path vertices",
    "Integrator/Russian-roulette terminations",
    "Lights/Light samples taken",
    "Film/Samples added",
]
_IDX = {name: i for i, name in enumerate(COUNTERS)}
N_COUNTERS = len(COUNTERS)

# The bench.py Mrays/s denominator: every ray handed to a traversal kernel
# (closest-hit + shadow/MIS + BSSRDF probes) — scene.cpp:40-43's
# nIntersectionTests + nShadowTests.
_RAY_IDS = [
    _IDX["Intersections/Regular ray intersection tests"],
    _IDX["Intersections/Shadow ray intersection tests"],
    _IDX["Intersections/BSSRDF probe rays"],
]


def zeros():
    return jnp.zeros((N_COUNTERS,), jnp.float32)


def ray_total(counters):
    """Scalar traced-ray count (the throughput denominator)."""
    return counters[_RAY_IDS[0]] + counters[_RAY_IDS[1]] + counters[_RAY_IDS[2]]


def bump(counters, name: str, amount):
    """Add `amount` (scalar or array summed) to a counter, in-graph."""
    i = _IDX[name]
    amt = jnp.sum(jnp.asarray(amount, jnp.float32))
    return counters.at[i].add(amt)


def merge(a, b):
    return a + b


def report(counters) -> str:
    """pbrt's PrintStats-style category report (stats.cpp:79-187)."""
    import numpy as np

    vals = np.asarray(counters)
    by_cat = collections.defaultdict(list)
    for name, v in zip(COUNTERS, vals):
        cat, title = name.split("/", 1)
        by_cat[cat].append((title, v))
    lines = ["Statistics:"]
    for cat in sorted(by_cat):
        lines.append(f"  {cat}")
        for title, v in by_cat[cat]:
            lines.append(f"    {title:<42}{int(v):>16,d}")
    return "\n".join(lines)
