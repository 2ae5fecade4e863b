"""Phase profiling: pbrt's SIGPROF time-fraction profile re-expressed for XLA.

The reference samples a 47-phase bitmask at 100 Hz (core/stats.h:142-190,
stats.cpp:207-237) because its phases interleave on CPU threads.  Under jit
there is no signal to catch — a phase is a region of the compiled graph — so
the TPU-native equivalents are:

  * `phase(name)` — `jax.named_scope` wrapper: names show up in XLA HLO and
    in `jax.profiler` traces (xprof), giving the per-phase device timeline
    the SIGPROF profile gave pbrt.
  * `Timer` — host wall-clock per named region for the COARSE phases that
    are separate dispatches anyway (scene build, compile, render, imageio),
    printed as a pbrt-style fraction table via `report()`.
  * `trace(dir)` — context manager starting a jax.profiler trace for deep
    dives (open with tensorboard/xprof).

Used by integrators (named_scope on raygen/traversal/shading/NEE/film) and
by render.py's driver (Timer around build/compile/render).
"""
from __future__ import annotations

import contextlib
import time

import jax

# ---------------------------------------------------------------------------


def phase(name: str):
    """In-graph phase annotation (named_scope): free at runtime, labels HLO."""
    return jax.named_scope(name)


class Timer:
    """Host-side accumulating phase timer (coarse phases only)."""

    def __init__(self):
        self.acc: dict[str, float] = {}
        self.t0 = time.time()

    @contextlib.contextmanager
    def __call__(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            self.acc[name] = self.acc.get(name, 0.0) + (time.time() - t)

    def report(self) -> str:
        """pbrt's 'Profile' block format (stats.cpp:207-237): time + %."""
        total = max(time.time() - self.t0, 1e-9)
        lines = ["Profile (host wall clock):"]
        for name, s in sorted(self.acc.items(), key=lambda kv: -kv[1]):
            lines.append(f"    {name:<42}{s:8.2f}s ({100.0*s/total:5.1f}%)")
        other = total - sum(self.acc.values())
        lines.append(f"    {'(other)':<42}{other:8.2f}s ({100.0*other/total:5.1f}%)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace region (xprof); view with tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
