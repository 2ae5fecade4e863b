"""Multi-host runtime (P7): 2 real processes must render the 1-process image.

Spawns tools/multihost_worker.py under jax.distributed with simulated CPU
devices — a REAL multi-process cluster, not a single-process mesh — and
asserts shard invariance (P8) across process counts: 1 proc x 8 devices and
2 procs x 4 devices split the same 8-shard work ids, so the images must
match to film-accumulation order (exactly, in practice).
"""
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tools", "multihost_worker.py")


def _run(nproc, devices_per_proc, out, port):
    env = dict(os.environ)
    # The workers own their XLA_FLAGS; drop the conftest's forced 8-device
    # setting so --devices-per-proc wins.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--nproc", str(nproc), "--pid", str(p),
             "--port", str(port), "--devices-per-proc", str(devices_per_proc),
             "--res", "32", "--spp", "2", "--depth", "2",
             "--out", out if p == 0 else ""],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        )
        for p in range(nproc)
    ]
    errs = [p.communicate(timeout=900)[1] for p in procs]
    for p, e in zip(procs, errs):
        assert p.returncode == 0, e.decode()[-2000:]


@pytest.mark.slow
def test_two_process_render_matches_single():
    with tempfile.TemporaryDirectory() as td:
        out1 = os.path.join(td, "p1.npz")
        out2 = os.path.join(td, "p2.npz")
        _run(1, 8, out1, port=21511)
        _run(2, 4, out2, port=21513)
        img1 = np.load(out1)["img"]
        img2 = np.load(out2)["img"]
        assert np.isfinite(img1).all() and img1.mean() > 0
        dmax = float(np.abs(img1 - img2).max())
        assert dmax <= 1e-5, dmax
