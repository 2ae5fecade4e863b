#!/usr/bin/env python
"""Multi-host scaling harness (SURVEY.md §5.8; BASELINE.json >= 80 % bar).

Runs the distributed wavefront render at 1..N simulated processes (CPU
devices via multihost_worker.py) with the SAME total device count per run,
then at N processes scaling the device count, and reports rays/s + scaling
efficiency.  On this repo's CPU CI host the absolute numbers are meaningless
(2 vCPUs oversubscribed); the harness exists so a pod run is one command:

    python tools/bench_scaling.py --scene killeroo --res 128 --spp 4

Prints one JSON line per configuration plus a summary with
efficiency = (rays_s[N] / N) / rays_s[1].
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def run_config(nproc, devices_per_proc, res, spp, scene, port, timed_reps=1):
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "r.npz")
        procs = []
        for pid in range(nproc):
            procs.append(subprocess.Popen(
                [sys.executable, WORKER, "--nproc", str(nproc),
                 "--pid", str(pid), "--port", str(port),
                 "--devices-per-proc", str(devices_per_proc),
                 "--res", str(res), "--spp", str(spp), "--scene", scene,
                 "--timed-reps", str(timed_reps),
                 "--out", out],
                stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ))
        rc = [p.wait(timeout=1200) for p in procs]
        if any(rc):
            raise RuntimeError(f"workers failed: {rc}")
        d = np.load(out)
        return {
            "nproc": nproc, "devices_per_proc": devices_per_proc,
            "wall_s": float(d["wall_s"]), "rays": float(d["rays"]),
            "rays_s": float(d["rays"]) / float(d["wall_s"]),
            "img": d["img"],
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--scene", default="demo")
    ap.add_argument("--port", type=int, default=21401)
    args = ap.parse_args()

    results = []
    for k in range(1, args.max_procs + 1):
        r = run_config(k, args.devices_per_proc, args.res, args.spp,
                       args.scene, args.port + k)
        results.append(r)
        print(json.dumps({k2: v for k2, v in r.items() if k2 != "img"}))

    # Shard invariance (P8): every process count renders the same image.
    base = results[0]["img"]
    for r in results[1:]:
        dmax = float(np.abs(r["img"] - base).max())
        print(json.dumps({"invariance_vs_1proc": {
            "nproc": r["nproc"], "max_abs_diff": dmax}}))

    if len(results) > 1:
        n = results[-1]["nproc"]
        eff = (results[-1]["rays_s"] / n) / results[0]["rays_s"]
        print(json.dumps({
            "metric": "multihost scaling efficiency 1->%d procs" % n,
            "value": round(eff, 3), "unit": "fraction",
            "target": 0.8,
            "note": "CPU-simulated hosts; run on a pod for the real number",
        }))


if __name__ == "__main__":
    main()
