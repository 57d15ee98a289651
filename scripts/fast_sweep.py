#!/usr/bin/env python
"""Chip sweep of the fast schedule's ``reassoc_every`` (VERDICT r4 #3).

The three call sites disagreed on the default (PipelineConfig 2,
apps/cli.py 7, bench.py 7) with no stated reason. This sweep measures,
same-process on the chip, for every candidate period:

  - flagship-config throughput (BenchSetup, steady-state keyframe ring),
  - trajectory delta vs the exact schedule on the accuracy-probe world
    (a real converging drive — the bench world is degenerate for
    x-recovery, so accuracy must come from the probe world).

Output: one JSON line per k, plus a summary. The knee picks the default.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CANDIDATES = [int(s) for s in os.environ.get("SWEEP_KS", "2,4,7,14").split(",")]


def trajectory_delta(k: int, exact_traj=None):
    """Drive the accuracy-probe world; return (traj, max |t| delta vs exact)."""
    from accuracy_probe import world
    from madicp_tpu.models.pipeline import Pipeline

    rng = np.random.default_rng(7)
    W = world(rng)
    kw = dict(assoc_mode="fast", reassoc_every=k) if k else {}
    pipe = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=4,
        n_points=65536, depth=14, max_leaves=16384, **kw,
    )
    traj = []
    for s in range(12):
        p = W - np.array([0.3 * s, 0.0, 0.0])
        r = np.linalg.norm(p, axis=1)
        pipe.compute(0.1 * s, p[(r > 1.0) & (r < 80.0)])
        traj.append(pipe.current_pose())
    traj = np.stack(traj)
    if exact_traj is None:
        return traj, 0.0
    return traj, float(np.abs(traj[:, :3, 3] - exact_traj[:, :3, 3]).max())


def throughput(spec: str, setup) -> float:
    import jax

    pipe = setup.make_pipe(spec)
    setup.prime(pipe)
    n_steps, n_windows = 8, 3
    total = 1 + 2 + n_windows * n_steps
    staged = {i: pipe.stage(setup.scan_at(i)) for i in range(1, total)}
    for i in range(1, 3):
        pipe.compute_device(0.1 * i, *staged[i])
    _ = jax.device_get(pipe.state.X)
    rates, lo = [], 3
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for i in range(lo, lo + n_steps):
            pipe.compute_device(0.1 * i, *staged[i])
        _ = jax.device_get(pipe.state.X)
        rates.append(n_steps / (time.perf_counter() - t0))
        lo += n_steps
    del pipe, staged
    return max(rates)


def main():
    from bench import BenchSetup

    setup = BenchSetup()
    exact_traj, _ = trajectory_delta(0)

    rows = []
    for k in CANDIDATES:
        _, delta = trajectory_delta(k, exact_traj)
        sps = throughput(f"fast:{k}", setup)
        rows.append({"reassoc_every": k,
                     "scans_per_sec": round(sps, 2),
                     "traj_delta_mm": round(delta * 1e3, 3)})
        print(json.dumps(rows[-1]), flush=True)
    # control: repeat the first candidate to expose chip-epoch drift
    ctrl = throughput(f"fast:{CANDIDATES[0]}", setup)
    print(json.dumps({"control_repeat": CANDIDATES[0],
                      "scans_per_sec": round(ctrl, 2)}), flush=True)
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
