#!/usr/bin/env python
"""Same-process A/B of association schedules (tunnel-drift-proof).

Same-code bench runs drift ~1.6x between processes on the axon tunnel
(NOTES.md measurement discipline), so cross-run comparisons of schedule
variants are noise. This runs several variants back-to-back in ONE
process — same chip epoch — and repeats the FIRST variant at the end as
the drift control.

Usage: python scripts/bench_ab.py [variant ...]
  variant := exact | certified | compact:<U> | fast[:<every>]
Default: certified compact:8192 certified  (control repeat)
Env: AB_STEPS (default 10), AB_WARMUP (2), plus bench.py's BENCH_N_POINTS
/ BENCH_KEYFRAMES / BENCH_DEPTH / BENCH_MAX_LEAVES / BENCH_LADDER.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import BenchSetup

    variants = sys.argv[1:] or ["certified", "compact:8192", "certified"]

    setup = BenchSetup()
    n_warmup = int(os.environ.get("AB_WARMUP", 2))
    n_steps = int(os.environ.get("AB_STEPS", 10))
    total = n_warmup + n_steps
    scans_np = {i: setup.scan_at(i) for i in range(1, 1 + total)}

    results = []
    for spec in variants:
        pipe = setup.make_pipe(spec)
        # the odometry step DONATES the ring and the staged scan buffers,
        # so every variant needs its own device copies (see BenchSetup)
        setup.prime(pipe)
        staged = {i: pipe.stage(scans_np[i]) for i in range(1, 1 + total)}
        t_c0 = time.perf_counter()
        for i in range(1, 1 + n_warmup):
            pipe.compute_device(0.1 * i, *staged[i])
        _ = jax.device_get(pipe.state.X)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for i in range(1 + n_warmup, 1 + total):
            pipe.compute_device(0.1 * i, *staged[i])
        _ = jax.device_get(pipe.state.X)
        dt = time.perf_counter() - t0
        r = dict(variant=spec, scans_per_sec=round(n_steps / dt, 3),
                 ms_per_scan=round(1000 * dt / n_steps, 1),
                 compile_s=round(compile_s, 1),
                 descents=int(np.asarray(pipe.descents())))
        results.append(r)
        print(json.dumps(r), flush=True)

    print(json.dumps({"ab": results}))


if __name__ == "__main__":
    main()
