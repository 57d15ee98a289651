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
/ BENCH_KEYFRAMES / BENCH_DEPTH / BENCH_MAX_LEAVES.
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

    from bench import synthetic_kitti_scan
    from madicp_tpu.models.pipeline import Pipeline
    from madicp_tpu.ops.tree import build_tree, transform_tree

    variants = sys.argv[1:] or ["certified", "compact:8192", "certified"]

    n_points = int(os.environ.get("BENCH_N_POINTS", 131072))
    num_keyframes = int(os.environ.get("BENCH_KEYFRAMES", 16))
    depth = int(os.environ.get("BENCH_DEPTH", 16))
    max_leaves = int(os.environ.get("BENCH_MAX_LEAVES", 32768))
    n_warmup = int(os.environ.get("AB_WARMUP", 2))
    n_steps = int(os.environ.get("AB_STEPS", 10))

    rng = np.random.default_rng(0)
    world = synthetic_kitti_scan(rng, n_points=min(120000, n_points))

    def scan_at(i):
        t = np.array([1.4 * i, 0.05 * i, 0.0])
        yaw = 0.004 * i
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        local = (world - t) @ R
        return (local + rng.normal(0, 0.008, local.shape)).astype(np.float32)

    def pad(points):
        pts = np.zeros((n_points, 3), np.float32)
        pts[: len(points)] = points[:n_points]
        v = np.zeros(n_points, bool)
        v[: len(points)] = True
        return jnp.asarray(pts), jnp.asarray(v)

    def make_pipe(spec):
        kw = dict(assoc_mode="exact", certify=False, certify_compact=0,
                  reassoc_every=7)
        if spec == "exact":
            pass
        elif spec == "certified":
            kw["certify"] = True
        elif spec.startswith("compact:"):
            kw["certify"] = True
            kw["certify_compact"] = int(spec.split(":")[1])
        elif spec.startswith("fast"):
            kw["assoc_mode"] = "fast"
            if ":" in spec:
                kw["reassoc_every"] = int(spec.split(":")[1])
        else:
            raise SystemExit(f"unknown variant {spec!r}")
        return Pipeline(
            sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
            b_min=0.1, b_ratio=0.02, num_keyframes=num_keyframes,
            n_points=n_points, depth=depth, max_leaves=max_leaves,
            dtype=jnp.float32, **kw,
        )

    # shared steady-state keyframe ring (built once)
    cfg_probe = make_pipe("exact").cfg
    build = jax.jit(
        lambda p, v: build_tree(
            p, v, depth=depth, b_max=cfg_probe.b_max, b_min=cfg_probe.b_min
        )[0]
    )
    kf_scans = {
        k: scan_at(k - num_keyframes) for k in range(num_keyframes)
    }

    def fresh_ring():
        # rebuilt on device per variant: the odometry step DONATES the
        # ring buffers, so variants must not share one
        kf_trees = []
        for k in range(num_keyframes):
            t = np.array(
                [1.4 * (k - num_keyframes), 0.05 * (k - num_keyframes), 0.0]
            )
            yaw = 0.004 * (k - num_keyframes)
            cs, sn = np.cos(yaw), np.sin(yaw)
            Rk = jnp.asarray(
                np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1.0]], np.float32)
            )
            tree = build(*pad(kf_scans[k]))
            kf_trees.append(
                transform_tree(tree, Rk, jnp.asarray(t, jnp.float32))
            )
        return jax.tree.map(lambda *a: jnp.stack(a), *kf_trees)

    total = n_warmup + n_steps
    scans_np = {i: scan_at(i) for i in range(1, 1 + total)}

    results = []
    for vi, spec in enumerate(variants):
        pipe = make_pipe(spec)
        pipe.compute(0.0, scan_at(0))
        # the odometry step DONATES the ring and the staged scan buffers,
        # so every variant needs its own device copies
        pipe.state = pipe.state._replace(
            kf_tree=fresh_ring(),
            kf_valid=jnp.ones(num_keyframes, bool),
        )
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
