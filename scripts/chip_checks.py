#!/usr/bin/env python
"""Automated on-chip verification tier (VERDICT r4 item 2).

The CPU oracle/golden suite runs fma-exact matmuls, so a whole class of
TPU-only numeric bugs — r4's headline find was JAX lowering f32 matmuls
to ONE bf16 pass, corrupting point transforms by association-gate
magnitudes — is invisible to it by construction. This script is the
scripted chip tier: run it on the real TPU and it emits a
``CHIPCHECK_rN.json`` artifact (like ``BENCH_rN.json``) so on-chip
correctness is checked per round instead of by hand-run NOTES rituals.

Checks:
  precision_default   the package's import-time matmul-precision
                      guarantee is in force (madicp_tpu/__init__.py)
  point_transform     on-device f32 (L,3)@(3,3) transform error at
                      40 m range vs f64 — catches removal of the
                      precision override (bf16 pass: ~0.05-0.24 m;
                      highest: ~4e-6 m)
  onehot_exact        the 3x-bf16-split one-hot row selection is
                      bitwise-equal to gather ON THE CHIP — catches
                      removal of the optimization_barriers that stop
                      XLA's dot-refolding (NOTES r4 "TPU one-hot
                      gotcha"; invisible to CPU bitwise tests)
  motion_recovery     synthetic-drive odometry accuracy
                      (scripts/accuracy_probe.py, bound 1 cm/scan,
                      typical ~0.3 mm)
  certified_vs_exact  pose identity of the certified schedule against
                      the plain exact sweep on a short drive (f32:
                      sub-mm bound; f64 would be bitwise)
  drift_long          110-scan corridor drive scored by the framework's
                      drift/ATE evaluator — the chip twin of
                      tests/test_long_horizon.py (same bars, imported)
  realtime_20hz       the vbr_os1 operating point — 20 Hz, deskew on
                      (the reference's tightest envelope,
                      pipeline.cpp:62,167): the rolling anytime
                      calibration must converge to a budget-fitting
                      iteration count and the measured steady state
                      must hold the sensor rate
  bench               abbreviated schedule matrix (certified + fast)
                      at the flagship config; skip with --no-bench
                      (the driver runs the full bench.py separately)

Usage: python scripts/chip_checks.py [--round N] [--no-bench] [--out F]
Exit code 0 iff every check passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def check_precision_default() -> dict:
    import jax
    import madicp_tpu  # noqa: F401  (installs the default)

    prec = jax.config.jax_default_matmul_precision
    return {"effective": str(prec), "pass": prec in ("highest", "float32")}


def check_point_transform() -> dict:
    """f32 rotation transform of far points on device vs f64 numpy.

    The r4 bug: at default precision this error is ~0.05-0.24 m at 40 m
    range (one bf16 pass); at the package-guaranteed tier it is ~4e-6 m.
    The 1e-4 m bound separates them by three orders of magnitude in both
    directions.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    pts = rng.uniform(-40.0, 40.0, (32768, 3))
    th = 0.37
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    t = np.array([1.2, -0.4, 0.3])

    out = jax.jit(lambda p, R, t: p @ R.T + t)(
        jnp.asarray(pts, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32),
    )
    exact = pts @ R.T + t
    err = float(np.abs(np.asarray(out, np.float64) - exact).max())
    return {"max_err_m": err, "bound_m": 1e-4, "pass": err < 1e-4}


def check_onehot_exact() -> dict:
    """The exact one-hot MXU selection must be BITWISE equal to gather on
    the chip — r4 measured XLA silently refolding the 3-dot split into a
    single-bf16 pass (~0.4% rel error) when the barriers are absent."""
    import jax
    import jax.numpy as jnp

    from madicp_tpu.ops.tree import _select_rows_onehot

    rng = np.random.default_rng(11)
    tab = rng.uniform(-60.0, 60.0, (512, 56)).astype(np.float32)
    idx = rng.integers(0, 512, 4096).astype(np.int32)

    sel = jax.jit(_select_rows_onehot)(jnp.asarray(tab), jnp.asarray(idx))
    want = tab[idx]
    got = np.asarray(sel)
    bitwise = bool((got.view(np.int32) == want.view(np.int32)).all())
    err = float(np.abs(got - want).max())
    return {"bitwise": bitwise, "max_abs_err": err, "pass": bitwise}


def check_motion_recovery() -> dict:
    import accuracy_probe

    return accuracy_probe.run(verbose=True)


def check_certified_vs_exact() -> dict:
    """Short drive, certified vs plain exact, pose agreement. f32 on
    chip: the eps_cert fp-safety window admits rare association flips
    bounded to sub-mm trajectory deltas (test_certified_f32_divergence_
    bounded pins the CPU analog)."""
    from accuracy_probe import world
    from madicp_tpu.models.pipeline import Pipeline

    def drive(certify: bool):
        rng = np.random.default_rng(7)
        W = world(rng)
        pipe = Pipeline(
            sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1,
            p_th=0.8, b_min=0.1, b_ratio=0.02, num_keyframes=4,
            n_points=65536, depth=14, max_leaves=16384, certify=certify,
        )
        poses = []
        for k in range(10):
            p = W - np.array([0.3 * k, 0.0, 0.0])
            r = np.linalg.norm(p, axis=1)
            pipe.compute(0.1 * k, p[(r > 1.0) & (r < 80.0)])
            poses.append(pipe.current_pose())
        return np.stack(poses), pipe.descents()

    certified, n_cert = drive(True)
    exact, n_exact = drive(False)
    delta = float(np.abs(certified[:, :3, 3] - exact[:, :3, 3]).max())
    return {
        "max_translation_delta_m": delta,
        "bound_m": 2e-3,
        "descents_certified": n_cert,
        "descents_exact": n_exact,
        "pass": delta < 2e-3,
    }


def check_realtime_20hz() -> dict:
    """The 20 Hz + deskew-on envelope (vbr_os1: the tightest reference
    operating point — 45 ms anytime budget, pipeline.cpp:62,167). The
    rolling calibration must land on an iteration count whose steady
    state holds the sensor rate."""
    import jax

    from accuracy_probe import world
    from madicp_tpu.models.pipeline import Pipeline

    rng = np.random.default_rng(7)
    W = world(rng)
    pipe = Pipeline(
        sensor_hz=20.0, deskew=True, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=8, realtime=True,
        n_points=65536, depth=14, max_leaves=16384,
        assoc_mode="fast", realtime_recal_every=6,
    )

    def scan(k):
        # 4 m/s at 20 Hz with slight yaw — vbr-ish handheld motion
        p = W - np.array([0.2 * k, 0.02 * k, 0.0])
        r = np.linalg.norm(p, axis=1)
        return p[(r > 1.0) & (r < 80.0)]

    n_cal = 20
    for k in range(n_cal):
        pipe.compute(0.05 * k, scan(k))
    _ = jax.device_get(pipe.state.X)

    # freeze recalibration for the measurement: a recal inside the
    # window re-times a dispatch (and a just-changed iteration count's
    # FIRST dispatch pays its ~30-60 s tunnel compile), which measures
    # the calibrator, not the calibrated step (r5: 5.7 s/scan artifact)
    pipe._rt_every = 1 << 30
    its = pipe.cfg.max_icp_iterations
    pipe.compute(0.05 * n_cal, scan(n_cal))  # warm the frozen config
    _ = jax.device_get(pipe.state.X)

    n_meas, best = 10, None
    for w in range(2):  # two windows, best-of (tunnel epochs)
        lo = n_cal + 1 + w * n_meas
        t0 = time.perf_counter()
        for k in range(lo, lo + n_meas):
            pipe.compute(0.05 * k, scan(k))
        _ = jax.device_get(pipe.state.X)
        ms = (time.perf_counter() - t0) / n_meas * 1000.0
        best = ms if best is None else min(best, ms)

    # pass = the calibrated steady state holds the sensor period
    # (50 ms/scan; small slack for tunnel-epoch noise on shared chips)
    return {
        "ms_per_scan": round(best, 2),
        "scans_per_sec": round(1000.0 / best, 2),
        "budget_ms": 45.0,
        "calibrated_iterations": its,
        "pass": bool(best <= 55.0 and its >= 1),
    }


def check_drift_long() -> dict:
    """110-scan corridor drive scored by the framework's own drift/ATE
    evaluator — the chip twin of tests/test_long_horizon.py (which runs
    f64 on CPU and is blind to TPU numerics by construction). Bars
    match the CPU test: well below dataset-scale relevance, well above
    fixture noise (CPU f64 measures ~0.105% drift / 4.3 mm ATE)."""
    import tempfile

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
    ))
    # the bars ARE the CPU twin's bars — import them so a future
    # recalibration there cannot silently diverge from the chip tier
    from test_long_horizon import (
        ATE_M_MAX,
        END_ERR_M_MAX,
        T_ERR_PCT_MAX,
    )
    from tests_fixtures_helper import synthetic_corridor_scans

    from madicp_tpu.apps.evaluate import evaluate
    from madicp_tpu.models.pipeline import Pipeline
    from madicp_tpu.utils.trajectory import write_transformed_pose

    rng = np.random.default_rng(11)
    scans, gt = synthetic_corridor_scans(
        rng, n_scans=110, n_points=8192, step=0.25
    )
    T0_inv = np.linalg.inv(gt[0])
    gt_rel = np.stack([T0_inv @ T for T in gt])

    def drive(schedule: str) -> dict:
        kw = {} if schedule == "certified" else dict(assoc_mode="fast")
        pipe = Pipeline(
            sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1,
            p_th=0.8, b_min=0.1, b_ratio=0.02, num_keyframes=4,
            n_points=8192, depth=13, max_leaves=4096, **kw,
        )
        poses, promotions = [], 0
        for i, s in enumerate(scans):
            pipe.compute(0.1 * i, s)
            poses.append(pipe.current_pose())
            promotions += int(pipe.is_map_updated())
        est = np.stack(poses)

        E = np.eye(4)
        with tempfile.TemporaryDirectory() as td:
            est_f = os.path.join(td, "est.txt")
            gt_f = os.path.join(td, "gt.txt")
            with open(est_f, "w") as f:
                for T in est:
                    write_transformed_pose(f, T, E)
            with open(gt_f, "w") as f:
                for T in gt_rel:
                    write_transformed_pose(f, T, E)
            m = evaluate(est_f, gt_f, lengths=(5.0, 10.0, 20.0))

        end_err = float(
            np.linalg.norm(est[-1][:3, 3] - gt_rel[-1][:3, 3])
        )
        return {
            "drift_pct": round(float(m["t_err_pct"]), 4),
            "ate_rmse_m": round(float(m["ate_rmse_m"]), 5),
            "end_err_m": round(end_err, 5),
            "promotions": promotions,
            "segments": int(m["segments"]),
            # the full CPU-twin gate: ATE is Umeyama-aligned, so the
            # un-aligned endpoint error catches slow yaw-bias bends
            "pass": bool(
                m["t_err_pct"] < T_ERR_PCT_MAX
                and m["ate_rmse_m"] < ATE_M_MAX
                and end_err < END_ERR_M_MAX
                and m["segments"] >= 15
                and promotions >= 5
            ),
        }

    # both the default (certified exact) and the throughput (fast)
    # schedules, like the CPU twin's parametrisation
    out = {s: drive(s) for s in ("certified", "fast")}
    out["pass"] = all(v["pass"] for v in out.values())
    return out


def check_bench() -> dict:
    """Abbreviated flagship-config schedule matrix; the full matrix is
    bench.py's job (run by the driver every round)."""
    # pinned, NOT read from BENCH_SCHEDULES: a leftover env knob from a
    # prior bench run would silently re-key the regression floors below
    schedules = ("certified", "fast")
    # sanity floors per schedule: catastrophic perf regressions fail
    # the tier (r4/r5 floors: certified ~7.3, fast ~15.5 scans/s;
    # tunnel epochs vary ~1.6x, hence the wide margins)
    floors = {"certified": 4.0, "fast": 8.0}
    import jax

    from bench import BenchSetup

    setup = BenchSetup()
    n_steps = int(os.environ.get("BENCH_STEPS", "6"))
    n_windows = int(os.environ.get("BENCH_WINDOWS", "2"))
    out = {}
    for spec in schedules:
        pipe = setup.make_pipe(spec)
        setup.prime(pipe)
        total = 1 + 2 + n_windows * n_steps
        staged = {i: pipe.stage(setup.scan_at(i)) for i in range(1, total)}
        for i in range(1, 3):
            pipe.compute_device(0.1 * i, *staged[i])
        _ = jax.device_get(pipe.state.X)
        rates, lo = [], 3
        for _w in range(n_windows):
            t0 = time.perf_counter()
            for i in range(lo, lo + n_steps):
                pipe.compute_device(0.1 * i, *staged[i])
            _ = jax.device_get(pipe.state.X)
            rates.append(n_steps / (time.perf_counter() - t0))
            lo += n_steps
        out[spec] = {
            "scans_per_sec": round(max(rates), 2),
            "descents": pipe.descents(),
        }
        del pipe, staged
    ok = all(
        out[name]["scans_per_sec"] >= floor
        for name, floor in floors.items()
    )
    return {"schedules": out, "abbreviated": True, "pass": ok}


CHECKS = [
    ("precision_default", check_precision_default),
    ("point_transform", check_point_transform),
    ("onehot_exact", check_onehot_exact),
    ("motion_recovery", check_motion_recovery),
    ("certified_vs_exact", check_certified_vs_exact),
    ("drift_long", check_drift_long),
    ("realtime_20hz", check_realtime_20hz),
    ("bench", check_bench),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=int(os.environ.get("ROUND", 5)))
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-bench", action="store_true")
    ap.add_argument(
        "--only", default=None,
        help="comma-separated subset of check names",
    )
    args = ap.parse_args()

    import jax

    platform = jax.devices()[0].platform
    results, t_all = {}, time.perf_counter()
    only = set(args.only.split(",")) if args.only else None
    if only is not None:
        known = {name for name, _ in CHECKS}
        unknown = only - known
        if unknown:
            # a typo'd filter must not produce a false-green empty
            # artifact (ok = all(<empty>) = True)
            raise SystemExit(
                f"unknown check(s) {sorted(unknown)}; known: {sorted(known)}"
            )
    for name, fn in CHECKS:
        if name == "bench" and args.no_bench:
            continue
        if only is not None and name not in only:
            continue
        print(f"=== {name} ===", flush=True)
        t0 = time.perf_counter()
        try:
            r = fn()
        except Exception as e:  # a crashed check is a failed check
            r = {"pass": False, "error": f"{type(e).__name__}: {e}"}
        r["seconds"] = round(time.perf_counter() - t0, 1)
        results[name] = r
        print(f"    -> {'PASS' if r['pass'] else 'FAIL'} "
              f"({r['seconds']}s) {json.dumps({k: v for k, v in r.items() if k not in ('pass', 'seconds')})}",
              flush=True)

    ok = all(r["pass"] for r in results.values())
    artifact = {
        "round": args.round,
        "platform": platform,
        "ok": ok,
        "seconds": round(time.perf_counter() - t_all, 1),
        "checks": results,
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"CHIPCHECK_r{args.round:02d}.json",
    )
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"{'OK' if ok else 'FAILED'} -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
