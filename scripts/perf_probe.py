#!/usr/bin/env python
"""Exact-schedule association probe: dynamic-slice scan vs flat-forest.

VERDICT r1 headline: the exact (reference-identical) ICP schedule runs
~2x above the measured gather floor, prime suspect the per-keyframe
``lax.scan`` whose xs-slicing copies each ~29 MB keyframe arena every GN
round (NOTES.md). This probe measures the full 15-round exact schedule
at the flagship config under interchangeable association backends:

  scan  — current production path: lax.scan over stacked (K, M, 56)
          arenas; XLA dynamic-slices one arena per step (copy).
  flat  — judge-suggested: ONE (K*M, 56) reshaped view, sequential
          fori_loop over keyframes, descent gathers index at a traced
          base offset (no slice copy; hot footprint per phase is still
          one tree).
  batch — all keyframes' descents at once (vmap over base offsets);
          gathers interleave across the whole forest (expected slow per
          early probes; included as the control).

Measurement discipline (NOTES.md): timings bracket N in-jit rounds with
real data dependencies (the GN update feeds the next round); sync via
jax.device_get; same-process back-to-back comparisons only; the big
arenas are jit ARGUMENTS.

Usage: python scripts/perf_probe.py [variants: scan flat batch scan2]
       [--calls N]   (timed calls per variant; default 4)
Default variants: scan flat scan2 (scan2 = repeat control for drift).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")  # repo root (bench.py)


def main():
    import jax
    import jax.numpy as jnp

    from bench import synthetic_kitti_scan
    from madicp_tpu.ops.icp_core import (
        gn_se3_step,
        icp_terms,
        icp_terms_packed,
    )
    from madicp_tpu.ops.tree import SearchTree, build_tree, get_leaves

    args = sys.argv[1:]
    n_calls = 4
    variants = []
    i = 0
    while i < len(args):
        if args[i] == "--calls":
            n_calls = int(args[i + 1])
            i += 2
        elif args[i].startswith("--"):
            raise SystemExit(f"unknown option {args[i]!r} (see docstring)")
        else:
            variants.append(args[i])
            i += 1
    variants = variants or ["scan", "flat", "scan2"]
    known = {"scan", "scan2", "flat", "batch", "lad1", "lad2", "lad3",
             "lad4", "lad5"}
    unknown = [v for v in variants if v not in known]
    if unknown:
        raise SystemExit(f"unknown variants {unknown}; pick from {sorted(known)}")

    K, N, DEPTH, L = 16, 131072, 16, 32768
    B_MAX, B_MIN, B_RATIO, RHO = 0.2, 0.1, 0.02, 0.1
    ROUNDS = 15
    M = 2 ** (DEPTH + 1)

    rng = np.random.default_rng(0)
    world = synthetic_kitti_scan(rng, n_points=120000)

    def pad(points):
        pts = np.zeros((N, 3), np.float32)
        pts[: len(points)] = points[:N]
        v = np.zeros(N, bool)
        v[: len(points)] = True
        return jnp.asarray(pts), jnp.asarray(v)

    build = jax.jit(
        lambda p, v: build_tree(p, v, depth=DEPTH, b_max=B_MAX, b_min=B_MIN)[0]
    )
    print("building keyframe ring...", flush=True)
    navs = []
    for k in range(K):
        t = np.array([1.4 * k, 0.05 * k, 0.0])
        local = (world - t).astype(np.float32)
        local += rng.normal(0, 0.008, local.shape).astype(np.float32)
        navs.append(build(*pad(local)).nav)
    kf_nav = jnp.stack(navs)  # (K, M, 56)
    del navs

    tree0 = build(*pad(world.astype(np.float32)))
    leaves = get_leaves(tree0, L)
    lp, lv = leaves.pts, leaves.valid
    X0 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.3)
    kw = dict(b_max=B_MAX, b_ratio=B_RATIO, rho_ker=RHO)

    # ---- variant bodies: one full re-association GN round over K kf ----
    def make_round_scan(ladder):
        def round_scan(X, kf_nav):
            def per_kf(acc, nav):
                t = icp_terms(SearchTree(nav), lp, lv, X, ladder=ladder, **kw)
                return (acc[0] + t.H, acc[1] + t.b), None

            (H, b), _ = jax.lax.scan(
                per_kf, (jnp.zeros((6, 6)), jnp.zeros(6)), kf_nav
            )
            return gn_se3_step(X, H, b)

        return round_scan

    round_scan = make_round_scan(0)

    def round_flat(X, nav_flat):
        def per_kf(k, acc):
            t = icp_terms_packed(nav_flat, k * M, DEPTH, lp, lv, X, **kw)
            return (acc[0] + t.H, acc[1] + t.b)

        H, b = jax.lax.fori_loop(
            0, K, per_kf, (jnp.zeros((6, 6)), jnp.zeros(6))
        )
        return gn_se3_step(X, H, b)

    def round_batch(X, nav_flat):
        bases = jnp.arange(K, dtype=jnp.int32) * M

        def one(base):
            t = icp_terms_packed(nav_flat, base, DEPTH, lp, lv, X, **kw)
            return t.H, t.b

        Hs, bs = jax.vmap(one)(bases)
        return gn_se3_step(X, jnp.sum(Hs, 0), jnp.sum(bs, 0))

    def make_step(round_fn):
        @jax.jit
        def step(X, nav_arg):
            return jax.lax.fori_loop(
                0, ROUNDS, lambda r, X: round_fn(X, nav_arg), X
            )

        return step

    steps = {
        "scan": (make_step(round_scan), lambda: kf_nav),
        "scan2": (make_step(round_scan), lambda: kf_nav),  # repeat control
        "flat": (make_step(round_flat), lambda: kf_nav.reshape(K * M, 56)),
        "batch": (make_step(round_batch), lambda: kf_nav.reshape(K * M, 56)),
        # select-ladder descents (r3): first k gathers computed instead
        # of issued — bitwise-identical results (ops/tree.py)
        **{
            f"lad{k}": (make_step(make_round_scan(k)), lambda: kf_nav)
            for k in (1, 2, 3, 4, 5)
        },
    }

    results = {}
    for name in variants:
        step, arg_fn = steps[name]
        arg = arg_fn()
        X = step(X0, arg)  # compile + run
        _ = jax.device_get(X)
        times = []
        for _ in range(n_calls):
            t0 = time.perf_counter()
            X = step(X + 0.0, arg)
            _ = jax.device_get(X)
            times.append(time.perf_counter() - t0)
        results[name] = min(times)
        print(
            f"{name:6s}: {ROUNDS}-round exact step "
            f"min {min(times)*1e3:8.1f} ms  all "
            + " ".join(f"{t*1e3:.0f}" for t in times),
            flush=True,
        )

    if "scan" in results and "flat" in results:
        print(f"flat/scan speedup: {results['scan']/results['flat']:.2f}x")


if __name__ == "__main__":
    main()
