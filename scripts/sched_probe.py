#!/usr/bin/env python
"""Same-process A/B of the FULL ICP round schedule (icp_rounds) per
association schedule — the headline decision data, without the full-step
compile cost of bench_ab (r3; the tunnel flaps, so chip windows are
short and every compile must count).

Variants run the real ``models.pipeline.icp_rounds`` (15 rounds, 16 kf,
flagship shapes) under different PipelineConfigs, back-to-back in one
process with a control repeat. Prints ms/step-equivalent (ICP loop only;
add ~20 ms build/aux + dispatch for scans/s) and descent counts.

Usage: python scripts/sched_probe.py [variant ...]
  variant := plain | certified | prefix:<U> | compact:<U> | fast[:<k>]
Default: plain prefix:16384 prefix:8192 prefix:4096 fast plain
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import BenchSetup
    from madicp_tpu.models.pipeline import PipelineConfig, icp_rounds
    from madicp_tpu.ops.tree import build_tree, get_leaves

    variants = sys.argv[1:] or [
        "plain", "prefix:16384", "prefix:8192", "prefix:4096", "fast",
        "plain",
    ]

    setup = BenchSetup()
    K, DEPTH = setup.num_keyframes, setup.depth

    build = jax.jit(
        lambda p, v: build_tree(p, v, depth=DEPTH, b_max=0.2, b_min=0.1)[0]
    )
    print("building ring...", flush=True)
    kf_tree = jax.tree.map(
        lambda *a: jnp.stack(a),
        *[build(*setup.pad(setup.scan_at(k - K))) for k in range(K)],
    )
    kf_valid_f = jnp.ones(K, jnp.float32)
    tree0 = build(*setup.pad(setup.scan_at(0)))
    leaves = get_leaves(tree0, setup.max_leaves)
    lp, lv = leaves.pts, leaves.valid
    # realistic start: the pipeline's constant-velocity prediction puts
    # X0 within ~cm of the optimum (1.4 m/scan, smooth motion) — a
    # cold 0.3 m offset makes every certificate-based schedule look
    # like plain exact (GN's first steps blow all budgets)
    X0 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.02)

    def make_cfg(spec):
        kw = dict(assoc_mode="exact", certify=False)
        if spec == "plain":
            pass
        elif spec == "certified":
            kw["certify"] = True
        elif spec.startswith("prefix:"):
            kw.update(certify=True, certify_prefix=int(spec.split(":")[1]))
        elif spec.startswith("compact:"):
            kw.update(certify=True, certify_compact=int(spec.split(":")[1]))
        elif spec.startswith("fast"):
            kw["assoc_mode"] = "fast"
            kw["reassoc_every"] = int(spec.split(":")[1]) if ":" in spec else 7
        else:
            raise SystemExit(f"unknown variant {spec!r}")
        return PipelineConfig(
            num_keyframes=K, n_points=setup.n_points, depth=DEPTH,
            max_leaves=setup.max_leaves, dtype=jnp.float32, **kw,
        )

    for spec in variants:
        cfg = make_cfg(spec)

        @jax.jit
        def run(kf_tree, kf_valid_f, lp, lv, X0):
            X, H, matched, nd = icp_rounds(
                cfg, kf_tree, kf_valid_f, lp, lv, X0
            )
            return X, nd

        t0 = time.perf_counter()
        X, nd = run(kf_tree, kf_valid_f, lp, lv, X0)
        _ = jax.device_get(X)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            X, nd = run(kf_tree, kf_valid_f, lp, lv, X0 + X * 1e-30)
            _ = jax.device_get(X)
            times.append(time.perf_counter() - t0)
        print(
            f"{spec:14s}: min {min(times)*1e3:7.1f} ms  all "
            + " ".join(f"{t*1e3:.0f}" for t in times)
            + f"  descents {int(jax.device_get(nd))}"
            + f"  compile {compile_s:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
