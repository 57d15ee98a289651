#!/usr/bin/env python
"""Compiled-HLO diagnosis of the exact round's 563 us/(kf,round) (r3).

round_probe facts: removing descent gathers changes nothing; SoA
(column) form is 12x SLOWER; terms alone are 32 ms/step. Hypothesis:
the round is HBM-bound on MATERIALIZED intermediates whose minor dim
pads to the (8, 128) tile. This probe compiles one 15-round exact loop
and prints XLA's own accounting: cost_analysis() bytes accessed/flops,
plus the large buffers/ops in the optimized HLO (fusions, copies,
transposes, gathers with their shapes).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import BenchSetup
    from madicp_tpu.ops.icp_core import gn_se3_step, icp_terms
    from madicp_tpu.ops.tree import SearchTree, build_tree, get_leaves

    setup = BenchSetup()
    K, DEPTH = setup.num_keyframes, setup.depth
    ROUNDS = 15
    kw = dict(b_max=0.2, b_ratio=0.02, rho_ker=0.1)

    build = jax.jit(
        lambda p, v: build_tree(p, v, depth=DEPTH, b_max=0.2, b_min=0.1)[0]
    )
    tree0 = build(*setup.pad(setup.scan_at(0)))
    leaves = get_leaves(tree0, setup.max_leaves)
    lp, lv = leaves.pts, leaves.valid
    kf_nav = jnp.stack([tree0.nav] * K)
    X0 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.3)

    def step(X, nav_all):
        def round_fn(r, X):
            def per_kf(acc, nav):
                t = icp_terms(SearchTree(nav), lp, lv, X, **kw)
                return (acc[0] + t.H, acc[1] + t.b), None

            (H, b), _ = jax.lax.scan(
                per_kf, (jnp.zeros((6, 6)), jnp.zeros(6)), nav_all
            )
            return gn_se3_step(X, H, b)

        return jax.lax.fori_loop(0, ROUNDS, round_fn, X)

    lowered = jax.jit(step).lower(X0, kf_nav)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    keys = ["flops", "bytes accessed", "bytes accessed output",
            "transcendentals", "optimal_seconds"]
    for k in keys:
        if k in ca:
            print(f"{k:24s}: {ca[k]:.3e}")
    # per-memory-space breakdowns when present
    for k, v in sorted(ca.items()):
        if k.startswith("bytes accessed") and k not in keys:
            print(f"{k:24s}: {v:.3e}")

    txt = compiled.as_text()
    print(f"\nHLO: {len(txt.splitlines())} lines")
    # big tensor shapes by op kind inside the while body
    counts = {}
    for m in re.finditer(r"= (\w+)\(", txt):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    top = sorted(counts.items(), key=lambda kv: -kv[1])[:18]
    print("op counts:", top)
    # the biggest buffers mentioned
    shapes = {}
    for m in re.finditer(r"f32\[([\d,]+)\]", txt):
        dims = [int(d) for d in m.group(1).split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        shapes[m.group(0)] = n
    big = sorted(shapes.items(), key=lambda kv: -kv[1])[:12]
    print("largest f32 shapes:", [(s, f"{n*4/1e6:.1f}MB") for s, n in big])
    for kind in ("fusion", "copy", "transpose", "gather"):
        lines = [ln.strip()[:140] for ln in txt.splitlines()
                 if f" {kind}(" in ln or f"= {kind}" in ln]
        print(f"\n{kind}: {len(lines)}")
        for ln in lines[:6]:
            print("  ", ln)


if __name__ == "__main__":
    main()
