#!/usr/bin/env python
"""Sweep the tree build's two compute-vs-memory thresholds on the chip.

The build replaces memory ops with compute for small levels (NOTES r4):
  - ``_BUILD_ONEHOT_MAX``: levels up to this many nodes select their
    per-point rows with an exact one-hot MXU matmul instead of an N-row
    HBM gather (13-wide rows, cheaper than the descent's 56-wide ones).
  - ``_BUILD_REDUCE_MIN_MAX``: levels up to this many nodes compute the
    oriented bbox with per-node masked min-REDUCTIONS instead of an
    N-row scatter-min.

Both crossovers were chip-measured once (r4) and are the last
non-exhausted single-chip lever NOTES names. This probe re-sweeps each
axis with the other held at its shipped value, timing R in-jit
repetitions of the full flagship build (data-dependent chaining, same
harness as scripts/aux_probe.py) so one dispatch's host latency is
amortised over R builds.

Bitwise safety: every variant is exact (the one-hot selection is
bitwise-equal to ``jnp.take``, min is order-free), so the sweep is a
pure wall-clock question.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import BenchSetup
    import madicp_tpu.ops.tree as tree_mod

    setup = BenchSetup()
    DEPTH = setup.depth
    R = 20

    pts, valid = setup.pad(setup.scan_at(0))
    pts = jnp.asarray(pts)
    valid = jnp.asarray(valid)

    def time_build() -> float:
        @jax.jit
        def rep_build(pts, valid):
            def body(i, acc):
                tree, _ = tree_mod.build_tree(
                    pts + acc * 1e-30, valid, depth=DEPTH,
                    b_max=0.2, b_min=0.1,
                )
                return acc + tree.nav[1, 0]

            return jax.lax.fori_loop(0, R, body, jnp.float32(0))

        _ = jax.device_get(rep_build(pts, valid))  # compile
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            _ = jax.device_get(rep_build(pts, valid))
            times.append(time.perf_counter() - t0)
        return min(times) / R * 1e3

    onehot0 = tree_mod._BUILD_ONEHOT_MAX
    reduce0 = tree_mod._BUILD_REDUCE_MIN_MAX

    print(f"flagship build, depth={DEPTH}, R={R} in-jit reps, "
          f"shipped onehot={onehot0} reduce={reduce0}", flush=True)

    results = {}
    print("-- _BUILD_ONEHOT_MAX sweep (reduce fixed) --", flush=True)
    for v in (512, 1024, 2048, 4096):
        tree_mod._BUILD_ONEHOT_MAX = v
        ms = time_build()
        results[("onehot", v)] = ms
        print(f"  onehot<={v:5d}: {ms:7.2f} ms/build", flush=True)
    tree_mod._BUILD_ONEHOT_MAX = onehot0

    print("-- _BUILD_REDUCE_MIN_MAX sweep (onehot fixed) --", flush=True)
    for v in (16, 32, 64):
        tree_mod._BUILD_REDUCE_MIN_MAX = v
        ms = time_build()
        results[("reduce", v)] = ms
        print(f"  reduce<={v:5d}: {ms:7.2f} ms/build", flush=True)
    tree_mod._BUILD_REDUCE_MIN_MAX = reduce0

    best_o = min((v for (k, v), ms in results.items() if k == "onehot"),
                 key=lambda v: results[("onehot", v)])
    best_r = min((v for (k, v), ms in results.items() if k == "reduce"),
                 key=lambda v: results[("reduce", v)])
    print(f"best: onehot<={best_o} ({results[('onehot', best_o)]:.2f} ms), "
          f"reduce<={best_r} ({results[('reduce', best_r)]:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
