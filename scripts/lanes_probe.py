#!/usr/bin/env python
"""kf-in-lanes microbenchmark: is the descent's substep chain cheaper
when all K=16 keyframes' carried blocks live in one (Q, 128) VPU tile?

VERDICT r3 #2: the per-keyframe descent does its vector math on (Q, 8)
blocks whose minor dim pads to 128 lanes (16x VPU waste), K times
sequentially. Stacking the K carried blocks into the minor dim gives
(Q, K*8) = (Q, 128) — exactly one tile — so the 16 per-keyframe substep
chains become ONE full-lane chain. This probe times JUST the dependent
substep math (no HBM gathers, no terms), bitwise-checking the lanes
variant against the per-kf variant:

  chain-kf    — 16 sequential per-kf substep chains on (Q, 8) blocks
                (the production layout, gathers replaced by a fixed row)
  chain-lanes — one (Q, 128) chain; group-local ops via static lane
                shifts/strided slices (sum order preserved, so sval is
                bitwise-equal to the per-kf chain)

Both run ROUNDS x N_STEPS x 3 substeps with a data dependency between
rounds. If chain-lanes does not win big here, the full kf-in-lanes
descent build is not worth it (the chain is its only advantage; the
issued gather rows are identical).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

Q = 32768
K = 16
ROUNDS = 15
N_STEPS = 6          # gather-steps per descent
SUBSTEPS = 3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    queries = jnp.asarray(rng.uniform(-40, 40, (Q, 3)), jnp.float32)
    # one fixed "row" per (kf, step-phase): the substep math reads a
    # (Q, 8) block; a broadcast row stands in for the gather result so
    # ONLY the chain math is timed (mirrors round_probe's `substeps`)
    rows = jnp.asarray(rng.normal(0, 1, (K, 8)), jnp.float32)
    rows = rows.at[:, 7].set(2.0)  # real interior flags
    rows = rows.at[:, 6].set(3.0)  # both children present

    def substep_kf(q, blk, node, side_accum):
        """One substep of the production per-kf math on (Q, 8)."""
        sval = jnp.sum((q - blk[:, 0:3]) * blk[:, 3:6], -1)
        side = sval >= 0
        flags = blk[:, 7]
        leaf = flags == 3.0
        real = flags >= 2.0
        kids = blk[:, 6]
        has = jnp.where(side, kids >= 2.0, (kids == 1.0) | (kids == 3.0))
        step = real & ~leaf & has
        node = jnp.where(step, 2 * node + side.astype(jnp.int32), node)
        # child select stand-in: blend the block with a shifted copy
        child = jnp.where(side[:, None], blk * 1.0001, blk * 0.9999)
        blk = jnp.where(step[:, None], child, blk)
        return blk, node, side_accum + sval

    def chain_kf(carry):
        q3 = carry  # (Q, 3) evolving input (data dependency)
        out = jnp.zeros((Q,), jnp.float32)
        for k in range(K):
            blk = jnp.broadcast_to(rows[k], (Q, 8))
            node = jnp.ones((Q,), jnp.int32)
            acc = jnp.zeros((Q,), jnp.float32)
            for g in range(N_STEPS):
                for s in range(SUBSTEPS):
                    blk, node, acc = substep_kf(q3, blk, node, acc)
            out = out + acc + node.astype(jnp.float32)
        return q3 + out[:, None] * 1e-30

    # ---- lanes variant: (Q, 128) carried blocks, all kf at once ----
    W = K * 8
    qtile = None  # built per call from q3

    def lane_shift(a, n):
        """a[:, i] <- a[:, i+n] (zeros shifted in) — static lane slice."""
        return jnp.concatenate(
            [a[:, n:], jnp.zeros((a.shape[0], n), a.dtype)], axis=1
        )

    def group_bcast(col16, reps=8):
        """(Q, 16) per-group scalars -> (Q, 128) lane-replicated."""
        return jnp.repeat(col16, reps, axis=1)

    def substep_lanes(qt, blk, node, acc):
        diff = qt - blk                       # (Q, 128)
        prod = diff * lane_shift(blk, 3)      # lanes 8k..8k+2 valid
        a0 = prod[:, 0::8]
        a1 = prod[:, 1::8]
        a2 = prod[:, 2::8]
        sval = (a0 + a1) + a2                 # (Q, 16): same order as sum
        side = sval >= 0                      # (Q, 16)
        flags = blk[:, 7::8]
        kids = blk[:, 6::8]
        leaf = flags == 3.0
        real = flags >= 2.0
        has = jnp.where(side, kids >= 2.0, (kids == 1.0) | (kids == 3.0))
        step = real & ~leaf & has             # (Q, 16)
        node = jnp.where(step, 2 * node + side.astype(jnp.int32), node)
        side128 = group_bcast(side)
        step128 = group_bcast(step)
        child = jnp.where(side128, blk * 1.0001, blk * 0.9999)
        blk = jnp.where(step128, child, blk)
        return blk, node, acc + sval

    rows128 = rows.reshape(1, W)

    def chain_lanes(carry):
        q3 = carry
        qt = jnp.concatenate(
            [q3, jnp.zeros((Q, 5), jnp.float32)], axis=1
        )                                     # (Q, 8) group pattern
        qt = jnp.tile(qt, (1, K))             # (Q, 128)
        blk = jnp.broadcast_to(rows128, (Q, W))
        node = jnp.ones((Q, K), jnp.int32)
        acc = jnp.zeros((Q, K), jnp.float32)
        for g in range(N_STEPS):
            for s in range(SUBSTEPS):
                blk, node, acc = substep_lanes(qt, blk, node, acc)
        out = jnp.sum(acc, axis=1) + jnp.sum(node, axis=1).astype(jnp.float32)
        return q3 + out[:, None] * 1e-30

    # ---- bitwise check: same math, same results per kf ----
    def onepass_kf(q3):
        outs = []
        for k in range(K):
            blk = jnp.broadcast_to(rows[k], (Q, 8))
            node = jnp.ones((Q,), jnp.int32)
            acc = jnp.zeros((Q,), jnp.float32)
            for g in range(N_STEPS):
                for s in range(SUBSTEPS):
                    blk, node, acc = substep_kf(q3, blk, node, acc)
            outs.append((node, acc))
        return outs

    def onepass_lanes(q3):
        qt = jnp.concatenate([q3, jnp.zeros((Q, 5), jnp.float32)], axis=1)
        qt = jnp.tile(qt, (1, K))
        blk = jnp.broadcast_to(rows128, (Q, W))
        node = jnp.ones((Q, K), jnp.int32)
        acc = jnp.zeros((Q, K), jnp.float32)
        for g in range(N_STEPS):
            for s in range(SUBSTEPS):
                blk, node, acc = substep_lanes(qt, blk, node, acc)
        return node, acc

    kf_out = jax.jit(onepass_kf)(queries)
    ln_node, ln_acc = jax.jit(onepass_lanes)(queries)
    for k in range(K):
        np.testing.assert_array_equal(
            np.asarray(kf_out[k][0]), np.asarray(ln_node[:, k]),
            err_msg=f"kf {k}: node ids diverge",
        )
        # the 18-substep sval ACCUMULATOR drifts at ulp scale (XLA fuses
        # the two formulations differently — same class of noise as the
        # ladder-vs-fori margins); ids above are the bitwise contract
        np.testing.assert_allclose(
            np.asarray(kf_out[k][1]), np.asarray(ln_acc[:, k]),
            rtol=1e-2, atol=1e-3,
            err_msg=f"kf {k}: sval accum diverges",
        )
    print("check: ids bitwise, sval accum ~ulp (lanes == per-kf)",
          flush=True)

    def mk_step(round_fn):
        @jax.jit
        def stepf(q):
            return jax.lax.fori_loop(
                0, ROUNDS, lambda r, q: round_fn(q), q
            )
        return stepf

    for name, fn in (
        ("chain-kf", mk_step(chain_kf)),
        ("chain-lanes", mk_step(chain_lanes)),
        ("chain-kf2", mk_step(chain_kf)),
    ):
        q = fn(queries)
        _ = jax.device_get(q)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            q = fn(q + 0.0)
            _ = jax.device_get(q)
            times.append(time.perf_counter() - t0)
        print(
            f"{name:12s}: min {min(times)*1e3:8.1f} ms  all "
            + " ".join(f"{t*1e3:.0f}" for t in times),
            flush=True,
        )


if __name__ == "__main__":
    main()
