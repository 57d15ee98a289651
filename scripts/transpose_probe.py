#!/usr/bin/env python
"""Can the descent's substep math run UNPADDED, fields-in-sublanes?

r4 finding: the descent chain costs ~0.8-1.0 ns per LOGICAL element in
both the (Q, 8) per-kf layout and the (Q, 128) kf-in-lanes layout —
i.e. it is HBM-bandwidth-bound on the PADDED physical tensors (a (Q, 8)
f32 block tiles to (Q, 128) lanes: 16x wasted traffic at every fusion
boundary). The unpadded alternative: transpose each gathered (Q, 56)
row block to (56, Q) — fields in sublanes, queries in lanes, zero
padding — and run the substep math on (Q,)-wide field rows.

This probe times the candidate transposes and the transposed substep
chain against the production layout:

  t-xla    — jnp.transpose (Q,56)->(56,Q); r3's SoA attempt blamed its
             10x loss on this, never isolated
  t-mxu    — exact 3x-bf16-split dot_general against I56 (the
             _select_rows_onehot trick: transposition as matmul, output
             (56, Q) comes straight off the MXU)
  chain-row — production-layout substep chain (control, = lanes_probe)
  chain-T  — same chain, (8, Q) field rows, no transposes (chain cost
             alone: what the layout would buy if transposes were free)
  chain-T+mxu — chain-T plus one t-mxu per gather step (the real deal)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

Q = 32768
K = 16
ROUNDS = 15
N_STEPS = 6
SUBSTEPS = 3
W = 56


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    queries = jnp.asarray(rng.uniform(-40, 40, (Q, 3)), jnp.float32)
    rows = jnp.asarray(rng.normal(0, 1, (Q, W)), jnp.float32)

    def timed(name, fn, *args):
        out = fn(*args)
        _ = jax.device_get(jax.tree.leaves(out)[0])
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = jax.device_get(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name:12s}: min {min(ts)*1e3:8.1f} ms  all "
              + " ".join(f"{t*1e3:.0f}" for t in ts), flush=True)
        return out

    R_T = ROUNDS * N_STEPS * K  # transposes per scan equivalent

    @jax.jit
    def t_xla(rows):
        def body(i, acc):
            rt = jnp.transpose(rows + acc * 1e-30)
            return acc + rt[0, 0]
        return jax.lax.fori_loop(0, R_T, body, jnp.float32(0))

    def split3(x):
        bits = jax.lax.bitcast_convert_type(x, jnp.int32)
        hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536),
                                          jnp.float32)
        r1 = x - hi
        r1b = jax.lax.bitcast_convert_type(r1, jnp.int32)
        mid = jax.lax.bitcast_convert_type(r1b & jnp.int32(-65536),
                                           jnp.float32)
        lo = r1 - mid
        return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
                lo.astype(jnp.bfloat16))

    eyeW = jnp.eye(W, dtype=jnp.bfloat16)

    def mxu_T(x):
        """(Q, W) -> (W, Q) exactly: one 3-split contraction with I_W.
        out[w, q] = sum_v I[w, v] x[q, v]."""
        dn = (((1,), (1,)), ((), ()))
        parts = split3(x)
        outs = [
            jax.lax.optimization_barrier(
                jax.lax.dot_general(eyeW, p, dn,
                                    preferred_element_type=jnp.float32)
            )
            for p in parts
        ]
        return (outs[0] + outs[1]) + outs[2]

    @jax.jit
    def t_mxu(rows):
        def body(i, acc):
            rt = mxu_T(rows + acc * 1e-30)
            return acc + rt[0, 0]
        return jax.lax.fori_loop(0, R_T, body, jnp.float32(0))

    # bitwise check of the MXU transpose
    a = np.asarray(jax.jit(mxu_T)(rows))
    b = np.asarray(rows).T
    print("mxu transpose bitwise:", np.array_equal(a, b), flush=True)

    # ---- substep chains ----
    def substep_row(q3, blk, node, acc):
        sval = jnp.sum((q3 - blk[:, 0:3]) * blk[:, 3:6], -1)
        side = sval >= 0
        flags = blk[:, 7]
        leaf = flags == 3.0
        real = flags >= 2.0
        kids = blk[:, 6]
        has = jnp.where(side, kids >= 2.0, (kids == 1.0) | (kids == 3.0))
        step = real & ~leaf & has
        node = jnp.where(step, 2 * node + side.astype(jnp.int32), node)
        child = jnp.where(side[:, None], blk * 1.0001, blk * 0.9999)
        blk = jnp.where(step[:, None], child, blk)
        return blk, node, acc + sval

    def substep_T(q3T, blkT, node, acc):
        """blkT: (8, Q) field rows; q3T: (3, Q)."""
        sval = ((q3T[0] - blkT[0]) * blkT[3]
                + (q3T[1] - blkT[1]) * blkT[4]
                + (q3T[2] - blkT[2]) * blkT[5])
        side = sval >= 0
        flags = blkT[7]
        leaf = flags == 3.0
        real = flags >= 2.0
        kids = blkT[6]
        has = jnp.where(side, kids >= 2.0, (kids == 1.0) | (kids == 3.0))
        step = real & ~leaf & has
        node = jnp.where(step, 2 * node + side.astype(jnp.int32), node)
        child = jnp.where(side[None, :], blkT * 1.0001, blkT * 0.9999)
        blkT = jnp.where(step[None, :], child, blkT)
        return blkT, node, acc + sval

    blk0 = rows[:, 0:8]
    blk0T = jnp.transpose(blk0)
    q3T = jnp.transpose(queries)

    def chain(sub, q, b0):
        def round_fn(carry):
            qq = carry
            out = jnp.zeros((Q,), jnp.float32)
            for k in range(K):
                blk = b0
                node = jnp.ones((Q,), jnp.int32)
                acc = jnp.zeros((Q,), jnp.float32)
                for g in range(N_STEPS):
                    for s in range(SUBSTEPS):
                        blk, node, acc = sub(qq, blk, node, acc)
                out = out + acc + node.astype(jnp.float32)
            if qq.ndim == 2 and qq.shape[0] == 3:
                return qq + out[None, :] * 1e-30
            return qq + out[:, None] * 1e-30

        @jax.jit
        def stepf(qq):
            return jax.lax.fori_loop(0, ROUNDS, lambda r, x: round_fn(x), qq)

        return stepf

    def chain_T_mxu():
        def round_fn(qq):
            out = jnp.zeros((Q,), jnp.float32)
            for k in range(K):
                node = jnp.ones((Q,), jnp.int32)
                acc = jnp.zeros((Q,), jnp.float32)
                blkT = blk0T
                for g in range(N_STEPS):
                    rT = mxu_T(rows + acc[0] * 1e-30)  # gather stand-in + T
                    blkT = jnp.where((acc >= 0)[None, :], rT[0:8],
                                     blkT)
                    for s in range(SUBSTEPS):
                        blkT, node, acc = substep_T(qq, blkT, node, acc)
                out = out + acc + node.astype(jnp.float32)
            return qq + out[None, :] * 1e-30

        @jax.jit
        def stepf(qq):
            return jax.lax.fori_loop(0, ROUNDS, lambda r, x: round_fn(x), qq)

        return stepf

    # gather directly from a TRANSPOSED (56, M) arena: rows become lanes
    rowsT = jnp.transpose(rows)  # stands in for navT
    ids = jnp.asarray(rng.integers(0, Q, Q).astype(np.int32))

    @jax.jit
    def t_gatherT(rowsT, ids):
        def body(i, acc):
            rt = jnp.take(rowsT + acc * 1e-30, ids, axis=1)
            return acc + rt[0, 0]
        return jax.lax.fori_loop(0, R_T, body, jnp.float32(0))

    @jax.jit
    def t_gather_row(rows, ids):
        """control: the production-orientation gather, same trip count"""
        def body(i, acc):
            r = jnp.take(rows + acc * 1e-30, ids, axis=0)
            return acc + r[0, 0]
        return jax.lax.fori_loop(0, R_T, body, jnp.float32(0))

    timed("t-xla", t_xla, rows)
    timed("t-mxu", t_mxu, rows)
    timed("t-gatherT", t_gatherT, rowsT, ids)
    timed("t-gather-row", t_gather_row, rows, ids)
    timed("chain-row", chain(substep_row, queries, blk0), queries)
    timed("chain-T", chain(substep_T, q3T, blk0T), q3T)
    timed("chain-T+mxu", chain_T_mxu(), q3T)
    timed("chain-row2", chain(substep_row, queries, blk0), queries)


if __name__ == "__main__":
    main()
