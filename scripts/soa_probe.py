#!/usr/bin/env python
"""SoA-descent prototype probe (r3).

round_probe measured the exact round at ~563 us/(kf,round) with the
descent's HBM gathers NOT on the critical path (removing 5 of 6 changes
nothing): the cost is the substep vector math. Hypothesis: every
(Q, 8) / (Q, 3) intermediate in the descent is tiled (8, 128) on TPU
with the minor dim padded to 128 lanes, wasting 16-42x of the VPU. This
probe re-implements the descent with struct-of-arrays (Q,) fields and
compares:

  aos      — current production descent (associate_packed)
  soa      — gather (Q,56) row, split into (Q,) columns, all substep
             math on full-width (Q,) arrays
  soa-t    — same but the row is transposed to (56, Q) first
  aos2     — control repeat

Correctness: each variant's leaf ids are compared against aos.
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
    from madicp_tpu.ops.icp_core import associate_packed
    from madicp_tpu.ops.tree import build_tree, get_leaves

    setup = BenchSetup()
    K, DEPTH = setup.num_keyframes, setup.depth
    ROUNDS = 15

    build = jax.jit(
        lambda p, v: build_tree(p, v, depth=DEPTH, b_max=0.2, b_min=0.1)[0]
    )
    print("building ring...", flush=True)
    kf_nav = jnp.stack(
        [build(*setup.pad(setup.scan_at(k - K))).nav for k in range(K)]
    )
    tree0 = build(*setup.pad(setup.scan_at(0)))
    leaves = get_leaves(tree0, setup.max_leaves)
    lp, lv = leaves.pts, leaves.valid
    Q = lp.shape[0]
    X0 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.3)
    n_gathers = -(-DEPTH // 3) + (1 if DEPTH % 3 == 0 else 0)

    def descend_soa(nav, ml, transpose_row: bool):
        qx, qy, qz = ml[:, 0], ml[:, 1], ml[:, 2]
        node = jnp.ones(Q, jnp.int32) * lv.astype(jnp.int32)
        blk = [jnp.zeros(Q, nav.dtype) for _ in range(8)]
        for g in range(n_gathers):
            row = jnp.take(nav, node, axis=0)  # (Q, 56)
            if transpose_row:
                rt = row.T  # (56, Q)
                cols = [rt[i] for i in range(56)]
            else:
                cols = [row[:, i] for i in range(56)]
            blk = cols[0:8]
            b1 = None
            for s in range(3):
                active = (g * 3 + s) < DEPTH
                if not active:
                    continue
                sval = (
                    (qx - blk[0]) * blk[3]
                    + (qy - blk[1]) * blk[4]
                    + (qz - blk[2]) * blk[5]
                )
                side = sval >= 0
                flags = blk[7]
                leaf = flags == 3.0
                real = flags >= 2.0
                kids = blk[6]
                has = jnp.where(
                    side, kids >= 2.0, (kids == 1.0) | (kids == 3.0)
                )
                step = real & ~leaf & has
                node = jnp.where(step, 2 * node + side.astype(jnp.int32), node)
                if s == 0:
                    child = [
                        jnp.where(side, cols[16 + i], cols[8 + i])
                        for i in range(8)
                    ]
                    blk = [
                        jnp.where(step, c, b) for c, b in zip(child, blk)
                    ]
                    b1 = side & step
                elif s == 1:
                    lo = [
                        jnp.where(side, cols[32 + i], cols[24 + i])
                        for i in range(8)
                    ]
                    hi = [
                        jnp.where(side, cols[48 + i], cols[40 + i])
                        for i in range(8)
                    ]
                    child = [jnp.where(b1, h, l) for h, l in zip(hi, lo)]
                    blk = [
                        jnp.where(step, c, b) for c, b in zip(child, blk)
                    ]
        return node, blk

    def mk_desc_aos():
        def round_fn(X, nav_all):
            ml = lp @ X[:3, :3].T + X[:3, 3]

            def per_kf(acc, nav):
                ids, payload = associate_packed(nav, 0, DEPTH, ml, lv)
                return acc + jnp.sum(payload[:, 0]), None

            acc, _ = jax.lax.scan(per_kf, jnp.asarray(0, jnp.float32), nav_all)
            return X + acc * 1e-30

        return round_fn

    def mk_desc_soa(transpose_row):
        def round_fn(X, nav_all):
            ml = lp @ X[:3, :3].T + X[:3, 3]

            def per_kf(acc, nav):
                _, blk = descend_soa(nav, ml, transpose_row)
                return acc + jnp.sum(blk[0]), None

            acc, _ = jax.lax.scan(per_kf, jnp.asarray(0, jnp.float32), nav_all)
            return X + acc * 1e-30

        return round_fn

    def mk_step(round_fn):
        @jax.jit
        def step(X, nav_all):
            return jax.lax.fori_loop(
                0, ROUNDS, lambda r, X: round_fn(X, nav_all), X
            )

        return step

    # ---- correctness: soa ids == aos ids on one keyframe ----
    ml0 = np.asarray(lp @ X0[:3, :3].T + X0[:3, 3])
    ids_ref, _ = associate_packed(kf_nav[0], 0, DEPTH, jnp.asarray(ml0), lv)
    for tr in (False, True):
        ids_soa, _ = jax.jit(lambda nav, ml: descend_soa(nav, ml, tr))(
            kf_nav[0], jnp.asarray(ml0)
        )
        np.testing.assert_array_equal(np.asarray(ids_ref), np.asarray(ids_soa))
    print("soa ids == aos ids  OK", flush=True)

    variants = [
        ("aos", mk_step(mk_desc_aos())),
        ("soa", mk_step(mk_desc_soa(False))),
        ("soa-t", mk_step(mk_desc_soa(True))),
        ("aos2", mk_step(mk_desc_aos())),
    ]
    for name, step in variants:
        X = step(X0, kf_nav)
        _ = jax.device_get(X)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            X = step(X + 0.0, kf_nav)
            _ = jax.device_get(X)
            times.append(time.perf_counter() - t0)
        print(
            f"{name:8s}: min {min(times)*1e3:8.1f} ms  all "
            + " ".join(f"{t*1e3:.0f}" for t in times),
            flush=True,
        )


if __name__ == "__main__":
    main()
