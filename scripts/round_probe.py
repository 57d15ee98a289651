#!/usr/bin/env python
"""Decompose the exact GN round's ~670 us/(kf,round) on the chip.

CAUTION: every r3 ladder row from this probe was VACUOUS — the ladder
guard was dead code until r4 (`use_ladder` tested `isinstance(base,
int)` after `base` had become a jnp array), so "lad*" variants measured
the gather path against itself. r4 fixed the guard (ops/tree.py) and
added a non-vacuity test pinning the lowered HLO; the rows below are
real as of r4. This probe times the round's components in one process:

  full      — the production round (descent + terms) per kf scan
  desc      — descent only (ids consumed, no terms math)
  desc-lad5 — descent only, 5 of 6 gathers computed
  terms     — terms math only from a fixed payload (no tree access)
  noslice   — descent only, ONE nav arg reused for all 16 kf
              (kills the lax.scan xs dynamic-slice copies)
  substeps  — descent control-flow math alone: same loop, gathers
              replaced by a broadcast row (1 hot row, no selects)
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
    from madicp_tpu.ops.icp_core import (
        associate_packed,
        gn_se3_step,
        icp_terms,
        terms_from_payload,
    )
    from madicp_tpu.ops.tree import SearchTree, build_tree, get_leaves

    setup = BenchSetup()
    K, DEPTH = setup.num_keyframes, setup.depth
    ROUNDS = 15
    kw = dict(b_max=0.2, b_ratio=0.02, rho_ker=0.1)

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
    X0 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.3)

    def mk_full(ladder):
        def round_fn(X, nav_all):
            def per_kf(acc, nav):
                t = icp_terms(SearchTree(nav), lp, lv, X, ladder=ladder, **kw)
                return (acc[0] + t.H, acc[1] + t.b), None

            (H, b), _ = jax.lax.scan(
                per_kf, (jnp.zeros((6, 6)), jnp.zeros(6)), nav_all
            )
            return gn_se3_step(X, H, b)

        return round_fn

    def mk_desc(ladder, noslice=False):
        def round_fn(X, nav_arg):
            # noslice: nav_arg is ONE (M, 56) arena searched 16x (no xs
            # dynamic-slice per keyframe); else the stacked (K, M, 56)
            ml = lp @ X[:3, :3].T + X[:3, 3]

            def per_kf(acc, nav):
                if noslice:
                    nav = nav_arg
                ids, payload = associate_packed(
                    nav, 0, DEPTH, ml, lv, ladder=ladder
                )
                return acc + jnp.sum(payload[:, 0]) + jnp.asarray(
                    ids[0], jnp.float32
                ), None

            xs = jnp.arange(K) if noslice else nav_arg
            acc, _ = jax.lax.scan(per_kf, jnp.asarray(0, jnp.float32), xs)
            return X + acc * 1e-30  # data dependency into next round

        return round_fn

    def mk_full_tuple(ladder):
        """Ring as a TUPLE of 16 separate nav arrays: the per-kf loop is
        Python-unrolled, so there is no lax.scan xs dynamic-slice copy
        (~19 ms/loop, desc-noslice r3/r4). r1 measured unrolled STACKED
        static slices 1.6x slower; separate args may behave differently
        (no slice op at all — each nav is its own parameter)."""

        def round_fn(X, navs):
            H = jnp.zeros((6, 6))
            b = jnp.zeros(6)
            for nav in navs:
                t = icp_terms(SearchTree(nav), lp, lv, X, ladder=ladder, **kw)
                H = H + t.H
                b = b + t.b
            return gn_se3_step(X, H, b)

        return round_fn

    def mk_desc_fori(ladder):
        """fori_loop + dynamic_index instead of scan xs (VERDICT r4
        item 4's first untried variant — scan lowers to the same
        slice, so parity here CLOSES that idea)."""

        def round_fn(X, nav_all):
            ml = lp @ X[:3, :3].T + X[:3, 3]

            def body(k, acc):
                nav = jax.lax.dynamic_index_in_dim(
                    nav_all, k, keepdims=False
                )
                ids, payload = associate_packed(
                    nav, 0, DEPTH, ml, lv, ladder=ladder
                )
                return acc + jnp.sum(payload[:, 0]) + jnp.asarray(
                    ids[0], jnp.float32
                )

            acc = jax.lax.fori_loop(0, K, body, jnp.asarray(0, jnp.float32))
            return X + acc * 1e-30

        return round_fn

    def mk_desc_pipe(ladder, full=False):
        """Software-pipelined xs: iteration k's body FIRST issues the
        dynamic-slice of keyframe k+1's nav (independent work), THEN
        descends keyframe k from the carry. The ~80 us/kf slice copy
        already runs at memcpy speed-of-light (29 MB read+write at HBM
        BW), so the only possible win is OVERLAP: the descent is
        gather-issue-bound, leaving bandwidth idle for the prefetch."""

        def round_fn(X, nav_all):
            ml = lp @ X[:3, :3].T + X[:3, 3]

            def per_kf(carry, k):
                acc, nav_cur = carry
                nav_next = jax.lax.dynamic_index_in_dim(
                    nav_all, jnp.minimum(k + 1, K - 1), keepdims=False
                )
                if full:
                    t = icp_terms(
                        SearchTree(nav_cur), lp, lv, X, ladder=ladder, **kw
                    )
                    acc = (acc[0] + t.H, acc[1] + t.b)
                else:
                    ids, payload = associate_packed(
                        nav_cur, 0, DEPTH, ml, lv, ladder=ladder
                    )
                    acc = acc + jnp.sum(payload[:, 0]) + jnp.asarray(
                        ids[0], jnp.float32
                    )
                return (acc, nav_next), None

            acc0 = (
                (jnp.zeros((6, 6)), jnp.zeros(6))
                if full else jnp.asarray(0, jnp.float32)
            )
            (acc, _), _ = jax.lax.scan(
                per_kf, (acc0, nav_all[0]), jnp.arange(K)
            )
            if full:
                return gn_se3_step(X, acc[0], acc[1])
            return X + acc * 1e-30

        return round_fn

    def mk_terms(payload_all):
        def round_fn(X, nav_all):
            def per_kf(acc, payload):
                t = terms_from_payload(payload, lp, lv, X, **kw)
                return (acc[0] + t.H, acc[1] + t.b), None

            (H, b), _ = jax.lax.scan(
                per_kf, (jnp.zeros((6, 6)), jnp.zeros(6)), payload_all
            )
            return gn_se3_step(X, H, b)

        return round_fn

    # fixed payload for the terms-only variant
    ml0 = lp @ X0[:3, :3].T + X0[:3, 3]
    _, payload0 = associate_packed(kf_nav[0], 0, DEPTH, ml0, lv)
    payload_all = jnp.stack([payload0] * K)

    def mk_terms_mm(payload_all):
        """Normal equations as ONE stacked (8,L)x(L,8) matmul per kf
        instead of 27 full-width multiply-reduces: rows = [sqrt(s)J(6),
        sqrt(s)e, 0]; H = G[0:6,0:6], b = G[0:6,6]. Fewer ops per
        (kf, round) if the terms cost is op-count-bound.
        Measured r4: 31.7 vs 33.5 ms — ~5%, dropped."""
        import jax.numpy as jnp

        def round_fn(X, nav_all):
            dtype = lp.dtype
            R = X[:3, :3]
            t = X[:3, 3]
            rho = jnp.sqrt(jnp.asarray(0.1, dtype))

            def per_kf(acc, payload):
                ml = lp @ R.T + t
                mlx, mly, mlz = ml[:, 0], ml[:, 1], ml[:, 2]
                mx, my, mz = lp[:, 0], lp[:, 1], lp[:, 2]
                fx, fy, fz = payload[:, 0], payload[:, 1], payload[:, 2]
                nx, ny, nz = payload[:, 3], payload[:, 4], payload[:, 5]
                f_bbox0 = payload[:, 6]
                f_ok = payload[:, 7] == 3.0
                dx, dy, dz = mlx - fx, mly - fy, mlz - fz
                dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                src_ball = 0.2 + 0.02 * jnp.sqrt(mx * mx + my * my + mz * mz)
                matched = (dist <= src_ball) & lv & f_ok
                e = dx * nx + dy * ny + dz * nz
                ux = nx * R[0, 0] + ny * R[1, 0] + nz * R[2, 0]
                uy = nx * R[0, 1] + ny * R[1, 1] + nz * R[2, 1]
                uz = nx * R[0, 2] + ny * R[1, 2] + nz * R[2, 2]
                chi = jnp.abs(e)
                scale = jnp.where(chi > rho, rho / jnp.maximum(chi, 1e-30), 1.0)
                w_plan = jnp.clip(1.0 - f_bbox0 / 0.2, 0.0, 1.0)
                s = scale * w_plan * w_plan * matched.astype(dtype)
                sq = jnp.sqrt(s)
                Wm = jnp.stack([
                    sq * ux, sq * uy, sq * uz,
                    sq * (my * uz - mz * uy),
                    sq * (mz * ux - mx * uz),
                    sq * (mx * uy - my * ux),
                    sq * e, jnp.zeros_like(e),
                ])                                  # (8, L)
                G = jax.lax.dot_general(
                    Wm, Wm, (((1,), (1,)), ((), ()))
                )                                   # (8, 8)
                return (acc[0] + G[0:6, 0:6], acc[1] + G[0:6, 6]), None

            (H, b), _ = jax.lax.scan(
                per_kf, (jnp.zeros((6, 6)), jnp.zeros(6)), payload_all
            )
            return gn_se3_step(X, H, b)

        return round_fn

    def mk_step(round_fn):
        @jax.jit
        def step(X, nav_all):
            return jax.lax.fori_loop(
                0, ROUNDS, lambda r, X: round_fn(X, nav_all), X
            )

        return step

    nav1 = kf_nav[0]
    nav_tuple = tuple(kf_nav[k] for k in range(K))
    variants = [
        ("full", mk_step(mk_full(0)), kf_nav),
        ("full-lad1", mk_step(mk_full(1)), kf_nav),
        ("full-lad2", mk_step(mk_full(2)), kf_nav),
        ("full-lad3", mk_step(mk_full(3)), kf_nav),
        ("full-lad4", mk_step(mk_full(4)), kf_nav),
        ("full-tuple-lad3", mk_step(mk_full_tuple(3)), nav_tuple),
        ("desc", mk_step(mk_desc(0)), kf_nav),
        ("desc-fori-lad3", mk_step(mk_desc_fori(3)), kf_nav),
        ("desc-pipe-lad3", mk_step(mk_desc_pipe(3)), kf_nav),
        ("full-pipe-lad3", mk_step(mk_desc_pipe(3, full=True)), kf_nav),
        ("desc-lad3", mk_step(mk_desc(3)), kf_nav),
        ("desc-lad5", mk_step(mk_desc(5)), kf_nav),
        ("desc-noslice", mk_step(mk_desc(0, noslice=True)), nav1),
        ("desc-noslice-lad5", mk_step(mk_desc(5, noslice=True)), nav1),
        ("terms", mk_step(mk_terms(payload_all)), kf_nav),
        ("terms-mm", mk_step(mk_terms_mm(payload_all)), kf_nav),
        ("full2", mk_step(mk_full(0)), kf_nav),
    ]
    import os

    only = os.environ.get("ROUND_PROBE_ONLY", "")
    if only:
        wanted = {w.strip() for w in only.split(",") if w.strip()}
        variants = [v for v in variants if v[0] in wanted]
    for name, step, arg in variants:
        X = step(X0, arg)
        _ = jax.device_get(X)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            X = step(X + 0.0, arg)
            _ = jax.device_get(X)
            times.append(time.perf_counter() - t0)
        print(
            f"{name:18s}: min {min(times)*1e3:8.1f} ms  all "
            + " ".join(f"{t*1e3:.0f}" for t in times),
            flush=True,
        )


if __name__ == "__main__":
    main()
