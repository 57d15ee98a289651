#!/usr/bin/env python
"""Decompose the ~20 ms replicated per-step aux floor (VERDICT r2 item 4).

The odometry step outside the ICP rounds: deskew (off in bench), tree
build, leaf extraction, velocity estimate, frame-ring writes,
transform_tree, promotion cond. These are replicated across kf-sharded
devices, so they cap kf-axis scaling (NOTES cost model). Times each
piece with R=20 in-jit repetitions and real data dependencies.
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
    from madicp_tpu.ops.tree import build_tree, get_leaves, transform_tree

    setup = BenchSetup()
    DEPTH, L = setup.depth, setup.max_leaves
    R = 20

    pts, valid = setup.pad(setup.scan_at(0))

    def timed(name, fn, *args):
        out = fn(*args)  # compile
        _ = jax.device_get(jax.tree.leaves(out)[0])
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = jax.device_get(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        print(
            f"{name:16s}: {min(times) / R * 1e3:7.2f} ms/iter  "
            f"(total {min(times)*1e3:.0f} ms / {R})",
            flush=True,
        )
        return out

    @jax.jit
    def rep_build(pts, valid):
        def body(i, acc):
            tree, _ = build_tree(
                pts + acc * 1e-30, valid, depth=DEPTH, b_max=0.2, b_min=0.1
            )
            return acc + tree.nav[1, 0]

        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    tree0, _ = jax.jit(
        lambda p, v: build_tree(p, v, depth=DEPTH, b_max=0.2, b_min=0.1)
    )(pts, valid)

    @jax.jit
    def rep_leaves(nav):
        def body(i, acc):
            from madicp_tpu.ops.tree import SearchTree

            lv = get_leaves(SearchTree(nav + acc * 1e-30), L)
            return acc + lv.pts[0, 0]

        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    @jax.jit
    def rep_transform(nav):
        from madicp_tpu.ops.tree import SearchTree

        Rm = jnp.eye(3, dtype=jnp.float32)
        t = jnp.ones(3, jnp.float32) * 1e-9

        def body(i, acc):
            tr = transform_tree(SearchTree(nav + acc * 1e-30), Rm, t)
            return acc + tr.nav[1, 0]

        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    @jax.jit
    def rep_ring_write(nav, ring):
        def body(i, carry):
            acc, ring = carry
            ring = ring.at[i % ring.shape[0]].set(nav + acc * 1e-30)
            return (acc + ring[0, 1, 0], ring)

        return jax.lax.fori_loop(0, R, body, (jnp.float32(0), ring))

    ring = jnp.stack([tree0.nav] * 10)
    timed("build_tree", rep_build, pts, valid)
    timed("get_leaves", rep_leaves, tree0.nav)
    timed("transform_tree", rep_transform, tree0.nav)
    timed("ring_write(10)", rep_ring_write, tree0.nav, ring)

    # the full odometry step minus ICP (max_icp_iterations=0)
    pipe = setup.make_pipe("exact")
    import dataclasses

    pipe.cfg = dataclasses.replace(pipe.cfg, max_icp_iterations=0)
    setup.prime(pipe)
    staged = {i: pipe.stage(setup.scan_at(i)) for i in range(1, 10)}
    for i in range(1, 4):
        pipe.compute_device(0.1 * i, *staged[i])
    _ = jax.device_get(pipe.state.X)
    t0 = time.perf_counter()
    for i in range(4, 10):
        pipe.compute_device(0.1 * i, *staged[i])
    _ = jax.device_get(pipe.state.X)
    dt = (time.perf_counter() - t0) / 6
    print(f"step(0 icp its)  : {dt*1e3:7.2f} ms/scan  (incl ~35 ms RPC)",
          flush=True)


if __name__ == "__main__":
    main()
