#!/usr/bin/env python
"""Gather-row cost vs row width, in the exact-schedule access pattern.

NOTES.md records TPU HBM gathers at ~3.4 ns/row with rows "width-free up
to 256 B" (56 f32). The depth-3 nav-packing idea (15 blocks = 120 f32 =
480 B/row, 4 gathers per depth-16 descent instead of 6) only wins if a
480 B row still costs ~1 row — this probe answers that.

Pattern mimics the descent: lax.scan over K=16 stacked tables, per table
G sequential dependent gathers of Q random rows; repeated R rounds with
a data dependency between rounds. Reports ns per gather-row for widths
56 / 120 / 248 f32 (and re-runs 56 as drift control).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    K, M, Q, G, R = 16, 2 ** 17, 32768, 6, 15
    widths = [int(w) for w in sys.argv[1:]] or [56, 120, 248, 56]

    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, M, size=Q), jnp.int32)

    def make_step(W):
        @jax.jit
        def step(tables, idx):
            def rnd(r, idx):
                def per_kf(idx, tab):
                    for _ in range(G):
                        row = jnp.take(tab, idx, axis=0)  # (Q, W)
                        # data dependency: next index derives from the row
                        idx = (
                            idx * 1103515245 + row[:, 0].astype(jnp.int32)
                        ) & (M - 1)
                    return idx, None

                idx, _ = jax.lax.scan(per_kf, idx, tables)
                return idx

            return jax.lax.fori_loop(0, R, rnd, idx)

        return step

    for W in widths:
        tables = jnp.asarray(
            rng.integers(0, 7, size=(K, M, W)), jnp.float32
        )
        step = make_step(W)
        out = step(tables, idx0)
        _ = jax.device_get(out)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = step(tables, out)
            _ = jax.device_get(out)
            times.append(time.perf_counter() - t0)
        rows = R * K * G * Q
        best = min(times)
        print(
            f"W={W:4d} f32 ({W*4:4d} B): {best*1e3:7.1f} ms "
            f"= {best/rows*1e9:5.2f} ns/row  all "
            + " ".join(f"{t*1e3:.0f}" for t in times),
            flush=True,
        )


if __name__ == "__main__":
    main()
