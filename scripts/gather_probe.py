#!/usr/bin/env python
"""Gather cost vs operand size (the issue-vs-cache-bound question, r3).

bench_ab r3 measured certified == exact (185 ms) despite 91% of descents
parked on row 0, and compact SLOWER — descent gathers are issue-bound
per ROW. The remaining lever is making each issued row cheaper. NOTES'
older probes say gather cost tracks the OPERAND size (1.4 ns/row hot
<=34 MB vs 3.4 ns/row for the 29 MB arenas, 10x penalty for a 537 MB
flat forest). The current descent gathers every level from the full
(131072, 56) arena; per-gather-level tables would shrink the operand to
8^g rows (2 KB..7 MB). This probe measures exactly that:

  A. 6 chained gathers of Q=32768 rows from ONE operand of N rows,
     N in {8, 64, 512, 4096, 32768, 131072} — ns/row vs operand size.
  B. leveled-descent emulation: 6 chained gathers from tables of sizes
     1, 8, 64, 512, 4096, 32768 (the per-level layout), over 16
     keyframes x 15 rounds — directly predicts the new exact
     association time.
  C. control: variant A at N=131072 repeated (drift check).

Measurement discipline (NOTES.md): in-jit repetition with a REAL data
dependency (gathered values feed the next indices), operands as jit
arguments, sync via jax.device_get, one process.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    Q, W, R, G = 32768, 56, 15, 6
    rng = np.random.default_rng(0)

    def mktab(n):
        # values uniform in [0, n) so index chaining actually scatters
        return jnp.asarray(rng.uniform(0, n, (n, W)).astype(np.float32))

    def chain_same(tab):
        """R rounds x G chained gathers from one operand."""
        n = tab.shape[0]
        idx0 = jnp.asarray(rng.integers(0, n, Q).astype(np.int32))

        @jax.jit
        def run(tab, idx0):
            def rnd(r, carry):
                idx, acc = carry

                def g(i, carry):
                    idx, acc = carry
                    row = jnp.take(tab, idx, axis=0)
                    acc = acc + row[:, 0]
                    idx = (idx + row[:, 1].astype(jnp.int32) + r + i) % n
                    return idx, acc

                return jax.lax.fori_loop(0, G, g, (idx, acc))

            idx, acc = jax.lax.fori_loop(
                0, R, rnd, (idx0, jnp.zeros((Q,), jnp.float32))
            )
            return acc

        return run, (tab, idx0), R * G * Q

    def chain_leveled(tabs, K=16):
        """15 rounds x 16 kf x one 6-gather leveled descent."""
        sizes = [t.shape[0] for t in tabs]
        idx0 = jnp.asarray(rng.integers(0, sizes[0], Q).astype(np.int32))

        @jax.jit
        def run(tabs, idx0):
            def rnd(r, carry):
                idx, acc = carry

                def kf(k, carry):
                    idx, acc = carry
                    for g, tab in enumerate(tabs):
                        n = tab.shape[0]
                        row = jnp.take(tab, idx % n, axis=0)
                        acc = acc + row[:, 0]
                        idx = (idx + row[:, 1].astype(jnp.int32) + k + g)
                    return idx % sizes[0], acc

                return jax.lax.fori_loop(0, K, kf, (idx, acc))

            idx, acc = jax.lax.fori_loop(
                0, R, rnd, (idx0, jnp.zeros((Q,), jnp.float32))
            )
            return acc

        return run, (tabs, idx0), R * K * len(tabs) * Q

    variants = []
    for n in (8, 64, 512, 4096, 32768, 131072):
        variants.append((f"same:{n}", chain_same(mktab(n))))
    variants.append(
        ("leveled16kf", chain_leveled(tuple(mktab(8 ** g if g else 1)
                                            for g in range(6))))
    )
    variants.append(("same:131072ctl", chain_same(mktab(131072))))

    for name, (run, args, rows) in variants:
        out = run(*args)  # compile + run
        _ = jax.device_get(out)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = run(*args)
            _ = jax.device_get(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"{name:16s}: {best * 1e3:9.2f} ms  "
            f"{best / rows * 1e9:6.2f} ns/row  "
            f"all " + " ".join(f"{t * 1e3:.0f}" for t in times),
            flush=True,
        )


if __name__ == "__main__":
    main()
