#!/usr/bin/env python
"""Pallas attempt on the build's scatter-add floor (VERDICT r4 item 3).

The tree build's remaining aux floor is 17 per-level moment scatter-adds
(``tree.py build_tree``: ``zeros((sz,10)).at[idx].add(mom)`` with
N=131072 input rows) at the measured 9-12 ns/input-row scatter floor —
~1.2-1.6 ms per op regardless of the level size. The r4 Mosaic blocker
was documented for descent GATHERS (dynamic_gather single-vreg limit);
this probe tests the SCATTER/accumulate direction, plus the MXU
alternative:

  A. segment-sum as a tiled ONE-HOT MATMUL in Pallas VMEM — the
     "scatter" runs on the MXU: out(16, M) += vals_t(16, Qb) @
     oh(Qb, Mb), oh built in-kernel from the index block (never touches
     HBM). O(N*M) FLOPs, so only plausible for small levels — exactly
     the regime where the scatter's per-ROW pricing is most wasteful.
  B. Mosaic dynamic row store read-modify-write: acc[idx_i] += row in a
     fori_loop — tests whether Mosaic lowers dynamic-offset VMEM RMW at
     all (the gather-direction analog is the documented r4 dead end).
  C. jnp ``.at[].add`` INSIDE a Pallas kernel (scatter lowering).

Baseline: the shipped XLA scatter-add, same shapes, in-jit repetitions
with a data dependency (NOTES measurement discipline).
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 131072
R = 20
SIZES = [int(s) for s in
         __import__("os").environ.get(
             "PROBE_SIZES", "64,256,1024,4096,16384"
         ).split(",")]


def timed(name, fn, *args):
    import jax

    try:
        out = fn(*args)  # compile
        _ = jax.device_get(jax.tree.leaves(out)[0])
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        print(f"{name:24s}: FAILS ({type(e).__name__}: {msg})", flush=True)
        return None
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = jax.device_get(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    per = min(times) / R * 1e3
    print(f"{name:24s}: {per:7.3f} ms/op  ({per * 1e6 / N:.2f} ns/row)",
          flush=True)
    return per


def make_onehot_segsum(M: int, Qb: int = 512, Mb: int = 2048,
                       mode: str = "f32"):
    """Pallas tiled one-hot-matmul segment sum: (16, N) f32 vals +
    (N,) int32 idx -> (16, M) sums. idx >= M rows drop (no hot match).

    mode:
      f32      — plain f32 dot (first probe run: Mosaic lowers it as ONE
                 bf16 pass, err ~0.28 at M=64 — same default-precision
                 hazard as XLA, NOTES r4)
      highest  — f32 dot with precision=HIGHEST
      bf16x3   — truncation-split vals into 3 non-overlapping bf16 parts
                 (hi/mid/lo, exactly as ops/tree._select_rows_onehot) and
                 take 3 bf16 dots with f32 accumulation: every product
                 against the one-hot is exact, so the result is a pure
                 f32-accumulation segment sum (scatter-grade accuracy)
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Mb = min(Mb, M)
    n_mt, n_nb = M // Mb, N // Qb

    def kernel(idx_ref, vals_ref, out_ref):
        mt, nb = pl.program_id(0), pl.program_id(1)

        @pl.when(nb == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        idx = idx_ref[0, :]  # (Qb,)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Qb, Mb), 1) + mt * Mb
        eq = idx[:, None] == cols  # (Qb, Mb)
        v = vals_ref[:]
        if mode == "f32":
            out_ref[:] += jnp.dot(
                v, eq.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        elif mode == "highest":
            out_ref[:] += jnp.dot(
                v, eq.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:  # bf16x3
            oh = eq.astype(jnp.bfloat16)
            bits = jax.lax.bitcast_convert_type(v, jnp.int32)
            hi_f = jax.lax.bitcast_convert_type(
                bits & jnp.int32(-65536), jnp.float32
            )
            r1 = v - hi_f
            r1b = jax.lax.bitcast_convert_type(r1, jnp.int32)
            mid_f = jax.lax.bitcast_convert_type(
                r1b & jnp.int32(-65536), jnp.float32
            )
            lo_f = r1 - mid_f
            acc = out_ref[:]
            for part in (hi_f, mid_f, lo_f):
                acc = acc + jnp.dot(
                    part.astype(jnp.bfloat16), oh,
                    preferred_element_type=jnp.float32,
                )
            out_ref[:] = acc

    grid_spec = pl.GridSpec(
        grid=(n_mt, n_nb),
        in_specs=[
            pl.BlockSpec((1, Qb), lambda mt, nb: (0, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, Qb), lambda mt, nb: (0, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, Mb), lambda mt, nb: (0, mt),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, M), jnp.float32),
        grid_spec=grid_spec,
    )

    def f(idx2d, vals_t):
        return call(idx2d, vals_t)

    return f


def make_fused_moments(M: int, Qb: int = 2048, Mb: int = 2048):
    """The REAL candidate: fuse the moment construction INTO the kernel.

    The platform's measured floor is ~0.6-1.6 ns per LOGICAL ELEMENT an
    op touches (stream probe: plain jnp.sum of (16, N) costs the same
    1.3 ms as any pallas kernel over it; the (N, 10) scatter costs
    2.1 ms). So the win is not the scatter engine — it is reading
    (N, 3+1) instead of (N, 10+1): d-blocks come in, the 10 moment
    columns [d, outer6(d), 1] are built in VMEM (VPU work is free at
    this floor), and 3 exact bf16-split dots against the in-VMEM one-hot
    produce (Mb, 16) segment sums. Output orientation (M, 16): M in
    sublanes, 16 lanes.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Mb = min(Mb, M)
    n_mt, n_nb = M // Mb, N // Qb

    def kernel(idx_ref, d_ref, out_ref):
        mt, nb = pl.program_id(0), pl.program_id(1)

        @pl.when(nb == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        d = d_ref[:]  # (Qb, 3)
        x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        mom = jnp.concatenate(
            [d, x * x, x * y, x * z, y * y, y * z, z * z,
             jnp.ones_like(x), jnp.zeros((Qb, 6), jnp.float32)], axis=1
        )  # (Qb, 16)

        idx = idx_ref[0, :]  # (Qb,)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Qb, Mb), 1) + mt * Mb
        oh = (idx[:, None] == cols).astype(jnp.bfloat16)

        bits = jax.lax.bitcast_convert_type(mom, jnp.int32)
        hi_f = jax.lax.bitcast_convert_type(
            bits & jnp.int32(-65536), jnp.float32
        )
        r1 = mom - hi_f
        r1b = jax.lax.bitcast_convert_type(r1, jnp.int32)
        mid_f = jax.lax.bitcast_convert_type(
            r1b & jnp.int32(-65536), jnp.float32
        )
        lo_f = r1 - mid_f
        acc = out_ref[:]
        for part in (hi_f, mid_f, lo_f):
            acc = acc + jax.lax.dot_general(
                oh, part.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[:] = acc

    grid_spec = pl.GridSpec(
        grid=(n_mt, n_nb),
        in_specs=[
            pl.BlockSpec((1, Qb), lambda mt, nb: (0, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qb, 3), lambda mt, nb: (nb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mb, 16), lambda mt, nb: (mt, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, 16), jnp.float32),
        grid_spec=grid_spec,
    )


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vals = rng.normal(0, 1, (N, 16)).astype(np.float32)
    vals_t = jnp.asarray(vals.T.copy())           # (16, N)
    vals_d = jnp.asarray(vals[:, :10].copy())     # (N, 10) scatter shape

    print(f"platform: {jax.devices()[0].platform}", flush=True)

    for M in SIZES:
        idx_np = rng.integers(0, M, N).astype(np.int32)
        idx_np[rng.random(N) < 0.05] = M  # 5% dropped (padding) rows
        idx = jnp.asarray(idx_np)
        idx2d = jnp.asarray(idx_np[None, :])

        # ---- baseline: shipped XLA scatter-add -------------------------
        @jax.jit
        def rep_scatter(vals_d, idx, M=M):
            def body(i, acc):
                v = vals_d + acc * 1e-30
                mom = jnp.zeros((M, 10), jnp.float32).at[idx].add(
                    v, mode="drop")
                return acc + mom[0, 0]

            return jax.lax.fori_loop(0, R, body, jnp.float32(0))

        print(f"-- M={M}", flush=True)
        base = timed("xla scatter-add", rep_scatter, vals_d, idx)

        # ---- A: pallas one-hot matmul segment sum ----------------------
        want = np.zeros((M, 16), np.float32)
        np.add.at(want, idx_np[idx_np < M], vals[idx_np < M])
        for mode in ("f32", "highest", "bf16x3"):
            seg = make_onehot_segsum(M, mode=mode)

            @jax.jit
            def rep_onehot(vals_t, idx2d, seg=seg):
                def body(i, acc):
                    v = vals_t + acc * 1e-30
                    mom = seg(idx2d, v)
                    return acc + mom[0, 0]

                return jax.lax.fori_loop(0, R, body, jnp.float32(0))

            # correctness first: segment sums must agree with the
            # scatter to f32 REASSOCIATION tolerance (sum order differs
            # by design; bf16-pass lowering fails this by ~0.3)
            try:
                got = np.asarray(seg(idx2d, vals_t))  # (16, M)
                err = np.abs(got.T - want).max()
                note = f"err {err:.1e}" + (
                    " EXCEEDS f32-reassoc tolerance" if err > 1e-3 else ""
                )
            except Exception as e:
                print(f"onehot[{mode:7s}]          : FAILS "
                      f"({type(e).__name__}: {str(e)[:160]})", flush=True)
                continue
            t = timed(f"onehot[{mode}]", rep_onehot, vals_t, idx2d)
            if base and t:
                print(f"{'':24s}  -> {t / base:.2f}x vs scatter, {note}",
                      flush=True)

    # ---- A2: fused moments-from-d kernel vs the build's real path ------
    d_np = rng.normal(0, 1, (N, 3)).astype(np.float32)
    d_j = jnp.asarray(d_np)
    print("-- fused moment construction (read (N,4) instead of (N,11))",
          flush=True)
    for M in SIZES:
        idx_np = rng.integers(0, M, N).astype(np.int32)
        idx_np[rng.random(N) < 0.05] = M
        idx = jnp.asarray(idx_np)
        idx2d = jnp.asarray(idx_np[None, :])

        @jax.jit
        def rep_build_path(d, idx, M=M):
            """The shipped path: materialize (N, 10) moments, scatter."""
            def body(i, acc):
                dd = d + acc * 1e-30
                x, y, z = dd[:, 0:1], dd[:, 1:2], dd[:, 2:3]
                mom = jnp.concatenate(
                    [dd, x * x, x * y, x * z, y * y, y * z, z * z,
                     jnp.ones_like(x)], axis=1
                )
                out = jnp.zeros((M, 10), jnp.float32).at[idx].add(
                    mom, mode="drop")
                return acc + out[0, 0]

            return jax.lax.fori_loop(0, R, body, jnp.float32(0))

        fused = make_fused_moments(M)

        @jax.jit
        def rep_fused(d, idx2d, fused=fused):
            def body(i, acc):
                out = fused(idx2d, d + acc * 1e-30)
                return acc + out[0, 0]

            return jax.lax.fori_loop(0, R, body, jnp.float32(0))

        # correctness
        try:
            got = np.asarray(fused(idx2d, d_j))[:, :10]
            dd = d_np
            mom_np = np.concatenate(
                [dd, dd[:, 0:1] * dd[:, 0:1], dd[:, 0:1] * dd[:, 1:2],
                 dd[:, 0:1] * dd[:, 2:3], dd[:, 1:2] * dd[:, 1:2],
                 dd[:, 1:2] * dd[:, 2:3], dd[:, 2:3] * dd[:, 2:3],
                 np.ones((N, 1), np.float32)], axis=1
            )
            want = np.zeros((M, 10), np.float32)
            np.add.at(want, idx_np[idx_np < M], mom_np[idx_np < M])
            err = np.abs(got - want).max()
            note = f"err {err:.1e}" + (
                " EXCEEDS f32-reassoc tolerance" if err > 1e-3 else ""
            )
        except Exception as e:
            print(f"fused M={M}: FAILS ({type(e).__name__}: "
                  f"{str(e)[:160]})", flush=True)
            continue
        print(f"-- M={M} ({note})", flush=True)
        base = timed("xla mom+scatter", rep_build_path, d_j, idx)
        t = timed("pallas fused", rep_fused, d_j, idx2d)
        if base and t:
            print(f"{'':24s}  -> fused/scatter = {t / base:.2f}x",
                  flush=True)

    # ---- B: Mosaic dynamic-offset VMEM read-modify-write ---------------
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Mq, Q = 256, 8192

    def rmw_kernel(idx_ref, vals_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            j = idx_ref[0, i]
            out_ref[pl.ds(j, 1), :] += vals_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, Q, body, 0)

    rmw = pl.pallas_call(
        rmw_kernel,
        out_shape=jax.ShapeDtypeStruct((Mq, 16), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    idx_q = jnp.asarray(rng.integers(0, Mq, Q).astype(np.int32)[None, :])
    vals_q = jnp.asarray(rng.normal(0, 1, (Q, 16)).astype(np.float32))

    @jax.jit
    def rep_rmw(idx_q, vals_q):
        def body(i, acc):
            out = rmw(idx_q, vals_q + acc * 1e-30)
            return acc + out[0, 0]

        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    print(f"-- dynamic RMW store (Q={Q}, M={Mq})", flush=True)
    per = timed("mosaic rmw loop", rep_rmw, idx_q, vals_q)
    if per:
        print(f"{'':24s}  -> {per * 1e6 / Q:.1f} ns/row", flush=True)

    # ---- C: jnp scatter-add inside a pallas kernel ----------------------
    def scat_kernel(idx_ref, vals_ref, out_ref):
        idx = idx_ref[0, :]
        out_ref[:] = jnp.zeros((Mq, 16), jnp.float32).at[idx].add(
            vals_ref[:], mode="drop")

    scat = pl.pallas_call(
        scat_kernel,
        out_shape=jax.ShapeDtypeStruct((Mq, 16), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def rep_scat(idx_q, vals_q):
        def body(i, acc):
            out = scat(idx_q, vals_q + acc * 1e-30)
            return acc + out[0, 0]

        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    print(f"-- in-kernel jnp .at[].add (Q={Q}, M={Mq})", flush=True)
    timed("mosaic jnp scatter", rep_scat, idx_q, vals_q)


if __name__ == "__main__":
    main()
