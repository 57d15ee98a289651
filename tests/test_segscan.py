import numpy as np
import jax.numpy as jnp

from madicp_tpu.ops import segscan as ss


def _setup(rng, n=257, nseg=9):
    ids = np.sort(rng.integers(0, nseg, size=n)).astype(np.int32)
    vals = rng.normal(size=n)
    return jnp.asarray(ids), jnp.asarray(vals), ids, vals


def test_flags(rng):
    ids, _, ids_np, _ = _setup(rng)
    starts = np.asarray(ss.segment_starts(ids))
    ends = np.asarray(ss.segment_ends(ids))
    assert starts[0] and ends[-1]
    np.testing.assert_array_equal(starts[1:], ids_np[1:] != ids_np[:-1])
    np.testing.assert_array_equal(ends[:-1], ids_np[:-1] != ids_np[1:])


def test_cumsum_and_broadcast(rng):
    ids, vals, ids_np, vals_np = _setup(rng)
    starts = ss.segment_starts(ids)
    ends = ss.segment_ends(ids)
    out = np.asarray(ss.seg_cumsum(vals, starts))
    bl = np.asarray(ss.seg_broadcast_last(out, ends))
    cf = np.asarray(ss.seg_copy_first(vals, starts))
    for s in np.unique(ids_np):
        seg = np.where(ids_np == s)[0]
        expect = np.cumsum(vals_np[seg])
        np.testing.assert_allclose(out[seg], expect, atol=1e-12)
        np.testing.assert_allclose(bl[seg], expect[-1], atol=1e-12)
        np.testing.assert_allclose(cf[seg], vals_np[seg[0]], atol=1e-12)


def test_minmax_argmin(rng):
    ids, vals, ids_np, vals_np = _setup(rng)
    starts = ss.segment_starts(ids)
    mn = np.asarray(ss.seg_cummin(vals, starts))
    mx = np.asarray(ss.seg_cummax(vals, starts))
    pay = jnp.arange(vals.shape[0], dtype=jnp.int32)
    k, p = ss.seg_argmin(vals, pay, starts)
    k, p = np.asarray(k), np.asarray(p)
    for s in np.unique(ids_np):
        seg = np.where(ids_np == s)[0]
        np.testing.assert_allclose(mn[seg[-1]], vals_np[seg].min())
        np.testing.assert_allclose(mx[seg[-1]], vals_np[seg].max())
        assert p[seg[-1]] == seg[np.argmin(vals_np[seg])]
        np.testing.assert_allclose(k[seg[-1]], vals_np[seg].min())


def test_argmin_tie_first():
    ids = jnp.zeros(5, jnp.int32)
    vals = jnp.asarray([3.0, 1.0, 1.0, 2.0, 1.0])
    pay = jnp.arange(5, dtype=jnp.int32)
    _, p = ss.seg_argmin(vals, pay, ss.segment_starts(ids))
    assert int(np.asarray(p)[-1]) == 1  # first minimum wins


def test_pytree_values(rng):
    ids, vals, ids_np, vals_np = _setup(rng)
    starts = ss.segment_starts(ids)
    v2 = jnp.stack([vals, 2 * vals], axis=-1)
    out = ss.seg_cumsum({"a": vals, "b": v2}, starts)
    for s in np.unique(ids_np):
        seg = np.where(ids_np == s)[0]
        np.testing.assert_allclose(
            np.asarray(out["b"])[seg[-1], 1], 2 * vals_np[seg].sum(), atol=1e-12
        )
