"""Segmented associative scans over sorted segment layouts.

General-purpose segmented reductions expressed as
``jax.lax.associative_scan`` over ``(flag, value)`` pairs — dense, fully
vectorised, scatter-free work that XLA maps well onto the VPU.

The MAD-tree build originally used these (points sorted by node id =
contiguous segments per node); it now uses scatter-adds into per-level
node tables, which measured faster on v5e (no per-level sort). The
primitives remain as library utilities for segment-structured batch
work (and are covered by tests/test_segscan.py).

Conventions:
- ``flags`` marks the FIRST element of each segment (forward scans).
- Inclusive scans: the segment total sits at the segment's LAST element.
- ``broadcast_back`` propagates each segment's last value to every element.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _bc(flag: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (N,) flag against an (N, ...) value."""
    return flag.reshape(flag.shape + (1,) * (like.ndim - flag.ndim))


def _seg_scan(flags: jnp.ndarray, vals: Any, combine: Callable[[Any, Any], Any], reverse: bool = False):
    """Generic inclusive segmented scan.

    ``combine(a, b)`` merges two already-reduced values (a left of b).
    ``flags`` must mark segment starts for forward scans and segment ends
    for reverse scans.
    """

    def comb(a, b):
        fa, va = a
        fb, vb = b
        merged = combine(va, vb)
        v = jax.tree.map(lambda m, y: jnp.where(_bc(fb, y), y, m), merged, vb)
        return fa | fb, v

    if reverse:
        # mirror: reverse arrays, scan forward, reverse back
        rev = lambda t: jax.tree.map(lambda x: jnp.flip(x, axis=0), t)
        f, v = _seg_scan(jnp.flip(flags, axis=0), rev(vals), lambda a, b: combine(b, a))
        return jnp.flip(f, axis=0), rev(v)

    out_f, out_v = jax.lax.associative_scan(comb, (flags, vals))
    return out_f, out_v


def seg_cumsum(vals: Any, start_flags: jnp.ndarray) -> Any:
    """Inclusive segmented sum; totals at segment-last positions."""
    _, v = _seg_scan(start_flags, vals, lambda a, b: jax.tree.map(jnp.add, a, b))
    return v


def seg_cummin(vals: Any, start_flags: jnp.ndarray) -> Any:
    _, v = _seg_scan(start_flags, vals, lambda a, b: jax.tree.map(jnp.minimum, a, b))
    return v


def seg_cummax(vals: Any, start_flags: jnp.ndarray) -> Any:
    _, v = _seg_scan(start_flags, vals, lambda a, b: jax.tree.map(jnp.maximum, a, b))
    return v


def seg_argmin(keys: jnp.ndarray, payload: jnp.ndarray, start_flags: jnp.ndarray):
    """Segmented argmin with first-wins tie-break (matches the strict ``<``
    update of the reference's nearest-to-mean search, ``mad_tree.cpp:78-85``).

    Returns ``(min_key, payload_at_min)`` as inclusive scans; segment results
    at segment-last positions.
    """

    def combine(a, b):
        ka, pa = a
        kb, pb = b
        take_b = kb < ka  # strict: ties keep the earlier element
        return jnp.where(take_b, kb, ka), jnp.where(_bc(take_b, pa), pb, pa)

    _, (k, p) = _seg_scan(start_flags, (keys, payload), combine)
    return k, p


def seg_copy_first(vals: Any, start_flags: jnp.ndarray) -> Any:
    """Broadcast each segment's FIRST value over the whole segment."""
    # combine(a, b) -> a (the left/earlier reduced value wins)
    _, v = _seg_scan(start_flags, vals, lambda a, b: a)
    return v


def seg_broadcast_last(vals: Any, end_flags: jnp.ndarray) -> Any:
    """Broadcast each segment's LAST value over the whole segment.

    ``end_flags`` marks segment ends. Used to hand per-node statistics
    (computed at segment-last positions) back to every point of the node
    without an arena scatter/gather round-trip.
    """
    _, v = _seg_scan(end_flags, vals, lambda a, b: b, reverse=True)
    return v


def segment_starts(sort_ids: jnp.ndarray) -> jnp.ndarray:
    """True where a sorted id differs from its predecessor (first = True)."""
    prev = jnp.concatenate([sort_ids[:1] - 1, sort_ids[:-1]])
    return sort_ids != prev


def segment_ends(sort_ids: jnp.ndarray) -> jnp.ndarray:
    """True where a sorted id differs from its successor (last = True)."""
    nxt = jnp.concatenate([sort_ids[1:], sort_ids[-1:] + 1])
    return sort_ids != nxt
