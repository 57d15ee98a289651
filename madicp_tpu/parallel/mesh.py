"""Mesh construction and sharding layouts for pipeline state."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from madicp_tpu.models.pipeline import PipelineState


def make_global(x, sharding: NamedSharding):
    """Build a (possibly cross-process) global array from a value every
    process holds in full: each addressable shard is sliced out locally.
    Single-process shardings take the plain ``device_put`` path
    (``device_put`` cannot target non-addressable devices)."""
    x = np.asarray(x)
    if len(sharding.device_set) == len(sharding.addressable_devices):
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def read_replicated(arr) -> np.ndarray:
    """Host value of a replicated global array (works when the sharding
    spans non-addressable devices, where ``np.asarray`` would raise)."""
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        return np.asarray(arr.addressable_shards[0].data)
    return np.asarray(arr)


def make_mesh(
    kf: int = 1,
    seq: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ``(seq, kf)`` device mesh.

    The ``kf`` axis should map to the fastest interconnect (ICI): the
    per-round ``psum`` of the 6x6 normal equations rides it once per GN
    iteration. The ``seq`` axis carries no per-scan traffic at all (pure
    data parallelism), so it can span hosts (DCN).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = kf * seq
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(seq, kf)
    return Mesh(arr, axis_names=("seq", "kf"))


def state_shardings(mesh: Mesh, state: PipelineState, batched: bool = False):
    """Sharding pytree for a PipelineState.

    Keyframe-stacked tree arrays shard their leading K axis over ``kf``;
    with ``batched=True`` every array gains a leading sequence axis sharded
    over ``seq``. Everything else is replicated (it is tiny: poses, rings,
    scalars) or, for the frame-window trees, kept replicated because the
    promotion copy crosses the two rings.
    """
    b = ("seq",) if batched else ()

    def spec(*names):
        return NamedSharding(mesh, P(*(b + names)))

    rep = spec()
    kf_leaf = jax.tree.map(lambda _: spec("kf"), state.kf_tree)
    return PipelineState(
        X=rep,
        velocity=rep,
        traj=rep,
        traj_count=rep,
        kf_tree=kf_leaf,
        kf_valid=spec("kf"),
        kf_head=rep,
        keyframe_to_map=rep,
        fr_tree=jax.tree.map(lambda _: rep, state.fr_tree),
        fr_valid=rep,
        fr_weight=rep,
        fr_seq=rep,
        fr_pose=rep,
        fr_head=rep,
        seq=rep,
        seq_keyframe=rep,
    )
