"""Fleet mode: many sequences evaluated data-parallel across the mesh.

The reference processes one sequence per process with no distributed
capability (SURVEY.md §2 P4). Here a fleet holds one pipeline state per
sequence, stacked on a leading batch axis sharded over the ``seq`` mesh
axis; each step advances every sequence with zero inter-sequence
communication (DCN is only touched at dispatch/result time).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from madicp_tpu.models.pipeline import (
    PipelineConfig,
    init_state,
    pipeline_step,
)


from madicp_tpu.parallel.mesh import make_global as _make_global


class Fleet:
    """Batched odometry over ``n_seq`` independent sequences."""

    def __init__(
        self,
        cfg: PipelineConfig,
        n_seq: int,
        mesh: Optional[Mesh] = None,
        shard_points: bool = False,
    ):
        """``shard_points=True`` (needs a mesh with a ``kf`` axis)
        additionally shards each sequence's input-cloud point axis over
        ``kf``, letting GSPMD partition the per-scan tree build within
        every sequence — the same points-parallel build as
        ``make_sharded_pipeline_step(shard_points=True)`` (r5, NOTES):
        per-level node tables all-reduce over ``kf``, nothing crosses
        ``seq``. Results differ from the replicated build only by
        partial-sum order (f32/f64 reassociation noise, pinned by
        tests/test_parallel.py at tolerance, not bitwise)."""
        self.cfg = cfg
        self.n_seq = n_seq
        self.mesh = mesh
        if shard_points and (
            mesh is None or "kf" not in mesh.axis_names
        ):
            raise ValueError("shard_points needs a mesh with a 'kf' axis")

        states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(n_seq))
        batched_step = jax.vmap(partial(pipeline_step, cfg))

        if mesh is not None:
            if "seq" not in mesh.axis_names:
                raise ValueError("fleet mesh needs a 'seq' axis")
            from madicp_tpu.parallel.mesh import state_shardings

            proto = jax.eval_shape(lambda: init_state(cfg))
            st_shard = state_shardings(mesh, proto, batched=True)
            seq_s = NamedSharding(mesh, P("seq"))
            pts_s = (
                NamedSharding(mesh, P("seq", "kf"))
                if shard_points else seq_s
            )
            out_rep = jax.tree.map(
                lambda _: seq_s,
                jax.eval_shape(
                    lambda s: pipeline_step(
                        cfg,
                        s,
                        jnp.zeros((cfg.n_points, 3), cfg.dtype),
                        jnp.zeros(cfg.n_points, bool),
                        jnp.zeros((), cfg.dtype),
                    )[1],
                    proto,
                ),
            )
            self._step = jax.jit(
                batched_step,
                in_shardings=(st_shard, pts_s, pts_s, seq_s),
                out_shardings=(st_shard, out_rep),
                donate_argnums=(0,),
            )
            self._seq_s = seq_s
            self._pts_s = pts_s
            self.states = jax.tree.map(
                lambda a, s: _make_global(a, s), states, st_shard
            )
        else:
            self._step = jax.jit(batched_step, donate_argnums=(0,))
            # force distinct buffers per leaf: the jitted vmap(init_state)
            # may CSE identical constants (X / keyframe_to_map) into one
            # buffer, which the donating step would reject
            self.states = jax.tree.map(jnp.copy, states)

    def compute(self, stamps, points, valid):
        """Advance all sequences by one scan.

        Args:
            stamps: (B,) timestamps.
            points: (B, N, 3) padded clouds.
            valid:  (B, N) masks.
        Returns the batched StepOutput.
        """
        points = np.asarray(points, self.cfg.dtype)
        valid = np.asarray(valid)
        stamps = np.asarray(stamps, self.cfg.dtype)
        if self.mesh is not None:
            # every process passes the FULL batch; cross-process meshes
            # slice out each process's addressable shards locally (DCN
            # carries nothing inside the step — 'seq' is pure DP)
            points = _make_global(points, self._pts_s)
            valid = _make_global(valid, self._pts_s)
            stamps = _make_global(stamps, self._seq_s)
        self.states, out = self._step(self.states, points, valid, stamps)
        return out

    def poses(self) -> np.ndarray:
        X = self.states.X
        if isinstance(X, jax.Array) and not X.is_fully_addressable:
            from jax.experimental import multihost_utils

            X = multihost_utils.process_allgather(X, tiled=True)
        return np.asarray(X)
