"""Standalone MAD-tree nearest-neighbour tool.

API parity with the reference's ``pymadtree`` binding
(``src/pybind/tools/mad_tree_wrapper.h:34-71`` / ``pymadtree.cpp:36-48``):
``build`` (default ``b_max=1e-5`` giving per-point leaves), ``search`` for a
single query, ``search_cloud`` and ``search_cloud_dist`` for batches. Here
the batch variants are single fused device calls instead of serial loops.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from madicp_tpu.ops.tree import SearchTree, build_tree, search_tree


def _pad_pow2(n: int, minimum: int = 64) -> int:
    return max(minimum, 2 ** int(math.ceil(math.log2(max(n, 1)))))


class MADtree:
    """Host-facing MAD-tree: build once, batched approximate-NN queries."""

    def __init__(self, dtype=jnp.float32):
        self._tree: Optional[SearchTree] = None
        self._dtype = dtype

    def build(
        self,
        cloud: np.ndarray,
        b_max: float = 1e-5,
        b_min: float = 0.1,
        max_parallel_level: int = 2,  # accepted for API parity; unused on TPU
        depth: Optional[int] = None,
    ) -> None:
        del max_parallel_level
        cloud = np.asarray(cloud)
        n = cloud.shape[0]
        n_pad = _pad_pow2(n)
        if depth is None:
            # per-point leaves need ~log2(N) levels; PCA bisection is
            # near-balanced, leave headroom for uneven splits
            depth = int(math.ceil(math.log2(max(n_pad, 2)))) + 4
        pts = np.zeros((n_pad, 3))
        pts[:n] = cloud
        valid = np.zeros(n_pad, bool)
        valid[:n] = True
        build = jax.jit(
            lambda p, v: build_tree(p, v, depth=depth, b_max=b_max, b_min=b_min)
        )
        self._tree, _ = build(
            jnp.asarray(pts, dtype=self._dtype), jnp.asarray(valid)
        )

    def _require_tree(self) -> SearchTree:
        if self._tree is None:
            raise RuntimeError("call build() first")
        return self._tree

    def search(self, query: np.ndarray):
        """Single query -> (matched point, matched normal)."""
        pts, normals = self.search_cloud(np.asarray(query)[None, :])
        return pts[0], normals[0]

    def search_cloud(self, queries: np.ndarray):
        """(Q,3) queries -> ((Q,3) matched points, (Q,3) matched normals)."""
        tree = self._require_tree()
        q = jnp.asarray(np.asarray(queries), dtype=self._dtype)
        leaf = search_tree(tree, q)
        return (
            np.asarray(jnp.take(tree.repr, leaf, axis=0)),
            np.asarray(jnp.take(tree.normal, leaf, axis=0)),
        )

    def search_cloud_dist(self, queries: np.ndarray):
        """Like ``search_cloud`` plus the match distances."""
        pts, normals = self.search_cloud(queries)
        d = np.linalg.norm(pts - np.asarray(queries), axis=1)
        return pts, normals, d

    # reference-style aliases
    searchCloud = search_cloud
    searchCloudDist = search_cloud_dist
