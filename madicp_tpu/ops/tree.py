"""MAD-tree as a statically-shaped, level-synchronous batched structure.

The reference builds a pointer-based binary tree by recursive PCA bisection
with ``std::async`` task parallelism (``mad_tree.cpp:47-130``). On TPU we
re-design it: the tree is an *implicit heap-indexed arena* of node arrays
(root at index 1, children of ``i`` at ``2i`` / ``2i+1``), and the build is
*level-synchronous*: points stay sorted by node id so each node owns a
contiguous segment, and one fused batch of segmented scans per level
computes every node's mean/covariance (shifted moments for f32 stability),
analytic 3x3 eigendecomposition, oriented bounding box, leaf decision,
plane-predecessor/normal inheritance, representative point and split — for
all nodes of the level at once. Parallelism is the vector lanes; no task
forking, no pointers, no dynamic shapes.

Algorithmic contracts reproduced from the reference (see SURVEY.md §2.1):
- leaf criterion: largest oriented extent ``bbox[2] < b_max``
  (``mad_tree.cpp:64``), plus a forced leaf at the static depth cap;
- plane predecessor: first ancestor whose smallest extent ``bbox[0] <
  b_min`` — its PCA normal is inherited by all descendant leaves
  (``mad_tree.cpp:65-67, 90-93``);
- leaves with fewer than 3 points inherit the normal of the nearest
  ancestor with >= 3 points (``mad_tree.cpp:68-73``);
- the leaf representative is the input point nearest to the node mean,
  not the mean itself (``mad_tree.cpp:76-86``);
- bounding boxes measure extents in the eigenbasis including the origin
  (min/max initialised to zero, ``utils.h:75-97``);
- covariance uses the k/(k-1) Bessel correction (``utils.h:54-73``);
- split: sign of ``(p - mean) . evec2`` — strictly negative goes left
  (``mad_tree.cpp:95-97``);
- search: pure descent by split-plane sign, no backtracking
  (``mad_tree.cpp:144-152``).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from madicp_tpu.ops.eigh3 import eigh3
from madicp_tpu.ops import segscan as ss


class SearchTree(NamedTuple):
    """Heap-indexed arena form of a built MAD-tree.

    All arrays have leading dimension ``M = 2 ** (depth + 1)``; index 0 is
    unused, the root is index 1, children of ``i`` live at ``2i``/``2i+1``.
    Missing children simply have ``is_real == False``.
    """

    mean: jnp.ndarray      # (M, 3) PCA mean — the descent anchor
    split: jnp.ndarray     # (M, 3) split direction (largest-eigenvalue axis)
    normal: jnp.ndarray    # (M, 3) resolved surfel normal (leaf semantics)
    repr: jnp.ndarray      # (M, 3) leaf representative point (nearest to mean)
    bbox0: jnp.ndarray     # (M,)   smallest oriented extent (planarity weight)
    is_leaf: jnp.ndarray   # (M,)   bool
    is_real: jnp.ndarray   # (M,)   bool

    @property
    def depth(self) -> int:
        return int(math.log2(self.mean.shape[-2])) - 1


class Leaves(NamedTuple):
    """Compacted leaf list of a tree (padded to a static capacity)."""

    pts: jnp.ndarray     # (L, 3) representative points
    normal: jnp.ndarray  # (L, 3)
    bbox0: jnp.ndarray   # (L,)
    valid: jnp.ndarray   # (L,) bool


def tree_arena_size(depth: int) -> int:
    return 2 ** (depth + 1)


def _outer6(d: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular entries of d d^T: (N,3) -> (N,6)."""
    return jnp.stack(
        [
            d[:, 0] * d[:, 0],
            d[:, 0] * d[:, 1],
            d[:, 0] * d[:, 2],
            d[:, 1] * d[:, 1],
            d[:, 1] * d[:, 2],
            d[:, 2] * d[:, 2],
        ],
        axis=-1,
    )


def _sym_from6(u: jnp.ndarray) -> jnp.ndarray:
    """(N,6) upper-triangular -> (N,3,3) symmetric."""
    xx, xy, xz, yy, yz, zz = (u[:, i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        axis=-2,
    )


def build_tree(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    depth: int,
    b_max: float,
    b_min: float,
) -> tuple[SearchTree, jnp.ndarray]:
    """Build a MAD-tree over a padded point cloud.

    Args:
        points: (N, 3) padded point cloud (padding must be finite).
        valid:  (N,) bool mask of real points.
        depth:  static maximum tree depth; nodes still larger than ``b_max``
                at this depth become (oversized) leaves.
        b_max:  leaf criterion on the largest oriented extent.
        b_min:  plane-predecessor criterion on the smallest oriented extent.

    Returns:
        (tree, point_leaf): the arena-form tree and, per input point (in the
        original order), the arena id of the leaf containing it (0 for
        padding points).
    """
    dtype = points.dtype
    N = points.shape[0]
    M = tree_arena_size(depth)
    INVALID = jnp.int32(M)

    iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]

    sort_id0 = jnp.where(valid, jnp.int32(1), INVALID)
    order0 = jnp.argsort(sort_id0, stable=True)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    arena = dict(
        mean=jnp.zeros((M, 3), dtype),
        split=jnp.zeros((M, 3), dtype),
        normal=jnp.zeros((M, 3), dtype),
        repr=jnp.zeros((M, 3), dtype),
        bbox0=jnp.zeros((M,), dtype),
        is_leaf=jnp.zeros((M,), bool),
        is_real=jnp.zeros((M,), bool),
        # build-time only:
        pca_normal=jnp.zeros((M, 3), dtype),
        npts=jnp.zeros((M,), jnp.int32),
        pp=jnp.zeros((M,), jnp.int32),
    )

    carry0 = dict(
        pts=points[order0],
        valid=valid[order0],
        orig=iota[order0],
        sort_id=sort_id0[order0],
        frozen=~valid[order0],
        leaf_of=jnp.zeros((N,), jnp.int32),
        arena=arena,
    )

    b_max = jnp.asarray(b_max, dtype)
    b_min = jnp.asarray(b_min, dtype)

    def level_body(level, c):
        pts, val = c["pts"], c["valid"]
        sort_id, frozen = c["sort_id"], c["frozen"]
        arena = c["arena"]
        active_in = (~frozen) & val
        force_leaf = level == depth

        starts = ss.segment_starts(sort_id)
        ends = ss.segment_ends(sort_id)

        # ---- pass 1: shifted moments -> mean, covariance, eigenbasis ----
        ref = ss.seg_copy_first(pts, starts)
        d = pts - ref
        ones = jnp.ones((N,), dtype)
        sums = ss.seg_cumsum({"s1": d, "s2": _outer6(d), "cnt": ones}, starts)
        k = sums["cnt"]
        k_safe = jnp.maximum(k, 1.0)
        mean_shift = sums["s1"] / k_safe[:, None]
        mean = ref + mean_shift
        cov6 = sums["s2"] / k_safe[:, None] - _outer6(mean_shift)
        bessel = k / jnp.maximum(k - 1.0, 1.0)
        cov6 = jnp.where((k >= 2.0)[:, None], cov6 * bessel[:, None], 0.0)
        _, evecs = eigh3(_sym_from6(cov6))  # (N,3,3): columns ascending
        pca_n = evecs[:, :, 0]
        split_dir = evecs[:, :, 2]

        # broadcast the per-node (segment-end) statistics back to each point
        bb = ss.seg_broadcast_last(
            {"mean": mean, "evecs": evecs, "k": k}, ends
        )
        node_mean_pt = bb["mean"]
        node_evecs_pt = bb["evecs"]

        # ---- pass 2: oriented bbox + nearest-to-mean representative ----
        d2 = pts - node_mean_pt
        v = jnp.einsum("nij,ni->nj", node_evecs_pt, d2)
        mins = ss.seg_cummin(v, starts)
        maxs = ss.seg_cummax(v, starts)
        extents = jnp.maximum(maxs, 0.0) - jnp.minimum(mins, 0.0)
        dist = jnp.linalg.norm(d2, axis=-1)
        # padding-safe: key never matters for masked segments
        _, near_pos = ss.seg_argmin(jnp.where(val, dist, big), iota, starts)
        near_pt = jnp.take(pts, near_pos, axis=0)

        # ---- per-node classification (values meaningful at segment ends) --
        is_leaf_node = force_leaf | (extents[:, 2] < b_max)
        pid = sort_id >> 1
        parent_pp = jnp.take(arena["pp"], pid, mode="clip")
        parent_bbox0 = jnp.take(arena["bbox0"], pid, mode="clip")
        node_pp = jnp.where(
            parent_pp > 0,
            parent_pp,
            jnp.where(parent_bbox0 < b_min, pid, jnp.int32(0)),
        )

        # leaf normal resolution: plane predecessor, else <3-point parent walk
        n_pp = jnp.take(arena["pca_normal"], node_pp, axis=0, mode="clip")
        few = k < 3.0
        cur = jnp.where(few & (sort_id >= 2), pid, sort_id)
        for _ in range(depth):
            step = (jnp.take(arena["npts"], cur, mode="clip") < 3) & (cur >= 2)
            cur = jnp.where(step, cur >> 1, cur)
        n_walk = jnp.take(arena["pca_normal"], cur, axis=0, mode="clip")
        normal = jnp.where(
            (node_pp > 0)[:, None],
            n_pp,
            jnp.where((few & (sort_id >= 2))[:, None], n_walk, pca_n),
        )

        # ---- arena writes (one writer per node: its segment end) ----
        wmask = ends & active_in & (sort_id < M)
        wid = jnp.where(wmask, sort_id, INVALID)
        aw = dict(arena)
        kw = dict(mode="drop", unique_indices=True)
        aw["mean"] = aw["mean"].at[wid].set(mean, **kw)
        aw["split"] = aw["split"].at[wid].set(split_dir, **kw)
        aw["normal"] = aw["normal"].at[wid].set(normal, **kw)
        aw["repr"] = aw["repr"].at[wid].set(
            jnp.where(is_leaf_node[:, None], near_pt, mean), **kw
        )
        aw["bbox0"] = aw["bbox0"].at[wid].set(extents[:, 0], **kw)
        aw["is_leaf"] = aw["is_leaf"].at[wid].set(is_leaf_node, **kw)
        aw["is_real"] = aw["is_real"].at[wid].set(jnp.ones((N,), bool), **kw)
        aw["pca_normal"] = aw["pca_normal"].at[wid].set(pca_n, **kw)
        aw["npts"] = aw["npts"].at[wid].set(k.astype(jnp.int32), **kw)
        aw["pp"] = aw["pp"].at[wid].set(node_pp, **kw)

        # ---- point updates: freeze new leaves, split the rest ----
        leaf_pt = ss.seg_broadcast_last(is_leaf_node, ends)
        newly = active_in & leaf_pt
        leaf_of = jnp.where(newly, sort_id, c["leaf_of"])
        frozen2 = frozen | newly
        node_split_pt = ss.seg_broadcast_last(split_dir, ends)
        go_right = jnp.sum((pts - node_mean_pt) * node_split_pt, -1) >= 0
        child = 2 * sort_id + jnp.where(frozen2 | ~go_right, 0, 1)
        new_id = jnp.where(val, child, INVALID)

        perm = jnp.argsort(new_id, stable=True)
        return dict(
            pts=pts[perm],
            valid=val[perm],
            orig=c["orig"][perm],
            sort_id=new_id[perm],
            frozen=frozen2[perm],
            leaf_of=leaf_of[perm],
            arena=aw,
        )

    c = jax.lax.fori_loop(0, depth + 1, level_body, carry0)

    point_leaf = jnp.zeros((N,), jnp.int32).at[c["orig"]].set(c["leaf_of"])
    a = c["arena"]
    tree = SearchTree(
        mean=a["mean"],
        split=a["split"],
        normal=a["normal"],
        repr=a["repr"],
        bbox0=a["bbox0"],
        is_leaf=a["is_leaf"],
        is_real=a["is_real"],
    )
    return tree, point_leaf


def search_tree(tree: SearchTree, queries: jnp.ndarray, depth: Optional[int] = None) -> jnp.ndarray:
    """Approximate-NN descent: (Q, 3) queries -> (Q,) leaf arena ids.

    Pure descent by split-plane sign, no backtracking, exactly like the
    reference's ``bestMatchingLeafFast`` (``mad_tree.cpp:144-152``); the
    statistical exactness is recovered by ICP's gating/weighting.
    """
    if depth is None:
        depth = tree.depth
    Q = queries.shape[0]
    node0 = jnp.ones((Q,), jnp.int32)

    def body(_, node):
        leaf = jnp.take(tree.is_leaf, node)
        mean = jnp.take(tree.mean, node, axis=0)
        split = jnp.take(tree.split, node, axis=0)
        left = jnp.sum((queries - mean) * split, -1) < 0
        child = 2 * node + jnp.where(left, jnp.int32(0), jnp.int32(1))
        ok = jnp.take(
            tree.is_real,
            jnp.minimum(child, jnp.int32(tree.is_real.shape[-1] - 1)),
        )
        return jnp.where(leaf | ~ok, node, child).astype(jnp.int32)

    return jax.lax.fori_loop(0, depth, body, node0)


def get_leaves(tree: SearchTree, max_leaves: int) -> Leaves:
    """Compact the tree's leaves into padded fixed-size arrays.

    Leaf order is arena (breadth-first) order — the MAD-ICP math is
    order-invariant (sums over leaves), unlike the reference's DFS
    ``getLeafs`` (``mad_tree.cpp:154-163``) whose order is also unused.
    """
    flag = tree.is_leaf & tree.is_real
    order = jnp.argsort(~flag, stable=True)
    ids = order[:max_leaves]
    return Leaves(
        pts=jnp.take(tree.repr, ids, axis=0),
        normal=jnp.take(tree.normal, ids, axis=0),
        bbox0=jnp.take(tree.bbox0, ids),
        valid=jnp.take(flag, ids),
    )


def count_leaves(tree: SearchTree) -> jnp.ndarray:
    return jnp.sum(tree.is_leaf & tree.is_real)


def transform_tree(tree: SearchTree, R: jnp.ndarray, t: jnp.ndarray) -> SearchTree:
    """Rigidly move a tree into another frame (reference ``applyTransform``,
    ``mad_tree.cpp:165-172``): rotate the eigen-directions, transform the
    anchor/representative points. Oriented extents are rotation-invariant.
    """
    return tree._replace(
        mean=tree.mean @ R.T + t,
        repr=tree.repr @ R.T + t,
        split=tree.split @ R.T,
        normal=tree.normal @ R.T,
    )
