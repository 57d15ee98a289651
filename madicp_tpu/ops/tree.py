"""MAD-tree as a statically-shaped, level-synchronous batched structure.

The reference builds a pointer-based binary tree by recursive PCA bisection
with ``std::async`` task parallelism (``mad_tree.cpp:47-130``). On TPU we
re-design it: the tree is an *implicit heap-indexed arena* of node arrays
(root at index 1, children of ``i`` at ``2i`` / ``2i+1``), and the build is
*level-synchronous*: each point carries its node id, and per level one
scatter-add of shifted moments plus one scatter-min of eigenbasis extents
computes every node's mean/covariance (f32-stable), analytic 3x3
eigendecomposition, oriented bounding box, leaf decision and
plane-predecessor/normal inheritance — for all nodes of the level at
once, on compact ``(2^level, C)`` arrays that concatenate directly into
the arena. Parallelism is the vector lanes; no task forking, no
pointers, no sorting, no dynamic shapes.

Storage is gather-optimised for the search/ICP hot loop. TPU HBM gathers
cost ~5 ns *per row* independent of row width up to 256 bytes (measured on
v5e), so the tree is stored as:

- ``nav`` (M, 56): per node, the packed 8-float descent blocks of its
  **depth-2 subtree** — itself, both children and all four grandchildren
  (7 blocks). One gather therefore advances a query THREE levels, cutting
  the number of random-access rows per descent by ~10x versus per-field
  gathers.

A block is ``[mean(3), split(3), kids, flags]`` for an interior node but
``[repr(3), normal(3), bbox0, flags]`` for a LEAF — a leaf's mean/split
are never used for stepping (descent stops on its flags), so its block
slots carry the surfel payload instead, *everywhere the leaf appears*
(its own panel 0 and its parent/grandparent child panels). A descent
therefore ends holding the matched leaf's payload in-register: no
separate payload gather, no payload panel.

``kids`` encodes child existence (left + 2*right); ``flags`` encodes
``is_leaf + 2*is_real`` (0 = unreal, 2 = interior, 3 = real leaf — a
leaf is always real).

Algorithmic contracts reproduced from the reference (see SURVEY.md §2.1):
- leaf criterion: largest oriented extent ``bbox[2] < b_max``
  (``mad_tree.cpp:64``), plus a forced leaf at the static depth cap;
- plane predecessor: first ancestor whose smallest extent ``bbox[0] <
  b_min`` — its PCA normal is inherited by all descendant leaves
  (``mad_tree.cpp:65-67, 90-93``);
- leaves with fewer than 3 points inherit the normal of the nearest
  ancestor with >= 3 points (``mad_tree.cpp:68-73``), tracked here as an
  incremental per-node field (``n3``) instead of an upward pointer walk;
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
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from madicp_tpu.ops.eigh3 import eigh3


class SearchTree(NamedTuple):
    """Packed arena form of a built MAD-tree.

    The node dimension is ``M = 2 ** (depth + 1)``; index 0 is unused,
    the root is index 1, children of ``i`` live at ``2i``/``2i+1``.
    ``nav[n]`` holds the descent blocks of n's depth-2 subtree in panels
    0-6; a leaf's block carries its surfel payload (see module
    docstring), so ``mean``/``split`` of a LEAF row read as the
    representative point / inherited normal.
    """

    nav: jnp.ndarray  # (M, 56)

    # -- reference-field views (panel 0 of nav) ---------------------------
    @property
    def mean(self) -> jnp.ndarray:
        """Interior rows: node mean. Leaf rows: representative point."""
        return self.nav[..., 0:3]

    @property
    def split(self) -> jnp.ndarray:
        """Interior rows: split direction. Leaf rows: surfel normal."""
        return self.nav[..., 3:6]

    @property
    def repr(self) -> jnp.ndarray:
        """Leaf representative point (valid where ``is_leaf``)."""
        return self.nav[..., 0:3]

    @property
    def normal(self) -> jnp.ndarray:
        """Leaf surfel normal (valid where ``is_leaf``)."""
        return self.nav[..., 3:6]

    @property
    def bbox0(self) -> jnp.ndarray:
        """Leaf smallest oriented extent (valid where ``is_leaf``)."""
        return self.nav[..., 6]

    @property
    def is_leaf(self) -> jnp.ndarray:
        flags = self.nav[..., 7]
        return (flags == 1.0) | (flags == 3.0)

    @property
    def is_real(self) -> jnp.ndarray:
        return self.nav[..., 7] >= 2.0

    @property
    def depth(self) -> int:
        return int(math.log2(self.nav.shape[-2])) - 1


class Leaves(NamedTuple):
    """Compacted leaf list of a tree (padded to a static capacity).

    ``total`` is the tree's TRUE leaf count before capping; when it
    exceeds the capacity, ``total - sum(valid)`` leaves were dropped (in
    arena order) — the reference never drops (``mad_tree.cpp:154-163``),
    so callers must surface ``total > capacity`` rather than silently
    shrink the map (VERDICT r1 item 4)."""

    pts: jnp.ndarray     # (L, 3) representative points
    normal: jnp.ndarray  # (L, 3)
    bbox0: jnp.ndarray   # (L,)
    valid: jnp.ndarray   # (L,) bool
    total: jnp.ndarray   # () int32 — true leaf count (may exceed L)


NAV_WIDTH = 56  # 7 blocks x 8 floats (self, 2 children, 4 grandchildren)


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


def _pack_tree(arena: dict, M: int, dtype) -> SearchTree:
    """Assemble the gather-optimised layout from per-field arena arrays.

    All child/grandchild panels are strided views of the block table
    (children of ``i`` are rows ``2i``/``2i+1``), so packing is dense
    reshape/concat work — no scatters, no gathers. Leaf blocks carry the
    surfel payload in place of the (unused for stepping) mean/split.
    """
    leaf = arena["is_leaf"] & arena["is_real"]
    flags = leaf.astype(dtype) + 2.0 * arena["is_real"].astype(dtype)
    real_pairs = arena["is_real"].astype(dtype).reshape(M // 2, 2)
    kids_half = real_pairs[:, 0] + 2.0 * real_pairs[:, 1]
    kids = jnp.concatenate([kids_half, jnp.zeros((M - M // 2,), dtype)])

    lf = leaf[:, None]
    B = jnp.concatenate(
        [
            jnp.where(lf, arena["repr"], arena["mean"]),
            jnp.where(lf, arena["normal"], arena["split"]),
            jnp.where(leaf, arena["bbox0"], kids)[:, None],
            flags[:, None],
        ],
        axis=1,
    )  # (M, 8)

    def strided(k: int, j: int) -> jnp.ndarray:
        """Rows ``B[k*n + j]`` for n < M//k, zero-padded to M."""
        rows = B.reshape(M // k, k, 8)[:, j]
        return jnp.concatenate([rows, jnp.zeros((M - M // k, 8), dtype)], axis=0)

    nav = jnp.concatenate(
        [
            B,                 # panel 0: self
            strided(2, 0),     # panel 1: left child
            strided(2, 1),     # panel 2: right child
            strided(4, 0),     # panels 3-6: grandchildren
            strided(4, 1),
            strided(4, 2),
            strided(4, 3),
        ],
        axis=1,
    )
    return SearchTree(nav=nav)


# Build-time compute-selection thresholds (r4, chip-measured via
# scripts/aux_probe.py): levels with at most this many nodes replace
# their N-row random-access op with compute. The build's stats gathers
# go one-hot up to 1024 rows — its 13-wide pack is cheap on the MXU,
# unlike the descent's 56-wide rows, which stop paying at 512 (NOTES
# ladder sweep; hence the separate, smaller descent ladder default);
# scatter-mins turn into per-node masked reductions only while the
# reduction count stays tiny.
_BUILD_ONEHOT_MAX = 1024
_BUILD_REDUCE_MIN_MAX = 32
# Levels with at most this many nodes MAY compute their moment
# segment-sum with the fused Pallas one-hot-MXU kernel instead of
# materialising the (N, 10) moment columns and scatter-adding them.
# SHIPS DISABLED (0) — measured r5, chip (scripts/pallas_scatter_probe
# .py + the in-build A/B recorded in NOTES): STANDALONE the kernel wins
# (0.74x at 64 nodes, 0.81x at 256, 0.97x at 1024 vs the mom+scatter
# pair — the platform floor is ~0.6-1.6 ns per logical element an op
# touches, and the kernel reads (N, 4) instead of (N, 11)), but
# IN-BUILD it loses 2.3x (37 -> 86 ms/build): every pallas_call pins
# linear {1,0} operand layouts, so XLA inserts relayout copies of the
# tiled (N, 3) intermediate at each of the 11 call boundaries
# (~4.5 ms/call — visible as operand_layout_constraints in the
# compiler diagnostics). Same toolchain-wall class as the r4 Mosaic
# dynamic_gather limit; revisit when pallas accepts tiled layouts.
# Also probed r5: in-kernel jnp scatter-add is an unimplemented Mosaic
# lowering, and a serial dynamic-store RMW loop runs at 165 ns/row —
# the MXU one-hot is the only viable Pallas scatter direction.
# f32 + TPU only; env knob for re-measurement.
_BUILD_PALLAS_SEGSUM_MAX = int(os.environ.get("MADICP_PALLAS_SEGSUM", "0"))


def _segsum_qb(N: int, sz: int) -> int:
    """Block size of the Pallas segment-sum kernel — shared by the
    kernel and its enablement guard (the guard must test divisibility
    against the SAME Qb the kernel will use, or the grid silently
    drops the tail rows)."""
    Mk = max(sz, 8)
    # bounded so the in-VMEM one-hot (Qb, Mk) bf16 tile plus double-
    # buffered inputs stay under the ~16 MB VMEM budget
    return min(2048, N, max(256, (1 << 21) // Mk))


def _bf16x3_split(x: jnp.ndarray):
    """TRUNCATION-split an f32 array into three exactly-representable,
    non-overlapping bf16 parts (``x == hi + mid + lo`` bitwise): bf16
    is literally the top 16 bits of f32, so masking the mantissa tail
    yields exact parts (a ROUNDED split can leave a 9-bit residue bf16
    cannot hold). The load-bearing trick behind both the exact one-hot
    row selection (`_select_rows_onehot`) and the Pallas segment-sum
    (`_segsum_moments_pallas`): every one-hot product is then an exact
    ``1.0 * part`` with f32 accumulation."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    r1 = x - hi
    r1b = jax.lax.bitcast_convert_type(r1, jnp.int32)
    mid = jax.lax.bitcast_convert_type(r1b & jnp.int32(-65536), jnp.float32)
    lo = r1 - mid
    return hi, mid, lo


def _segsum_moments_pallas(
    d: jnp.ndarray, idx: jnp.ndarray, sz: int, *, interpret: bool = False
) -> jnp.ndarray:
    """Per-level moment table via a fused Pallas kernel: (N, 3) shifted
    deltas + (N,) node ids -> (sz, 10) sums of [d, outer6(d), 1].

    The moment columns never exist in HBM: each (Qb, 3) block is
    expanded to its 10 columns in VMEM and contracted against an
    in-VMEM one-hot on the MXU. Exactness: the one-hot makes every
    product a plain ``1.0 * x``, and the moments are truncation-split
    into three non-overlapping bf16 parts (the ``_select_rows_onehot``
    trick) with f32 accumulation — the result is a pure f32-accumulation
    segment sum, the same accuracy class as the scatter-add it replaces
    (sum ORDER differs, so it is NOT bitwise vs the scatter; CPU keeps
    the scatter path and its goldens). Rows with ``idx >= sz`` match no
    one-hot column and drop, like ``mode="drop"``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = d.shape[0]
    Mk = max(sz, 8)  # degenerate tiny tables pad up; cols sz..Mk unused
    Qb = _segsum_qb(N, sz)

    def kernel(idx_ref, d_ref, out_ref):
        nb = pl.program_id(0)

        @pl.when(nb == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        dd = d_ref[:]  # (Qb, 3)
        x, y, z = dd[:, 0:1], dd[:, 1:2], dd[:, 2:3]
        mom = jnp.concatenate(
            [dd, x * x, x * y, x * z, y * y, y * z, z * z,
             jnp.ones_like(x), jnp.zeros((Qb, 6), jnp.float32)],
            axis=1,
        )  # (Qb, 16)

        ids = idx_ref[0, :]  # (Qb,)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Qb, Mk), 1)
        oh = (ids[:, None] == cols).astype(jnp.bfloat16)

        acc = out_ref[:]
        for part in _bf16x3_split(mom):
            # precision pinned to DEFAULT: the package-global
            # jax_default_matmul_precision=highest otherwise attaches an
            # fp32 contract precision to these bf16 operands, which
            # Mosaic rejects ("Bad lhs type"). DEFAULT is exact here —
            # every one-hot product is 1.0 * bf16-part, accumulated f32.
            acc = acc + jax.lax.dot_general(
                oh, part.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        out_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mk, 16), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(N // Qb,),
            in_specs=[
                pl.BlockSpec((1, Qb), lambda nb: (0, nb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Qb, 3), lambda nb: (nb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Mk, 16), lambda nb: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(idx[None, :], d)
    return out[:sz, :10]


def build_tree(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    depth: int,
    b_max: float,
    b_min: float,
    pallas_segsum: Optional[int] = None,
) -> tuple[SearchTree, jnp.ndarray]:
    """Build a MAD-tree over a padded point cloud.

    The level loop is unrolled in Python so every level works on exactly
    the arena rows it owns (level ``l`` is the static slice
    ``[2^l, 2^{l+1})`` of the heap order): per-node statistics are formed
    by scatter-adds from the points into ``(2^l, C)`` tables, node math
    (eigendecomposition, leaf tests, normal inheritance) runs on those
    compact per-level arrays (their total size over all levels is ~N, not
    N x depth), and the finished level arrays concatenate directly into
    the arena — no sorting, no segmented scans, no full-arena scatters.
    Parent information flows down as a per-node pack gathered with a
    static ``repeat`` (children of row i at the previous level are rows
    2i/2i+1 of this one).

    Args:
        points: (N, 3) padded point cloud (padding must be finite).
        valid:  (N,) bool mask of real points.
        depth:  static maximum tree depth; nodes still larger than ``b_max``
                at this depth become (oversized) leaves.
        b_max:  leaf criterion on the largest oriented extent.
        b_min:  plane-predecessor criterion on the smallest oriented extent.
        pallas_segsum: level-size threshold for the fused Pallas moment
                kernel (None -> ``_BUILD_PALLAS_SEGSUM_MAX``; 0 forces
                the scatter path everywhere — the A/B baseline). Only
                consulted on the TPU backend with f32 points.

    Returns:
        (tree, point_leaf): the packed tree and, per input point (in the
        original order), the arena id of the leaf containing it (0 for
        padding points).
    """
    dtype = points.dtype
    N = points.shape[0]
    M = tree_arena_size(depth)

    b_max = jnp.asarray(b_max, dtype)
    b_min = jnp.asarray(b_min, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    big_i = jnp.int32(2**31 - 1)

    iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    kw = dict(mode="drop")

    # per-point state
    node = jnp.where(valid, jnp.int32(1), jnp.int32(0))
    frozen = ~valid
    leaf_of = jnp.zeros((N,), jnp.int32)
    frz_dist = jnp.full((N,), big, dtype)   # |p - leaf mean| at freeze time
    prev_mean_pt = jnp.zeros((N, 3), dtype)  # parent mean: moment shift

    # per-node pack handed from a level to its children:
    # [mean(3), pca_n(3), ppn(3), n3(3), bbox0(1), has_pp(1), is_leaf(1)]
    root_parent = jnp.concatenate(
        [jnp.zeros((1, 12), dtype), jnp.full((1, 1), big, dtype),
         jnp.zeros((1, 2), dtype)], axis=1
    )
    prev_pack = root_parent  # level -1 sentinel: shift 0, no pp, no n3

    levels = []  # per-level node field dicts, concatenated into the arena

    for level in range(depth + 1):
        lo, sz = 1 << level, 1 << level
        force_leaf = level == depth
        live = (~frozen) & valid
        idx = jnp.where(live, node - lo, jnp.int32(sz))  # local node index

        # ---- moments: one segment-sum per point, shifted by parent mean
        # for f32 stability (utils.h:54-73 computes exact moments in f64;
        # the parent-mean shift keeps the f32 covariance accurate at depth)
        d = points - prev_mean_pt
        seg_max = (
            _BUILD_PALLAS_SEGSUM_MAX if pallas_segsum is None
            else pallas_segsum
        )
        if (
            sz <= seg_max
            and dtype == jnp.float32
            and N % _segsum_qb(N, sz) == 0  # grid drops tail rows else
            and jax.default_backend() == "tpu"
        ):
            # fused Pallas kernel: moment columns built in VMEM, one-hot
            # MXU contraction — see _segsum_moments_pallas. f32-
            # accumulation-exact but NOT bitwise vs the scatter (sum
            # order); CPU keeps the scatter, so this is a TPU-only
            # divergence within f32 reassociation noise.
            node_mom = _segsum_moments_pallas(d, idx, sz)
        else:
            mom = jnp.concatenate(
                [d, _outer6(d), jnp.ones((N, 1), dtype)], axis=1
            )  # (N, 10)
            node_mom = jnp.zeros((sz, 10), dtype).at[idx].add(mom, **kw)

        # ---- node math on the compact (sz, .) level arrays ----
        par = prev_pack if level == 0 else jnp.repeat(prev_pack, 2, axis=0)
        par_mean, par_pca = par[:, 0:3], par[:, 3:6]
        par_ppn, par_n3 = par[:, 6:9], par[:, 9:12]
        par_bbox0, par_has_pp = par[:, 12], par[:, 13] > 0
        par_leaf = par[:, 14] > 0

        k = node_mom[:, 9]
        k_safe = jnp.maximum(k, 1.0)
        mean_shift = node_mom[:, 0:3] / k_safe[:, None]
        mean = par_mean + mean_shift
        cov6 = node_mom[:, 3:9] / k_safe[:, None] - _outer6(mean_shift)
        bessel = k / jnp.maximum(k - 1.0, 1.0)
        cov6 = jnp.where((k >= 2.0)[:, None], cov6 * bessel[:, None], 0.0)
        _, evecs = eigh3(_sym_from6(cov6))  # (sz,3,3): columns ascending
        pca_n = evecs[:, :, 0]
        split_dir = evecs[:, :, 2]

        # plane predecessor (mad_tree.cpp:65-67, 90-93): the shallowest
        # ancestor with bbox0 < b_min wins; its PCA normal (ppn) rides down
        has_pp = par_has_pp | (par_bbox0 < b_min)
        ppn = jnp.where(
            par_has_pp[:, None],
            par_ppn,
            jnp.where((par_bbox0 < b_min)[:, None], par_pca, 0.0),
        )
        # nearest >=3-point ancestor-or-self normal (mad_tree.cpp:68-73)
        n3 = jnp.where((k >= 3.0)[:, None], pca_n, par_n3)
        few = k < 3.0
        if level == 0:  # the root has no ancestors to inherit from
            fallback = pca_n
        else:
            fallback = jnp.where(few[:, None], par_n3, pca_n)
        normal = jnp.where(has_pp[:, None], ppn, fallback)

        # ---- per-point: eigenbasis coordinates and oriented bbox ----
        # Points of a leaf node "descend" one extra level and retire
        # there (their child slots are flagged dead via par_leaf), so the
        # freeze decision rides the one per-point gather of this level —
        # no separate leaf-flag lookup is needed.
        packA = jnp.concatenate(
            [mean, evecs.reshape(sz, 9),
             par_leaf.astype(dtype)[:, None]], axis=1
        )  # (sz, 13)
        idx_c = jnp.minimum(idx, sz - 1)
        # small levels select their rows with COMPUTE instead of issuing
        # an N-row HBM gather (the descent's select-ladder trick, r4:
        # ~2-3 ns saved per elided row): broadcast / select tree / exact
        # one-hot MXU matmul — all bitwise-equal to ``jnp.take``. ALL
        # variants gate on the one threshold so zeroing it yields the
        # pure gather build (the A/B baseline in tests/test_tree.py)
        if sz > _BUILD_ONEHOT_MAX:
            ptA = jnp.take(packA, idx_c, axis=0)
        elif sz == 1:
            ptA = jnp.broadcast_to(packA[0], (N, 13))
        elif sz <= 8:
            ptA = _select_rows_tree(packA, idx_c)
        else:
            ptA = _select_rows_onehot(packA, idx_c)
        mean_pt = ptA[:, 0:3]
        d2 = points - mean_pt
        # v = E^T d2, written as three fused (N,3) multiply-adds — a
        # batched-matvec einsum lowers to a sprawl of (N,1) slice ops here
        v = (
            ptA[:, 3:6] * d2[:, 0:1]
            + ptA[:, 6:9] * d2[:, 1:2]
            + ptA[:, 9:12] * d2[:, 2:3]
        )
        dist = jnp.linalg.norm(d2, axis=-1)

        ext = jnp.concatenate([v, -v], axis=1)  # (N, 6)
        if sz <= _BUILD_REDUCE_MIN_MAX:
            # tiny levels: per-node masked min-REDUCTIONS instead of an
            # N-row scatter-min (~9-12 ns/row) — min is order-free, so
            # this is bitwise-identical to the scatter
            node_ext = jnp.stack(
                [
                    jnp.min(
                        jnp.where((idx == j)[:, None], ext, big), axis=0
                    )
                    for j in range(sz)
                ]
            )
        else:
            node_ext = jnp.full((sz, 6), big, dtype).at[idx].min(ext, **kw)
        vmin = node_ext[:, 0:3]
        vmax = -node_ext[:, 3:6]
        extents = jnp.maximum(vmax, 0.0) - jnp.minimum(vmin, 0.0)
        is_real_node = (k > 0) & ~par_leaf
        is_leaf_node = is_real_node & (force_leaf | (extents[:, 2] < b_max))

        levels.append(
            dict(
                mean=mean,
                split=split_dir,
                normal=normal,
                bbox0=extents[:, 0],
                is_leaf=is_leaf_node,
                is_real=is_real_node,
            )
        )

        # ---- per-point updates: retire points whose parent was a leaf;
        # at the depth cap every surviving point freezes in place ----
        dead_pt = live & (ptA[:, 12] > 0)
        leaf_of = jnp.where(dead_pt, node >> 1, leaf_of)
        frz_dist = jnp.where(
            dead_pt,
            jnp.linalg.norm(points - prev_mean_pt, axis=-1),
            frz_dist,
        )
        frozen = frozen | dead_pt
        if level < depth:
            go_right = v[:, 2] >= 0
            node = jnp.where(
                live & ~dead_pt, 2 * node + go_right.astype(jnp.int32), node
            )
            prev_mean_pt = jnp.where(live[:, None], mean_pt, prev_mean_pt)
            prev_pack = jnp.concatenate(
                [mean, pca_n, ppn, n3, extents[:, 0:1],
                 has_pp.astype(dtype)[:, None],
                 is_leaf_node.astype(dtype)[:, None]], axis=1
            )
        else:
            here = live & ~dead_pt
            leaf_of = jnp.where(here, node, leaf_of)
            frz_dist = jnp.where(here, dist, frz_dist)

    arena = {
        key: jnp.concatenate(
            [jnp.zeros((1,) + levels[0][key].shape[1:], levels[0][key].dtype)]
            + [lv[key] for lv in levels]
        )
        for key in levels[0]
    }
    point_leaf = jnp.where(valid, leaf_of, 0)

    # ---- leaf representatives, resolved once for the whole tree ----
    # Nearest-to-mean point with near-tie tie-break (mad_tree.cpp:76-86):
    # every point recorded |p - leaf_mean| when it froze, so one arena-wide
    # min/argmin pass replaces a per-level argmin chain (3 fewer N-row
    # random-access ops per level). Distances within a relative hair of
    # the minimum (e.g. the two points of a 2-point leaf, whose distances
    # to the midpoint tie up to rounding) resolve to the LOWEST ORIGINAL
    # INDEX: the winner of a mathematical tie must not depend on each
    # implementation's fp noise, or cross-implementation parity tests
    # (tests/reference_oracle.py, same rule) chase phantom mismatches.
    # The reference's own winner for such ties is its unobservable
    # in-place partition order.
    aid = jnp.where(valid, leaf_of, jnp.int32(M))
    dmin = jnp.full((M,), big, dtype).at[aid].min(frz_dist, **kw)
    tie_tol = 1e-9 if dtype == jnp.float64 else 1e-4
    is_near = valid & (
        frz_dist <= jnp.take(dmin, jnp.minimum(aid, M - 1)) * (1.0 + tie_tol)
    )
    near_pos = jnp.full((M,), big_i).at[
        jnp.where(is_near, aid, jnp.int32(M))
    ].min(iota, **kw)
    near_pt = jnp.take(points, jnp.minimum(near_pos, N - 1), axis=0)
    arena["repr"] = jnp.where(
        arena["is_leaf"][:, None], near_pt, arena["mean"]
    )

    tree = _pack_tree(arena, M, dtype)
    return tree, point_leaf


def _select_rows_tree(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(N, W) x (Q,) -> (Q, W) row selection as a log2(N)-deep chain of
    vector selects — zero HBM gather rows issued. Bitwise-equal to
    ``jnp.take`` (it moves the same f32 words, just via the VPU).
    N must be a (small) power of two; cost is N-1 selects over (Q, W)."""
    cands = [tab[i] for i in range(tab.shape[0])]
    bit = 0
    while len(cands) > 1:
        b = ((idx >> bit) & 1).astype(bool)[:, None]
        cands = [
            jnp.where(b, cands[2 * i + 1], cands[2 * i])
            for i in range(len(cands) // 2)
        ]
        bit += 1
    return cands[0]


def _select_rows_onehot(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(N, W) x (Q,) -> (Q, W) row selection as one-hot matmuls — the
    "gather" runs on the MXU instead of the HBM gather unit.

    Exactness: a one-hot dot product is a single product ``1.0 * x``
    plus zeros, so selection is exact in any dtype — except that TPU f32
    matmuls run as bf16 passes whose emulation precision is backend
    policy. For f32 the table is therefore split EXPLICITLY into three
    non-overlapping bf16 parts (``x = hi + mid + lo`` exactly: 8+8+8
    mantissa bits cover f32's 24; each residual is an exact f32
    subtraction), each part is selected by a bf16 one-hot matmul with
    f32 accumulation, and the three exact selections sum back to ``x``
    bitwise (the parts are non-overlapping, so each partial sum is
    representable). Pinned bitwise against ``jnp.take`` (ids/blocks) by
    tests/test_tree.py::test_ladder_descent_matches_gather_descent."""
    N = tab.shape[0]
    oh = idx[:, None] == jnp.arange(N, dtype=idx.dtype)[None, :]
    if tab.dtype == jnp.float32:
        hi_f, mid_f, lo_f = _bf16x3_split(tab)
        hi, mid, lo = (
            hi_f.astype(jnp.bfloat16),
            mid_f.astype(jnp.bfloat16),
            lo_f.astype(jnp.bfloat16),
        )
        ohb = oh.astype(jnp.bfloat16)
        # the barriers stop XLA from refolding the three dots into
        # dot(oh, hi+mid+lo) with the sum pre-collapsed to ONE bf16 —
        # observed on TPU (r4): without them the selection silently
        # degrades to single-bf16 precision (~0.4% rel)
        d1 = jax.lax.optimization_barrier(
            jnp.dot(ohb, hi, preferred_element_type=jnp.float32)
        )
        d2 = jax.lax.optimization_barrier(
            jnp.dot(ohb, mid, preferred_element_type=jnp.float32)
        )
        d3 = jax.lax.optimization_barrier(
            jnp.dot(ohb, lo, preferred_element_type=jnp.float32)
        )
        return (d1 + d2) + d3
    return jnp.dot(
        oh.astype(tab.dtype), tab, precision=jax.lax.Precision.HIGHEST
    )


def search_forest(
    nav: jnp.ndarray,
    queries: jnp.ndarray,
    base,
    depth: int,
    valid: Optional[jnp.ndarray] = None,
    start: Optional[jnp.ndarray] = None,
    n_gathers: Optional[int] = None,
    return_blocks: bool = False,
    return_margin: bool = False,
    ladder: int = 0,
):
    """Approximate-NN descent over one tree stored inside a flat forest.

    ``nav`` is a stacked flat table (e.g. all keyframe arenas reshaped to
    ``(K*M, NAV_WIDTH)``) and ``base`` the (traced) row offset of the
    target tree.
    Indexing into the flat table instead of dynamic-slicing one tree out
    keeps a keyframe loop free of ~29 MB slice copies while each gather
    still touches only that tree's rows (HBM gather cost tracks the hot
    footprint, not the operand size). Returns LOCAL heap leaf ids.

    Pure descent by split-plane sign, no backtracking, exactly like the
    reference's ``bestMatchingLeafFast`` (``mad_tree.cpp:144-152``); the
    statistical exactness is recovered by ICP's gating/weighting.

    One ``nav`` gather yields the current node's whole depth-2 subtree, so
    each loop iteration advances THREE levels; child blocks are picked with
    cheap vector selects instead of further gathers.

    ``start`` (optional, (Q,) int32) warm-starts each query's descent at
    an interior node instead of the root — used by the fast re-association
    mode, where round ``r`` restarts from an ancestor of round ``r-1``'s
    leaf. Out-of-subtree queries then stop at a non-leaf node, whose
    block ``flags`` read interior — they simply gate out as unmatched.
    With ``start``, per-query levels are unknown, so ``n_gathers`` bounds
    the descent instead of ``depth`` (safe structurally: real nodes at
    the static depth cap are always leaves, so a descent can never step
    out of the arena). A query entering a leaf on the LAST substep of
    the LAST warm gather keeps a stale (interior) block and reads
    unmatched — conservative, and impossible on the root-descent path
    (the gather count leaves one follow-up gather after any third-substep
    leaf entry).

    With ``return_blocks=True`` returns ``(leaf_ids, blocks)`` where
    ``blocks`` (Q, 8) is the final node's descent block — for a leaf,
    its surfel payload ``[repr(3), normal(3), bbox0, flags]``.

    ``ladder`` (static int) replaces the first ``ladder`` descent
    gathers with COMPUTE — TPU descent gathers are issue-bound at
    ~3 ns/row regardless of locality or operand size (measured,
    scripts/gather_probe.py r3), so the only way to make the hot loop
    cheaper is to not issue rows at all. Gather ``g`` needs the block
    rows of level ``3g`` — a static ``2^{3g}``-row arena slice — and a
    query AT that level selects its row without touching the gather
    unit: level 0 is a broadcast of the root row, tiny levels use a
    select tree (``_select_rows_tree``), larger ones an exact one-hot
    matmul on the MXU (``_select_rows_onehot``). Queries parked below
    the level (earlier leaf / padding) keep their carried block, which
    is bitwise what their own row's panel 0 holds (``_pack_tree``
    strided copies; padding queries' carry is seeded from row 0's
    panel for the same reason). Leaf ids and payload blocks are
    therefore BITWISE IDENTICAL to ``ladder=0``; margins agree only to
    ~ulp (the ladder trace unrolls where the gather path rolls a
    ``fori_loop``, so XLA fuses the side dot-product differently —
    noise ~eps x coordinate scale, below the certificate's
    ``eps_cert`` floor; pinned by tests/test_tree.py). Only root
    descents qualify (``start=None`` and a static ``base == 0``);
    otherwise ``ladder`` is ignored.

    With ``return_margin=True`` additionally returns ``margins`` (Q,):
    the minimum |signed distance to a split plane| over every real
    interior node the descent EVALUATED (split directions are unit
    eigenvectors, so the value is metric). This is a path-stability
    certificate: moving a query by strictly less than its margin cannot
    flip any side decision along its path, so the descent provably
    returns the SAME leaf — the basis of the certified re-association
    schedule (``PipelineConfig.certify``), which skips the HBM gathers
    of provably-unchanged associations on later GN rounds while staying
    result-identical to a full re-descent.
    """
    Q = queries.shape[0]
    known_levels = start is None
    if n_gathers is None:
        n_gathers = -(-depth // 3)
        if return_blocks and depth % 3 == 0:
            # when depth % 3 == 0 the deepest leaf is entered on a third
            # substep, whose block isn't in the gathered row — one extra
            # gather re-fetches it (panel 0 = its payload). Id-only
            # descents don't need it: ids are final after ceil(depth/3).
            n_gathers += 1
    # padding queries start (and stay) at the unreal row 0: their gathers
    # all hit one hot cache line instead of random-walking the table
    if start is None:
        node0 = jnp.ones((Q,), jnp.int32)
    else:
        node0 = jnp.maximum(start, 1)
    if valid is not None:
        node0 = node0 * valid.astype(jnp.int32)
    # capture staticness BEFORE the asarray below erases it (the ladder
    # needs a static root offset to slice per-level tables out of `nav`)
    base_is_static_zero = isinstance(base, int) and base == 0
    base = jnp.asarray(base, jnp.int32)

    big = jnp.asarray(jnp.finfo(nav.dtype).max, nav.dtype)

    def step_body(g, carry, row, at):
        """One 3-level descent step given this step's block rows.

        ``at`` masks queries AT this step's level (compute-selected rows
        are only meaningful for them); ``None`` for the gather path,
        where ``row`` is each query's own node row and panel 0 is
        bitwise the carried block for parked queries."""
        node, blk, margin = carry
        if at is None:
            blk = row[:, 0:8]
        else:
            blk = jnp.where(at[:, None], row[:, 0:8], blk)
        b1 = jnp.zeros((Q,), bool)
        for s in range(3):
            active = (g * 3 + s) < depth if known_levels else True
            sval = jnp.sum((queries - blk[:, 0:3]) * blk[:, 3:6], -1)
            side = sval >= 0
            flags = blk[:, 7]
            leaf = flags == 3.0
            real = flags >= 2.0
            kids = blk[:, 6]
            has = jnp.where(side, kids >= 2.0, (kids == 1.0) | (kids == 3.0))
            # the side decision is consequential at every real interior
            # node evaluated (it picks the child AND gates `has`), so the
            # certificate must cover them all — including a final node
            # where no step was taken
            consider = active & real & ~leaf
            if return_margin:
                # margin tracking only when asked for: it is a
                # loop-CARRIED value, so XLA cannot dead-code it out of
                # the fori body on its own — tracing it away saves real
                # chain work on margin-free descents (fast mode,
                # certify=False)
                margin = jnp.where(
                    consider, jnp.minimum(margin, jnp.abs(sval)), margin
                )
            step = consider & has
            node = jnp.where(step, 2 * node + side.astype(jnp.int32), node)
            if s == 0:
                child = jnp.where(
                    side[:, None], row[:, 16:24], row[:, 8:16]
                )
                blk = jnp.where(step[:, None], child, blk)
                b1 = side & step
            elif s == 1:
                lo = jnp.where(side[:, None], row[:, 32:40], row[:, 24:32])
                hi = jnp.where(side[:, None], row[:, 48:56], row[:, 40:48])
                child = jnp.where(b1[:, None], hi, lo)
                blk = jnp.where(step[:, None], child, blk)
        return node, blk, margin

    use_ladder = ladder > 0 and known_levels and base_is_static_zero
    if use_ladder:
        # parked/invalid queries (node 0) keep their carried block where
        # the gather path re-fetches row 0's panel 0 — seed the carry
        # with that panel so a full ladder stays bitwise-equal for them
        blk0 = jnp.broadcast_to(nav[0, 0:8], (Q, 8))
    else:
        blk0 = jnp.zeros((Q, 8), nav.dtype)
    margin0 = jnp.full((Q,), big, nav.dtype)
    carry = (node0, blk0, margin0)
    if use_ladder:
        M = nav.shape[-2]
        for g in range(n_gathers):
            lvl = 1 << (3 * g)
            if g < ladder and 2 * lvl <= M:
                node = carry[0]
                at = node >= lvl
                if lvl == 1:
                    row = jnp.broadcast_to(nav[1], (Q, nav.shape[-1]))
                else:
                    tab = jax.lax.slice_in_dim(nav, lvl, 2 * lvl, axis=0)
                    local = jnp.clip(node - lvl, 0, lvl - 1)
                    if lvl <= 8:
                        row = _select_rows_tree(tab, local)
                    else:
                        row = _select_rows_onehot(tab, local)
                carry = step_body(g, carry, row, at)
            else:
                row = jnp.take(nav, base + carry[0], axis=0)
                carry = step_body(g, carry, row, None)
    else:
        carry = jax.lax.fori_loop(
            0,
            n_gathers,
            lambda g, c: step_body(
                g, c, jnp.take(nav, base + c[0], axis=0), None
            ),
            carry,
        )
    node, blk, margin = carry
    out = (node,)
    if return_blocks:
        out += (blk,)
    if return_margin:
        out += (margin,)
    return out if len(out) > 1 else node


def search_tree(tree: SearchTree, queries: jnp.ndarray, depth: Optional[int] = None) -> jnp.ndarray:
    """Approximate-NN descent on a single tree: (Q, 3) -> (Q,) leaf ids."""
    if depth is None:
        depth = tree.depth
    return search_forest(tree.nav, queries, 0, depth)


def search_payload(tree: SearchTree, leaf_ids: jnp.ndarray):
    """Gather the leaf payload for descent results in one packed row read.

    (The descent itself already returns the payload via
    ``return_blocks=True``; this is the standalone lookup.)
    Returns ``(pts, normals, bbox0, ok)``.
    """
    lf = jnp.take(tree.nav, leaf_ids, axis=0)[:, 0:8]
    return lf[:, 0:3], lf[:, 3:6], lf[:, 6], lf[:, 7] == 3.0


def get_leaves(tree: SearchTree, max_leaves: int) -> Leaves:
    """Compact the tree's leaves into padded fixed-size arrays.

    Leaf order is arena (breadth-first) order — the MAD-ICP math is
    order-invariant (sums over leaves), unlike the reference's DFS
    ``getLeafs`` (``mad_tree.cpp:154-163``) whose order is also unused.
    Compaction is a cumsum + row scatter (no sort: an argsort over the
    arena lowers to an expensive while-loop on TPU); leaves beyond the
    capacity are dropped in arena order.
    """
    flag = tree.nav[..., 7] == 3.0
    pos = jnp.cumsum(flag.astype(jnp.int32)) - 1
    idx = jnp.where(flag, pos, max_leaves)
    out = jnp.zeros((max_leaves, 8), tree.nav.dtype).at[idx].set(
        tree.nav[:, 0:8], mode="drop"
    )
    count = jnp.sum(flag.astype(jnp.int32))
    iota = jax.lax.broadcasted_iota(jnp.int32, (max_leaves, 1), 0)[:, 0]
    return Leaves(
        pts=out[:, 0:3],
        normal=out[:, 3:6],
        bbox0=out[:, 6],
        valid=iota < count,
        total=count,
    )


def count_leaves(tree: SearchTree) -> jnp.ndarray:
    return jnp.sum(tree.nav[..., 7] == 3.0)


def transform_tree(tree: SearchTree, R: jnp.ndarray, t: jnp.ndarray) -> SearchTree:
    """Rigidly move a tree into another frame (reference ``applyTransform``,
    ``mad_tree.cpp:165-172``): rotate the eigen-directions, transform the
    anchor/representative points. Oriented extents are rotation-invariant.

    Every ``nav`` panel has the uniform layout ``[position(3),
    direction(3), scalar(2)]`` (interior blocks: mean/split; leaf
    blocks: repr/normal), so the whole table transforms as ONE affine
    map ``nav @ A + c`` with A block-diagonal — a single MXU matmul over
    the ~29 MB table instead of strided panel passes.
    """
    dtype = tree.nav.dtype
    A8 = jnp.zeros((8, 8), dtype)
    A8 = A8.at[0:3, 0:3].set(R.T.astype(dtype))
    A8 = A8.at[3:6, 3:6].set(R.T.astype(dtype))
    A8 = A8.at[6, 6].set(1.0)
    A8 = A8.at[7, 7].set(1.0)
    A = jnp.kron(jnp.eye(7, dtype=dtype), A8)                 # (56, 56)
    c8 = jnp.concatenate([jnp.asarray(t, dtype), jnp.zeros((5,), dtype)])
    c = jnp.tile(c8, 7)                                       # (56,)
    nav = tree.nav @ A + c
    return SearchTree(nav=nav)
