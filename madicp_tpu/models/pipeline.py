"""Full MAD-ICP odometry pipeline as one jitted step over a state pytree.

Re-design of the reference ``Pipeline`` (``pipeline.cpp:34-308``): the
per-scan computation — deskew, MAD-tree build, constant-velocity
prediction, ``MAX_ICP_ITS`` full re-association Gauss-Newton rounds over
the keyframe local map, inlier ratio, velocity smoothing, frame-window and
information-driven keyframe promotion — is a single ``jit``-compiled
function of ``(state, points, valid, stamp)``. All reference data
structures become statically-shaped device arrays:

- keyframe deque            -> ring buffer of stacked arena trees (K axis;
                               shardable over a ``kf`` mesh axis)
- frame window (deque of 10) -> ring buffer of stacked arena trees
- trajectory (for velocity)  -> shifting window of the last SMOOTHING_T poses
- OpenMP keyframe loop       -> sequential ``lax.scan`` over the K axis
                               on-chip (HBM gather locality) + reduction;
                               ``shard_map`` + ``psum`` over ICI across
                               chips (parallel/sharded_icp.py)

The reference's anytime-realtime wall-clock break (``pipeline.cpp:166-169``)
is host control flow by nature; here the iteration count is a static config
(``max_icp_iterations``) and realtime compliance is *measured* (scans/sec),
not enforced mid-step (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from madicp_tpu.ops.constants import FRAME_WINDOW, MAX_ICP_ITS, SMOOTHING_T
from madicp_tpu.ops.deskew import deskew_cloud
from madicp_tpu.ops.icp_core import (
    associate_packed,
    gn_se3_step,
    icp_terms,
    neg_logdet,
    terms_from_payload,
)
from madicp_tpu.ops.lie import exp_se3_split
from madicp_tpu.ops.tree import (
    NAV_WIDTH,
    SearchTree,
    build_tree,
    get_leaves,
    transform_tree,
    tree_arena_size,
)


@dataclass(frozen=True)
class PipelineConfig:
    """Static configuration (hashable; closed over by the jitted step).

    Solver defaults follow ``mad_params.py:31-38`` / ``default.cfg``; the
    shape parameters (padded cloud size, tree depth, leaf capacity) are the
    TPU-native static-shape budget.
    """

    sensor_hz: float = 10.0
    deskew: bool = False
    # "reference" = the reference's literal once-per-point azimuth-bin
    # advance (pipeline.cpp:109-122), vectorised via sort + prefix-min;
    # "binned" = pure binning, sort-free (identical on bin-dense sweeps)
    deskew_mode: str = "reference"
    b_max: float = 0.2
    rho_ker: float = 0.1
    p_th: float = 0.8
    b_min: float = 0.1
    b_ratio: float = 0.02
    num_keyframes: int = 4
    # static shapes
    n_points: int = 131072
    depth: int = 16
    max_leaves: int = 0  # 0 -> n_points
    max_icp_iterations: int = MAX_ICP_ITS
    dtype: Any = jnp.float32
    # association schedule: "exact" re-descends every moving leaf from the
    # root every GN round (the reference's behavior, pipeline.cpp:166-193).
    # "fast" is the TPU-native accelerated schedule: round 0 and the final
    # round descend; in between, a re-descent runs every
    # ``reassoc_every``-th round and the other rounds reuse the cached
    # association (the classical reassociate-every-k-iterations ICP
    # economy) — the gate is still re-evaluated under the current
    # estimate every round, so stale matches fall out as the estimate
    # moves. Re-descents start from the root when ``reassoc_backup`` is
    # 0, or warm-start ``reassoc_backup`` levels above the previous
    # round's leaf. Several-fold fewer HBM gather rows per step at
    # trajectory-level-identical accuracy (tests/test_pipeline.py pins
    # fast-vs-exact agreement).
    assoc_mode: str = "exact"
    # 7 is the measured knee of the r5 chip sweep (scripts/fast_sweep.py,
    # flagship throughput + accuracy-probe trajectory delta vs exact):
    # every=2: 10.7 scans/s @ 0.001 mm, 4: 13.1 @ 0.001 mm,
    # 7: 15.5 @ 0.019 mm, 14: 16.9 @ 0.203 mm — k=14's +9% is not worth
    # 10x the delta; k=7 buys +18% over k=4 at a sub-0.02 mm delta.
    # apps/cli.py and bench.py use the same value (VERDICT r4 item 5).
    reassoc_every: int = 7
    reassoc_backup: int = 0
    # Select-ladder descent (every schedule): replace the first
    # ``assoc_ladder`` descent gathers per root descent with compute
    # (root-row broadcast / select tree / exact one-hot MXU matmul) —
    # ids/payloads bitwise-identical, path margins within the eps_cert
    # fp floor (see ops/tree.py::search_forest). TPU
    # descent gathers are issue-bound at ~3 ns/row no matter what they
    # touch (measured, scripts/gather_probe.py), so the early descent
    # levels — whose block tables are tiny — are cheaper to compute
    # than to gather. 3 replaces the level-0/3/6 gathers (1/8/64-row
    # tables); 0 disables.
    assoc_ladder: int = 3
    # Certified re-association (exact mode only). The exact schedule
    # re-associates every moving leaf against every keyframe every GN
    # round (pipeline.cpp:166-193). With certify=True each descent also
    # records the minimum |distance to a split plane| along its path
    # (ops/tree.py search_forest return_margin); on later rounds an
    # entry whose accumulated per-leaf displacement ||X_b m - X_a m|| is
    # strictly below that margin PROVABLY descends to the same leaf, so
    # its HBM gathers are skipped (parked on the hot row-0 cache line)
    # and its cached payload reused — the round is still a true
    # re-association, just with the provably-unchanged lookups elided.
    # Result-identical to certify=False in f64 (pinned bitwise-level by
    # tests/test_pipeline.py + tests/test_golden.py); in f32 the
    # eps_cert fp-safety window admits rare sub-window association flips
    # and identity degrades to a sub-mm trajectory bound
    # (test_certified_f32_divergence_bounded). Typically several-fold
    # fewer gather rows per scan once the GN estimate converges.
    certify: bool = True
    # certify_compact > 0 additionally COMPACTS each keyframe's
    # uncertified entries into a PER-KEYFRAME static buffer of that
    # size (jnp.nonzero) and descends only the buffer against that
    # keyframe's own arena — the parked row-0 gathers of the plain
    # certified sweep are not issued at all (TPU descent gathers are
    # issue-bound: parking makes rows cheaper, not fewer). Keyframes
    # whose uncertified count exceeds the buffer fall back to their
    # full parked sweep (sound: never skips an uncertified entry).
    # Result-equivalence is pinned by tests. An earlier variant with
    # ONE global buffer against a flat (K*arena,) forest view measured
    # ~5x SLOWER than the parked sweep on the chip (whole-forest
    # gather operands are penalized) — hence per-keyframe.
    certify_compact: int = 0
    # certify_prefix > 0: the PREFIX-certified exact schedule. r3 chip
    # measurements killed both earlier accelerations of the certified
    # schedule: parking provably-unchanged descents on row 0 saves
    # nothing (descent work is issue/VPU-bound per ENTRY, not per
    # touched cache line), and per-round compaction (certify_compact)
    # costs more O(K x L) nonzero/scatter machinery than it saves. This
    # variant removes the per-round bookkeeping entirely: after the
    # full round-0 descent, each leaf gets a conservative normalized
    # margin mu = min_k(margin_k) / (1 + ||m||) and the leaves are
    # SORTED by mu once per scan. Each round accumulates the scalar
    # motion budget S += ||dt|| + ||dR||_F; since a leaf's displacement
    # since round 0 is <= S * (1 + ||m||), the uncertified set
    # {mu <= T_r} (T_r = running max of S + fp-floor) is a PREFIX of
    # the sorted order that only grows — found with one searchsorted
    # and re-descended as a static [0:certify_prefix] slice (masked to
    # the true count), caches updated by one contiguous slice write.
    # Rounds whose prefix overflows the buffer re-descend everything
    # (sound: a full re-descent under the current pose is exactly the
    # plain exact round; skipped entries elsewhere still hold their
    # round-0 result, which the certificate guarantees unchanged).
    # Result-identical to the plain exact schedule (pinned by tests;
    # same fp-safety floor as `certify`). Mutually exclusive with
    # certify_compact.
    certify_prefix: int = 0

    def __post_init__(self):
        if self.deskew_mode not in ("reference", "binned"):
            raise ValueError(
                f"deskew_mode must be 'reference' or 'binned', got {self.deskew_mode!r}"
            )
        if self.assoc_mode not in ("exact", "fast"):
            raise ValueError(
                f"assoc_mode must be 'exact' or 'fast', got {self.assoc_mode!r}"
            )
        if self.reassoc_every < 1:
            raise ValueError(
                f"reassoc_every must be >= 1, got {self.reassoc_every}"
            )
        if self.reassoc_backup < 0:
            raise ValueError(
                f"reassoc_backup must be >= 0, got {self.reassoc_backup}"
            )
        if self.certify_compact < 0:
            raise ValueError(
                f"certify_compact must be >= 0, got {self.certify_compact}"
            )
        if self.assoc_ladder < 0:
            raise ValueError(
                f"assoc_ladder must be >= 0, got {self.assoc_ladder}"
            )
        if self.certify_prefix < 0:
            raise ValueError(
                f"certify_prefix must be >= 0, got {self.certify_prefix}"
            )
        if self.certify_prefix and self.certify_compact:
            raise ValueError(
                "certify_prefix and certify_compact are mutually exclusive"
            )

    @property
    def leaves_cap(self) -> int:
        # a tree can never have more leaves than arena rows, and
        # get_leaves truncates to the arena — a larger cap would give the
        # matched accumulator a mismatched static shape
        return min(self.max_leaves or self.n_points, self.arena)

    @property
    def arena(self) -> int:
        return tree_arena_size(self.depth)


class PipelineState(NamedTuple):
    X: jnp.ndarray              # (4,4) frame_to_map
    velocity: jnp.ndarray       # (6,)
    traj: jnp.ndarray           # (SMOOTHING_T, 4, 4), newest last
    traj_count: jnp.ndarray     # () int32
    kf_tree: SearchTree         # stacked, leading (K,)
    kf_valid: jnp.ndarray       # (K,) bool
    kf_head: jnp.ndarray        # () int32 ring head (next overwrite)
    keyframe_to_map: jnp.ndarray  # (4,4) pose of the latest keyframe
    fr_tree: SearchTree         # stacked, leading (FRAME_WINDOW,)
    fr_valid: jnp.ndarray       # (F,) bool
    fr_weight: jnp.ndarray      # (F,) -logdet(H): smaller = more informative
    fr_seq: jnp.ndarray         # (F,) int32
    fr_pose: jnp.ndarray        # (F, 4, 4)
    fr_head: jnp.ndarray        # () int32
    seq: jnp.ndarray            # () int32
    seq_keyframe: jnp.ndarray   # () int32


class StepOutput(NamedTuple):
    pose: jnp.ndarray           # (4,4) current lidar_to_world
    inlier_ratio: jnp.ndarray   # ()
    map_updated: jnp.ndarray    # () bool
    n_leaves: jnp.ndarray       # () int32 — real leaves of the current scan
    leaves_pts: jnp.ndarray     # (L,3) current leaves in the map frame
    leaves_valid: jnp.ndarray   # (L,)
    # leaves beyond the static capacity, dropped in arena order; the
    # reference never drops (mad_tree.cpp:154-163) — nonzero means the
    # configured max_leaves is too small for this scene and the map /
    # inlier bookkeeping is running on a truncated leaf set
    n_leaves_dropped: jnp.ndarray  # () int32
    # (valid-keyframe, valid-leaf) tree descents this scan actually
    # walked (gathers not parked on row 0; empty ring slots excluded in
    # every schedule so the numbers compare). The plain exact schedule
    # performs rounds x K_valid x L_valid of them; the certified
    # schedule's count collapses toward ~1 full round's worth as GN
    # converges — observable evidence for the certificate's skip rate
    n_descents: jnp.ndarray  # () int32


def _empty_tree(cfg: PipelineConfig, lead: tuple = ()) -> SearchTree:
    M = cfg.arena
    return SearchTree(nav=jnp.zeros(lead + (M, NAV_WIDTH), cfg.dtype))


def init_state(cfg: PipelineConfig) -> PipelineState:
    eye = jnp.eye(4, dtype=cfg.dtype)
    # NOTE: X and keyframe_to_map must be DISTINCT buffers — the Pipeline
    # donates its state every step, and donating one buffer reachable
    # through two pytree leaves is an XLA error.
    return PipelineState(
        X=jnp.eye(4, dtype=cfg.dtype),
        velocity=jnp.zeros(6, cfg.dtype),
        traj=jnp.tile(eye, (SMOOTHING_T, 1, 1)),
        traj_count=jnp.zeros((), jnp.int32),
        kf_tree=_empty_tree(cfg, (cfg.num_keyframes,)),
        kf_valid=jnp.zeros(cfg.num_keyframes, bool),
        kf_head=jnp.zeros((), jnp.int32),
        keyframe_to_map=eye,
        fr_tree=_empty_tree(cfg, (FRAME_WINDOW,)),
        fr_valid=jnp.zeros(FRAME_WINDOW, bool),
        fr_weight=jnp.full((FRAME_WINDOW,), jnp.inf, cfg.dtype),
        fr_seq=jnp.zeros(FRAME_WINDOW, jnp.int32),
        fr_pose=jnp.tile(eye, (FRAME_WINDOW, 1, 1)),
        fr_head=jnp.zeros((), jnp.int32),
        seq=jnp.zeros((), jnp.int32),
        seq_keyframe=jnp.zeros((), jnp.int32),
    )


def _set_slot(stacked, slot, value):
    """Functional write of one leading-axis slot across a pytree."""
    return jax.tree.map(lambda a, v: a.at[slot].set(v), stacked, value)


def initialize_step(
    cfg: PipelineConfig, state: PipelineState, points, valid, stamp
) -> tuple[PipelineState, StepOutput]:
    """First-scan bootstrap (reference ``pipeline.cpp:267-284``): the scan
    becomes keyframe 0 at identity; no deskew, no ICP."""
    del stamp
    tree, _ = build_tree(
        points, valid, depth=cfg.depth, b_max=cfg.b_max, b_min=cfg.b_min
    )
    leaves = get_leaves(tree, cfg.leaves_cap)
    eye = jnp.eye(4, dtype=cfg.dtype)

    kf_tree = _set_slot(state.kf_tree, 0, tree)
    state = state._replace(
        kf_tree=kf_tree,
        kf_valid=state.kf_valid.at[0].set(True),
        kf_head=jnp.ones((), jnp.int32) % cfg.num_keyframes,
        traj=state.traj.at[-1].set(eye),
        traj_count=jnp.ones((), jnp.int32),
        seq=state.seq + 1,
    )
    out = StepOutput(
        pose=eye,
        inlier_ratio=jnp.ones((), cfg.dtype),
        map_updated=jnp.ones((), bool),
        n_leaves=jnp.sum(leaves.valid).astype(jnp.int32),
        leaves_pts=leaves.pts,
        leaves_valid=leaves.valid,
        n_leaves_dropped=jnp.maximum(
            leaves.total - cfg.leaves_cap, 0
        ).astype(jnp.int32),
        n_descents=jnp.zeros((), jnp.int32),  # first scan runs no ICP
    )
    return state, out


def icp_rounds(
    cfg: PipelineConfig,
    kf_tree: SearchTree,
    kf_valid_f: jnp.ndarray,
    leaves_pts: jnp.ndarray,
    leaves_valid: jnp.ndarray,
    X0: jnp.ndarray,
    reduce_terms=None,
):
    """Run the full GN round schedule over a (possibly local) keyframe set.

    This is the reference's ICP loop (``pipeline.cpp:166-193``) for both
    association schedules (see ``PipelineConfig.assoc_mode``). Keyframes
    are processed with a sequential ``lax.scan`` rather than a vmap: the
    descent gathers then hit one keyframe's ~29 MB node table at a time
    instead of interleaving across the whole ring (measures ~4x faster
    on v5e). The per-keyframe reduction is the OpenMP-adder analog
    (``mad_icp.cpp:100-110``).

    ``reduce_terms`` completes the reduction across devices when the
    keyframe axis is sharded: it receives the locally-accumulated
    ``(H, b)`` or ``(H, b, matched)`` tuple and must return the globally
    reduced one (psum / any-reduce over the mesh axis); identity by
    default. The keyframe count is taken from the (local) array shapes,
    NOT from ``cfg.num_keyframes``.

    Returns ``(X, H_last, matched, n_descents)``; ``matched`` flags come
    from the final round only, like the reference (``pipeline.cpp:
    172-176``); ``n_descents`` counts the (valid-keyframe, valid-leaf)
    tree descents the schedule actually walked — empty ring slots are
    excluded in every schedule so plain/fast/certified counts compare
    (local to this shard; the sharded wrapper psums it).
    """
    dtype = cfg.dtype
    if reduce_terms is None:
        reduce_terms = lambda t: t  # noqa: E731
    K = kf_valid_f.shape[0]
    L = leaves_pts.shape[0]
    nv = jnp.sum(leaves_valid).astype(jnp.int32)  # valid moving leaves
    kv = jnp.sum(kf_valid_f > 0).astype(jnp.int32)  # valid keyframes

    def accumulate(X, with_matched: bool):
        """One full association+accumulation pass (exact schedule)."""

        def per_kf(acc, kf):
            tree_fields, v = kf
            terms = icp_terms(
                SearchTree(*tree_fields), leaves_pts, leaves_valid, X,
                b_max=cfg.b_max, b_ratio=cfg.b_ratio, rho_ker=cfg.rho_ker,
                ladder=cfg.assoc_ladder,
            )
            out = (acc[0] + terms.H * v, acc[1] + terms.b * v)
            if with_matched:
                out += (acc[2] | (terms.matched & (v > 0)),)
            return out, None

        acc0 = (jnp.zeros((6, 6), dtype), jnp.zeros((6,), dtype))
        if with_matched:
            acc0 += (jnp.zeros(L, bool),)
        acc, _ = jax.lax.scan(per_kf, acc0, (tuple(kf_tree), kf_valid_f))
        return reduce_terms(acc)

    # ---- fast association schedule (see PipelineConfig.assoc_mode) ----
    # Per-keyframe association state carried across rounds: leaf ids
    # (K, L) and gathered payloads (K, L, 8). Re-descents restart from
    # the root (or ``reassoc_backup`` levels above the previous leaf);
    # frozen rounds are pure vector math.
    warm = cfg.reassoc_backup > 0
    warm_gathers = -(-cfg.reassoc_backup // 3) + 1

    def assoc_scan(X, prev_ids, force_full: bool = False):
        """(Re-)associate against every keyframe; prev_ids None => full."""
        ml = leaves_pts @ X[:3, :3].T + X[:3, 3]
        full = prev_ids is None or not warm or force_full
        if prev_ids is None:
            prev_ids = jnp.zeros((K, L), jnp.int32)

        def per_kf(_, kf):
            tree_fields, prev = kf
            nav = SearchTree(*tree_fields).nav
            ids, payload = associate_packed(
                nav, 0, cfg.depth, ml, leaves_valid,
                start=None if full else prev >> cfg.reassoc_backup,
                n_gathers=None if full else warm_gathers,
                ladder=cfg.assoc_ladder,  # ignored on warm re-descents
            )
            return 0, (ids, payload)

        _, (ids, payload) = jax.lax.scan(per_kf, 0, (tuple(kf_tree), prev_ids))
        return ids, payload

    def terms_scan(X, payload, with_matched: bool):
        """H/b (+ matched) from cached payloads — no tree access.

        All keyframes at once: a vmap over the stacked (K, L, 8) payloads
        fuses into one dense pass + one batched (K, L, 6) matmul on the
        MXU, several times cheaper than a sequential per-keyframe scan.
        """
        terms = jax.vmap(
            lambda pl: terms_from_payload(
                pl, leaves_pts, leaves_valid, X,
                b_max=cfg.b_max, b_ratio=cfg.b_ratio, rho_ker=cfg.rho_ker,
            )
        )(payload)
        H = jnp.einsum("k,kij->ij", kf_valid_f, terms.H)
        b = jnp.einsum("k,ki->i", kf_valid_f, terms.b)
        if with_matched:
            matched = jnp.any(
                terms.matched & (kf_valid_f > 0)[:, None], axis=0
            )
            return reduce_terms((H, b, matched))
        return reduce_terms((H, b))

    # the reference resets `matched` only before the LAST iteration
    # (pipeline.cpp:172-176), so the inlier ratio and the information
    # weight come from the final association/H only — earlier rounds
    # skip that bookkeeping entirely.
    n_its = cfg.max_icp_iterations
    if n_its > 0 and cfg.assoc_mode == "fast":
        # descents happen on round 0, every reassoc_every-th
        # intermediate round, and the final full round — a static count
        n_redesc_rounds = sum(
            1 for r in range(1, n_its - 1) if r % cfg.reassoc_every == 0
        )
        n_descents = (
            jnp.int32(1 if n_its == 1 else 2 + n_redesc_rounds) * kv * nv
        )
        ids, payload = assoc_scan(X0, None)  # round 0: full descent
        if n_its == 1:
            H_last, b_last, matched = terms_scan(X0, payload, True)
            X = gn_se3_step(X0, H_last, b_last)
        else:
            H0, b0 = terms_scan(X0, payload, False)
            X1 = gn_se3_step(X0, H0, b0)

            def one_round(r, carry):
                X, ids, payload = carry
                ids, payload = jax.lax.cond(
                    r % cfg.reassoc_every == 0,
                    lambda: assoc_scan(X, ids),
                    lambda: (ids, payload),
                )
                H, b = terms_scan(X, payload, False)
                return (gn_se3_step(X, H, b), ids, payload)

            X, ids, payload = jax.lax.fori_loop(
                1, n_its - 1, one_round, (X1, ids, payload)
            )
            # final round: a FULL fresh re-descent even with warm-started
            # intermediate rounds — the matched mask / inlier ratio and
            # the H_last information weight must not inherit warm-descent
            # truncation (out-of-reach queries reading unmatched)
            ids, payload = assoc_scan(X, ids, force_full=True)
            H_last, b_last, matched = terms_scan(X, payload, True)
            X = gn_se3_step(X, H_last, b_last)
    elif n_its > 0 and cfg.certify and cfg.certify_prefix:
        # ---- prefix-certified exact schedule (EXPERIMENTAL) ----
        # Measured slower than plain exact on TPU at the flagship
        # config (BENCH_r04; see models/schedules_experimental.py for
        # why it ships anyway). Result-identity with plain exact is
        # pinned by tests/test_pipeline.py::test_certify_prefix_*.
        from madicp_tpu.models.schedules_experimental import (
            prefix_certified_rounds,
        )

        X, H_last, matched, n_descents = prefix_certified_rounds(
            cfg, kf_tree, kf_valid_f, leaves_pts, leaves_valid, X0,
            reduce_terms=reduce_terms, terms_scan=terms_scan,
            kv=kv, nv=nv,
        )
    elif n_its > 0 and cfg.certify:
        # ---- certified exact schedule (see PipelineConfig.certify) ----
        # Every round is a full re-association; entries whose descent
        # result is PROVABLY unchanged (path-margin certificate) skip
        # their gathers. Equality with the plain exact path is pinned by
        # tests/test_pipeline.py::test_certified_matches_plain_exact.
        dinfo = jnp.finfo(dtype)
        r_norm = jnp.linalg.norm(leaves_pts, axis=-1)  # (L,)

        kf_live_k = kf_valid_f > 0  # (K,) — constant within one scan:
        # promotion happens after icp_rounds, so masking dead ring slots
        # out of every descent (they contribute nothing to terms_scan
        # anyway) is result-identical and skips their work entirely

        def assoc_certified(X, uncert):
            """Re-descend uncertified (K, L) entries; certified entries
            park on row 0 (one hot cache line — ~free gathers)."""
            ml = leaves_pts @ X[:3, :3].T + X[:3, 3]

            def per_kf(_, kf):
                tree_fields, unc, live = kf
                nav = SearchTree(*tree_fields).nav
                ids, payload, margin = associate_packed(
                    nav, 0, cfg.depth, ml, leaves_valid & unc & live,
                    return_margin=True, ladder=cfg.assoc_ladder,
                )
                return 0, (ids, payload, margin)

            _, out = jax.lax.scan(
                per_kf, 0, (tuple(kf_tree), uncert, kf_live_k)
            )
            return out  # ids (K,L), payload (K,L,8), margin (K,L)

        def motion_bound(Xa, Xb):
            """EXACT per-leaf displacement ||Xb m - Xa m|| of each
            map-frame query between consecutive rounds — one (L, 3)
            matmul. Summed across rounds it upper-bounds (triangle
            inequality) each query's total displacement since its last
            re-descent, which is what the margin certificate needs.
            Measured ~2-3x tighter than the dt + theta*||m|| rotation
            -angle bound (late-round uncertified tails shrink ~3x,
            NOTES.md).

            SOUNDNESS CONSTRAINT: this budget's own rounding error must
            stay below ``eps_cert`` or near-zero-slack entries get
            unsoundly certified. Plain norm-of-difference arithmetic
            satisfies that (error ~eps x scale); an arccos-based theta
            does NOT — its cancellation near theta=0 carries ~sqrt(eps)
            absolute error (~1e-8 in f64), which silently flipped a few
            associations per scan until the golden regression caught it
            (NOTES.md, round 2). Do not reintroduce trig bounds here."""
            d = leaves_pts @ (Xb[:3, :3] - Xa[:3, :3]).T + (
                Xb[:3, 3] - Xa[:3, 3]
            )
            return jnp.linalg.norm(d, axis=-1)  # (L,)

        def eps_cert(X):
            """fp-safety floor: the side dot-product's rounding noise
            scales with the map-frame coordinate magnitude."""
            t_norm = jnp.linalg.norm(X[:3, 3])
            return 64.0 * dinfo.eps * (1.0 + t_norm + r_norm)  # (L,)

        kf_live = (kf_valid_f > 0)[:, None]  # (K, 1)

        def count_uncert(uncert):
            return jnp.sum(
                uncert & leaves_valid[None, :] & kf_live
            ).astype(jnp.int32)

        U = min(cfg.certify_compact, L) if cfg.certify_compact else 0

        def reassociate(X, uncert, ids, payload, slack):
            """One certified round's re-association: fresh descents for
            the uncertified entries, cached results elsewhere.

            With ``certify_compact`` (= per-KEYFRAME buffer size U) each
            keyframe whose live uncertified count fits compacts those
            leaves into a (U,) buffer and descends ONLY them — the
            parked row-0 gathers of the full sweep are not issued at
            all, and the gather operand stays that keyframe's own arena
            (a flat whole-forest view with per-query base offsets
            measured ~5x SLOWER than the parked sweep on the chip —
            TPU descent gathers pay heavily for a huge operand, NOTES).
            A keyframe whose count overflows U falls back to its full
            parked sweep (sound by construction: no uncertified entry
            is ever skipped)."""
            ml = leaves_pts @ X[:3, :3].T + X[:3, 3]

            def per_kf(_, kf):
                tree_fields, unc, live, ids_k, payload_k, slack_k = kf
                nav = SearchTree(*tree_fields).nav
                # dead ring slots (live=False) compact to ZERO work
                # instead of overflowing U into a full parked sweep
                # every round (they otherwise stay all-uncertified,
                # ADVICE r2)
                need = unc & leaves_valid & live

                def full_kf():
                    ids2, payload2, margin2 = associate_packed(
                        nav, 0, cfg.depth, ml, need, return_margin=True,
                        ladder=cfg.assoc_ladder,
                    )
                    return (
                        jnp.where(need, ids2, ids_k),
                        jnp.where(need[:, None], payload2, payload_k),
                        jnp.where(need, margin2, slack_k),
                    )

                if not U:
                    out = full_kf()
                else:
                    def compact_kf():
                        idx = jnp.nonzero(need, size=U, fill_value=L)[0]
                        live = idx < L
                        ids_u, payload_u, margin_u = associate_packed(
                            nav, 0, cfg.depth,
                            ml[jnp.minimum(idx, L - 1)], live,
                            return_margin=True, ladder=cfg.assoc_ladder,
                        )
                        drop = dict(mode="drop")  # fill idx L is OOB
                        return (
                            ids_k.at[idx].set(ids_u, **drop),
                            payload_k.at[idx].set(payload_u, **drop),
                            slack_k.at[idx].set(margin_u, **drop),
                        )

                    out = jax.lax.cond(
                        jnp.sum(need) <= U, compact_kf, full_kf
                    )
                return 0, out

            _, out = jax.lax.scan(
                per_kf, 0,
                (tuple(kf_tree), uncert, kf_live_k, ids, payload, slack),
            )
            return out

        ones_kl = jnp.ones((K, L), bool)
        ids, payload, slack = assoc_certified(X0, ones_kl)
        n_descents = kv * nv  # round 0: every live entry descends
        if n_its == 1:
            H_last, b_last, matched = terms_scan(X0, payload, True)
            X = gn_se3_step(X0, H_last, b_last)
        else:
            H0, b0 = terms_scan(X0, payload, False)
            X1 = gn_se3_step(X0, H0, b0)

            def one_round(r, carry):
                Xp, X, ids, payload, slack, nd = carry
                slack = slack - motion_bound(Xp, X)[None, :]
                uncert = slack <= eps_cert(X)[None, :]
                ids, payload, slack = reassociate(
                    X, uncert, ids, payload, slack
                )
                H, b = terms_scan(X, payload, False)
                nd = nd + count_uncert(uncert)
                return (X, gn_se3_step(X, H, b), ids, payload, slack, nd)

            Xp, X, ids, payload, slack, n_descents = jax.lax.fori_loop(
                1, n_its - 1, one_round,
                (X0, X1, ids, payload, slack, n_descents),
            )
            # final round: matched flags + H_last for the information
            # weight come from this round's (certified) re-association,
            # like the reference's last-iteration reset (pipeline.cpp:
            # 172-176)
            slack = slack - motion_bound(Xp, X)[None, :]
            uncert = slack <= eps_cert(X)[None, :]
            _, payload, _ = reassociate(X, uncert, ids, payload, slack)
            n_descents = n_descents + count_uncert(uncert)
            H_last, b_last, matched = terms_scan(X, payload, True)
            X = gn_se3_step(X, H_last, b_last)
    elif n_its > 0:
        def one_round(_, X):
            H, b = accumulate(X, with_matched=False)
            return gn_se3_step(X, H, b)

        X = jax.lax.fori_loop(0, n_its - 1, one_round, X0)
        H_last, b_last, matched = accumulate(X, with_matched=True)
        X = gn_se3_step(X, H_last, b_last)
        n_descents = jnp.int32(n_its) * kv * nv  # every round, everything
    else:
        X = X0
        H_last = jnp.zeros((6, 6), dtype)
        matched = jnp.zeros(L, bool)
        n_descents = jnp.zeros((), jnp.int32)
    return X, H_last, matched, n_descents


def odometry_step(
    cfg: PipelineConfig,
    state: PipelineState,
    points,
    valid,
    stamp,
    icp_rounds_fn=None,
) -> tuple[PipelineState, StepOutput]:
    """One full odometry step (reference ``Pipeline::compute``,
    ``pipeline.cpp:125-265``).

    ``icp_rounds_fn(kf_tree, kf_valid, leaves, X0) -> (X, H_last,
    matched)`` may override the whole ICP round loop — the kf-sharded
    path injects a ``shard_map`` + ``psum`` version (built on the same
    :func:`icp_rounds`) so each device only touches its local keyframe
    shard (parallel/sharded_icp.py).
    """
    dtype = cfg.dtype
    hz = jnp.asarray(cfg.sensor_hz, dtype)

    # ---- deskew (pipeline.cpp:137-138, 79-123) ----
    if cfg.deskew:
        do = state.traj_count >= 2
        skewed = deskew_cloud(
            points, state.traj[-2], state.traj[-1], hz,
            valid=valid, mode=cfg.deskew_mode,
        )
        points = jnp.where(do & valid[:, None], skewed, points)

    # ---- current-scan tree (pipeline.cpp:140-144) ----
    tree, _ = build_tree(
        points, valid, depth=cfg.depth, b_max=cfg.b_max, b_min=cfg.b_min
    )
    leaves = get_leaves(tree, cfg.leaves_cap)

    # ---- constant-velocity prediction (pipeline.cpp:146-152) ----
    X0 = state.X @ exp_se3_split(state.velocity / hz)

    # ---- ICP rounds over the keyframe map (pipeline.cpp:166-193) ----
    if icp_rounds_fn is None:
        X, H_last, matched, n_descents = icp_rounds(
            cfg, state.kf_tree, state.kf_valid.astype(dtype),
            leaves.pts, leaves.valid, X0,
        )
    else:
        X, H_last, matched, n_descents = icp_rounds_fn(
            state.kf_tree, state.kf_valid, leaves, X0
        )

    # ---- inlier ratio over final-round matches (pipeline.cpp:197-204) ----
    n_leaves = jnp.sum(leaves.valid)
    ratio = jnp.sum(matched & leaves.valid) / jnp.maximum(n_leaves, 1)
    ratio = ratio.astype(dtype)

    # ---- trajectory + velocity smoothing (pipeline.cpp:206-217) ----
    traj = jnp.concatenate([state.traj[1:], X[None]], axis=0)
    traj_count = state.traj_count + 1
    from madicp_tpu.models.vel_estimator import estimate_velocity

    velocity = estimate_velocity(state.velocity, traj, traj_count, 1.0 / hz)

    # ---- frame record (pipeline.cpp:219-232) ----
    weight = neg_logdet(H_last)
    tree_map_frame = transform_tree(tree, X[:3, :3], X[:3, 3])
    fr_tree = _set_slot(state.fr_tree, state.fr_head, tree_map_frame)
    fr_valid = state.fr_valid.at[state.fr_head].set(True)
    fr_weight = state.fr_weight.at[state.fr_head].set(weight)
    fr_seq = state.fr_seq.at[state.fr_head].set(state.seq)
    fr_pose = state.fr_pose.at[state.fr_head].set(X)
    fr_head = (state.fr_head + 1) % FRAME_WINDOW

    # ---- keyframe promotion (pipeline.cpp:234-262) ----
    # The tree datapath (a ~29 MB window-slot gather + ring write) lives
    # under a lax.cond: most scans do not promote, and the skip branch
    # aliases the rings instead of copying them.
    promote = ratio < cfg.p_th
    masked_w = jnp.where(fr_valid, fr_weight, jnp.inf)
    best = jnp.argmin(masked_w).astype(jnp.int32)
    best_seq = fr_seq[best]
    kf_slot = state.kf_head

    def do_promote():
        best_tree = jax.tree.map(lambda a: a[best], fr_tree)
        return (
            _set_slot(state.kf_tree, kf_slot, best_tree),
            state.kf_valid.at[kf_slot].set(True),
            (state.kf_head + 1) % cfg.num_keyframes,
            # drop window frames at or before the promoted one
            # (pipeline.cpp:246-251)
            fr_valid & (fr_seq > best_seq),
            fr_pose[best],
            best_seq,
        )

    def no_promote():
        return (
            state.kf_tree,
            state.kf_valid,
            state.kf_head,
            fr_valid,
            state.keyframe_to_map,
            state.seq_keyframe,
        )

    (kf_tree, kf_valid, kf_head, fr_valid, keyframe_to_map, seq_keyframe
     ) = jax.lax.cond(promote, do_promote, no_promote)

    new_state = PipelineState(
        X=X,
        velocity=velocity,
        traj=traj,
        traj_count=traj_count,
        kf_tree=kf_tree,
        kf_valid=kf_valid,
        kf_head=kf_head,
        keyframe_to_map=keyframe_to_map,
        fr_tree=fr_tree,
        fr_valid=fr_valid,
        fr_weight=fr_weight,
        fr_seq=fr_seq,
        fr_pose=fr_pose,
        fr_head=fr_head,
        seq=state.seq + 1,
        seq_keyframe=seq_keyframe,
    )
    out = StepOutput(
        pose=X,
        inlier_ratio=ratio,
        map_updated=promote,
        n_leaves=n_leaves.astype(jnp.int32),
        leaves_pts=leaves.pts @ X[:3, :3].T + X[:3, 3],
        leaves_valid=leaves.valid,
        n_leaves_dropped=jnp.maximum(
            leaves.total - cfg.leaves_cap, 0
        ).astype(jnp.int32),
        n_descents=n_descents,
    )
    return new_state, out


def _pipeline_step_impl(cfg: PipelineConfig, state: PipelineState, points, valid, stamp,
                        icp_rounds_fn=None):
    """Dispatch: first scan initialises, later scans run full odometry."""
    return jax.lax.cond(
        state.seq == 0,
        lambda: initialize_step(cfg, state, points, valid, stamp),
        lambda: odometry_step(cfg, state, points, valid, stamp, icp_rounds_fn),
    )


pipeline_step = partial(jax.jit, static_argnames=("cfg",))(_pipeline_step_impl)

# The Pipeline class owns its state and never reuses the previous step's,
# so it donates the (~1 GB of keyframe/frame rings) input state — XLA then
# updates the ring slots in place instead of copying every buffer each scan.
_pipeline_step_donated = jax.jit(
    _pipeline_step_impl, static_argnames=("cfg",), donate_argnums=(1,)
)

# The host API dispatches the first-scan bootstrap and the odometry step
# as SEPARATE jits (a host-side branch on a Python flag): wrapping both
# in one lax.cond makes every later scan carry the initialize branch and
# its cond-boundary handling of the donated rings. The cond-based
# _pipeline_step_impl remains for traced contexts (compute_batch's scan,
# the sharded step).
_initialize_step_donated = jax.jit(
    initialize_step, static_argnames=("cfg",), donate_argnums=(1,)
)
_odometry_step_donated = jax.jit(
    odometry_step, static_argnames=("cfg",), donate_argnums=(1,)
)


def _pipeline_chunk_impl(cfg: PipelineConfig, state: PipelineState,
                         stamps, pts, valid):
    """C odometry steps as one compiled ``lax.scan`` over the chunk axis."""

    def body(st, xs):
        s, p, v = xs
        return _pipeline_step_impl(cfg, st, p, v, s)

    return jax.lax.scan(body, state, (stamps, pts, valid))


_pipeline_chunk_donated = jax.jit(
    _pipeline_chunk_impl, static_argnames=("cfg",), donate_argnums=(1,)
)


def _warn_if_matmul_precision_degraded() -> None:
    """Warn when the global matmul precision has been downgraded AFTER
    ``import madicp_tpu`` installed the ``highest`` default.

    On TPU, f32 matmuls at the default/bf16 tier run as ONE bf16 pass,
    which carries gate-magnitude geometry error (up to 0.24 m point-
    transform error at 40 m range, r4 measurement — NOTES.md "TPU matmul
    precision") and silently corrupts the certificate's motion budgets.
    The import-time override only fires when the knob is unset, so an
    embedding application that sets a bf16 tier after importing would
    otherwise reintroduce the bug with nothing detecting it (ADVICE r4).
    """
    prec = jax.config.jax_default_matmul_precision
    if prec in ("highest", "float32", "F32_F32_F32"):
        return
    import warnings

    warnings.warn(
        "madicp_tpu: jax_default_matmul_precision is "
        f"{prec!r}; on TPU this lowers f32 matmuls to bf16 passes and "
        "corrupts point-transform geometry by up to the association-gate "
        "magnitude (~0.24 m at 40 m range). Set it to 'highest' (the "
        "madicp_tpu import-time default) for correct odometry.",
        RuntimeWarning,
        stacklevel=3,
    )


class Pipeline:
    """Host-facing odometry engine (API parity with the reference
    ``pypeline.Pipeline``, ``pypeline.cpp:52-75``)."""

    def __init__(
        self,
        sensor_hz: float,
        deskew: bool,
        b_max: float,
        rho_ker: float,
        p_th: float,
        b_min: float,
        b_ratio: float,
        num_keyframes: int,
        num_threads: int = 0,   # API parity; unused on TPU
        realtime: bool = False,  # measured, not enforced (SURVEY.md §7)
        *,
        n_points: int = 131072,
        depth: int = 16,
        max_leaves: int = 0,
        max_icp_iterations: int = MAX_ICP_ITS,
        dtype=jnp.float32,
        assoc_mode: str = "exact",
        reassoc_every: int = 7,
        reassoc_backup: int = 0,
        deskew_mode: str = "reference",
        realtime_recal_every: int = 32,
        certify: bool = True,
        certify_compact: int = 0,
        certify_prefix: int = 0,
        assoc_ladder: int = 3,
    ):
        del num_threads
        _warn_if_matmul_precision_degraded()
        self.cfg = PipelineConfig(
            sensor_hz=float(sensor_hz),
            deskew=bool(deskew),
            deskew_mode=str(deskew_mode),
            b_max=float(b_max),
            rho_ker=float(rho_ker),
            p_th=float(p_th),
            b_min=float(b_min),
            b_ratio=float(b_ratio),
            num_keyframes=int(num_keyframes),
            n_points=int(n_points),
            depth=int(depth),
            max_leaves=int(max_leaves),
            max_icp_iterations=int(max_icp_iterations),
            dtype=dtype,
            assoc_mode=str(assoc_mode),
            reassoc_every=int(reassoc_every),
            reassoc_backup=int(reassoc_backup),
            certify=bool(certify),
            certify_compact=int(certify_compact),
            certify_prefix=int(certify_prefix),
            assoc_ladder=int(assoc_ladder),
        )
        self.realtime = bool(realtime)
        self.state = init_state(self.cfg)
        self._last: Optional[StepOutput] = None
        # host-side first-scan flag (see _dispatch_step)
        self._initialized = False
        # anytime-realtime calibration (see compute())
        self._rt_scans = 0
        self._rt_calibrated = not self.realtime
        self._rt_every = max(1, int(realtime_recal_every))
        self._rt_its_max = int(max_icp_iterations)
        # warm-config tracking: a recalibration only times a program
        # that has already dispatched once (see compute_device)
        self._rt_cfg_warm = False
        self._rt_pending = False
        self._now = None  # injectable clock (tests)

    # -- main entry ---------------------------------------------------------
    def compute(self, stamp: float, points: np.ndarray) -> None:
        """Process one scan (reference ``Pipeline::compute``).

        With ``realtime=True`` the reference breaks out of the ICP loop
        when the wall-clock budget ``1/sensor_hz - 5 ms`` runs out
        (``pipeline.cpp:62,166-169``) — host control flow that cannot
        live inside a compiled TPU step. The equivalent here is a
        one-time calibration: the steady-state step is timed (with a
        hard device sync) right after compilation, and the iteration
        count is rescaled so the step fits the budget; the step is then
        re-jitted once with the new static count.
        """
        self.compute_device(stamp, *self.stage(points))

    def stage(self, points: np.ndarray):
        """Pad a cloud and start its host->device transfer.

        Returns ``(pts, valid, n_dropped)`` for :meth:`compute_device`
        (``n_dropped`` is a host int — points beyond the static
        ``n_points`` capacity, truncated in input order). Call from a
        prefetch thread to overlap the (measured ~9 ms/scan on a
        tunneled TPU host) input transfer with the previous scan's
        device step.
        """
        pts, valid, n_dropped = self._pad(points)
        return jnp.asarray(pts), jnp.asarray(valid), n_dropped

    def compute_device(self, stamp: float, pts, valid, n_dropped: int = 0) -> None:
        """Process a scan already padded and staged on device (see
        :meth:`stage`); otherwise identical to :meth:`compute`."""
        self._n_points_dropped = int(n_dropped)
        due = (
            self.realtime
            and self._rt_scans >= 2
            and (
                (self._rt_scans - 2) % self._rt_every == 0
                or self._rt_pending
            )
        )
        if due:
            if not self._rt_cfg_warm:
                # The current iteration count has never dispatched: its
                # first dispatch pays tracing + XLA compile, which must
                # NOT be timed as a step (a remote-TPU compile is
                # ~1000x a step — timing it collapses the budget to 1
                # and every subsequent recount recompiles; observed r5
                # on chip). Process this scan normally to warm the
                # program; recalibrate on the next scan instead.
                self._rt_pending = True
                self._dispatch_step(pts, valid, stamp)
                self._rt_scans += 1
                return
            self._rt_pending = False
            self._calibrate_realtime(pts, valid, stamp)
            self._rt_scans += 1
            return
        self._dispatch_step(pts, valid, stamp)
        self._rt_scans += 1

    def _dispatch_step(self, pts, valid, stamp) -> None:
        """Host-side first-scan/odometry branch (see the jit notes above
        ``_initialize_step_donated``)."""
        self._rt_cfg_warm = True  # current config's program dispatched
        stamp = jnp.asarray(stamp, self.cfg.dtype)
        if self._initialized:
            self.state, self._last = _odometry_step_donated(
                self.cfg, self.state, pts, valid, stamp
            )
        else:
            self.state, self._last = _initialize_step_donated(
                self.cfg, self.state, pts, valid, stamp
            )
            self._initialized = True

    def compute_batch(self, stamps, clouds) -> np.ndarray:
        """Process a chunk of scans in ONE device dispatch.

        ``stamps`` is a length-C sequence of floats, ``clouds`` a length-C
        sequence of (Ni, 3) arrays. The chunk runs as a single compiled
        ``lax.scan`` over the scans. Per-scan results land in the same
        accessors as ``compute`` (holding the LAST scan of the chunk);
        returns the (C, 4, 4) chunk poses.

        .. note:: **Not a throughput mode.** Measured on TPU v5e at the
           flagship config, chunked dispatch WORSENS device time per scan
           ~35%: the keyframe-ring donation/aliasing that makes the
           per-scan step update its ~1 GB of rings in place is defeated
           inside the ``lax.scan`` body, so every chunk iteration copies
           the rings (NOTES.md, measured negative result). The ~30-50 ms
           per-dispatch RPC saving on tunneled hosts does not pay for
           that at realistic chunk sizes. Use :meth:`compute` (with
           :meth:`stage` on a prefetch thread) for throughput; this API
           exists for offline convenience and API completeness only.

        With ``realtime=True`` the anytime budget is a per-scan host
        decision, so chunking is refused until the one-time calibration
        has completed (run a few scans through ``compute`` first); after
        calibration the budget lives in the static iteration count and
        chunking is safe.
        """
        if self.realtime and not self._rt_calibrated:
            raise RuntimeError(
                "compute_batch is an offline/throughput API; "
                "realtime mode processes scan-by-scan via compute()"
            )
        C = len(stamps)
        assert len(clouds) == C and C >= 1
        pts = np.zeros((C, self.cfg.n_points, 3), np.dtype(self.cfg.dtype))
        val = np.zeros((C, self.cfg.n_points), bool)
        self._n_points_dropped = 0
        for i, cloud in enumerate(clouds):
            pts[i], val[i], nd = self._pad(cloud)
            self._n_points_dropped += nd
        self.state, outs = _pipeline_chunk_donated(
            self.cfg,
            self.state,
            jnp.asarray(np.asarray(stamps, np.dtype(self.cfg.dtype))),
            jnp.asarray(pts),
            jnp.asarray(val),
        )
        self._last = jax.tree.map(lambda a: a[-1], outs)
        self._initialized = True  # the chunk's traced cond bootstrapped
        self._rt_scans += C
        return np.asarray(outs.pose)

    def _calibrate_realtime(self, pts, valid, stamp) -> None:
        """Rolling anytime-budget calibration: time one synced
        steady-state step and rescale the ICP iteration budget to fit.

        The reference re-checks its wall-clock budget every ICP
        iteration of every scan (``pipeline.cpp:166-169``); a compiled
        TPU step cannot branch on the host clock mid-loop, so the
        equivalent is this rolling recalibration every
        ``realtime_recal_every`` scans: the step is re-timed (hard
        device sync both sides), the iteration count SHRINKS when the
        budget is blown and is RESTORED toward the configured maximum
        when headroom returns (load epochs on shared/tunneled chips move
        step time ~1.6x — NOTES.md). Each distinct count compiles once
        and then hits the jit cache, so oscillating load does not
        re-pay compilation.
        """
        import time as _time

        now = self._now or _time.perf_counter
        jax.device_get(self.state.X)  # drain the queue
        t0 = now()
        self._dispatch_step(pts, valid, stamp)
        jax.device_get(self.state.X)
        step_s = now() - t0

        budget_s = 1.0 / self.cfg.sensor_hz - 0.005  # 5 ms reserve, as ref
        its = self.cfg.max_icp_iterations
        # cost ~ linear in the iteration count with the remainder
        # (build/bookkeeping) as a fixed floor of ~2 rounds' worth
        cand = int(its * budget_s / max(step_s, 1e-9)) - 2
        cand = max(1, min(self._rt_its_max, cand))
        if step_s > budget_s and cand < its:
            new_its = cand
        elif step_s < 0.8 * budget_s and cand > its:
            # restore gradually (the linear model extrapolates badly far
            # from the measured point; converges in a few recals)
            new_its = min(cand, its + 4)
        else:
            new_its = its
        if new_its != its:
            import dataclasses

            self.cfg = dataclasses.replace(
                self.cfg, max_icp_iterations=new_its
            )
            # the new count's program hasn't compiled yet: defer the
            # next recalibration until one normal dispatch warms it
            self._rt_cfg_warm = False
        self._rt_calibrated = True

    def _pad(self, points: np.ndarray):
        """Pad a cloud to the static shape; returns HOST arrays plus the
        count of points truncated by the capacity (the reference never
        drops input, ``pipeline.cpp:125-144`` — a nonzero count means
        ``n_points`` is too small for this sensor/scene and must be
        raised; surfaced via :meth:`points_dropped` and a CLI warning,
        mirroring ``leaves_dropped``)."""
        points = np.asarray(points)
        n = points.shape[0]
        N = self.cfg.n_points
        n_dropped = max(0, n - N)
        if n > N:
            points = points[:N]
            n = N
        pts = np.zeros((N, 3), dtype=np.dtype(self.cfg.dtype))
        pts[:n] = points
        valid = np.zeros(N, bool)
        valid[:n] = True
        return pts, valid, n_dropped

    # -- accessors (reference pipeline.h:60-71, pipeline.cpp:286-308) -------
    def current_pose(self) -> np.ndarray:
        return np.asarray(self.state.X)

    def keyframe_pose(self) -> np.ndarray:
        return np.asarray(self.state.keyframe_to_map)

    def current_id(self) -> int:
        return int(self.state.seq)

    def keyframe_id(self) -> int:
        return int(self.state.seq_keyframe)

    def is_initialized(self) -> bool:
        return int(self.state.seq) > 0

    def is_map_updated(self) -> bool:
        return bool(np.asarray(self._last.map_updated)) if self._last else False

    def inlier_ratio(self) -> float:
        return float(np.asarray(self._last.inlier_ratio)) if self._last else 0.0

    def descents(self) -> int:
        """(valid-keyframe, valid-leaf) tree descents the last scan's ICP
        actually walked. With the certified exact schedule this collapses
        toward one full round's worth (K x n_leaves) as GN converges —
        the measurable evidence that the certificate is doing its job;
        the plain exact schedule reports rounds x K x n_leaves."""
        return int(np.asarray(self._last.n_descents)) if self._last else 0

    def leaves_dropped(self) -> int:
        """Leaves of the current scan dropped by the static ``max_leaves``
        capacity (the reference never drops, ``mad_tree.cpp:154-163``);
        nonzero means the configured capacity is too small for the scene."""
        return (
            int(np.asarray(self._last.n_leaves_dropped)) if self._last else 0
        )

    def points_dropped(self) -> int:
        """Input points truncated by the static ``n_points`` capacity
        (the reference ingests every point, ``pipeline.cpp:125-144``);
        nonzero means ``n_points`` is too small for this sensor and
        scans entered the pipeline incomplete — raise ``--n-points``.
        Scope: the last :meth:`compute`/:meth:`compute_device` scan, or
        the SUM over the whole chunk after :meth:`compute_batch`
        (unlike the other accessors, which report the chunk's final
        scan)."""
        return getattr(self, "_n_points_dropped", 0)

    def current_leaves(self) -> np.ndarray:
        """Current-scan leaf points in the map frame (viewer accessor)."""
        if self._last is None:
            return np.zeros((0, 3))
        pts = np.asarray(self._last.leaves_pts)
        return pts[np.asarray(self._last.leaves_valid)]

    def model_leaves(self) -> np.ndarray:
        """All keyframe leaf points (viewer accessor)."""
        kf = self.state.kf_tree
        flag = np.asarray(kf.is_leaf & kf.is_real)
        kf_valid = np.asarray(self.state.kf_valid)
        flag = flag & kf_valid[:, None]
        return np.asarray(kf.repr)[flag]

    # reference-style aliases
    currentPose = current_pose
    keyframePose = keyframe_pose
    currentID = current_id
    keyframeID = keyframe_id
    isMapUpdated = is_map_updated
    currentLeaves = current_leaves
    modelLeaves = model_leaves
