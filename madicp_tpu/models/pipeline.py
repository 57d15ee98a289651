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
    gn_se3_step,
    icp_terms,
    neg_logdet,
)
from madicp_tpu.ops.lie import exp_se3_split
from madicp_tpu.ops.tree import (
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


def _empty_tree(cfg: PipelineConfig, lead: tuple = ()) -> SearchTree:
    M = cfg.arena
    return SearchTree(nav=jnp.zeros(lead + (M, 64), cfg.dtype))


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
    )
    return state, out


def odometry_step(
    cfg: PipelineConfig,
    state: PipelineState,
    points,
    valid,
    stamp,
    accumulate_fn=None,
) -> tuple[PipelineState, StepOutput]:
    """One full odometry step (reference ``Pipeline::compute``,
    ``pipeline.cpp:125-265``).

    ``accumulate_fn(kf_tree, kf_valid, leaves, X, with_matched)`` may
    override how one association/accumulation pass over the keyframe map
    is computed — the kf-sharded path injects a ``shard_map`` + ``psum``
    version here (parallel/sharded_icp.py) so each device only touches
    its local keyframes.
    """
    dtype = cfg.dtype
    hz = jnp.asarray(cfg.sensor_hz, dtype)

    # ---- deskew (pipeline.cpp:137-138, 79-123) ----
    if cfg.deskew:
        do = state.traj_count >= 2
        skewed = deskew_cloud(points, state.traj[-2], state.traj[-1], hz)
        points = jnp.where(do, skewed, points)

    # ---- current-scan tree (pipeline.cpp:140-144) ----
    tree, _ = build_tree(
        points, valid, depth=cfg.depth, b_max=cfg.b_max, b_min=cfg.b_min
    )
    leaves = get_leaves(tree, cfg.leaves_cap)

    # ---- constant-velocity prediction (pipeline.cpp:146-152) ----
    X0 = state.X @ exp_se3_split(state.velocity / hz)

    # ---- ICP rounds over the keyframe map (pipeline.cpp:166-193) ----
    # Keyframes are processed with a sequential lax.scan rather than a
    # vmap: the descent gathers then hit one keyframe's ~34 MB node table
    # at a time instead of interleaving across the whole ring, which
    # measures ~4x faster on v5e — HBM gather cost grows with the gather
    # operand size, so one big (K*M, 64) forest table is NOT an option
    # (measured ~10x slower) and the per-keyframe dynamic-slice the scan
    # makes is the cheaper evil. The reduction over keyframes is the
    # OpenMP-adder analog (mad_icp.cpp:100-110); under kf-sharding each
    # device scans its local keyframes and a psum completes the sum
    # (parallel/sharded_icp.py).
    kf_valid_f = state.kf_valid.astype(dtype)

    def accumulate_local(X, with_matched: bool):
        """One association+accumulation pass over all keyframes."""

        def per_kf(acc, kf):
            tree_fields, v = kf
            terms = icp_terms(
                SearchTree(*tree_fields),
                leaves.pts,
                leaves.valid,
                X,
                b_max=cfg.b_max,
                b_ratio=cfg.b_ratio,
                rho_ker=cfg.rho_ker,
            )
            out = (acc[0] + terms.H * v, acc[1] + terms.b * v)
            if with_matched:
                out += (acc[2] | (terms.matched & (v > 0)),)
            return out, None

        acc0 = (jnp.zeros((6, 6), dtype), jnp.zeros((6,), dtype))
        if with_matched:
            acc0 += (jnp.zeros(cfg.leaves_cap, bool),)
        acc, _ = jax.lax.scan(per_kf, acc0, (tuple(state.kf_tree), kf_valid_f))
        return acc

    if accumulate_fn is None:
        accumulate = accumulate_local
    else:
        def accumulate(X, with_matched: bool):
            return accumulate_fn(
                state.kf_tree, state.kf_valid, leaves, X, with_matched
            )

    # the reference resets `matched` only before the LAST iteration
    # (pipeline.cpp:172-176), so the inlier ratio and the information
    # weight come from the final association/H only — earlier rounds
    # skip that bookkeeping entirely.
    if cfg.max_icp_iterations > 0:
        def one_round(_, X):
            H, b = accumulate(X, with_matched=False)
            return gn_se3_step(X, H, b)

        X = jax.lax.fori_loop(0, cfg.max_icp_iterations - 1, one_round, X0)
        H_last, b_last, matched = accumulate(X, with_matched=True)
        X = gn_se3_step(X, H_last, b_last)
    else:
        X = X0
        H_last = jnp.zeros((6, 6), dtype)
        matched = jnp.zeros(cfg.leaves_cap, bool)

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
    promote = ratio < cfg.p_th
    masked_w = jnp.where(fr_valid, fr_weight, jnp.inf)
    best = jnp.argmin(masked_w).astype(jnp.int32)
    best_seq = fr_seq[best]
    best_tree = jax.tree.map(lambda a: a[best], fr_tree)
    kf_slot = state.kf_head
    cur_kf = jax.tree.map(lambda a: a[kf_slot], state.kf_tree)
    new_kf_val = jax.tree.map(
        lambda b_, c: jnp.where(promote, b_, c), best_tree, cur_kf
    )
    kf_tree = _set_slot(state.kf_tree, kf_slot, new_kf_val)
    kf_valid = state.kf_valid.at[kf_slot].set(
        jnp.where(promote, True, state.kf_valid[kf_slot])
    )
    kf_head = jnp.where(
        promote, (state.kf_head + 1) % cfg.num_keyframes, state.kf_head
    )
    # drop window frames at or before the promoted one (pipeline.cpp:246-251)
    fr_valid = jnp.where(promote, fr_valid & (fr_seq > best_seq), fr_valid)
    keyframe_to_map = jnp.where(promote, fr_pose[best], state.keyframe_to_map)
    seq_keyframe = jnp.where(promote, best_seq, state.seq_keyframe)

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
    )
    return new_state, out


def _pipeline_step_impl(cfg: PipelineConfig, state: PipelineState, points, valid, stamp,
                        accumulate_fn=None):
    """Dispatch: first scan initialises, later scans run full odometry."""
    return jax.lax.cond(
        state.seq == 0,
        lambda: initialize_step(cfg, state, points, valid, stamp),
        lambda: odometry_step(cfg, state, points, valid, stamp, accumulate_fn),
    )


pipeline_step = partial(jax.jit, static_argnames=("cfg",))(_pipeline_step_impl)

# The Pipeline class owns its state and never reuses the previous step's,
# so it donates the (~1 GB of keyframe/frame rings) input state — XLA then
# updates the ring slots in place instead of copying every buffer each scan.
_pipeline_step_donated = jax.jit(
    _pipeline_step_impl, static_argnames=("cfg",), donate_argnums=(1,)
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
    ):
        del num_threads
        self.cfg = PipelineConfig(
            sensor_hz=float(sensor_hz),
            deskew=bool(deskew),
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
        )
        self.realtime = bool(realtime)
        self.state = init_state(self.cfg)
        self._last: Optional[StepOutput] = None
        # anytime-realtime calibration (see compute())
        self._rt_scans = 0
        self._rt_calibrated = not self.realtime
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
        pts, valid = self._pad(points)
        if not self._rt_calibrated and self._rt_scans >= 2:
            self._calibrate_realtime(pts, valid, stamp)
            self._rt_scans += 1
            return
        self.state, self._last = _pipeline_step_donated(
            self.cfg, self.state, pts, valid, jnp.asarray(stamp, self.cfg.dtype)
        )
        self._rt_scans += 1

    def _calibrate_realtime(self, pts, valid, stamp) -> None:
        """Time one synced steady-state step; shrink the ICP budget to fit."""
        import time as _time

        now = self._now or _time.perf_counter
        jax.device_get(self.state.X)  # drain the queue
        t0 = now()
        self.state, self._last = _pipeline_step_donated(
            self.cfg, self.state, pts, valid, jnp.asarray(stamp, self.cfg.dtype)
        )
        jax.device_get(self.state.X)
        step_s = now() - t0

        budget_s = 1.0 / self.cfg.sensor_hz - 0.005  # 5 ms reserve, as ref
        its = self.cfg.max_icp_iterations
        if step_s > budget_s and its > 1:
            # assume cost ~ linear in the iteration count with the
            # remainder (build/bookkeeping) as a fixed floor of ~2 rounds
            new_its = max(1, int(its * budget_s / step_s) - 2)
            if new_its < its:
                import dataclasses

                self.cfg = dataclasses.replace(
                    self.cfg, max_icp_iterations=new_its
                )
        self._rt_calibrated = True

    def _pad(self, points: np.ndarray):
        points = np.asarray(points)
        n = points.shape[0]
        N = self.cfg.n_points
        if n > N:
            points = points[:N]
            n = N
        pts = np.zeros((N, 3), dtype=np.dtype(self.cfg.dtype))
        pts[:n] = points
        valid = np.zeros(N, bool)
        valid[:n] = True
        return jnp.asarray(pts), jnp.asarray(valid)

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
