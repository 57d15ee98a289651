"""Keyframe-sharded ICP: explicit ``shard_map`` + ``psum`` over ICI.

This is the TPU-native replacement of the reference's OpenMP keyframe loop
(``pipeline.cpp:180-185``): every chip owns ``K/n_kf`` keyframe trees,
computes its partial normal equations with the same fused batched kernel
as the single-chip path, and a single ``psum`` of (6x6 + 6) floats per GN
round reduces them over the ``kf`` mesh axis — a trivially cheap collective
that lets the local-map size grow with the pod.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from madicp_tpu.models.pipeline import (
    PipelineConfig,
    PipelineState,
    pipeline_step,
)
from madicp_tpu.ops.icp_core import icp_terms
from madicp_tpu.ops.tree import SearchTree


def icp_round_sharded(
    mesh: Mesh,
    kf_tree: SearchTree,
    kf_valid: jnp.ndarray,
    leaves_pts: jnp.ndarray,
    leaves_valid: jnp.ndarray,
    X: jnp.ndarray,
    *,
    b_max,
    b_ratio,
    rho_ker,
):
    """One association+accumulation round with the keyframe axis sharded.

    Standalone single-round utility (building block / reference for the
    collective layout). The full pipeline does NOT call this per round —
    :func:`make_sharded_pipeline_step` wraps the whole round schedule
    (``models.pipeline.icp_rounds``) in one ``shard_map``; keep gate or
    weight changes in ``ops.icp_core``, which both paths share.

    Returns globally-reduced ``(H, b, matched)``; ``matched`` is the any-
    keyframe match mask of the moving leaves (an OR-reduction over ``kf``).
    """

    def local(kf_tree, kf_valid, leaves_pts, leaves_valid, X):
        dtype = leaves_pts.dtype
        L = leaves_pts.shape[0]

        # sequential over the local keyframes (gather-locality, see
        # models/pipeline.py accumulate), psum over the kf mesh axis
        def per_kf(acc, kf):
            tree_fields, v = kf
            terms = icp_terms(
                SearchTree(*tree_fields), leaves_pts, leaves_valid, X,
                b_max=b_max, b_ratio=b_ratio, rho_ker=rho_ker,
            )
            return (
                acc[0] + terms.H * v,
                acc[1] + terms.b * v,
                acc[2] | (terms.matched & (v > 0)),
            ), None

        acc0 = (jnp.zeros((6, 6), dtype), jnp.zeros((6,), dtype),
                jnp.zeros(L, bool))
        (H, b, matched), _ = jax.lax.scan(
            per_kf, acc0, (tuple(kf_tree), kf_valid.astype(dtype))
        )
        H = jax.lax.psum(H, "kf")
        b = jax.lax.psum(b, "kf")
        matched = jax.lax.psum(matched.astype(jnp.int32), "kf") > 0
        return H, b, matched

    kf_spec = jax.tree.map(lambda _: P("kf"), kf_tree)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(kf_spec, P("kf"), P(), P(), P()),
        out_specs=(P(), P(), P()),
        # the descent loop carry starts replicated and becomes kf-varying;
        # skip the static vma check (equivalence is covered by tests)
        check_vma=False,
    )(kf_tree, kf_valid, leaves_pts, leaves_valid, X)


def make_sharded_pipeline_step(
    cfg: PipelineConfig, mesh: Mesh, shard_points: bool = False
):
    """Jit the full pipeline step with the keyframe map sharded over ``kf``.

    The whole ICP round loop inside the step runs under one ``shard_map``
    (:func:`madicp_tpu.models.pipeline.icp_rounds` with a psum reduction
    hook): each device runs the association — in either association
    schedule, exact or fast — against ONLY its local keyframe shard, and
    a 6x6+6 psum per GN round crosses ICI. (Leaving the sequential
    keyframe scan to GSPMD would instead all-gather the ~29 MB node
    tables every round.) By default everything else in the step — tree
    build, leaf extraction, promotion — is replicated work.

    ``shard_points=True`` additionally shards the INPUT CLOUD's point
    axis over ``kf``, so the per-scan tree build — the dominant
    replicated aux item and therefore the kf-axis Amdahl ceiling
    (NOTES cost model: step ≈ 122/d + 15 ms) — becomes points-parallel
    under GSPMD: each device scatter-adds its N/d points' moments and
    the small per-level node tables are all-reduced (verified on the
    virtual 8-device mesh: the partitioned build lowers with ZERO
    all-gathers and one all-reduce per level table, r5). The built tree
    comes out replicated, so the shard_map'd round loop is unchanged.
    Results differ from the replicated build only by partial-sum order
    (f32 reassociation noise; pinned by tests/test_parallel.py at
    tolerance, NOT bitwise — leave the default off where bitwise parity
    with the single-chip path matters). Callers must place ``points``
    and ``valid`` with ``NamedSharding(mesh, P("kf"))`` on the point
    axis (``place_inputs`` below does it).

    Returns ``(step, place_state, place_inputs)`` where ``place_inputs
    (points, valid, stamp)`` builds correctly-placed global arrays for
    one scan under either setting.
    """
    from madicp_tpu.parallel.mesh import state_shardings
    from madicp_tpu.models.pipeline import (
        _pipeline_step_impl,
        icp_rounds,
        init_state,
    )

    proto = jax.eval_shape(lambda: init_state(cfg))
    shardings = state_shardings(mesh, proto)
    rep = NamedSharding(mesh, P())
    pts_spec = NamedSharding(mesh, P("kf")) if shard_points else rep

    def psum_terms(t):
        out = (jax.lax.psum(t[0], "kf"), jax.lax.psum(t[1], "kf"))
        if len(t) == 3:
            out += (jax.lax.psum(t[2].astype(jnp.int32), "kf") > 0,)
        return out

    def sharded_rounds(kf_tree, kf_valid, leaves, X0):
        def local(kf_tree, kf_valid, leaves_pts, leaves_valid, X0):
            X, H_last, matched, n_desc = icp_rounds(
                cfg, kf_tree, kf_valid.astype(cfg.dtype),
                leaves_pts, leaves_valid, X0, reduce_terms=psum_terms,
            )
            # descent counts are per-shard; report the global total
            return X, H_last, matched, jax.lax.psum(n_desc, "kf")

        kf_spec = jax.tree.map(lambda _: P("kf"), kf_tree)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(kf_spec, P("kf"), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            # descent carries start replicated and become kf-varying;
            # skip the static vma check (equivalence covered by tests)
            check_vma=False,
        )(kf_tree, kf_valid, leaves.pts, leaves.valid, X0)

    step = jax.jit(
        partial(_pipeline_step_impl, cfg, icp_rounds_fn=sharded_rounds),
        in_shardings=(shardings, pts_spec, pts_spec, rep),
        out_shardings=(shardings, rep),
    )

    from madicp_tpu.parallel.mesh import make_global

    def place_state(state: PipelineState) -> PipelineState:
        # leaf-wise: device_put cannot target non-addressable devices,
        # so cross-process meshes build each global array from the
        # locally-held full value (parallel/mesh.py::make_global)
        return jax.tree.map(
            lambda a, s: make_global(np.asarray(a), s), state, shardings
        )

    def place_inputs(points, valid, stamp):
        """Global arrays for one scan, matching the step's in_shardings
        (points/valid sharded over ``kf`` when ``shard_points``)."""
        return (
            make_global(np.asarray(points), pts_spec),
            make_global(np.asarray(valid), pts_spec),
            make_global(np.asarray(stamp), rep),
        )

    return step, place_state, place_inputs
