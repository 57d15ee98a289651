import numpy as np
import jax
import jax.numpy as jnp

from madicp_tpu.models.pipeline import (
    Pipeline,
    PipelineConfig,
    init_state,
    pipeline_step,
)
from madicp_tpu.parallel import (
    Fleet,
    icp_round_sharded,
    make_mesh,
    make_sharded_pipeline_step,
)
from madicp_tpu.ops.tree import build_tree
from madicp_tpu.ops.icp_core import icp_terms
from tests_fixtures_helper import synthetic_room_scans


CFG = PipelineConfig(
    sensor_hz=10.0,
    num_keyframes=4,
    n_points=2048,
    depth=11,
    dtype=jnp.float64,
)


def _pad(scan, n):
    pts = np.zeros((n, 3))
    pts[: len(scan)] = scan[:n]
    valid = np.zeros(n, bool)
    valid[: len(scan)] = True
    return jnp.asarray(pts), jnp.asarray(valid)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_icp_round_sharded_matches_local(rng, four_walls):
    mesh = make_mesh(kf=4, seq=1)
    pts, valid = _pad(four_walls, 8192)
    tree, _ = build_tree(pts, valid, depth=13, b_max=0.2, b_min=0.1)
    kf_tree = jax.tree.map(lambda a: jnp.stack([a] * 4), tree)
    kf_valid = jnp.array([True, True, True, False])
    q = jnp.asarray(four_walls[:256] + rng.normal(size=(256, 3)) * 0.01)
    qv = jnp.ones(256, bool)
    X = jnp.eye(4)

    H_s, b_s, m_s = icp_round_sharded(
        mesh, kf_tree, kf_valid, q, qv, X, b_max=0.2, b_ratio=0.02, rho_ker=0.1
    )

    terms = jax.vmap(
        lambda t: icp_terms(t, q, qv, X, b_max=0.2, b_ratio=0.02, rho_ker=0.1)
    )(kf_tree)
    w = kf_valid.astype(q.dtype)
    H_l = jnp.einsum("kij,k->ij", terms.H, w)
    b_l = jnp.einsum("ki,k->i", terms.b, w)
    m_l = jnp.any(terms.matched & kf_valid[:, None], axis=0)

    np.testing.assert_allclose(np.asarray(H_s), np.asarray(H_l), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b_s), np.asarray(b_l), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(m_s), np.asarray(m_l))


def test_sharded_pipeline_matches_unsharded(rng):
    scans, _ = synthetic_room_scans(rng, n_scans=4, n_points=1200, step=0.05)
    mesh = make_mesh(kf=4, seq=2)

    step_s, place, _ = make_sharded_pipeline_step(CFG, mesh)
    state_s = place(init_state(CFG))
    state_u = init_state(CFG)

    for i, scan in enumerate(scans):
        pts, valid = _pad(scan, CFG.n_points)
        stamp = jnp.asarray(float(i), CFG.dtype)
        state_s, out_s = step_s(state_s, pts, valid, stamp)
        state_u, out_u = pipeline_step(CFG, state_u, pts, valid, stamp)
        np.testing.assert_allclose(
            np.asarray(out_s.pose), np.asarray(out_u.pose), atol=1e-9
        )
        assert bool(out_s.map_updated) == bool(out_u.map_updated)
    np.testing.assert_allclose(
        np.asarray(state_s.X), np.asarray(state_u.X), atol=1e-9
    )


def test_points_sharded_build_matches_unsharded(rng):
    """``shard_points=True`` also shards the per-scan tree build over
    the ``kf`` axis (GSPMD partitions the per-level scatter-adds; the
    node tables all-reduce). The build's partial sums then accumulate
    in a different order than the single-device scatter, so parity is
    at f64-reassociation tolerance, NOT bitwise — the trees and the GN
    normal equations are otherwise the same math (r5, NOTES)."""
    scans, _ = synthetic_room_scans(rng, n_scans=4, n_points=1200, step=0.05)
    mesh = make_mesh(kf=4, seq=2)

    step_s, place, place_inputs = make_sharded_pipeline_step(
        CFG, mesh, shard_points=True
    )
    state_s = place(init_state(CFG))
    state_u = init_state(CFG)

    for i, scan in enumerate(scans):
        pts, valid = _pad(scan, CFG.n_points)
        stamp = jnp.asarray(float(i), CFG.dtype)
        state_s, out_s = step_s(*(state_s,) + place_inputs(pts, valid, stamp))
        state_u, out_u = pipeline_step(CFG, state_u, pts, valid, stamp)
        np.testing.assert_allclose(
            np.asarray(out_s.pose), np.asarray(out_u.pose), atol=1e-6
        )
        assert bool(out_s.map_updated) == bool(out_u.map_updated)
    np.testing.assert_allclose(
        np.asarray(state_s.X), np.asarray(state_u.X), atol=1e-6
    )


def test_points_sharded_build_lowers_without_allgather():
    """Non-vacuity pin for ``shard_points=True``: GSPMD must PARTITION
    the build (per-level node tables all-reduce) rather than silently
    all-gathering the sharded cloud and running it replicated — the
    difference between a real points-parallel build and a no-op. The
    whole compiled step must contain ZERO all-gather ops (r5: 0
    all-gathers / 434 all-reduces on the 4x2 virtual mesh)."""
    mesh = make_mesh(kf=4, seq=2)
    step, place, place_inputs = make_sharded_pipeline_step(
        CFG, mesh, shard_points=True
    )
    state = place(init_state(CFG))
    pts = np.zeros((CFG.n_points, 3))
    valid = np.ones(CFG.n_points, bool)
    txt = step.lower(
        *(state,) + place_inputs(pts, valid, 0.0)
    ).compile().as_text()
    assert "all-gather" not in txt, "sharded build fell back to all-gather"
    assert txt.count("all-reduce") > 10, "no table reductions: not sharded?"


def test_fleet_matches_sequential(rng):
    n_seq = 4
    all_scans = []
    for _ in range(n_seq):
        scans, _ = synthetic_room_scans(rng, n_scans=3, n_points=900, step=0.05)
        all_scans.append(scans)

    mesh = make_mesh(kf=2, seq=4)
    fleet = Fleet(CFG, n_seq, mesh=mesh)

    seq_pipes = [init_state(CFG) for _ in range(n_seq)]
    for step_i in range(3):
        pts_b, val_b = zip(
            *[_pad(all_scans[s][step_i], CFG.n_points) for s in range(n_seq)]
        )
        out = fleet.compute(
            np.arange(n_seq, dtype=float),
            jnp.stack(pts_b),
            jnp.stack(val_b),
        )
        for s in range(n_seq):
            seq_pipes[s], out_u = pipeline_step(
                CFG,
                seq_pipes[s],
                pts_b[s],
                val_b[s],
                jnp.asarray(float(s), CFG.dtype),
            )
            np.testing.assert_allclose(
                np.asarray(out.pose[s]), np.asarray(out_u.pose), atol=1e-9
            )
    np.testing.assert_allclose(
        fleet.poses(), np.stack([np.asarray(s.X) for s in seq_pipes]), atol=1e-9
    )


def test_fleet_points_sharded_matches_sequential(rng):
    """Fleet(shard_points=True): each sequence's tree build partitions
    over the kf sub-axis (GSPMD; nothing crosses seq). Parity with the
    sequential pipelines at f64-reassociation tolerance — the partial
    node-table sums accumulate in a different order (r5, NOTES)."""
    n_seq = 2
    all_scans = [
        synthetic_room_scans(rng, n_scans=3, n_points=900, step=0.05)[0]
        for _ in range(n_seq)
    ]
    mesh = make_mesh(kf=4, seq=2)
    fleet = Fleet(CFG, n_seq, mesh=mesh, shard_points=True)

    seq_pipes = [init_state(CFG) for _ in range(n_seq)]
    for step_i in range(3):
        pts_b, val_b = zip(
            *[_pad(all_scans[s][step_i], CFG.n_points) for s in range(n_seq)]
        )
        out = fleet.compute(
            np.arange(n_seq, dtype=float),
            jnp.stack(pts_b),
            jnp.stack(val_b),
        )
        for s in range(n_seq):
            seq_pipes[s], out_u = pipeline_step(
                CFG, seq_pipes[s], pts_b[s], val_b[s],
                jnp.asarray(float(s), CFG.dtype),
            )
            np.testing.assert_allclose(
                np.asarray(out.pose[s]), np.asarray(out_u.pose), atol=1e-6
            )
    # persisted sharded state read-back path (poses() allgather), like
    # the sibling replicated-build fleet test
    np.testing.assert_allclose(
        fleet.poses(),
        np.stack([np.asarray(s.X) for s in seq_pipes]),
        atol=1e-6,
    )

    import pytest

    with pytest.raises(ValueError, match="kf"):
        Fleet(CFG, 2, shard_points=True)  # no mesh


def test_fleet_without_mesh(rng):
    scans, _ = synthetic_room_scans(rng, n_scans=2, n_points=600, step=0.05)
    fleet = Fleet(CFG, 2)
    pts, valid = _pad(scans[0], CFG.n_points)
    out = fleet.compute(
        np.zeros(2), jnp.stack([pts, pts]), jnp.stack([valid, valid])
    )
    assert out.pose.shape == (2, 4, 4)


def test_sharded_pipeline_matches_unsharded_fast(rng):
    """The kf-sharded step supports the fast association schedule: each
    device runs the full round schedule (periodic re-descents + cached
    rounds) on its keyframe shard, psum-reducing (H, b) per round."""
    import dataclasses

    cfg = dataclasses.replace(CFG, assoc_mode="fast", reassoc_every=4)
    scans, _ = synthetic_room_scans(rng, n_scans=4, n_points=1200, step=0.05)
    mesh = make_mesh(kf=4, seq=2)

    step_s, place, _ = make_sharded_pipeline_step(cfg, mesh)
    state_s = place(init_state(cfg))
    state_u = init_state(cfg)

    for i, scan in enumerate(scans):
        pts, valid = _pad(scan, cfg.n_points)
        stamp = jnp.asarray(float(i), cfg.dtype)
        state_s, out_s = step_s(state_s, pts, valid, stamp)
        state_u, out_u = pipeline_step(cfg, state_u, pts, valid, stamp)
        np.testing.assert_allclose(
            np.asarray(out_s.pose), np.asarray(out_u.pose), atol=1e-9
        )
    np.testing.assert_allclose(
        np.asarray(state_s.X), np.asarray(state_u.X), atol=1e-9
    )


def test_sharded_pipeline_matches_unsharded_prefix(rng):
    """The kf-sharded step supports the prefix-certified exact schedule:
    each device sorts by ITS OWN local keyframes' margins and re-descends
    its own prefix; matched flags are unsorted back to canonical leaf
    positions BEFORE the cross-shard any-reduce. Pinned against the
    unsharded prefix run AND plain exact (result-identity is schedule-
    wide)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, certify=True, certify_prefix=512)
    plain = dataclasses.replace(CFG, certify=False)
    scans, _ = synthetic_room_scans(rng, n_scans=4, n_points=1200, step=0.05)
    mesh = make_mesh(kf=4, seq=2)

    step_s, place, _ = make_sharded_pipeline_step(cfg, mesh)
    state_s = place(init_state(cfg))
    state_u = init_state(cfg)
    state_p = init_state(plain)

    for i, scan in enumerate(scans):
        pts, valid = _pad(scan, cfg.n_points)
        stamp = jnp.asarray(float(i), cfg.dtype)
        state_s, out_s = step_s(state_s, pts, valid, stamp)
        state_u, out_u = pipeline_step(cfg, state_u, pts, valid, stamp)
        state_p, out_p = pipeline_step(plain, state_p, pts, valid, stamp)
        np.testing.assert_allclose(
            np.asarray(out_s.pose), np.asarray(out_u.pose), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(out_s.pose), np.asarray(out_p.pose), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(out_s.inlier_ratio),
            np.asarray(out_p.inlier_ratio), atol=1e-12,
        )
    np.testing.assert_allclose(
        np.asarray(state_s.X), np.asarray(state_p.X), atol=1e-9
    )
