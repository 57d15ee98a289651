import numpy as np
import jax.numpy as jnp

from madicp_tpu.models.pipeline import Pipeline
from tests_fixtures_helper import synthetic_room_scans


def _make_pipeline(**kw):
    args = dict(
        sensor_hz=10.0,
        deskew=False,
        b_max=0.2,
        rho_ker=0.1,
        p_th=0.8,
        b_min=0.1,
        b_ratio=0.02,
        num_keyframes=4,
        n_points=4096,
        depth=12,
        dtype=jnp.float64,
    )
    args.update(kw)
    return Pipeline(**args)


def test_pipeline_initialization(rng):
    scans, _ = synthetic_room_scans(rng, n_scans=1)
    p = _make_pipeline()
    assert not p.is_initialized()
    p.compute(0.0, scans[0])
    assert p.is_initialized()
    assert p.current_id() == 1
    assert p.is_map_updated()
    np.testing.assert_array_equal(p.current_pose(), np.eye(4))
    assert p.model_leaves().shape[0] > 0


def test_pipeline_tracks_synthetic_motion(rng):
    scans, gt = synthetic_room_scans(rng, n_scans=6, step=0.06)
    p = _make_pipeline()
    # ground truth poses are relative to the first sensor pose
    T0 = gt[0]
    for i, scan in enumerate(scans):
        p.compute(i * 0.1, scan)
        est = p.current_pose()
        rel_gt = np.linalg.inv(T0) @ gt[i]
        t_err = np.linalg.norm(est[:3, 3] - rel_gt[:3, 3])
        assert t_err < 0.05, f"scan {i}: translation error {t_err}"
        R_err = np.arccos(
            np.clip((np.trace(est[:3, :3].T @ rel_gt[:3, :3]) - 1) / 2, -1, 1)
        )
        assert R_err < 0.02, f"scan {i}: rotation error {R_err}"


def test_pipeline_inlier_ratio_and_keyframes(rng):
    scans, gt = synthetic_room_scans(rng, n_scans=5, step=0.05)
    p = _make_pipeline(num_keyframes=2)
    for i, scan in enumerate(scans):
        p.compute(i * 0.1, scan)
        if i > 0:
            assert 0.0 <= p.inlier_ratio() <= 1.0
            # overlapping synthetic scans should match well
            assert p.inlier_ratio() > 0.5
    kf_valid = np.asarray(p.state.kf_valid)
    assert kf_valid.sum() >= 1


def test_pipeline_keyframe_promotion_on_low_overlap(rng):
    # feeding a far-away disjoint scene forces inlier ratio < p_th and a
    # keyframe promotion (pipeline.cpp:234-262)
    scans, _ = synthetic_room_scans(rng, n_scans=2, step=0.05)
    p = _make_pipeline()
    p.compute(0.0, scans[0])
    kf_before = int(np.asarray(p.state.kf_valid).sum())
    far = scans[1] + np.array([100.0, 0.0, 0.0])
    p.compute(0.1, far)
    assert p.inlier_ratio() < 0.8
    assert p.is_map_updated()
    kf_after = int(np.asarray(p.state.kf_valid).sum())
    assert kf_after == kf_before + 1
    assert p.keyframe_id() == 1


def test_pipeline_frame_window_rolls(rng):
    scans, _ = synthetic_room_scans(rng, n_scans=4, step=0.04)
    p = _make_pipeline()
    for i, s in enumerate(scans):
        p.compute(i * 0.1, s)
    seq = np.asarray(p.state.fr_seq)
    valid = np.asarray(p.state.fr_valid)
    # frames 1..3 recorded (frame 0 is the init keyframe, not in the window)
    assert set(seq[valid].tolist()) <= {1, 2, 3}
    assert p.current_id() == 4


def test_pipeline_f32(rng):
    scans, gt = synthetic_room_scans(rng, n_scans=4, step=0.05)
    p = _make_pipeline(dtype=jnp.float32)
    T0 = gt[0]
    for i, scan in enumerate(scans):
        p.compute(i * 0.1, scan)
    rel_gt = np.linalg.inv(T0) @ gt[3]
    t_err = np.linalg.norm(p.current_pose()[:3, 3] - rel_gt[:3, 3])
    assert t_err < 0.08


def test_pipeline_deskew_enabled_runs(rng):
    scans, _ = synthetic_room_scans(rng, n_scans=3, step=0.04)
    p = _make_pipeline(deskew=True)
    for i, s in enumerate(scans):
        p.compute(i * 0.1, s)
    assert np.isfinite(p.current_pose()).all()


def test_realtime_calibration_shrinks_iterations(rng, four_walls):
    """realtime=True times a synced step and rescales the ICP budget; a
    fake clock reporting 10x the budget must shrink the iteration count."""
    p = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=2, realtime=True,
        n_points=4096, depth=10, max_leaves=2048,
    )
    ticks = iter([0.0, 0.95])  # 950 ms step vs 95 ms budget
    p._now = lambda: next(ticks)

    def scan(i):
        t = np.array([0.05 * i, 0.0, 0.0])
        return (four_walls - t).astype(np.float32)

    for i in range(4):
        p.compute(0.1 * i, scan(i))
    assert p._rt_calibrated
    assert 1 <= p.cfg.max_icp_iterations < 15
    assert p.current_id() == 4  # the calibration scan was still processed
    assert np.isfinite(p.current_pose()).all()


def test_realtime_keeps_iterations_when_within_budget(rng, four_walls):
    p = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=2, realtime=True,
        n_points=4096, depth=10, max_leaves=2048,
    )
    ticks = iter([0.0, 0.01])  # 10 ms step: well inside budget
    p._now = lambda: next(ticks)
    for i in range(4):
        p.compute(0.1 * i, (four_walls - 0.05 * i).astype(np.float32))
    assert p.cfg.max_icp_iterations == 15


def test_realtime_20hz_deskew_converges_to_budget(rng, four_walls):
    """The vbr_os1 operating point (20 Hz, deskew on — the reference's
    tightest anytime envelope, ``pipeline.cpp:62,167``: 45 ms budget):
    the rolling recalibration must converge to an iteration count whose
    modelled step time FITS the budget, with deskew in the loop
    (VERDICT r4 item 6). The injectable clock models a step as a 10 ms
    floor plus 3 ms per ICP iteration — 15 iterations (55 ms) blows the
    45 ms budget, so the calibration must settle strictly below 15 and
    at a count that fits."""
    p = Pipeline(
        sensor_hz=20.0, deskew=True, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=2, realtime=True,
        n_points=4096, depth=10, max_leaves=2048, realtime_recal_every=1,
    )
    state = {"t": 0.0, "timing": False}

    def fake_now():
        # called twice per calibration: start, then end of the timed
        # step — the step "takes" 10 ms + 3 ms per current iteration
        if state["timing"]:
            state["t"] += 0.010 + 0.003 * p.cfg.max_icp_iterations
        state["timing"] = not state["timing"]
        return state["t"]

    p._now = fake_now
    for i in range(8):
        t = np.array([0.02 * i, 0.0, 0.0])
        p.compute(0.05 * i, (four_walls - t).astype(np.float32))
    assert p._rt_calibrated
    its = p.cfg.max_icp_iterations
    budget_s = 1.0 / 20.0 - 0.005
    assert 1 <= its < 15
    assert 0.010 + 0.003 * its <= budget_s, (
        f"calibrated {its} iterations do not fit the 45 ms budget"
    )
    assert np.isfinite(p.current_pose()).all()


def test_certified_matches_plain_exact(rng):
    """Certified re-association (path-margin certificate) must be
    RESULT-IDENTICAL to the plain exact schedule: the skipped gathers
    are provably redundant, so any trajectory difference is a soundness
    bug. f64, multi-scan, with keyframe promotions."""
    scans, _ = synthetic_room_scans(rng, n_scans=6, step=0.06)
    a = _make_pipeline(assoc_mode="exact", certify=True, num_keyframes=2)
    b = _make_pipeline(assoc_mode="exact", certify=False, num_keyframes=2)
    for i, scan in enumerate(scans):
        a.compute(0.1 * i, scan)
        b.compute(0.1 * i, scan)
        np.testing.assert_allclose(
            a.current_pose(), b.current_pose(), atol=1e-9,
            err_msg=f"scan {i}: certified exact diverged from plain exact",
        )
        assert a.inlier_ratio() == b.inlier_ratio(), f"scan {i}"
        assert a.is_map_updated() == b.is_map_updated(), f"scan {i}"
    np.testing.assert_allclose(
        np.asarray(a.state.velocity), np.asarray(b.state.velocity), atol=1e-9
    )
    # observability: the plain exact schedule walks every descent every
    # round; the certificate must have skipped a large share of them
    # once GN converges (this is the mechanism behind its speed)
    kv = int(np.asarray(b.state.kf_valid.sum()))  # live keyframes
    full = b.cfg.max_icp_iterations * kv * int(np.asarray(b._last.n_leaves))
    assert kv > 0 and b.descents() == full
    assert 0 < a.descents() < full // 2


def test_certified_compact_matches_plain_exact(rng):
    """certify_compact (uncertified entries compacted into a static
    buffer and descended against the flat forest view) must match both
    the parked-sweep certified schedule and plain exact. Run at two
    buffer sizes — one so small most rounds OVERFLOW (full-sweep
    fallback branch), one large enough that converged rounds fit
    (compact branch) — so both lax.cond paths execute."""
    scans, _ = synthetic_room_scans(rng, n_scans=6, step=0.06)
    b = _make_pipeline(assoc_mode="exact", certify=False, num_keyframes=2)
    c = _make_pipeline(assoc_mode="exact", certify=True, num_keyframes=2)
    compacts = [
        _make_pipeline(assoc_mode="exact", certify=True, num_keyframes=2,
                       certify_compact=U)
        for U in (16, 512)
    ]
    for i, scan in enumerate(scans):
        b.compute(0.1 * i, scan)
        c.compute(0.1 * i, scan)
        for a in compacts:
            a.compute(0.1 * i, scan)
            np.testing.assert_allclose(
                a.current_pose(), b.current_pose(), atol=1e-9,
                err_msg=f"scan {i} U={a.cfg.certify_compact}: "
                        f"compact certified diverged from plain",
            )
            assert a.inlier_ratio() == b.inlier_ratio(), f"scan {i}"
    # same descent accounting as the parked certified schedule
    for a in compacts:
        assert a.descents() == c.descents()


def test_certify_prefix_matches_plain_exact(rng):
    """certify_prefix (global margin-sorted order, per-round uncertified
    PREFIX re-descent) must be RESULT-IDENTICAL to the plain exact
    schedule. Run at two buffer sizes — one so small most rounds
    OVERFLOW into the full-sweep fallback, one large enough that
    converged rounds fit the prefix — so both lax.cond paths execute.
    f64, multi-scan, with keyframe promotions."""
    scans, _ = synthetic_room_scans(rng, n_scans=6, step=0.06)
    b = _make_pipeline(assoc_mode="exact", certify=False, num_keyframes=2)
    prefixes = [
        _make_pipeline(assoc_mode="exact", certify=True, num_keyframes=2,
                       certify_prefix=U)
        for U in (8, 1024)
    ]
    for i, scan in enumerate(scans):
        b.compute(0.1 * i, scan)
        for a in prefixes:
            a.compute(0.1 * i, scan)
            np.testing.assert_allclose(
                a.current_pose(), b.current_pose(), atol=1e-9,
                err_msg=f"scan {i} U={a.cfg.certify_prefix}: "
                        f"prefix certified diverged from plain",
            )
            assert a.inlier_ratio() == b.inlier_ratio(), f"scan {i}"
            assert a.is_map_updated() == b.is_map_updated(), f"scan {i}"
    # the schedule must skip SOME work once GN converges; how much is
    # scene-dependent (this small room's margins are weak for the scalar
    # budget). NOTE descents are NOT monotone in U: a tiny buffer
    # overflows into baseline RESETS whose refreshed margins make the
    # following rounds cheaper (r3 measured here: U=8 walks ~33% of the
    # full schedule, U=1024 ~74%) — both sound, both result-identical.
    kv = int(np.asarray(b.state.kf_valid.sum()))
    full = b.cfg.max_icp_iterations * kv * int(np.asarray(b._last.n_leaves))
    assert kv > 0 and b.descents() == full
    for a in prefixes:
        assert 0 < a.descents() < full
    assert min(a.descents() for a in prefixes) < full // 2


def test_certify_prefix_matches_plain_exact_submetre_scene(rng):
    """Identity on a SUB-METRE scene (mean leaf range < 1 m): the
    derived radius scale E0 must floor at 1.0 — the skip guard's fp
    term ``eps64*(1+|t|)*(E0+r)`` dominates the ``eps_cert`` safety
    floor unconditionally only for E0 >= 1 (r4 code review), so a
    close-range scene is the case a too-small floor would break."""
    room = synthetic_room_scans(rng, n_scans=1, n_points=1200)[0][0]
    room = room * 0.15  # shrink the room: ranges ~0.2-0.5 m
    scans = [room + rng.normal(0, 0.0005, room.shape) for _ in range(4)]
    for i in range(4):
        scans[i] = scans[i] - np.array([0.01 * i, 0.0, 0.0])
    kw = dict(assoc_mode="exact", num_keyframes=2, b_max=0.03,
              b_min=0.015, b_ratio=0.02)
    b = _make_pipeline(certify=False, **kw)
    a = _make_pipeline(certify=True, certify_prefix=512, **kw)
    for i, scan in enumerate(scans):
        b.compute(0.1 * i, scan)
        a.compute(0.1 * i, scan)
        np.testing.assert_allclose(
            a.current_pose(), b.current_pose(), atol=1e-9,
            err_msg=f"scan {i}: prefix certified diverged on the "
                    f"sub-metre scene",
        )
        assert a.inlier_ratio() == b.inlier_ratio(), f"scan {i}"


def test_certify_prefix_matches_plain_exact_kitti_scale(rng):
    """Same identity on a scene with a VERY different radius (~60 m
    KITTI-like streetscape vs the ~2 m room above): the certificate's
    radius scale E0 is derived from the round-0 leaf set, and this pins
    that no scene-specific constant hides in the soundness-adjacent
    path (VERDICT r3 item 6 — E0 was hardcoded to a car-scene 16.0)."""
    from bench import synthetic_kitti_scan

    world = synthetic_kitti_scan(np.random.default_rng(3), n_points=4000)
    scans = []
    for i in range(4):
        t = np.array([1.0 * i, 0.05 * i, 0.0])
        scans.append(world - t + rng.normal(0, 0.005, world.shape))
    b = _make_pipeline(assoc_mode="exact", certify=False, num_keyframes=2)
    a = _make_pipeline(assoc_mode="exact", certify=True, num_keyframes=2,
                       certify_prefix=1024)
    for i, scan in enumerate(scans):
        b.compute(0.1 * i, scan)
        a.compute(0.1 * i, scan)
        np.testing.assert_allclose(
            a.current_pose(), b.current_pose(), atol=1e-9,
            err_msg=f"scan {i}: prefix certified diverged from plain "
                    f"on the large-radius scene",
        )
        assert a.inlier_ratio() == b.inlier_ratio(), f"scan {i}"
    assert a.descents() < b.descents()


def test_certify_prefix_config_validation():
    import pytest

    with pytest.raises(ValueError):
        _make_pipeline(certify_prefix=64, certify_compact=64)
    with pytest.raises(ValueError):
        _make_pipeline(certify_prefix=-1)


def test_certified_f32_divergence_bounded(rng):
    """At f32 (the shipped bench/production dtype) the eps_cert safety
    window is wide enough that a FEW near-zero-slack entries can keep a
    cached association a fresh descent would flip at the fp level — both
    are valid approximate-NN answers, but exactness degrades to a BOUND:
    certified f32 must track plain-exact f32 to sub-mm over a multi-scan
    drive with promotions. (Exactness itself is pinned in f64 by
    test_certified_matches_plain_exact and the golden tests.)"""
    scans, _ = synthetic_room_scans(rng, n_scans=8, step=0.06)
    a = _make_pipeline(assoc_mode="exact", certify=True, num_keyframes=2,
                       dtype=jnp.float32)
    b = _make_pipeline(assoc_mode="exact", certify=False, num_keyframes=2,
                       dtype=jnp.float32)
    for i, scan in enumerate(scans):
        a.compute(0.1 * i, scan)
        b.compute(0.1 * i, scan)
        d = np.abs(a.current_pose() - b.current_pose()).max()
        assert d < 5e-4, f"scan {i}: certified f32 drifted {d:.2e} from plain"


def test_realtime_budget_degrades_and_recovers(rng, four_walls):
    """Rolling recalibration (VERDICT r1 item 7): under a load spike the
    iteration budget shrinks; when headroom returns it is RESTORED —
    matching the spirit of the reference's per-iteration wall-clock break
    (pipeline.cpp:166-169) under shifting load epochs."""
    p = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=2, realtime=True,
        n_points=1024, depth=9, max_leaves=512,
        max_icp_iterations=6, realtime_recal_every=1,
    )
    # clock deltas per timed step: one slow epoch, then fast ones
    deltas = iter([0.95, 0.003, 0.003, 0.003, 0.003])
    clock = {"t": 0.0, "mid": False}

    def fake_now():
        if clock["mid"]:
            clock["t"] += next(deltas)
        clock["mid"] = not clock["mid"]
        return clock["t"]

    p._now = fake_now

    def scan(i):
        return (four_walls - np.array([0.05 * i, 0.0, 0.0])).astype(
            np.float32
        )

    seen = []
    for i in range(7):
        p.compute(0.1 * i, scan(i))
        seen.append(p.cfg.max_icp_iterations)
    # scan 2 is the first timed step (slow): budget collapses to 1;
    # subsequent fast epochs restore it to the configured maximum
    assert min(seen) == 1
    assert p.cfg.max_icp_iterations == 6
    assert p.current_id() == 7  # every scan was still processed
    assert np.isfinite(p.current_pose()).all()


def test_leaves_cap_clamped_to_arena(rng, four_walls):
    """n_points larger than the arena (2^(depth+1)) must not crash: the
    leaf capacity clamps to the arena size (regression: shape mismatch
    in the matched accumulator on the second scan)."""
    p = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=2,
        n_points=2048, depth=9, max_leaves=0,
    )
    assert p.cfg.leaves_cap == 2 ** 10
    for i in range(3):
        t = np.array([0.05 * i, 0.0, 0.0])
        p.compute(0.1 * i, (four_walls - t).astype(np.float32))
    assert np.isfinite(p.current_pose()).all()


def test_leaf_overflow_is_observable(rng):
    """A scan with more leaves than max_leaves must surface the dropped
    count (VERDICT r1 item 4) instead of silently shrinking the map."""
    scans, _ = synthetic_room_scans(rng, n_scans=2, step=0.05)
    p = _make_pipeline(max_leaves=64)  # far below the real leaf count
    p.compute(0.0, scans[0])
    assert p.leaves_dropped() > 0
    p.compute(0.1, scans[1])
    assert p.leaves_dropped() > 0
    # count is exact: true leaves minus capacity
    assert (
        p.leaves_dropped()
        == int(np.asarray(p._last.n_leaves_dropped))
    )
    # an adequately-sized capacity reports zero
    p2 = _make_pipeline()
    p2.compute(0.0, scans[0])
    assert p2.leaves_dropped() == 0


import pytest


@pytest.mark.parametrize("every,backup", [(2, 0), (4, 0), (2, 6)])
def test_fast_assoc_matches_exact_trajectory(rng, every, backup):
    """assoc_mode="fast" (periodic re-descents + cached rounds in
    between, optionally warm-started) must land trajectory-level on top
    of the exact full-re-association schedule: same scene, same scans,
    pose gap at the millimetre scale."""
    scans, _ = synthetic_room_scans(rng, n_scans=6, step=0.06)
    pe = _make_pipeline(assoc_mode="exact")
    pf = _make_pipeline(
        assoc_mode="fast", reassoc_every=every, reassoc_backup=backup
    )
    for i, s in enumerate(scans):
        pe.compute(i * 0.1, s)
        pf.compute(i * 0.1, s)
    Xe, Xf = pe.current_pose(), pf.current_pose()
    assert np.linalg.norm(Xe[:3, 3] - Xf[:3, 3]) < 5e-3
    assert np.abs(Xe[:3, :3] - Xf[:3, :3]).max() < 1e-3
    assert abs(pe.inlier_ratio() - pf.inlier_ratio()) < 0.05


def test_fast_assoc_tracks_motion(rng):
    """Fast mode passes the same absolute accuracy bar as exact mode."""
    scans, gt = synthetic_room_scans(rng, n_scans=6, step=0.06)
    p = _make_pipeline(assoc_mode="fast")
    T0 = gt[0]
    for i, scan in enumerate(scans):
        p.compute(i * 0.1, scan)
    rel_gt = np.linalg.inv(T0) @ gt[-1]
    assert np.linalg.norm(p.current_pose()[:3, 3] - rel_gt[:3, 3]) < 0.05


def test_fast_assoc_single_iteration(rng):
    """n_its == 1 takes the dedicated fast-mode branch (full descent, one
    GN step, matched flags from that round)."""
    scans, _ = synthetic_room_scans(rng, n_scans=3, step=0.04)
    p = _make_pipeline(assoc_mode="fast", max_icp_iterations=1)
    for i, s in enumerate(scans):
        p.compute(i * 0.1, s)
    assert np.isfinite(p.current_pose()).all()
    assert 0.0 < p.inlier_ratio() <= 1.0


def test_compute_batch_matches_sequential(rng):
    """One chunked dispatch == the same scans fed one by one.

    Deliberately small config: the chunk's lax.scan-of-steps is the
    suite's heaviest XLA-CPU compile (it carries both the initialize and
    the odometry branch per iteration), and at the default test shapes
    it can abort the compiler outright when run after other heavy
    compiles (VERDICT r2). Equality chunk==sequential is shape- and
    iteration-count-independent, so test it at the cheap point.
    """
    small = dict(n_points=2048, depth=10, max_icp_iterations=6)
    scans, _ = synthetic_room_scans(rng, n_scans=5, step=0.05)
    stamps = [0.1 * i for i in range(5)]
    pseq = _make_pipeline(**small)
    for t, s in zip(stamps, scans):
        pseq.compute(t, s)
    pchunk = _make_pipeline(**small)
    poses = pchunk.compute_batch(stamps, scans)
    assert poses.shape == (5, 4, 4)
    np.testing.assert_allclose(poses[-1], pseq.current_pose(), atol=1e-12)
    np.testing.assert_allclose(
        pchunk.current_pose(), pseq.current_pose(), atol=1e-12
    )
    assert pchunk.current_id() == pseq.current_id() == 5
    assert abs(pchunk.inlier_ratio() - pseq.inlier_ratio()) < 1e-9


def test_compute_batch_refuses_uncalibrated_realtime(rng):
    import pytest

    scans, _ = synthetic_room_scans(rng, n_scans=2)
    p = _make_pipeline(realtime=True)
    with pytest.raises(RuntimeError):
        p.compute_batch([0.0, 0.1], scans)


def test_compute_device_matches_compute(rng):
    """stage() + compute_device() is the same computation as compute()."""
    scans, _ = synthetic_room_scans(rng, n_scans=4, step=0.05)
    pa = _make_pipeline()
    pb = _make_pipeline()
    for i, s in enumerate(scans):
        pa.compute(i * 0.1, s)
        pb.compute_device(i * 0.1, *pb.stage(s))
    np.testing.assert_array_equal(pa.current_pose(), pb.current_pose())
    assert pa.current_id() == pb.current_id()


def test_point_capacity_truncation_is_surfaced(rng):
    """Input points beyond the static ``n_points`` capacity are dropped
    (unavoidable under static shapes) but must be REPORTED — the
    reference ingests every point (``pipeline.cpp:125-144``), so a
    silent truncation would corrupt parity invisibly (VERDICT r3 #5).
    ``leaves_dropped`` got this treatment in r2; ``points_dropped`` is
    its input-side twin."""
    scans, _ = synthetic_room_scans(rng, n_scans=3, step=0.05)
    p = _make_pipeline(n_points=len(scans[0]) - 100)
    p.compute(0.0, scans[0])
    assert p.points_dropped() == 100
    # a scan within capacity resets the counter
    p.compute(0.1, scans[1][: p.cfg.n_points])
    assert p.points_dropped() == 0
    # batch path accumulates across the chunk
    pb = _make_pipeline(n_points=len(scans[0]) - 100)
    pb.compute_batch([0.0, 0.1], [scans[0], scans[1]])
    assert pb.points_dropped() == 100 + max(
        0, len(scans[1]) - pb.cfg.n_points
    )
