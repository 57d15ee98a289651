"""Checkpoint/resume bitwise fidelity + evaluation CLI metrics."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from madicp_tpu.models.pipeline import Pipeline
from madicp_tpu.utils.checkpoint import load_pipeline, save_pipeline
from madicp_tpu.utils.trajectory import save_kitti_poses


def _scan(rng, four_walls, i):
    t = np.array([0.05 * i, 0.02 * i, 0.0])
    return (four_walls - t + rng.normal(0, 0.002, four_walls.shape)).astype(
        np.float32
    )


def _make_pipe(**kw):
    return Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=2,
        n_points=8192, depth=11, max_leaves=4096, **kw,
    )


def test_checkpoint_resume_identical(tmp_path, rng, four_walls):
    scans = [_scan(rng, four_walls, i) for i in range(6)]

    pipe = _make_pipe()
    for i in range(3):
        pipe.compute(0.1 * i, scans[i])
    save_pipeline(tmp_path / "ck.npz", pipe)

    resumed = load_pipeline(tmp_path / "ck.npz")
    assert resumed.current_id() == pipe.current_id() == 3
    np.testing.assert_array_equal(
        np.asarray(resumed.state.X), np.asarray(pipe.state.X)
    )

    for i in range(3, 6):
        pipe.compute(0.1 * i, scans[i])
        resumed.compute(0.1 * i, scans[i])

    for a, b in zip(jax.tree.leaves(pipe.state), jax.tree.leaves(resumed.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_preserves_config(tmp_path, rng, four_walls):
    pipe = _make_pipe()
    pipe.compute(0.0, _scan(rng, four_walls, 0))
    save_pipeline(tmp_path / "ck.npz", pipe)
    resumed = load_pipeline(tmp_path / "ck.npz")
    assert resumed.cfg == pipe.cfg
    assert resumed.realtime == pipe.realtime


def test_checkpoint_preserves_realtime_ceiling(tmp_path, rng, four_walls):
    """A checkpoint taken while the anytime budget is SHRUNK must not
    permanently cap the resumed run at the shrunk iteration count: the
    configured ceiling (_rt_its_max) and recal cadence travel with the
    checkpoint, so the restore branch of the rolling recalibration can
    still raise the budget back once headroom returns."""
    import dataclasses

    pipe = _make_pipe(realtime=True, max_icp_iterations=9,
                      realtime_recal_every=5)
    pipe.compute(0.0, _scan(rng, four_walls, 0))
    # simulate a post-spike state: budget shrunk to 2 of the 9 configured
    pipe.cfg = dataclasses.replace(pipe.cfg, max_icp_iterations=2)
    save_pipeline(tmp_path / "ck.npz", pipe)

    resumed = load_pipeline(tmp_path / "ck.npz")
    assert resumed.cfg.max_icp_iterations == 2  # resumes where it was
    assert resumed._rt_its_max == 9             # ...but can recover fully
    assert resumed._rt_every == 5


def _trajectory(n, step=1.0, yaw_rate=0.0):
    poses = []
    for i in range(n):
        T = np.eye(4)
        c, s = np.cos(yaw_rate * i), np.sin(yaw_rate * i)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[0, 3] = step * i
        poses.append(T)
    return np.stack(poses)


def test_evaluate_identical_is_zero(tmp_path):
    from madicp_tpu.apps.evaluate import evaluate

    traj = _trajectory(250, step=1.0)
    save_kitti_poses(tmp_path / "est.txt", traj)
    save_kitti_poses(tmp_path / "gt.txt", traj)
    m = evaluate(tmp_path / "est.txt", tmp_path / "gt.txt")
    assert m["poses"] == 250
    assert m["ate_rmse_m"] == pytest.approx(0.0, abs=1e-9)
    assert m["t_err_pct"] == pytest.approx(0.0, abs=1e-9)
    assert m["segments"] > 0


def test_evaluate_detects_scale_drift(tmp_path):
    from madicp_tpu.apps.evaluate import evaluate

    gt = _trajectory(250, step=1.0)
    est = _trajectory(250, step=1.01)  # 1% drift
    save_kitti_poses(tmp_path / "est.txt", est)
    save_kitti_poses(tmp_path / "gt.txt", gt)
    m = evaluate(tmp_path / "est.txt", tmp_path / "gt.txt")
    assert m["t_err_pct"] == pytest.approx(1.0, rel=0.05)


def test_evaluate_cli_json(tmp_path, capsys):
    from madicp_tpu.apps.evaluate import main

    traj = _trajectory(120, step=1.0)
    save_kitti_poses(tmp_path / "est.txt", traj)
    save_kitti_poses(tmp_path / "gt.txt", traj)
    rc = main([
        "--estimate", str(tmp_path / "est.txt"),
        "--ground-truth", str(tmp_path / "gt.txt"),
        "--json",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ate_rmse_m"] == pytest.approx(0.0, abs=1e-9)

    rc = main([
        "--estimate", str(tmp_path / "missing.txt"),
        "--ground-truth", str(tmp_path / "gt.txt"),
    ])
    assert rc == -1


def test_checkpoint_preserves_assoc_schedule(tmp_path, rng, four_walls):
    """Regression: the loader used to rebuild the Pipeline without the
    association-schedule fields, silently resuming fast-mode runs in
    exact mode."""
    p = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=2,
        n_points=2048, depth=10, max_leaves=1024,
        assoc_mode="fast", reassoc_every=5, reassoc_backup=3,
    )
    p.compute(0.0, _scan(rng, four_walls, 0))
    f = tmp_path / "ck.npz"
    save_pipeline(f, p)
    q = load_pipeline(f)
    assert q.cfg.assoc_mode == "fast"
    assert q.cfg.reassoc_every == 5
    assert q.cfg.reassoc_backup == 3
    assert q.cfg == p.cfg


def test_config_validation():
    from madicp_tpu.models.pipeline import PipelineConfig

    with pytest.raises(ValueError):
        PipelineConfig(assoc_mode="sloppy")
    with pytest.raises(ValueError):
        PipelineConfig(reassoc_every=0)
    with pytest.raises(ValueError):
        PipelineConfig(reassoc_backup=-1)
