import types

import numpy as np
import pytest

from madicp_tpu.utils.config import (
    DATASET_CONFIGS,
    MAD_PARAMS,
    dump_yaml,
    load_dataset_config,
    load_mad_params,
)
from madicp_tpu.utils.kitti import KittiReader, apply_vertical_correction
from madicp_tpu.utils.natsort import natsorted
from madicp_tpu.utils.pointcloud2 import dtype_from_fields, read_point_cloud
from madicp_tpu.utils.trajectory import (
    ate_rmse,
    kitti_drift,
    load_kitti_poses,
    save_kitti_poses,
    transformed_pose,
    write_transformed_pose,
)


def test_preset_luts_complete():
    # the 7 built-in dataset envelopes (dataset_configurations.py:139-147)
    assert set(DATASET_CONFIGS) == {
        "hilti_2021", "kitti", "mulran", "newer_college_os0",
        "newer_college_os1", "vbr_os0", "vbr_os1",
    }
    assert "default" in MAD_PARAMS
    d = MAD_PARAMS["default"]
    assert (d.b_max, d.b_min, d.b_ratio, d.p_th, d.rho_ker, d.n) == (
        0.2, 0.1, 0.02, 0.8, 0.1, 10,
    )
    k = DATASET_CONFIGS["kitti"]
    assert k.apply_correction and not k.deskew and k.sensor_hz == 10
    assert DATASET_CONFIGS["mulran"].deskew
    assert DATASET_CONFIGS["vbr_os1"].sensor_hz == 20


def test_config_yaml_roundtrip(tmp_path):
    for name in ["kitti", "vbr_os1"]:
        p = tmp_path / f"{name}.cfg"
        dump_yaml(DATASET_CONFIGS[name], p)
        loaded = load_dataset_config(p)
        assert loaded == DATASET_CONFIGS[name]
    p = tmp_path / "default.cfg"
    dump_yaml(MAD_PARAMS["default"], p)
    assert load_mad_params(p) == MAD_PARAMS["default"]


def test_config_unknown_name():
    with pytest.raises(KeyError):
        load_dataset_config("nope")
    with pytest.raises(KeyError):
        load_mad_params("nope")


def test_natsorted():
    xs = ["s10.bin", "s2.bin", "s1.bin"]
    assert natsorted(xs) == ["s1.bin", "s2.bin", "s10.bin"]


def _write_bins(tmp_path, clouds):
    for i, c in enumerate(clouds):
        arr = np.zeros((len(c), 4), np.float32)
        arr[:, :3] = c
        arr.tofile(tmp_path / f"{i:06d}.bin")


def test_kitti_reader(tmp_path, rng):
    clouds = [rng.normal(size=(100, 3)) * 5 + 10 for _ in range(3)]
    _write_bins(tmp_path, clouds)
    with KittiReader(tmp_path, min_range=1.0, max_range=100.0, sensor_hz=10.0) as r:
        assert len(r) == 3
        stamps = []
        for ts, pts in r:
            stamps.append(ts)
            assert pts.shape[1] == 3
            norms = np.linalg.norm(pts, axis=1)
            assert norms.min() >= 1.0 and norms.max() <= 100.0
        np.testing.assert_allclose(stamps, [0.1, 0.2, 0.3])


def test_kitti_vertical_correction(rng):
    pts = rng.normal(size=(50, 3)) * 10
    out = apply_vertical_correction(pts)
    # norms preserved (pure rotations), small angle
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), np.linalg.norm(pts, axis=1), rtol=1e-12
    )
    ang = np.arccos(
        np.clip(np.sum(out * pts, 1) / np.sum(pts * pts, 1), -1, 1)
    )
    np.testing.assert_allclose(ang, np.radians(0.205), atol=1e-6)
    # rotation is toward +z (for points below the pole)
    assert np.all(
        (out[:, 2] - pts[:, 2]) * np.sign(np.linalg.norm(pts[:, :2], axis=1)) != 0
    )


def _pc2_msg(points, with_time=True, bigendian=False):
    n = len(points)
    fields = [
        types.SimpleNamespace(name="x", offset=0, datatype=7, count=1),
        types.SimpleNamespace(name="y", offset=4, datatype=7, count=1),
        types.SimpleNamespace(name="z", offset=8, datatype=7, count=1),
    ]
    step = 16
    if with_time:
        fields.append(
            types.SimpleNamespace(name="t", offset=12, datatype=6, count=1)
        )
    dt = np.dtype(
        {
            "names": [f.name for f in fields],
            "formats": [
                (">" if bigendian else "<") + ("u4" if f.name == "t" else "f4")
                for f in fields
            ],
            "offsets": [f.offset for f in fields],
            "itemsize": step,
        }
    )
    arr = np.zeros(n, dt)
    arr["x"], arr["y"], arr["z"] = points.T.astype(np.float32)
    if with_time:
        arr["t"] = np.arange(n)
    return types.SimpleNamespace(
        fields=fields,
        width=n,
        height=1,
        point_step=step,
        is_bigendian=bigendian,
        data=arr.tobytes(),
    )


def test_pointcloud2_decode(rng):
    pts = rng.normal(size=(64, 3)) * 3 + 5
    msg = _pc2_msg(pts)
    out, ts = read_point_cloud(msg, min_range=0.1, max_range=1e3)
    np.testing.assert_allclose(out, pts.astype(np.float32), atol=1e-6)
    assert ts.min() == 0.0 and ts.max() == 1.0


def test_pointcloud2_filters_and_endianness(rng):
    pts = np.array([[0.0, 0, 0.05], [5, 0, 0], [np.nan, 1, 1], [200, 0, 0]])
    msg = _pc2_msg(pts, with_time=False)
    out, ts = read_point_cloud(msg, min_range=0.5, max_range=100.0)
    assert out.shape == (1, 3)
    np.testing.assert_allclose(out[0], [5, 0, 0], atol=1e-6)
    np.testing.assert_array_equal(ts, [1.0])
    # big-endian payload decodes identically
    pts2 = rng.normal(size=(16, 3)) + 4
    a = read_point_cloud(_pc2_msg(pts2, bigendian=True), 0.1, 1e3)[0]
    b = read_point_cloud(_pc2_msg(pts2, bigendian=False), 0.1, 1e3)[0]
    np.testing.assert_allclose(a, b)


def test_dtype_from_fields_counts():
    fields = [
        types.SimpleNamespace(name="v", offset=0, datatype=7, count=3),
        types.SimpleNamespace(name="", offset=12, datatype=2, count=1),
    ]
    dt = dtype_from_fields(fields, point_step=16)
    assert dt.itemsize == 16
    assert set(dt.names) == {"v_0", "v_1", "v_2", "unnamed_field_1"}


def test_pose_writer_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    poses = []
    T = np.eye(4)
    for _ in range(5):
        d = np.eye(4)
        d[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.1).as_matrix()
        d[:3, 3] = rng.normal(size=3)
        T = T @ d
        poses.append(T.copy())
    E = np.eye(4)
    E[:3, :3] = Rotation.from_rotvec([0.3, 0.1, -0.2]).as_matrix()
    E[:3, 3] = [1.0, 2.0, 3.0]

    path = tmp_path / "estimate.txt"
    save_kitti_poses(path, poses, lidar_to_base=E)
    loaded = load_kitti_poses(path)
    for i, T in enumerate(poses):
        np.testing.assert_allclose(loaded[i], transformed_pose(T, E), atol=1e-9)

    with open(path) as f:
        assert len(f.readline().split()) == 12


def test_ate_and_drift_metrics(rng):
    # identical trajectories -> zero error
    T = [np.eye(4)]
    for i in range(300):
        d = np.eye(4)
        d[:3, 3] = [1.0, 0.02 * np.sin(i / 20), 0]
        T.append(T[-1] @ d)
    T = np.stack(T)
    assert ate_rmse(T, T) < 1e-12
    drift = kitti_drift(T, T)
    assert drift["segments"] > 0
    assert drift["t_err_pct"] < 1e-9

    # a known constant per-step translation error shows up in the drift
    T2 = T.copy()
    T2[:, 0, 3] *= 1.01  # 1% scale error along x
    d2 = kitti_drift(T2, T)
    assert 0.5 < d2["t_err_pct"] < 2.0


def test_shipped_config_files_match_presets():
    """The YAML .cfg files shipped in madicp_tpu/configurations are
    generated from (and must stay in sync with) the preset tables."""
    from pathlib import Path

    import madicp_tpu
    from madicp_tpu.utils.config import (
        DATASET_CONFIGS,
        MAD_PARAMS,
        load_dataset_config,
        load_mad_params,
    )

    root = Path(madicp_tpu.__file__).parent / "configurations"
    assert load_mad_params(root / "default.cfg") == MAD_PARAMS["default"]
    for name, preset in DATASET_CONFIGS.items():
        f = root / "datasets" / f"{name}.cfg"
        assert f.exists(), f"missing shipped config {f}"
        assert load_dataset_config(f) == preset


def test_pointcloud2_absolute_timestamps_normalize(rng):
    """Absolute per-point stamps (e.g. epoch seconds) must normalize to
    the full [0, 1] sweep, not collapse toward 1 (min/max 'initial='
    regression)."""
    pts = rng.normal(size=(64, 3)) * 3 + 5
    msg = _pc2_msg(pts)
    # rewrite the time field with large absolute values spanning 0.1 s
    dt = np.dtype({"names": ["x", "y", "z", "t"],
                   "formats": ["<f4", "<f4", "<f4", "<u4"],
                   "offsets": [0, 4, 8, 12], "itemsize": 16})
    arr = np.frombuffer(bytearray(msg.data), dtype=dt).copy()
    arr["t"] = np.linspace(1_500_000_000, 1_500_000_100, 64).astype(np.uint32)
    msg.data = arr.tobytes()
    _, ts = read_point_cloud(msg, min_range=0.1, max_range=1e3)
    assert ts.min() == pytest.approx(0.0)
    assert ts.max() == pytest.approx(1.0)
    assert ts.std() > 0.2  # spans the sweep, not clamped to ~1


def test_kitti_reader_random_access(tmp_path, rng):
    for i in range(3):
        rec = rng.normal(size=(50, 4)).astype(np.float32) * 5
        rec.tofile(tmp_path / f"{i:06d}.bin")
    r = KittiReader(tmp_path, min_range=0, max_range=1e3, sensor_hz=10.0)
    t1, p1 = r[1]
    assert t1 == pytest.approx(0.2)
    # random access must not disturb iteration state
    seq = list(r)
    assert len(seq) == 3
    np.testing.assert_array_equal(seq[1][1], p1)
