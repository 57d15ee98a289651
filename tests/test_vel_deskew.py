import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from madicp_tpu.models.vel_estimator import VelEstimator, estimate_velocity
from madicp_tpu.ops.constants import SMOOTHING_T
from madicp_tpu.ops.deskew import deskew_cloud
import reference_oracle as oracle


def _traj_const_vel(v, n, ts):
    """Poses of a constant-twist trajectory sampled every ts."""
    poses = [np.eye(4)]
    for _ in range(n - 1):
        d = np.eye(4)
        d[:3, :3] = oracle.exp_so3(np.asarray(v[3:]) * ts)
        d[:3, 3] = np.asarray(v[:3]) * ts
        poses.append(poses[-1] @ d)
    return poses


def test_vel_estimator_matches_oracle(rng):
    ts = 0.1
    for n in [2, 4, 10]:
        poses = [np.eye(4)]
        for _ in range(n - 1):
            d = np.eye(4)
            d[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.05).as_matrix()
            d[:3, 3] = rng.normal(size=3) * 0.3
            poses.append(poses[-1] @ d)
        v0 = rng.normal(size=6) * 0.1

        ref = oracle.vel_one_round(v0.copy(), poses, ts)

        est = VelEstimator(sensor_hz=1.0 / ts)
        est.init(v0)
        est.set_odometry(poses)
        ours = est.one_round()
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_vel_estimator_windowed_state(rng):
    # functional form with padded window + count, as used inside the pipeline
    ts = 0.1
    n = 6
    poses = _traj_const_vel([1.0, 0.2, 0.0, 0.0, 0.0, 0.3], n, ts)
    W = SMOOTHING_T
    traj = np.tile(np.eye(4), (W, 1, 1))
    traj[W - n :] = np.stack(poses)
    v0 = np.zeros(6)
    ours = np.asarray(
        estimate_velocity(jnp.asarray(v0), jnp.asarray(traj), jnp.asarray(n), ts)
    )
    ref = oracle.vel_one_round(v0, poses, ts)
    np.testing.assert_allclose(ours, ref, atol=1e-9)
    # count larger than window uses the last W poses
    poses2 = _traj_const_vel([1.0, 0.0, 0.0, 0.0, 0.0, 0.1], W + 5, ts)
    traj2 = np.stack(poses2[-W:])
    ours2 = np.asarray(
        estimate_velocity(
            jnp.asarray(v0), jnp.asarray(traj2), jnp.asarray(W + 5), ts
        )
    )
    ref2 = oracle.vel_one_round(v0, poses2[-W:], ts)
    np.testing.assert_allclose(ours2, ref2, atol=1e-9)


def test_vel_estimator_single_pose_noop():
    est = VelEstimator(sensor_hz=10.0)
    est.init(np.array([1.0, 0, 0, 0, 0, 0]))
    est.set_odometry([np.eye(4)])
    out = est.one_round()
    np.testing.assert_allclose(out, [1.0, 0, 0, 0, 0, 0])


def test_deskew_constant_velocity(rng):
    # A sensor spinning clockwise from +pi to -pi while translating with
    # constant velocity: deskewing must move early points (azimuth ~ +pi)
    # by ~ -v*ts and leave late points (~ -pi) nearly unchanged.
    ts = 0.1
    v = np.array([2.0, 0.0, 0.0])
    n = 4096
    az = np.linspace(np.pi - 1e-3, -np.pi + 1e-3, n)
    r = 10.0
    pts = np.column_stack([r * np.cos(az), r * np.sin(az), np.zeros(n)])

    T_prev = np.eye(4)
    T_now = np.eye(4)
    T_now[:3, 3] = v * ts

    out = np.asarray(
        deskew_cloud(jnp.asarray(pts), jnp.asarray(T_prev), jnp.asarray(T_now), 1.0 / ts)
    )
    shift = out - pts
    np.testing.assert_allclose(shift[0], -v * ts, atol=1e-3)
    np.testing.assert_allclose(shift[-1], 0.0, atol=1e-3)
    # monotone time ramp along the sweep
    assert np.all(np.diff(shift[:, 0]) >= -1e-9)


def test_deskew_identity_when_static():
    pts = np.random.default_rng(0).normal(size=(256, 3))
    out = np.asarray(
        deskew_cloud(jnp.asarray(pts), jnp.eye(4), jnp.eye(4), 10.0)
    )
    np.testing.assert_allclose(out, pts, atol=1e-12)


def test_deskew_rotation(rng):
    # pure yaw rotation: deskewed points rotated by exp(w * t_bin).
    # mode="binned": a point's time offset is a pure function of its
    # azimuth, so a lone mid-sweep point maps to the sweep's middle.
    # (The default "reference" mode replicates the literal serial sweep,
    # which advances the bin at most once per POINT — a 1-point cloud
    # stays at the sweep start; parity for that semantic is pinned in
    # tests/test_pipeline_oracle.py against the literal numpy loop.)
    ts = 0.1
    w = np.array([0.0, 0.0, 0.5])
    T_prev = np.eye(4)
    T_now = np.eye(4)
    T_now[:3, :3] = oracle.exp_so3(w * ts)
    pts = np.array([[10.0, 0.01, 0.0]])  # azimuth ~ 0 -> middle of sweep
    out = np.asarray(
        deskew_cloud(
            jnp.asarray(pts), jnp.asarray(T_prev), jnp.asarray(T_now),
            1.0 / ts, mode="binned",
        )
    )
    t_expect = -ts / 2
    R = oracle.exp_so3(w * t_expect)
    np.testing.assert_allclose(out[0], R @ pts[0], atol=2e-3)


def test_vel_estimator_window_caps_at_smoothing_t():
    """With more than SMOOTHING_T poses only the last 10 are used
    (pipeline.cpp:208-217): garbage older poses must not matter."""
    from madicp_tpu.models.vel_estimator import VelEstimator
    from madicp_tpu.ops.constants import SMOOTHING_T

    v = np.array([1.0, 0.5, 0.0, 0.0, 0.0, 0.1])
    ts = 0.1

    def traj(n, garbage_head=0):
        poses = []
        T = np.eye(4)
        for i in range(n):
            poses.append(T.copy())
            d = np.eye(4)
            d[:3, 3] = v[:3] * ts
            c, s = np.cos(v[5] * ts), np.sin(v[5] * ts)
            d[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            T = T @ d
        for i in range(garbage_head):
            poses[i] = np.diag([1.0, 1, 1, 1]) * 1  # identity garbage
            poses[i][:3, 3] = [100.0 + i, -50.0, 9.0]
        return poses

    a = VelEstimator(10.0)
    a.init(np.zeros(6))
    a.set_odometry(traj(SMOOTHING_T))
    va = a.one_round()

    b = VelEstimator(10.0)
    b.init(np.zeros(6))
    b.set_odometry(traj(30, garbage_head=20))  # garbage outside the window
    vb = b.one_round()

    np.testing.assert_allclose(va, vb, atol=1e-12)
