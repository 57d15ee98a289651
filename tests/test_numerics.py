"""f32 numerical-parity check for the full pipeline.

SURVEY.md §7 ranks "numerical parity in f32" as the second-hardest part:
the reference computes everything in f64, while the TPU path runs f32
with shifted moments (tree build) and a Jacobi-preconditioned 6x6 solve.
This drives the same synthetic trajectory through an f32 and an f64
pipeline and bounds the divergence.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from madicp_tpu.models.pipeline import Pipeline


def _run(dtype, scans, stamps):
    p = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=4,
        n_points=8192, depth=12, max_leaves=4096, dtype=dtype,
    )
    poses = []
    for ts, s in zip(stamps, scans):
        p.compute(ts, s)
        poses.append(p.current_pose())
    return np.stack(poses)


@pytest.fixture
def drive(rng, four_walls):
    """A 12-scan drive through the four-walls room (translation + yaw)."""
    scans, stamps = [], []
    for i in range(12):
        t = np.array([0.06 * i, 0.025 * i, 0.0])
        yaw = 0.004 * i
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        pts = (four_walls - t) @ R
        scans.append((pts + rng.normal(0, 0.001, pts.shape)).astype(np.float64))
        stamps.append(0.1 * i)
    return scans, stamps


def test_f32_tracks_f64(drive):
    scans, stamps = drive
    p32 = _run(jnp.float32, scans, stamps)
    p64 = _run(jnp.float64, scans, stamps)
    # both must track; f32 divergence from f64 stays at the millimetre
    # scale over the drive (translations here are ~0.7 m total)
    t_err = np.linalg.norm(p32[:, :3, 3] - p64[:, :3, 3], axis=1)
    assert np.isfinite(p32).all()
    assert float(t_err.max()) < 5e-3, t_err
    R_err = np.linalg.norm(p32[:, :3, :3] - p64[:, :3, :3], axis=(1, 2))
    assert float(R_err.max()) < 5e-3, R_err


def test_f64_recovers_motion(drive):
    scans, stamps = drive
    p64 = _run(jnp.float64, scans, stamps)
    # ground-truth per-scan translation is (0.06, 0.025, 0); after the
    # velocity model warms up the per-scan delta must match to ~mm
    deltas = np.linalg.inv(p64[:-1]) @ p64[1:]
    step_t = deltas[3:, :3, 3]
    gt = np.array([0.06, 0.025, 0.0])
    err = np.linalg.norm(step_t - gt, axis=1)
    assert float(err.max()) < 5e-3, err
