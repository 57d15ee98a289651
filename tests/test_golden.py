"""Golden self-regression: the full pipeline on a fixed synthetic drive.

Pins end-to-end behavior (poses + inlier ratios) against a stored f64
trajectory so refactors of the tree/ICP internals cannot silently change
odometry output. Regenerate ``golden_four_walls.npz`` ONLY for an
intentional, understood behavior change (run this file's ``_drive``
under x64 CPU and save).
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from madicp_tpu.models.pipeline import Pipeline

# the golden drive exercises the full default pipeline config, so the
# smoke tier gets end-to-end coverage from it (see README)
pytestmark = pytest.mark.smoke

GOLDEN = Path(__file__).parent / "golden_four_walls.npz"


def _drive(certify: bool = True):
    rng = np.random.default_rng(42)

    def plane(xr, yr, zr, n):
        return np.column_stack(
            [rng.uniform(*xr, n), rng.uniform(*yr, n), rng.uniform(*zr, n)]
        )

    w, h, n = 4.0, 2.0, 1000
    room = np.vstack(
        [
            plane([0, w], [0, 0], [0, h], n),
            plane([0, w], [w, w], [0, h], n),
            plane([0, 0], [0, w], [0, h], n),
            plane([w, w], [0, w], [0, h], n),
            plane([0, w], [0, w], [0, 0], n),
        ]
    )
    p = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=3,
        n_points=8192, depth=12, max_leaves=4096, dtype=jnp.float64,
        certify=certify,
    )
    poses, ratios = [], []
    for i in range(10):
        t = np.array([0.05 * i, 0.02 * i, 0.0])
        yaw = 0.003 * i
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        scan = (room - t) @ R + rng.normal(0, 0.001, room.shape)
        p.compute(0.1 * i, scan)
        poses.append(p.current_pose())
        ratios.append(p.inlier_ratio())
    return np.stack(poses), np.array(ratios)


def test_pipeline_matches_golden():
    golden = np.load(GOLDEN)
    poses, ratios = _drive()
    np.testing.assert_allclose(poses, golden["poses"], atol=1e-9)
    np.testing.assert_allclose(ratios, golden["ratios"], atol=1e-9)


def test_plain_exact_matches_golden():
    """The PLAIN exact schedule (certify=False) must reproduce the same
    golden: the stored npz thereby anchors certified and plain exact to
    each other on a promotion-rich scene. This is the guard that caught
    the arccos motion-budget soundness leak the smaller 2-keyframe
    identity test missed (see models/pipeline.py motion_bound)."""
    golden = np.load(GOLDEN)
    poses, ratios = _drive(certify=False)
    np.testing.assert_allclose(poses, golden["poses"], atol=1e-9)
    np.testing.assert_allclose(ratios, golden["ratios"], atol=1e-9)


def test_golden_tracks_ground_truth():
    """The stored golden itself must be a good trajectory (sanity against
    accidentally pinning a broken run)."""
    golden = np.load(GOLDEN)
    poses = golden["poses"]
    gt_t = np.stack(
        [np.array([0.05 * i, 0.02 * i, 0.0]) for i in range(10)]
    )
    err = np.linalg.norm(poses[:, :3, 3] - gt_t, axis=1)
    assert float(err.max()) < 5e-3
    assert golden["ratios"].min() > 0.95
