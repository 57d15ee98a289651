"""Shared small synthetic fixtures for tests."""

import numpy as np


def small_walls(rng, n=160, width=4.0, height=2.0):
    """A small two-walls-plus-floor cloud for exact-parity tests."""
    k = n // 4
    w1 = np.column_stack(
        [rng.uniform(0, width, k), np.zeros(k), rng.uniform(0, height, k)]
    )
    w2 = np.column_stack(
        [np.zeros(k), rng.uniform(0, width, k), rng.uniform(0, height, k)]
    )
    fl = np.column_stack(
        [
            rng.uniform(0, width, n - 2 * k),
            rng.uniform(0, width, n - 2 * k),
            np.zeros(n - 2 * k),
        ]
    )
    return np.vstack([w1, w2, fl])


def synthetic_room_scans(rng, n_scans=8, n_points=1500, step=0.08):
    """A simple synthetic odometry sequence: a sensor translating inside a
    four-walls room, each scan sampled fresh in the sensor frame.

    Returns (scans, gt_poses) with gt_poses lidar->world.
    """
    from conftest import four_walls_cloud

    scans = []
    poses = []
    for i in range(n_scans):
        t = np.array([1.0 + step * i, 1.2 + 0.4 * step * i, 0.5])
        yaw = 0.02 * i
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        world = four_walls_cloud(rng, points_per_wall=n_points // 5)
        local = (world - t) @ R  # world -> sensor frame
        scans.append(local)
        poses.append(T)
    return scans, poses
