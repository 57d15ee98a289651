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


def synthetic_corridor_scans(rng, n_scans=110, n_points=2048, step=0.25):
    """Long-corridor drive for the long-horizon drift regression: floor,
    two side walls, and cross-wall slabs (with a central door gap) every
    6 m so point-to-plane has a travel-direction constraint. Each scan is
    sampled fresh in the sensor frame from the +-10 m window around the
    sensor, like a range-limited LiDAR; the sensor weaves gently in yaw
    and y so promotions and velocity smoothing are exercised.

    Returns (scans, gt_poses) with gt_poses lidar->world.
    """
    scans, poses = [], []
    for i in range(n_scans):
        x_s = 1.0 + step * i
        yaw = 0.03 * np.sin(0.08 * i)
        t = np.array([x_s, 3.0 + 0.3 * np.sin(0.05 * i), 1.0])
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        lo, hi = x_s - 10.0, x_s + 10.0
        n = n_points // 4
        floor = np.column_stack(
            [rng.uniform(lo, hi, n), rng.uniform(0, 6, n), np.zeros(n)]
        )
        w1 = np.column_stack(
            [rng.uniform(lo, hi, n), np.zeros(n), rng.uniform(0, 2.5, n)]
        )
        w2 = np.column_stack(
            [rng.uniform(lo, hi, n), np.full(n, 6.0), rng.uniform(0, 2.5, n)]
        )
        m = n_points - 3 * n
        slab_x = 6.0 * np.round(rng.uniform(lo, hi, m) / 6.0)
        door = rng.uniform(size=m) < 0.5
        slab_y = rng.uniform(0, 2.0, m) + np.where(door, 0.0, 4.0)
        slabs = np.column_stack([slab_x, slab_y, rng.uniform(0, 2.5, m)])
        world = np.vstack([floor, w1, w2, slabs])
        local = (world - t) @ R  # world -> sensor frame
        scans.append(local)
        poses.append(T)
    return scans, poses
