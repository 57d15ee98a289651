"""Pure-numpy oracle implementing the reference's documented contracts.

A small, recursive, float64 implementation of the MAD-ICP math written
from the behavioral contracts in SURVEY.md §2.1 (tree build, descent
search, gating, residual/Jacobian/weights, GN step, velocity estimator).
Used as the ground truth that the batched TPU implementation must match
on small problems. Deliberately simple and slow.
"""

from __future__ import annotations

import numpy as np


class Node:
    __slots__ = (
        "mean", "evecs", "bbox", "npts", "normal", "repr",
        "left", "right", "point_idx",
    )

    def __init__(self):
        self.left = None
        self.right = None
        self.point_idx = None

    @property
    def is_leaf(self):
        return self.left is None and self.right is None


def _mean_cov(pts):
    k = pts.shape[0]
    mean = pts.mean(axis=0)
    cov = pts.T @ pts / k - np.outer(mean, mean)
    if k >= 2:
        cov = cov * (k / (k - 1.0))
    else:
        cov = np.zeros((3, 3))
    return mean, cov, k


def _bbox(pts, mean, evecs):
    v = (pts - mean) @ evecs  # coordinates in eigenbasis
    lo = np.minimum(v.min(axis=0), 0.0)
    hi = np.maximum(v.max(axis=0), 0.0)
    return hi - lo


def build(points, b_max, b_min, max_depth=64):
    """Recursive MAD-tree build (contracts of mad_tree.cpp:47-130)."""

    def rec(idx, parent, plane_pred, depth):
        node = Node()
        pts = points[idx]
        mean, cov, k = _mean_cov(pts)
        w, evecs = np.linalg.eigh(cov)
        node.mean = mean
        node.evecs = evecs
        node.npts = k
        node.bbox = _bbox(pts, mean, evecs)
        node.normal = evecs[:, 0]

        if node.bbox[2] < b_max or depth >= max_depth:
            if plane_pred is not None:
                node.normal = plane_pred.evecs[:, 0]
            elif k < 3:
                up = node
                chain = parent
                while chain is not None and up.npts < 3:
                    up = chain[0]
                    chain = chain[1]
                node.normal = up.evecs[:, 0]
            d = np.linalg.norm(pts - mean, axis=1)
            j = int(np.argmin(d))
            node.repr = pts[j]
            node.point_idx = idx
            return node

        if plane_pred is None and node.bbox[0] < b_min:
            plane_pred = node

        side = (pts - mean) @ evecs[:, 2] < 0.0
        node.left = rec(idx[side], (node, parent), plane_pred, depth + 1)
        node.right = rec(idx[~side], (node, parent), plane_pred, depth + 1)
        return node

    idx0 = np.arange(points.shape[0])
    return rec(idx0, None, None, 0)


def search(root, q):
    """No-backtracking descent (mad_tree.cpp:144-152)."""
    node = root
    while not node.is_leaf:
        node = node.left if (q - node.mean) @ node.evecs[:, 2] < 0.0 else node.right
    return node


def leaves(root):
    out = []

    def rec(n):
        if n.is_leaf:
            out.append(n)
            return
        rec(n.left)
        rec(n.right)

    rec(root)
    return out


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])


def exp_so3(w):
    th2 = w @ w
    W = skew(w)
    if th2 < 1e-8:
        return np.eye(3) + W
    th = np.sqrt(th2)
    K = W / th
    return np.eye(3) + np.sin(th) * K + (2 * np.sin(th / 2) ** 2) * (K @ K)


def icp_terms(root, moving_pts, X, b_max, b_ratio, rho_ker):
    """One association + normal-equation pass (mad_icp.cpp:74-103)."""
    R = X[:3, :3]
    t = X[:3, 3]
    rho = np.sqrt(rho_ker)
    H = np.zeros((6, 6))
    b = np.zeros(6)
    matched = np.zeros(len(moving_pts), bool)
    for i, m in enumerate(moving_pts):
        ml = R @ m + t
        f = search(root, ml)
        if np.linalg.norm(ml - f.repr) > b_max + b_ratio * np.linalg.norm(m):
            continue
        matched[i] = True
        n = f.normal
        e = (ml - f.repr) @ n
        J = np.concatenate([n @ R, -(n @ R) @ skew(m)])
        chi = abs(e)
        scale = rho / chi if chi > rho else 1.0
        w = 1.0 - f.bbox[0] / b_max
        scale *= w * w
        H += scale * np.outer(J, J)
        b += scale * J * e
    return H, b, matched


def icp_solve(root, moving_pts, X0, b_max, b_ratio, rho_ker, iterations=15):
    """Full pairwise registration loop (mad_icp_wrapper.h:72-81)."""
    X = X0.copy()
    for _ in range(iterations):
        H, b, matched = icp_terms(root, moving_pts, X, b_max, b_ratio, rho_ker)
        dx = np.linalg.solve(H, -b)
        dX = np.eye(4)
        dX[:3, :3] = exp_so3(dx[3:])
        dX[:3, 3] = dx[:3]
        X = X @ dX
    return X, matched


def euler_xyz(R):
    return np.array(
        [
            np.arctan2(-R[1, 2], R[2, 2]),
            np.arcsin(R[0, 2]),
            np.arctan2(-R[0, 1], R[0, 0]),
        ]
    )


def vel_one_round(X_vel, odometry, ts, e_threshold=0.3162):
    """One GN round of the velocity estimator (vel_estimator.cpp:45-97)."""
    H = np.zeros((6, 6))
    b = np.zeros(6)
    n = len(odometry)
    T_now = odometry[-1]
    for i in range(n - 1):
        T_prev = odometry[i]
        dt = (n - 1 - i) * ts
        weight = 1.0 - (n - 2 - i) / (n - 1)
        T_rel = np.linalg.inv(T_prev) @ T_now
        e = np.concatenate(
            [
                dt * X_vel[:3] - T_rel[:3, 3],
                dt * X_vel[3:] - euler_xyz(T_rel[:3, :3]),
            ]
        )
        J = np.eye(6) * dt
        chi = np.linalg.norm(e)
        scale = e_threshold / chi if chi > e_threshold else 1.0
        H += scale * weight * J.T @ J
        b += scale * weight * J.T @ e
    dx = np.linalg.solve(H, -b)
    return X_vel + dx
