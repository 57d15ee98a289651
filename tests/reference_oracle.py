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


def _any_perp(v):
    """Deterministic unit vector orthogonal to v (same convention as
    ``madicp_tpu.ops.eigh3._any_perp``)."""
    axis = (
        np.array([1.0, 0.0, 0.0])
        if abs(v[0]) <= abs(v[1])
        else np.array([0.0, 1.0, 0.0])
    )
    p = np.cross(v, axis)
    return p / np.linalg.norm(p)


def canonical_eigh(cov):
    """LAPACK eigh + the framework's deterministic degenerate-pair
    canonicalisation (see ``ops/eigh3.py``): when two eigenvalues
    coincide the eigenplane basis is mathematically arbitrary (the
    reference's Eigen solver makes an unreproducible internal choice,
    e.g. the rank-1 covariance of a 2-point node whose null-space vector
    becomes a surfel normal, ``mad_tree.cpp:104-112``); both sides of the
    parity tests resolve it with the same axis-cross convention."""
    w, V = np.linalg.eigh(cov)
    scale = np.abs(cov).max()
    if scale > 0:
        tol = 1e-6 * scale  # must match ops/eigh3.py tol_c (f64)
        deg01 = (w[1] - w[0]) < tol
        deg12 = (w[2] - w[1]) < tol
        if deg01 and not deg12:
            V = V.copy()
            V[:, 0] = _any_perp(V[:, 2])
            V[:, 1] = np.cross(V[:, 2], V[:, 0])
        elif deg12 and not deg01:
            V = V.copy()
            V[:, 2] = _any_perp(V[:, 0])
            V[:, 1] = np.cross(V[:, 2], V[:, 0])
    return w, V


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
        w, evecs = canonical_eigh(cov)
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
            # representative: input point nearest to the mean
            # (mad_tree.cpp:76-86), with mathematical ties (e.g. the two
            # points of a 2-point leaf, equidistant from the midpoint up
            # to rounding) broken by LOWEST ORIGINAL INDEX — the same
            # value-independent rule as ops/tree.py (the reference's
            # winner for such ties is its unobservable in-place
            # partition order; fp argmin would let each implementation's
            # rounding noise pick a different winner).
            d = np.linalg.norm(pts - mean, axis=1)
            tie = d <= d.min() * (1.0 + 1e-9)
            j = int(np.nonzero(tie)[0][0])
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


def clamp_step(dx, t_max=1.0, r_max=0.5):
    """Trust-region GN-step clamp, mirroring ``ops/icp_core.clamp_step``
    (inactive for nominal mm-scale steps; see its docstring)."""
    dt = np.linalg.norm(dx[:3])
    dr = np.linalg.norm(dx[3:])
    return dx * min(1.0, t_max / max(dt, 1e-30), r_max / max(dr, 1e-30))


def icp_solve(root, moving_pts, X0, b_max, b_ratio, rho_ker, iterations=15):
    """Full pairwise registration loop (mad_icp_wrapper.h:72-81)."""
    X = X0.copy()
    for _ in range(iterations):
        H, b, matched = icp_terms(root, moving_pts, X, b_max, b_ratio, rho_ker)
        dx = clamp_step(np.linalg.solve(H, -b))
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


def log_so3(R):
    """Trace-based log map (lie_algebra.h:54-89), principal branch."""
    tr = np.trace(R)
    cos_t = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(cos_t)
    if th < 1e-9:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2.0
    if abs(np.pi - th) < 1e-6:
        # theta ~ pi branch: axis from the symmetric part
        A = (R + np.eye(3)) / 2.0
        axis = np.sqrt(np.maximum(np.diag(A), 0.0))
        # fix signs from off-diagonals
        if axis[0] > 0:
            axis[1] = np.copysign(axis[1], A[0, 1])
            axis[2] = np.copysign(axis[2], A[0, 2])
        elif axis[1] > 0:
            axis[2] = np.copysign(axis[2], A[1, 2])
        return th * axis / max(np.linalg.norm(axis), 1e-30)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2.0 * np.sin(th)) * w


CHUNKS = 1024


def deskew_reference(points, T_prev, T_now, sensor_hz):
    """The reference deskew, literally (``pipeline.cpp:79-123``).

    Sorts by azimuth, sweeps the sorted cloud from the highest azimuth
    down advancing the time offset AT MOST ONCE PER POINT, and transforms
    each point by ``[exp(w t) | v t]`` of its offset. Returns the cloud in
    the ORIGINAL point order (the reference rewrites it sorted; order is
    side-effect only — see ops/deskew.py docstring), plus the advance
    count per original point for direct bin comparisons.
    """
    ts = 1.0 / sensor_hz
    T_rel = np.linalg.inv(T_prev) @ T_now
    naive_vel = np.concatenate([T_rel[:3, 3], log_so3(T_rel[:3, :3])]) / ts

    az = np.arctan2(points[:, 1], points[:, 0])
    order = np.argsort(az, kind="stable")  # ascending, like std::sort
    resolution = 2.0 * np.pi / CHUNKS
    delta = ts / (CHUNKS - 1)

    out = np.zeros_like(points)
    k_of = np.zeros(len(points), np.int64)
    t = -ts
    k = 0
    angle = np.pi - resolution
    for i in range(len(order) - 1, -1, -1):  # descending azimuth
        j = order[i]
        if az[j] < angle:
            angle -= resolution
            t += delta
            k += 1
        d = naive_vel * t
        out[j] = exp_so3(d[3:]) @ points[j] + d[:3]
        k_of[j] = k
    return out, k_of


class PipelineOracle:
    """Complete scan-loop oracle of the reference ``Pipeline``
    (``pipeline.cpp:125-284``): deskew, tree build, constant-velocity
    prediction, MAX_ICP_ITS full re-association GN rounds over the
    keyframe deque, inlier ratio from the final round, trajectory +
    velocity smoothing, frame window with ``det(H^-1)`` weights,
    information-driven keyframe promotion/eviction. Pure numpy/f64,
    deliberately literal and slow.
    """

    MAX_ICP_ITS = 15
    FRAME_WINDOW = 10
    SMOOTHING_T = 10

    def __init__(self, sensor_hz, deskew, b_max, rho_ker, p_th, b_min,
                 b_ratio, num_keyframes):
        self.sensor_hz = sensor_hz
        self.deskew = deskew
        self.b_max = b_max
        self.rho_ker = rho_ker
        self.p_th = p_th
        self.b_min = b_min
        self.b_ratio = b_ratio
        self.num_keyframes = num_keyframes
        self.X = np.eye(4)
        self.velocity = np.zeros(6)
        self.trajectory = []
        self.keyframes = []   # list of dicts: root, leaves(list), pose, seq
        self.frames = []      # window: dicts + weight
        self.seq = 0
        self.seq_keyframe = 0
        self.keyframe_to_map = np.eye(4)
        self.is_map_updated = False
        self.inliers_ratio = 1.0

    @staticmethod
    def _map_frame_tree(root, R, t):
        """applyTransform (mad_tree.cpp:165-172) on the oracle tree."""

        def rec(n):
            n.mean = R @ n.mean + t
            n.evecs = R @ n.evecs
            n.normal = R @ n.normal
            if n.is_leaf:
                n.repr = R @ n.repr + t
            else:
                rec(n.left)
                rec(n.right)

        rec(root)

    def compute(self, stamp, cloud):
        self.is_map_updated = False
        if self.seq == 0:
            root = build(cloud, self.b_max, self.b_min)
            self.keyframes.append(
                dict(root=root, leaves=leaves(root), pose=np.eye(4), seq=0)
            )
            self.trajectory.append(np.eye(4))
            self.seq = 1
            self.is_map_updated = True
            return

        if self.deskew and len(self.trajectory) > 1:
            cloud, _ = deskew_reference(
                cloud, self.trajectory[-2], self.trajectory[-1], self.sensor_hz
            )

        root = build(cloud, self.b_max, self.b_min)
        lv = leaves(root)
        moving = np.stack([l.repr for l in lv])

        dx = self.velocity / self.sensor_hz
        dX = np.eye(4)
        dX[:3, :3] = exp_so3(dx[3:])
        dX[:3, 3] = dx[:3]
        X = self.X @ dX

        H = np.zeros((6, 6))
        matched = np.zeros(len(lv), bool)
        for _ in range(self.MAX_ICP_ITS):
            H = np.zeros((6, 6))
            b = np.zeros(6)
            matched = np.zeros(len(lv), bool)
            for kf in self.keyframes:
                Hk, bk, mk = icp_terms(
                    kf["root"], moving, X, self.b_max, self.b_ratio, self.rho_ker
                )
                H += Hk
                b += bk
                matched |= mk
            dxs = clamp_step(np.linalg.solve(H, -b))
            dXs = np.eye(4)
            dXs[:3, :3] = exp_so3(dxs[3:])
            dXs[:3, 3] = dxs[:3]
            X = X @ dXs

        self.X = X
        self.inliers_ratio = matched.sum() / len(lv)
        self.trajectory.append(X.copy())

        window = self.trajectory[-self.SMOOTHING_T:]
        self.velocity = vel_one_round(
            self.velocity.copy(), window, 1.0 / self.sensor_hz
        )

        weight = np.linalg.det(np.linalg.inv(H))
        self._map_frame_tree(root, X[:3, :3], X[:3, 3])
        self.frames.append(
            dict(root=root, leaves=leaves(root), pose=X.copy(),
                 seq=self.seq, weight=weight, stamp=stamp)
        )
        if len(self.frames) > self.FRAME_WINDOW:
            self.frames.pop(0)

        if self.inliers_ratio < self.p_th:
            best = min(self.frames, key=lambda f: f["weight"])
            new_seq = best["seq"]
            while self.frames and self.frames[0]["seq"] <= new_seq:
                self.frames.pop(0)
            self.keyframes.append(best)
            if len(self.keyframes) > self.num_keyframes:
                self.keyframes.pop(0)
            self.is_map_updated = True
            self.seq_keyframe = new_seq
            self.keyframe_to_map = best["pose"].copy()

        self.seq += 1


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
