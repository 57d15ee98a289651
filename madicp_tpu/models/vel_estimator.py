"""Constant-velocity estimator over a short pose window.

Parity with the reference ``VelEstimator`` (``vel_estimator.cpp:32-97``):
one Gauss-Newton round per scan over the last <= ``SMOOTHING_T`` poses,
residual per pose pair ``dt * v - [trans; eulerXYZ](T_prev^-1 T_now)``,
``J = dt * I6``, linearly decaying weights toward older poses and a robust
clamp at ``chi > E_THRESHOLD_VEL``. The pair loop is fully vectorised and
masked to the actual window length, so it runs inside the jitted pipeline
step with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from madicp_tpu.ops.constants import E_THRESHOLD_VEL, SMOOTHING_T
from madicp_tpu.ops.lie import euler_xyz, se3_inverse


def estimate_velocity(
    v0: jnp.ndarray,
    traj: jnp.ndarray,
    count: jnp.ndarray,
    ts,
) -> jnp.ndarray:
    """One GN round of the velocity estimate.

    Args:
        v0: (6,) current velocity ``[v_lin, v_ang]``.
        traj: (W, 4, 4) pose window, newest LAST; older slots may be padding.
        count: number of valid poses occupying the trailing slots
               (window length n = min(count, W)).
        ts: scan period (1 / sensor_hz).

    Mapping to the reference loop (``vel_estimator.cpp:81-97``): with the
    window stored in the trailing ``n`` slots of a W-slot array, slot ``i``
    pairs with the newest pose using ``dt = (W-1-i) * ts`` and weight
    ``1 - (W-2-i)/(n-1)``, masked to ``i >= W-n``.
    """
    dtype = traj.dtype
    W = traj.shape[0]
    ts = jnp.asarray(ts, dtype)
    n = jnp.minimum(count, W).astype(dtype)

    T_now = traj[-1]
    T_prev = traj[:-1]  # (W-1, 4, 4)
    i = jnp.arange(W - 1, dtype=dtype)
    active = (i >= (W - n)) & (n >= 2)
    dt = (W - 1 - i) * ts
    denom = jnp.maximum(n - 1.0, 1.0)
    weight = 1.0 - (W - 2 - i) / denom

    T_rel = se3_inverse(T_prev) @ T_now  # (W-1, 4, 4)
    e_t = dt[:, None] * v0[None, :3] - T_rel[:, :3, 3]
    e_r = dt[:, None] * v0[None, 3:] - euler_xyz(T_rel[:, :3, :3])
    e = jnp.concatenate([e_t, e_r], axis=-1)  # (W-1, 6)

    chi = jnp.linalg.norm(e, axis=-1)
    thr = jnp.asarray(E_THRESHOLD_VEL, dtype)
    scale = jnp.where(chi > thr, thr / jnp.maximum(chi, 1e-30), 1.0)
    s = scale * weight * active.astype(dtype)

    # J = dt * I6 -> H is (sum s dt^2) * I6, b = sum s dt e
    h = jnp.sum(s * dt * dt)
    b = jnp.einsum("w,wi->i", s * dt, e)
    dx = -b / jnp.maximum(h, 1e-30)
    dx = jnp.where(h > 0, dx, jnp.zeros_like(dx))
    return v0 + dx


class VelEstimator:
    """Host-facing wrapper mirroring the reference class shape."""

    def __init__(self, sensor_hz: float, dtype=jnp.float64):
        self._ts = 1.0 / float(sensor_hz)
        self._dtype = dtype
        self.X = np.zeros(6)
        self._odometry: list[np.ndarray] = []

    def init(self, velocity):
        self.X = np.asarray(velocity, dtype=float).copy()

    def set_odometry(self, odometry):
        self._odometry = [np.asarray(T, dtype=float) for T in odometry]

    def one_round(self):
        # only the last <= SMOOTHING_T poses enter the estimate
        # (vel_estimator.cpp:81-97 via pipeline.cpp:208-217)
        odometry = self._odometry[-SMOOTHING_T:]
        n = len(odometry)
        W = SMOOTHING_T
        traj = np.tile(np.eye(4), (W, 1, 1))
        if n:
            traj[W - n :] = np.stack(odometry)
        self.X = np.asarray(
            estimate_velocity(
                jnp.asarray(self.X, dtype=self._dtype),
                jnp.asarray(traj, dtype=self._dtype),
                jnp.asarray(n),
                self._ts,
            )
        )
        return self.X

    # reference-style aliases
    setOdometry = set_odometry
    oneRound = one_round
