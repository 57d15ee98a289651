"""Batched SO(3)/SE(3) operations.

Numerical conventions follow the reference implementation
(``mad_icp/src/tools/lie_algebra.h:33-89`` and the Euler extraction of
``mad_icp/src/odometry/vel_estimator.cpp:53-56``) so that trajectories are
comparable, but everything here is fully batched/vectorised JAX, usable
under ``jit``/``vmap`` at any float dtype.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (cross-product) matrix of ``v``: (..., 3) -> (..., 3, 3).

    Parity: reference ``lie_algebra.h:33-37``.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def exp_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map: (..., 3) -> (..., 3, 3).

    Small-angle branch at ``theta^2 < 1e-8`` returns ``I + W`` exactly like
    the reference (``lie_algebra.h:39-52``); the regular branch uses the
    ``2 sin^2(theta/2)`` form of ``1 - cos(theta)``.
    """
    dtype = omega.dtype
    theta_sq = jnp.sum(omega * omega, axis=-1)
    small = theta_sq < 1e-8
    # Guard the division so the untaken branch produces finite values.
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    W = skew(omega)
    K = W / theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    one_minus_cos = 2.0 * jnp.sin(theta / 2.0) ** 2
    R_full = (
        eye
        + jnp.sin(theta)[..., None, None] * K
        + one_minus_cos[..., None, None] * (K @ K)
    )
    R_small = eye + W
    return jnp.where(small[..., None, None], R_small, R_full)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map of SO(3): (..., 3, 3) -> (..., 3).

    Replicates the reference's trace-based formula with its special cases
    near ``theta = pi`` (three sub-branches on the diagonal) and the Taylor
    expansion near ``theta = 0`` (``lie_algebra.h:54-89``).
    """
    dtype = R.dtype
    R11, R12, R13 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    R21, R22, R23 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    R31, R32, R33 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = R11 + R22 + R33

    near_pi = (tr + 1.0) < 1e-10

    def _axis_branch(Rii, a, b, c):
        denom = jnp.sqrt(jnp.maximum(2.0 + 2.0 * Rii, 1e-30))
        return (jnp.pi / denom)[..., None] * jnp.stack([a, b, c], axis=-1)

    # theta ~ pi branches (picked by which diagonal entry is not -1)
    branch33 = _axis_branch(R33, R13, R23, 1.0 + R33)
    branch22 = _axis_branch(R22, R12, 1.0 + R22, R32)
    branch11 = _axis_branch(R11, 1.0 + R11, R21, R31)
    pi_omega = jnp.where(
        (jnp.abs(R33 + 1.0) > 1e-5)[..., None],
        branch33,
        jnp.where((jnp.abs(R22 + 1.0) > 1e-5)[..., None], branch22, branch11),
    )

    # regular branch
    tr_3 = tr - 3.0
    regular = tr_3 < -1e-7
    # acos argument clipped for safety at |.| <= 1
    theta = jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    mag_reg = theta / jnp.where(
        jnp.abs(sin_theta) < 1e-30, jnp.ones_like(sin_theta), 2.0 * sin_theta
    )
    mag_taylor = 0.5 - tr_3 * tr_3 / 12.0
    magnitude = jnp.where(regular, mag_reg, mag_taylor).astype(dtype)
    main_omega = magnitude[..., None] * jnp.stack(
        [R32 - R23, R13 - R31, R21 - R12], axis=-1
    )

    return jnp.where(near_pi[..., None], pi_omega, main_omega)


def euler_xyz(R: jnp.ndarray) -> jnp.ndarray:
    """Euler angles in the velocity-estimator convention: (...,3,3) -> (...,3).

    Parity: reference ``vel_estimator.cpp:53-56``::

        ax = atan2(-R(1,2), R(2,2));  ay = asin(R(0,2));  az = atan2(-R(0,1), R(0,0))
    """
    ax = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    ay = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    az = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.stack([ax, ay, az], axis=-1)


def se3_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble a homogeneous (..., 4, 4) transform from (...,3,3) and (...,3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a homogeneous rigid transform (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_matrix(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) rigid transform to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def exp_se3_split(dx: jnp.ndarray) -> jnp.ndarray:
    """MAD-ICP's SE(3) increment: rotation via exp map, translation raw.

    ``dx`` is (..., 6) ordered ``[t(3), omega(3)]``. The reference applies
    Gauss-Newton increments as ``dX.linear()=expMapSO3(dx.tail(3));
    dX.translation()=dx.head(3)`` (``mad_icp.cpp:112-115``,
    ``pipeline.cpp:146-151``) — i.e. NOT the full SE(3) exponential.
    """
    return se3_matrix(exp_so3(dx[..., 3:6]), dx[..., 0:3])
