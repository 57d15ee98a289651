import pytest

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from madicp_tpu.ops.lie import (
    skew,
    exp_so3,
    log_so3,
    euler_xyz,
    se3_matrix,
    se3_inverse,
    se3_apply,
    exp_se3_split,
)
import reference_oracle as oracle

pytestmark = pytest.mark.smoke  # fast oracle tier (see README)


def test_skew(rng):
    v = rng.normal(size=(7, 3))
    S = np.asarray(skew(jnp.asarray(v)))
    for i in range(7):
        np.testing.assert_allclose(S[i], oracle.skew(v[i]), atol=1e-12)
        w = rng.normal(size=3)
        np.testing.assert_allclose(S[i] @ w, np.cross(v[i], w), atol=1e-12)


def test_exp_so3_matches_scipy(rng):
    w = rng.normal(size=(50, 3))
    R = np.asarray(exp_so3(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-10)


def test_exp_so3_small_angle_branch():
    # matches the reference's I + W small-angle form (lie_algebra.h:45-46)
    w = np.array([1e-6, -2e-6, 5e-7])
    R = np.asarray(exp_so3(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.eye(3) + oracle.skew(w), atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(exp_so3(jnp.zeros(3))), np.eye(3), atol=0
    )


def test_log_exp_roundtrip(rng):
    w = rng.normal(size=(100, 3))
    w = w / np.linalg.norm(w, axis=1, keepdims=True)
    w = w * rng.uniform(1e-4, np.pi - 1e-3, size=(100, 1))
    out = np.asarray(log_so3(exp_so3(jnp.asarray(w))))
    np.testing.assert_allclose(out, w, atol=1e-8)


def test_log_so3_near_pi():
    for axis in [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                 np.array([0.57735, 0.57735, 0.57735])]:
        w = axis * (np.pi - 1e-9)
        R = Rotation.from_rotvec(w).as_matrix()
        out = np.array(log_so3(jnp.asarray(R)))  # copy: scipy needs writable
        np.testing.assert_allclose(
            Rotation.from_rotvec(out).as_matrix(), R, atol=1e-5
        )


def test_log_so3_identity():
    np.testing.assert_allclose(
        np.asarray(log_so3(jnp.eye(3))), np.zeros(3), atol=1e-12
    )


def test_euler_xyz_matches_oracle(rng):
    R = Rotation.from_rotvec(rng.normal(size=(20, 3)) * 0.5).as_matrix()
    ours = np.asarray(euler_xyz(jnp.asarray(R)))
    for i in range(20):
        np.testing.assert_allclose(ours[i], oracle.euler_xyz(R[i]), atol=1e-12)


def test_se3_helpers(rng):
    R = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
    t = rng.normal(size=3)
    T = np.asarray(se3_matrix(jnp.asarray(R), jnp.asarray(t)))
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[:3, :3], R)
    Tinv = np.asarray(se3_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-12)
    pts = rng.normal(size=(11, 3))
    out = np.asarray(se3_apply(jnp.asarray(T), jnp.asarray(pts)))
    np.testing.assert_allclose(out, pts @ R.T + t, atol=1e-12)


def test_exp_se3_split_convention(rng):
    # rotation via exp map, translation applied raw (mad_icp.cpp:112-115)
    dx = rng.normal(size=6) * 0.1
    T = np.asarray(exp_se3_split(jnp.asarray(dx)))
    np.testing.assert_allclose(T[:3, :3], oracle.exp_so3(dx[3:]), atol=1e-12)
    np.testing.assert_allclose(T[:3, 3], dx[:3], atol=1e-12)
