import pytest

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from madicp_tpu.ops.tree import build_tree, get_leaves
from madicp_tpu.ops.icp_core import icp_terms, solve_gn, gn_se3_step, neg_logdet
from madicp_tpu.models.registration import MADicp
import reference_oracle as oracle

pytestmark = pytest.mark.smoke  # fast oracle tier (see README)


B_MAX, B_MIN, B_RATIO, RHO = 0.2, 0.1, 0.02, 0.1


def _build(points, b_max=B_MAX, b_min=B_MIN, depth=13):
    pts = jnp.asarray(points)
    valid = jnp.ones(points.shape[0], bool)
    return build_tree(pts, valid, depth=depth, b_max=b_max, b_min=b_min)


def test_icp_terms_match_oracle(rng, four_walls):
    ref = four_walls
    tree, _ = _build(ref)
    root = oracle.build(ref, B_MAX, B_MIN)

    # moving leaves from an oracle build of a perturbed copy
    X = np.eye(4)
    X[:3, :3] = Rotation.from_euler("xyz", [0.05, -0.03, 0.08]).as_matrix()
    X[:3, 3] = [0.1, -0.2, 0.05]
    mov_root = oracle.build(ref, B_MAX, B_MIN)
    mov_pts = np.stack([l.repr for l in oracle.leaves(mov_root)])

    H_ref, b_ref, matched_ref = oracle.icp_terms(
        root, mov_pts, X, B_MAX, B_RATIO, RHO
    )
    terms = icp_terms(
        tree,
        jnp.asarray(mov_pts),
        jnp.ones(len(mov_pts), bool),
        jnp.asarray(X),
        b_max=B_MAX,
        b_ratio=B_RATIO,
        rho_ker=RHO,
    )
    np.testing.assert_array_equal(np.asarray(terms.matched), matched_ref)
    np.testing.assert_allclose(np.asarray(terms.H), H_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(terms.b), b_ref, atol=1e-8)


def test_gn_step_matches_oracle(rng):
    A = rng.normal(size=(6, 20))
    H = A @ A.T
    b = rng.normal(size=6)
    dx = np.asarray(solve_gn(jnp.asarray(H), jnp.asarray(b)))
    np.testing.assert_allclose(dx, np.linalg.solve(H, -b), rtol=1e-6, atol=1e-9)
    X = np.eye(4)
    X2 = np.asarray(gn_se3_step(jnp.asarray(X), jnp.asarray(H), jnp.asarray(b)))
    dX = np.eye(4)
    dX[:3, :3] = oracle.exp_so3(dx[3:])
    dX[:3, 3] = dx[:3]
    np.testing.assert_allclose(X2, X @ dX, atol=1e-8)


def test_solve_gn_empty():
    dx = np.asarray(solve_gn(jnp.zeros((6, 6)), jnp.zeros(6)))
    np.testing.assert_array_equal(dx, np.zeros(6))


def test_neg_logdet_ordering(rng):
    Hs = []
    for s in [1.0, 10.0, 100.0]:
        A = rng.normal(size=(6, 40)) * s
        Hs.append(A @ A.T)
    w = [float(np.asarray(neg_logdet(jnp.asarray(H)))) for H in Hs]
    det_inv = [1.0 / np.linalg.det(H) for H in Hs]
    assert np.argsort(w).tolist() == np.argsort(det_inv).tolist()


def test_registration_recovers_perturbation(rng, four_walls):
    # the reference's mad_registration demo: perturb a copy and recover
    # identity (mad_registration.py:48-69)
    ref_cloud = four_walls
    T_guess = np.eye(4)
    T_guess[:3, :3] = Rotation.from_euler("xyz", [0.1, 0.1, 0.1]).as_matrix()
    T_guess[:3, 3] = rng.random(3)

    icp = MADicp(dtype=jnp.float64)
    icp.set_reference_cloud(ref_cloud)
    icp.set_query_cloud(ref_cloud.copy())
    T_est = icp.compute(T_guess, icp_iterations=15)

    np.testing.assert_allclose(T_est, np.eye(4), atol=2e-3)


def test_registration_matches_oracle_full_loop(rng):
    # small cloud, exact parity of the full 15-round loop against the oracle
    from tests_fixtures_helper import small_walls

    ref_cloud = small_walls(rng, n=160)
    T0 = np.eye(4)
    T0[:3, :3] = Rotation.from_euler("xyz", [0.04, -0.02, 0.03]).as_matrix()
    T0[:3, 3] = [0.05, 0.02, -0.03]

    root = oracle.build(ref_cloud, B_MAX, B_MIN)
    mov_root = oracle.build(ref_cloud.copy(), B_MAX, B_MIN)
    mov_pts = np.stack([l.repr for l in oracle.leaves(mov_root)])
    X_ref, _ = oracle.icp_solve(root, mov_pts, T0, B_MAX, B_RATIO, RHO, 15)

    icp = MADicp(dtype=jnp.float64, depth=10)
    icp.set_reference_cloud(ref_cloud)
    icp.set_query_cloud(ref_cloud.copy())
    X_ours = icp.compute(T0, icp_iterations=15)

    np.testing.assert_allclose(X_ours, X_ref, atol=1e-6)


def test_registration_float32(rng, four_walls):
    T_guess = np.eye(4)
    T_guess[:3, :3] = Rotation.from_euler("xyz", [0.1, 0.1, 0.1]).as_matrix()
    T_guess[:3, 3] = rng.random(3)
    icp = MADicp(dtype=jnp.float32)
    icp.set_reference_cloud(four_walls)
    icp.set_query_cloud(four_walls.copy())
    T_est = icp.compute(T_guess, icp_iterations=15)
    np.testing.assert_allclose(T_est, np.eye(4), atol=5e-3)
