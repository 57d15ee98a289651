import pytest

import numpy as np
import jax.numpy as jnp

from madicp_tpu.ops.eigh3 import eigh3

pytestmark = pytest.mark.smoke  # fast oracle tier (see README)


def _check_batch(A, atol_val=1e-9, atol_vec=1e-7):
    evals, evecs = map(np.asarray, eigh3(jnp.asarray(A)))
    ref_vals = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(evals, ref_vals, atol=atol_val)
    # ascending
    assert np.all(np.diff(evals, axis=-1) >= -atol_val)
    # orthonormal columns
    gram = np.einsum("...ki,...kj->...ij", evecs, evecs)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape), atol=atol_vec)
    # eigen equation
    Av = np.einsum("...ij,...jk->...ik", A, evecs)
    lv = evals[..., None, :] * evecs
    np.testing.assert_allclose(Av, lv, atol=max(atol_vec, 1e-6) * (1 + np.abs(A).max()))


def test_random_symmetric(rng):
    B = rng.normal(size=(200, 3, 3))
    A = (B + np.swapaxes(B, -1, -2)) / 2
    _check_batch(A)


def test_covariance_like(rng):
    # anisotropic covariances like planar surfels
    pts = rng.normal(size=(50, 100, 3)) * np.array([1.0, 0.5, 0.01])
    A = np.einsum("bni,bnj->bij", pts, pts) / 100
    _check_batch(A, atol_val=1e-10)


def test_degenerate_cases():
    A = np.stack(
        [
            np.zeros((3, 3)),
            np.eye(3),
            np.diag([1.0, 1.0, 2.0]),
            np.diag([0.0, 1.0, 1.0]),
            np.diag([5.0, 5.0, 5.0]),
            np.diag([0.0, 0.0, 3.0]),
        ]
    )
    evals, evecs = map(np.asarray, eigh3(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(evals, ref, atol=1e-7)
    gram = np.einsum("...ki,...kj->...ij", evecs, evecs)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape), atol=1e-9)


def test_rank_one_two_points():
    # covariance of a 2-point cluster: rank one
    d = np.array([0.3, -0.1, 0.2])
    A = np.outer(d, d)[None]
    evals, evecs = map(np.asarray, eigh3(jnp.asarray(A)))
    np.testing.assert_allclose(evals[0, :2], 0.0, atol=1e-12)
    np.testing.assert_allclose(evals[0, 2], d @ d, atol=1e-12)
    # largest eigenvector is the cluster direction
    v = evecs[0, :, 2]
    np.testing.assert_allclose(np.abs(v @ d / np.linalg.norm(d)), 1.0, atol=1e-7)


def test_float32(rng):
    B = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = (B + np.swapaxes(B, -1, -2)) / 2
    evals, evecs = map(np.asarray, eigh3(jnp.asarray(A)))
    assert evals.dtype == np.float32
    ref = np.linalg.eigvalsh(A.astype(np.float64))
    np.testing.assert_allclose(evals, ref, atol=2e-5)
    gram = np.einsum("...ki,...kj->...ij", evecs, evecs)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape), atol=1e-5)
