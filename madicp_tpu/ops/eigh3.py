"""Closed-form batched eigendecomposition of symmetric 3x3 matrices.

The reference uses Eigen's ``SelfAdjointEigenSolver::computeDirect``
(``mad_tree.cpp:59-61``) — an analytic (non-iterative) solver returning
eigenvalues in ascending order. On TPU we need the same thing as a fully
vectorised primitive usable on hundreds of thousands of covariance
matrices per tree level; this module implements the trigonometric
(Cardano) eigenvalue solution with cross-product eigenvectors and robust
degenerate-case fallbacks. Eigenvector *signs* are arbitrary, as in the
reference (the MAD-ICP math is sign-invariant).
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(v: jnp.ndarray, eps: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = n[..., 0] > eps
    v = v / jnp.where(n > eps, n, jnp.ones_like(n))
    return v, ok


def _eigvec_from_rows(A: jnp.ndarray, lam: jnp.ndarray, eps: float):
    """Eigenvector of symmetric A for eigenvalue lam via row cross-products.

    Rows of (A - lam I) span the orthogonal complement of the eigenspace;
    the largest cross product of row pairs is a stable eigenvector estimate
    when lam is a simple eigenvalue.
    Returns (unit vector, validity mask).
    """
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best01 = (n01 >= n02) & (n01 >= n12)
    best02 = (~best01) & (n02 >= n12)
    v = jnp.where(
        best01[..., None], c01, jnp.where(best02[..., None], c02, c12)
    )
    return _normalize(v, eps)


def _any_perp(v: jnp.ndarray, eps: float) -> jnp.ndarray:
    """A unit vector orthogonal to unit vector v (batched, branch-free)."""
    # cross with the coordinate axis least aligned with v
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v.dtype), v.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], v.dtype), v.shape)
    use_ex = jnp.abs(v[..., 0]) <= jnp.abs(v[..., 1])
    axis = jnp.where(use_ex[..., None], ex, ey)
    p = jnp.cross(v, axis)
    p, _ = _normalize(p, eps)
    return p


def eigh3(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns ``(evals, evecs)`` with eigenvalues ascending and eigenvectors
    as *columns* (``evecs[..., :, k]`` pairs with ``evals[..., k]``), like
    Eigen's ``SelfAdjointEigenSolver`` used at ``mad_tree.cpp:59-61``.
    The returned basis is orthonormal even for (near-)degenerate inputs.
    """
    dtype = A.dtype
    eps = 1e-12 if dtype == jnp.float64 else 1e-6

    # scale for conditioning
    scale = jnp.max(jnp.abs(A), axis=(-1, -2))
    scale_safe = jnp.where(scale > 0, scale, jnp.ones_like(scale))
    As = A / scale_safe[..., None, None]

    q = jnp.trace(As, axis1=-2, axis2=-1) / 3.0
    B = As - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B, axis=(-1, -2)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    degenerate_all = p < eps  # (near-)spherical: all eigenvalues equal

    p_safe = jnp.where(degenerate_all, jnp.ones_like(p), p)
    Bn = B / p_safe[..., None, None]
    detBn = jnp.linalg.det(Bn)
    r = jnp.clip(detBn / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    l2 = q + 2.0 * p * jnp.cos(phi)  # largest
    l0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l1 = 3.0 * q - l0 - l2
    l0 = jnp.where(degenerate_all, q, l0)
    l1 = jnp.where(degenerate_all, q, l1)
    l2 = jnp.where(degenerate_all, q, l2)

    # Eigenvectors: smallest (the surfel normal — must be the most robust)
    # and largest (the split direction), middle by cross product.
    v0, ok0 = _eigvec_from_rows(As, l0, eps)
    v2, ok2 = _eigvec_from_rows(As, l2, eps)

    ident = jnp.broadcast_to(jnp.eye(3, dtype=dtype), As.shape)
    e0 = ident[..., :, 0]
    e2 = ident[..., :, 2]

    # Fallbacks for degenerate spectra.
    v0 = jnp.where(ok0[..., None], v0, jnp.where(ok2[..., None], _any_perp(v2, eps), e0))
    # Orthogonalise v2 against v0, fall back to a perpendicular if collapsed.
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    v2, ok2b = _normalize(v2, eps)
    v2 = jnp.where(ok2b[..., None], v2, _any_perp(v0, eps))

    # Canonicalise (near-)degenerate PAIRS: when two eigenvalues coincide
    # the corresponding eigenplane basis is mathematically arbitrary (e.g.
    # the rank-1 covariance of a 2-point node: lambda0 = lambda1 = 0, and
    # the reference inherits that arbitrary direction as a surfel normal,
    # mad_tree.cpp:104-112). Eigen's computeDirect makes an internal
    # arbitrary choice no reimplementation can reproduce; we instead fix a
    # DETERMINISTIC convention — the coordinate-axis cross product of the
    # well-defined remaining eigenvector — mirrored by the numpy oracle
    # (tests/reference_oracle.py::canonical_eigh) so cross-implementation
    # parity tests are exact. Sign remains arbitrary (the math is
    # sign-invariant).
    # Threshold sized to the trig formula's own eigenvalue error on
    # degenerate pairs (~1e-8 relative in f64, measured): both this and
    # the LAPACK-based oracle must take the same branch, and widening is
    # harmless — canonicalising a nearly-degenerate basis just replaces
    # one arbitrary-but-valid choice with a deterministic one.
    tol_c = 1e-6 if dtype == jnp.float64 else 1e-3
    deg01 = (l1 - l0) < tol_c  # normal/middle plane degenerate
    deg12 = (l2 - l1) < tol_c  # split/middle plane degenerate
    v0 = jnp.where((deg01 & ~deg12)[..., None], _any_perp(v2, eps), v0)
    v2 = jnp.where((deg12 & ~deg01)[..., None], _any_perp(v0, eps), v2)

    v1 = jnp.cross(v2, v0)
    v1, _ = _normalize(v1, eps)

    # fully degenerate -> identity basis
    v0 = jnp.where(degenerate_all[..., None], e0, v0)
    v1 = jnp.where(degenerate_all[..., None], ident[..., :, 1], v1)
    v2 = jnp.where(degenerate_all[..., None], e2, v2)

    evals = jnp.stack([l0, l1, l2], axis=-1) * scale_safe[..., None]
    evals = jnp.where(scale[..., None] > 0, evals, jnp.zeros_like(evals))
    evecs = jnp.stack([v0, v1, v2], axis=-1)
    return evals, evecs
