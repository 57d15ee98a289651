"""Point-to-plane ICP core: association, residuals, normal equations, GN step.

Re-designs the reference's per-leaf serial loop (``mad_icp.cpp:74-117``)
as fused batched math: the whole moving-leaf set descends the fixed tree
at once, residual/Jacobian/weight are vectorised, and the 6x6 normal
equations form as one masked ``(sqrt(w) J)^T (sqrt(w) J)`` matmul that XLA
places on the MXU. Accumulation across keyframes is a reduction over a
leading axis (``vmap`` + sum, or ``psum`` over a mesh axis — see
``madicp_tpu.parallel``), replacing OpenMP per-thread adders
(``mad_icp.cpp:37-38, 100-110``).

Contracts reproduced (SURVEY.md §2.1.3-6):
- gate: accept a match iff ``|X m - f| <= b_max + b_ratio * |m|``
  (``mad_icp.cpp:81-83``);
- residual ``e = (X m - f_mean) . n_f``; Jacobian ``J = [n_f^T R,
  -n_f^T R skew(m)]`` (``mad_icp.cpp:59-72``);
- Huber-style clamp at ``|e| > sqrt(rho_ker)`` (the reference ctor stores
  ``sqrt(rho_ker)``, ``mad_icp.cpp:31-32, 92-96``) times the squared
  planarity weight ``(1 - bbox0_f / b_max)^2`` (``mad_icp.cpp:97-98``);
- GN update: ``dx = -H^{-1} b``; ``X <- X * [exp(dx_rot) | dx_trans]``
  (``mad_icp.cpp:105-117``) with state ordering ``[t(3), omega(3)]``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from madicp_tpu.ops.lie import exp_se3_split
from madicp_tpu.ops.tree import SearchTree, search_forest


class IcpTerms(NamedTuple):
    H: jnp.ndarray        # (6, 6)
    b: jnp.ndarray        # (6,)
    matched: jnp.ndarray  # (L,) bool — gated matches of this fixed tree


def associate_packed(
    nav: jnp.ndarray,
    base,
    depth: int,
    moving_pts_map: jnp.ndarray,
    moving_valid: jnp.ndarray,
    start: jnp.ndarray = None,
    n_gathers: int = None,
    return_margin: bool = False,
    ladder: int = 0,
):
    """Descend one fixed tree for every moving point (already in the map
    frame); the descent's final block IS the matched leaf's payload
    (leaf blocks carry the surfel, see ops/tree.py) — no separate
    payload gather.

    Returns ``(leaf_ids, payload)`` with ``payload`` (L, 8) =
    ``[f_pt(3), f_n(3), f_bbox0, flags]`` (``flags == 3`` marks a real
    leaf match). ``start``/``n_gathers`` warm-start the descent (see
    ``search_forest``). With ``return_margin`` also returns the (L,)
    path-stability margins (see ``search_forest``).
    """
    return search_forest(
        nav, moving_pts_map, base, depth, valid=moving_valid,
        start=start, n_gathers=n_gathers, return_blocks=True,
        return_margin=return_margin, ladder=ladder,
    )


def terms_from_payload(
    payload: jnp.ndarray,
    moving_pts: jnp.ndarray,
    moving_valid: jnp.ndarray,
    X: jnp.ndarray,
    *,
    b_max,
    b_ratio,
    rho_ker,
) -> IcpTerms:
    """Gate + residual/Jacobian/weights + normal equations from an
    association payload — pure vector math, no tree access.

    The gate re-evaluates under the CURRENT ``X`` (``mad_icp.cpp:81-83``),
    so reusing a cached payload across consecutive GN rounds (fast mode)
    still gates stale matches out as the estimate moves.
    """
    dtype = moving_pts.dtype
    R = X[:3, :3]
    t = X[:3, 3]
    rho = jnp.sqrt(jnp.asarray(rho_ker, dtype))

    # struct-of-arrays throughout: TPU pads a (L, 3)/(L, 8) minor dim to
    # 128 lanes, wasting 16-42x of the VPU on every elementwise op (the
    # same finding that drove the SoA descent, scripts/round_probe.py) —
    # so all per-leaf math runs on full-width (L,) columns. Operation
    # ORDER matches the previous (L, 3) formulation so results agree to
    # roundoff-reassociation only (golden pins at 1e-9 hold).
    ml = moving_pts @ R.T + t
    mlx, mly, mlz = ml[:, 0], ml[:, 1], ml[:, 2]
    mx, my, mz = moving_pts[:, 0], moving_pts[:, 1], moving_pts[:, 2]
    fx, fy, fz = payload[:, 0], payload[:, 1], payload[:, 2]
    nx, ny, nz = payload[:, 3], payload[:, 4], payload[:, 5]
    f_bbox0 = payload[:, 6]
    f_ok = payload[:, 7] == 3.0

    # adaptive-radius gate (radius grows with point range)
    dx, dy, dz = mlx - fx, mly - fy, mlz - fz
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    src_ball = b_max + b_ratio * jnp.sqrt(mx * mx + my * my + mz * mz)
    matched = (dist <= src_ball) & moving_valid & f_ok

    # residual and analytic Jacobian: with u = R^T n,
    # J = [u^T, (m x u)^T]  (since -u^T skew(m) = (m x u)^T)
    e = dx * nx + dy * ny + dz * nz
    ux = nx * R[0, 0] + ny * R[1, 0] + nz * R[2, 0]
    uy = nx * R[0, 1] + ny * R[1, 1] + nz * R[2, 1]
    uz = nx * R[0, 2] + ny * R[1, 2] + nz * R[2, 2]
    J = (
        ux, uy, uz,
        my * uz - mz * uy,
        mz * ux - mx * uz,
        mx * uy - my * ux,
    )

    chi = jnp.abs(e)
    scale = jnp.where(chi > rho, rho / jnp.maximum(chi, 1e-30), 1.0)
    w_plan = jnp.clip(1.0 - f_bbox0 / b_max, 0.0, 1.0)
    s = scale * w_plan * w_plan * matched.astype(dtype)

    # normal equations as 21 + 6 full-width multiply-reduces (H is
    # symmetric) instead of (L, 6) einsums over a padded J
    se = s * e
    Hm = [[None] * 6 for _ in range(6)]
    for a in range(6):
        Ja_s = J[a] * s
        for c in range(a, 6):
            v = jnp.sum(Ja_s * J[c])
            Hm[a][c] = Hm[c][a] = v
    H = jnp.stack([jnp.stack(r) for r in Hm])
    b = jnp.stack([jnp.sum(Ji * se) for Ji in J])
    return IcpTerms(H=H, b=b, matched=matched)


def icp_terms_packed(
    nav: jnp.ndarray,
    base,
    depth: int,
    moving_pts: jnp.ndarray,
    moving_valid: jnp.ndarray,
    X: jnp.ndarray,
    *,
    b_max,
    b_ratio,
    rho_ker,
    ladder: int = 0,
) -> IcpTerms:
    """Normal-equation contribution of one fixed tree inside a flat forest.

    Args:
        nav: flat stacked arena(s), e.g. ``(K*M, 56)``.
        base: (traced) row offset of the keyframe's arena in the forest.
        depth: static tree depth (descent iteration count).
        moving_pts: (L, 3) moving leaf representatives, in the *local* frame.
        moving_valid: (L,) bool.
        X: (4, 4) current moving-to-fixed estimate.
        b_max / b_ratio / rho_ker: solver parameters (``mad_params.py:31-38``).
        ladder: compute-selected descent steps (see ``search_forest``).
    """
    ml = moving_pts @ X[:3, :3].T + X[:3, 3]
    _, payload = associate_packed(
        nav, base, depth, ml, moving_valid, ladder=ladder
    )
    return terms_from_payload(
        payload, moving_pts, moving_valid, X,
        b_max=b_max, b_ratio=b_ratio, rho_ker=rho_ker,
    )


def icp_terms(
    fixed_tree: SearchTree,
    moving_pts: jnp.ndarray,
    moving_valid: jnp.ndarray,
    X: jnp.ndarray,
    *,
    b_max,
    b_ratio,
    rho_ker,
    ladder: int = 0,
) -> IcpTerms:
    """Normal-equation contribution of one fixed tree (single-tree view)."""
    return icp_terms_packed(
        fixed_tree.nav,
        0,
        fixed_tree.depth,
        moving_pts,
        moving_valid,
        X,
        b_max=b_max,
        b_ratio=b_ratio,
        rho_ker=rho_ker,
        ladder=ladder,
    )


def icp_normal_equations(H_parts: jnp.ndarray, b_parts: jnp.ndarray):
    """Reduce per-keyframe (K,6,6)/(K,6) contributions (OpenMP-adder analog)."""
    return jnp.sum(H_parts, axis=0), jnp.sum(b_parts, axis=0)


def solve_gn(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``H dx = -b`` with Jacobi scaling for f32 robustness.

    The reference uses an f64 LDLT (``mad_icp.cpp:111``); on TPU we stay in
    f32 and precondition: translation and rotation blocks of H differ by
    ~range^2 in magnitude, and symmetric diagonal scaling keeps the 6x6
    solve well-conditioned. Returns zeros when H is (numerically) empty.
    """
    dtype = H.dtype
    diag = jnp.diagonal(H)
    good = jnp.sum(diag) > 0
    d = jnp.sqrt(jnp.maximum(diag, 1e-30))
    d = jnp.where(diag > 0, d, 1.0)
    Hs = H / (d[:, None] * d[None, :])
    bs = b / d
    dx = jnp.linalg.solve(Hs + 1e-8 * jnp.eye(6, dtype=dtype), -bs) / d
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    return jnp.where(good, dx, jnp.zeros_like(dx))


# Trust-region bound on one GN step. When the match set is small and
# geometrically degenerate (e.g. a registration started ~1 m off, every
# match on one plane), H is near-singular along some direction and the
# raw GN step can be metres long in a meaningless direction — the
# reference's unguarded f64 LDLT (mad_icp.cpp:111) has the same failure
# mode, it just never shows on its published demos. Converged operation
# takes mm-scale steps, so this clamp is INACTIVE on every nominal
# trajectory (oracle-parity tests pin that) and only stops catastrophic
# escapes, letting the next re-association recover.
GN_STEP_MAX_T = 1.0  # metres
GN_STEP_MAX_R = 0.5  # radians


def clamp_step(dx: jnp.ndarray) -> jnp.ndarray:
    """Scale dx = [t(3), w(3)] into the trust region (direction kept)."""
    dt = jnp.linalg.norm(dx[:3])
    dr = jnp.linalg.norm(dx[3:])
    scale = jnp.minimum(
        1.0,
        jnp.minimum(
            GN_STEP_MAX_T / jnp.maximum(dt, 1e-30),
            GN_STEP_MAX_R / jnp.maximum(dr, 1e-30),
        ),
    )
    return dx * scale


def gn_se3_step(X: jnp.ndarray, H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """One right-multiplicative Gauss-Newton update of X (``mad_icp.cpp:105-117``)."""
    dx = clamp_step(solve_gn(H, b))
    return X @ exp_se3_split(dx)


def neg_logdet(H: jnp.ndarray) -> jnp.ndarray:
    """Monotone surrogate of the keyframe information weight.

    The reference ranks candidate frames by ``det(H^{-1})`` — smaller is
    more informative (``pipeline.cpp:223, 234-244``). ``det`` of a 6x6 with
    metre-scale entries overflows f32, so we rank by ``-log det H`` which
    orders identically and stays finite.
    """
    sign, logdet = jnp.linalg.slogdet(H)
    return jnp.where(sign > 0, -logdet, jnp.asarray(jnp.finfo(H.dtype).max, H.dtype))
