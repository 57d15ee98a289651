"""Experimental association schedules — measured LOSERS on TPU.

Quarantined out of the hot ``models/pipeline.py`` round loop (VERDICT r4
item 7): both schedules here are result-identical to the plain exact
sweep (pinned by tests/test_pipeline.py) but strictly SLOWER on the
chip at the flagship configuration (BENCH_r04: prefix:8192 = 3.8
scans/s with its sorted prefix overflowing into the full-sweep fallback
every round, vs plain exact 7.3; certify_compact lives in pipeline.py's
certified branch and measured 5.0). They ship for the recorded negative
result, for CPU-backend use (compact is ~2.6x there, NOTES.md), and for
``n_descents`` observability — not as a throughput path. The CLI marks
the knobs experimental.

This module holds the prefix-certified schedule; the design and its
soundness argument live in ``PipelineConfig.certify_prefix``'s
docstring and NOTES.md ("Prefix-certified schedule design").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from madicp_tpu.ops.icp_core import (
    associate_packed,
    gn_se3_step,
    terms_from_payload,
)
from madicp_tpu.ops.tree import SearchTree


def prefix_certified_rounds(
    cfg,
    kf_tree: SearchTree,
    kf_valid_f: jnp.ndarray,
    leaves_pts: jnp.ndarray,
    leaves_valid: jnp.ndarray,
    X0: jnp.ndarray,
    *,
    reduce_terms,
    terms_scan,
    kv: jnp.ndarray,
    nv: jnp.ndarray,
):
    """The prefix-certified exact schedule (``cfg.certify_prefix > 0``).

    Body extracted verbatim from ``models.pipeline.icp_rounds`` (pure
    code motion; result-identity with the plain exact schedule remains
    pinned by tests/test_pipeline.py::test_certify_prefix_*). See
    ``PipelineConfig.certify_prefix`` for the scheme and its soundness
    argument. Returns ``(X, H_last, matched, n_descents)``.
    """
    dtype = cfg.dtype
    K = kf_valid_f.shape[0]
    L = leaves_pts.shape[0]
    n_its = cfg.max_icp_iterations

    U = min(cfg.certify_prefix, L)
    dinfo = jnp.finfo(dtype)
    eps64 = jnp.asarray(64.0, dtype) * dinfo.eps
    kf_live_k = kf_valid_f > 0  # (K,)

    # round 0: full descent against every live keyframe, recording
    # path margins (X0 is the baseline pose of every certificate)
    ml0 = leaves_pts @ X0[:3, :3].T + X0[:3, 3]

    def per_kf0(_, kf):
        tree_fields, live = kf
        nav = SearchTree(*tree_fields).nav
        _, payload, margin = associate_packed(
            nav, 0, cfg.depth, ml0, leaves_valid & live,
            return_margin=True, ladder=cfg.assoc_ladder,
        )
        return 0, (payload, margin)

    _, (payload0, margin0) = jax.lax.scan(
        per_kf0, 0, (tuple(kf_tree), kf_live_k)
    )
    n_descents = kv * nv
    if n_its == 1:
        H_last, b_last, matched = terms_scan(X0, payload0, True)
        X = gn_se3_step(X0, H_last, b_last)
        return X, H_last, matched, n_descents

    H0, b0 = terms_scan(X0, payload0, False)
    X1 = gn_se3_step(X0, H0, b0)
    iota_u = jnp.arange(U)

    # PER-KEYFRAME sorted baselines: a min-over-keyframes order
    # is hopeless — each leaf takes the smallest of K margin
    # draws, so with 16 keyframes nearly every leaf looks
    # uncertified (measured r3 sched_probe: descents == full).
    # Each keyframe therefore keeps its OWN margin-sorted order,
    # prefix and baseline epoch (S/T per keyframe).
    # radius scale of the 1D certificate key. The displacement
    # bound is 2D — A + C*r with A = sum ||dt||, C = sum
    # ||dR||_F — and merging it as (A+C)(1+r) inflates pure-
    # translation budgets ~(1+r)x for far points (measured r3:
    # every round overflowed). The key mu = margin/(E0 + r)
    # with threshold max(A/E0, C) is SOUND FOR ANY E0 > 0
    # (max(A/E0,C)*(E0+r) >= A + C*r termwise) and near-exact
    # when A/C ~ E0, which GN's coupled translation/rotation
    # steps sit near the scene's lever-arm scale — so E0 is
    # DERIVED per scan as the mean leaf range of the round-0
    # leaf set (a traced scalar, constant within the scan;
    # only prefix tightness varies with it, never correctness).
    # An earlier hardcoded E0=16.0 baked a car-scene radius
    # into a soundness-adjacent path (VERDICT r3 item 6).
    # FLOOR = 1.0, not epsilon: the skip guard's fp term
    # eps64*(1+|t|)*(E0+r) must dominate eps_cert =
    # 64*eps*(1+|t|+r), i.e. (1+|t|)(E0+r) >= 1+|t|+r — which
    # holds unconditionally iff E0 >= 1 (sub-metre E0 would
    # shrink the guard band below the fp-safety floor on
    # close-range scenes).
    r_all = jnp.linalg.norm(leaves_pts, axis=-1)  # (L,)
    E0 = jnp.maximum(
        jnp.sum(jnp.where(leaves_valid, r_all, 0.0))
        / jnp.maximum(nv.astype(dtype), 1.0),
        jnp.asarray(1.0, dtype),
    )

    def sort_kf(margin, payload, lps, lv, order):
        """One keyframe's new certification baseline from its
        full re-association (masked/padded entries carry
        finfo.max margins and sort last, so they never
        re-descend). ``order`` composes canonical->sorted
        permutations across baselines."""
        mu = margin / (E0 + jnp.linalg.norm(lps, axis=-1))
        perm = jnp.argsort(mu)
        return (
            payload[perm], lps[perm], lv[perm], mu[perm],
            order[perm],
        )

    sorted0 = jax.vmap(
        lambda mg, pl: sort_kf(
            mg, pl, leaves_pts, leaves_valid,
            jnp.arange(L, dtype=jnp.int32),
        )
    )(margin0, payload0)

    def terms_sorted(X, sstate, with_matched: bool):
        payload, lps_s, lv_s, _, order = sstate
        terms = jax.vmap(
            lambda pl, lp_k, lv_k: terms_from_payload(
                pl, lp_k, lv_k, X,
                b_max=cfg.b_max, b_ratio=cfg.b_ratio,
                rho_ker=cfg.rho_ker,
            )
        )(payload, lps_s, lv_s)
        H = jnp.einsum("k,kij->ij", kf_valid_f, terms.H)
        b = jnp.einsum("k,ki->i", kf_valid_f, terms.b)
        if with_matched:
            m_s = terms.matched & kf_live_k[:, None]  # (K, L)
            # back to canonical leaf positions (per-keyframe
            # orders differ) BEFORE any cross-shard reduction
            m_u = jnp.zeros((K, L), bool).at[
                jnp.arange(K)[:, None], order
            ].set(m_s)
            return reduce_terms((H, b, jnp.any(m_u, axis=0)))
        return reduce_terms((H, b))

    def motion_budget(Xa, Xb):
        # per-round displacement bound components: a query moves
        # ||(Xb-Xa) m|| <= ||dt|| + ||dR||_F ||m|| = A + C r.
        # Frobenius, not trig: the bound's own rounding error
        # must stay under the eps64 floor (NOTES r2 rule)
        dt = jnp.linalg.norm(Xb[:3, 3] - Xa[:3, 3])
        dR = jnp.linalg.norm((Xb[:3, :3] - Xa[:3, :3]).ravel())
        return dt, dR

    def reassoc_round(X, sstate, S, T, nd):
        # S = (A, C) per-keyframe translation/rotation budget
        # accumulators since each keyframe's baseline epoch. T
        # (K,) is a running MAX, so within one epoch a
        # keyframe's uncertified prefix only GROWS: a skipped
        # entry was never re-descended since the epoch's full
        # sweep, and its cache provably still holds that
        # sweep's leaf. Skip is sound: mu > T implies
        # margin > max(A/E0, C)(E0+r) + eps64(1+tnorm)(E0+r)
        #        >= A + C r + eps_cert.
        A, C = S
        T = jnp.maximum(
            T,
            jnp.maximum(A / E0, C)
            + eps64 * (1.0 + jnp.linalg.norm(X[:3, 3])),
        )

        def per_kf(_, kf):
            (tree_fields, live, pl_k, lps_k, lv_k, mu_k,
             ord_k, T_k, A_k, C_k) = kf
            nav = SearchTree(*tree_fields).nav
            n_r = jnp.searchsorted(
                mu_k, T_k, side="right"
            ).astype(jnp.int32)

            def prefix_branch():
                lps_pref = jax.lax.slice_in_dim(lps_k, 0, U, axis=0)
                lv_pref = jax.lax.slice_in_dim(lv_k, 0, U, axis=0)
                mlp = lps_pref @ X[:3, :3].T + X[:3, 3]
                act = lv_pref & (iota_u < n_r) & live
                _, pl_u = associate_packed(
                    nav, 0, cfg.depth, mlp, act,
                    ladder=cfg.assoc_ladder,
                )
                old = jax.lax.slice_in_dim(pl_k, 0, U, axis=0)
                new = jnp.where(act[:, None], pl_u, old)
                return (
                    jax.lax.dynamic_update_slice(pl_k, new, (0, 0)),
                    lps_k, lv_k, mu_k, ord_k, T_k, A_k, C_k,
                    jnp.sum(act).astype(jnp.int32),
                )

            def reset_branch():
                # prefix overflow: re-descend this keyframe's
                # whole leaf set, refresh its margins, re-sort,
                # restart its budget — this round's pose becomes
                # ITS new certification baseline
                mls = lps_k @ X[:3, :3].T + X[:3, 3]
                act = lv_k & live
                _, pl, mg = associate_packed(
                    nav, 0, cfg.depth, mls, act,
                    return_margin=True, ladder=cfg.assoc_ladder,
                )
                pl = jnp.where(act[:, None], pl, pl_k)
                pl, lps2, lv2, mu2, ord2 = sort_kf(
                    mg, pl, lps_k, lv_k, ord_k
                )
                zero = jnp.asarray(0, dtype)
                return (
                    pl, lps2, lv2, mu2, ord2, zero, zero, zero,
                    jnp.sum(act).astype(jnp.int32),
                )

            return 0, jax.lax.cond(
                n_r <= U, prefix_branch, reset_branch
            )

        payload_s, lps_s, lv_s, mu_s, order = sstate
        _, (payload_s, lps_s, lv_s, mu_s, order, T, A, C, counts
            ) = jax.lax.scan(
            per_kf, 0,
            (tuple(kf_tree), kf_live_k, payload_s, lps_s, lv_s,
             mu_s, order, T, A, C),
        )
        nd = nd + jnp.sum(counts, dtype=jnp.int32)
        return (payload_s, lps_s, lv_s, mu_s, order), (A, C), T, nd

    def one_round(r, carry):
        Xp, X, sstate, S, T, nd = carry
        dt, dR = motion_budget(Xp, X)
        S = (S[0] + dt, S[1] + dR)
        sstate, S, T, nd = reassoc_round(X, sstate, S, T, nd)
        H, b = terms_sorted(X, sstate, False)
        return (X, gn_se3_step(X, H, b), sstate, S, T, nd)

    zeros_k = jnp.zeros((K,), dtype)
    Xp, X, sstate, S, T, n_descents = jax.lax.fori_loop(
        1, n_its - 1, one_round,
        (X0, X1, sorted0, (zeros_k, zeros_k), zeros_k, n_descents),
    )
    # final round: matched flags + H_last from this round's
    # re-association, like the reference's last-iteration reset
    # (pipeline.cpp:172-176)
    dt, dR = motion_budget(Xp, X)
    S = (S[0] + dt, S[1] + dR)
    sstate, S, T, n_descents = reassoc_round(
        X, sstate, S, T, n_descents
    )
    H_last, b_last, matched = terms_sorted(X, sstate, True)
    X = gn_se3_step(X, H_last, b_last)
    return X, H_last, matched, n_descents
