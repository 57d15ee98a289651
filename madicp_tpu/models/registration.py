"""Pairwise MAD-ICP registration.

API parity with the reference's ``pymadicp`` binding
(``src/pybind/tools/mad_icp_wrapper.h:33-112`` / ``pymadicp.cpp:36-52``):
build a reference tree and a query tree, then run a fixed number of full
re-association Gauss-Newton rounds from an initial guess. The ICP loop is
one jitted ``lax.fori_loop``; each round is a fused batched association +
normal-equation + solve (see :mod:`madicp_tpu.ops.icp_core`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from madicp_tpu.ops.icp_core import icp_terms, gn_se3_step
from madicp_tpu.ops.tree import SearchTree, Leaves, build_tree, get_leaves


def _pad_pow2(n: int, minimum: int = 64) -> int:
    return max(minimum, 2 ** int(math.ceil(math.log2(max(n, 1)))))


@partial(jax.jit, static_argnames=("iterations",))
def _icp_loop(
    ref_tree: SearchTree,
    leaves: Leaves,
    X0: jnp.ndarray,
    b_max,
    b_ratio,
    rho_ker,
    *,
    iterations: int,
):
    def body(_, carry):
        X, _ = carry
        t = icp_terms(
            ref_tree,
            leaves.pts,
            leaves.valid,
            X,
            b_max=b_max,
            b_ratio=b_ratio,
            rho_ker=rho_ker,
        )
        return gn_se3_step(X, t.H, t.b), t.matched

    matched0 = jnp.zeros(leaves.pts.shape[0], bool)
    X, matched = jax.lax.fori_loop(0, iterations, body, (X0, matched0))
    return X, matched


class MADicp:
    """Pairwise registration of a query cloud onto a reference cloud."""

    def __init__(self, num_threads: int = 0, dtype=jnp.float32, depth: int = 16):
        # num_threads accepted for API parity with the reference binding;
        # parallelism on TPU is the vector lanes, not host threads.
        del num_threads
        self._dtype = dtype
        self._depth = depth
        self._ref_tree: Optional[SearchTree] = None
        self._leaves: Optional[Leaves] = None
        self._ref_b_max = 0.2
        self.last_matched: Optional[np.ndarray] = None

    def _build(self, cloud, b_max, b_min):
        cloud = np.asarray(cloud)
        n = cloud.shape[0]
        n_pad = _pad_pow2(n)
        pts = np.zeros((n_pad, 3))
        pts[:n] = cloud
        valid = np.zeros(n_pad, bool)
        valid[:n] = True
        build = jax.jit(
            lambda p, v: build_tree(
                p, v, depth=self._depth, b_max=b_max, b_min=b_min
            )
        )
        tree, _ = build(jnp.asarray(pts, dtype=self._dtype), jnp.asarray(valid))
        return tree, n_pad

    def set_reference_cloud(self, cloud, b_max: float = 0.2, b_min: float = 0.1):
        """Build the fixed tree (reference ``mad_icp_wrapper.h:47-52``)."""
        self._ref_b_max = float(b_max)
        self._ref_tree, _ = self._build(cloud, b_max, b_min)

    def set_query_cloud(self, cloud, b_max: float = 0.2, b_min: float = 0.1):
        """Build the moving tree and extract its leaves
        (reference ``mad_icp_wrapper.h:40-45``)."""
        tree, n_pad = self._build(cloud, b_max, b_min)
        self._leaves = get_leaves(tree, max_leaves=n_pad)

    def compute(
        self,
        T_guess: np.ndarray,
        icp_iterations: int = 15,
        rho_ker: float = 0.1,
        b_ratio: float = 0.02,
        print_stats: bool = False,
    ) -> np.ndarray:
        """Run ICP from ``T_guess``; returns the 4x4 estimate
        (reference ``mad_icp_wrapper.h:54-102``)."""
        if self._ref_tree is None or self._leaves is None:
            raise RuntimeError("set_reference_cloud and set_query_cloud first")
        X0 = jnp.asarray(np.asarray(T_guess), dtype=self._dtype)
        X, matched = _icp_loop(
            self._ref_tree,
            self._leaves,
            X0,
            jnp.asarray(self._ref_b_max, self._dtype),
            jnp.asarray(b_ratio, self._dtype),
            jnp.asarray(rho_ker, self._dtype),
            iterations=int(icp_iterations),
        )
        matched = np.asarray(matched & self._leaves.valid)
        self.last_matched = matched
        if print_stats:
            valid = np.asarray(self._leaves.valid)
            n_leaves = int(valid.sum())
            n_matched = int(matched.sum())
            print(f"MADicp|inliers ratio {n_matched / max(n_leaves, 1)}")
            print(f"--MADicp|matched leaves {n_matched}")
            print(f"--MADicp|total num leaves {n_leaves}")
        return np.asarray(X)

    # reference-style aliases
    setReferenceCloud = set_reference_cloud
    setQueryCloud = set_query_cloud
