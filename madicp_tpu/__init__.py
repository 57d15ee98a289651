"""madicp_tpu — a TPU-native LiDAR odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the MAD-ICP pipeline
("It Is All About Matching Data — Robust and Informed LiDAR Odometry",
RA-L 2024): MAD-tree construction, approximate nearest-neighbour data
association, point-to-plane Gauss-Newton registration, constant-velocity
prediction/deskewing and information-driven keyframe management — all as
batched, statically-shaped device computations that scale over a
``jax.sharding.Mesh`` (keyframe axis over ICI, sequence axis for fleets).

Layout
------
- :mod:`madicp_tpu.ops`       core batched kernels (lie algebra, 3x3 eigh,
                              segmented scans, MAD-tree build/search, ICP core,
                              deskew)
- :mod:`madicp_tpu.models`    user-facing engines (MADtree NN tool, MADicp
                              pairwise registration, VelEstimator, Pipeline)
- :mod:`madicp_tpu.parallel`  device-mesh sharding of the keyframe map and
                              multi-sequence fleet evaluation
- :mod:`madicp_tpu.utils`     configs, dataset readers, trajectory IO
- :mod:`madicp_tpu.apps`      CLI entry points
- :mod:`madicp_tpu.native`    C++ host-side data loader (optional, ctypes)
"""

__version__ = "0.1.0"

import jax as _jax

# TPU f32 matmuls default to ONE bf16 pass — measured r4: a (L,3)@(3,3)
# point transform carries up to 0.24 m error at 40 m range (vs 3.7e-6
# at HIGHEST), i.e. geometry error of the same magnitude as the 0.2 m
# association gate, and a 15-round pose chain drifts 0.02. Every matmul
# in this framework is geometry (point/tree transforms, pose
# compositions, normal-equation reductions), so f32 precision is a
# correctness requirement, not a tuning choice. The explicitly-bf16
# one-hot/exactness kernels (ops/tree.py) pass bf16 operands and are
# unaffected; CPU (always fma-exact) is unaffected — which is exactly
# why the CPU test suite could never catch this.
# Respect an embedding application's EXPLICIT choice: only install the
# default when the knob is still unset (None).
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from madicp_tpu.ops import constants  # noqa: F401
