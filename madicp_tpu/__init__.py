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

from madicp_tpu.ops import constants  # noqa: F401
