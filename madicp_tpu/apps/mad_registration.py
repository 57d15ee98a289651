"""Pairwise-registration demo (parity with the reference tool
``apps/utils/tools/mad_registration.py:48-69``): perturb a copy of the
four-walls cloud and recover identity in 15 ICP iterations."""

from __future__ import annotations

import numpy as np

from madicp_tpu.models.registration import MADicp
from madicp_tpu.ops.lie import exp_so3
from madicp_tpu.utils.fixtures import generate_four_walls_pointcloud

MAX_ITERATIONS = 15


def _euler_xyz_matrix(ax, ay, az):
    import jax.numpy as jnp

    Rx = np.asarray(exp_so3(jnp.asarray([ax, 0.0, 0.0])))
    Ry = np.asarray(exp_so3(jnp.asarray([0.0, ay, 0.0])))
    Rz = np.asarray(exp_so3(jnp.asarray([0.0, 0.0, az])))
    return Rz @ Ry @ Rx


def main(points_per_wall: int = 1000, seed: int = 42) -> np.ndarray:
    np.random.seed(seed)
    ref_cloud = generate_four_walls_pointcloud(points_per_wall=points_per_wall)
    query_cloud = ref_cloud.copy()

    T_guess = np.eye(4)
    T_guess[:3, :3] = _euler_xyz_matrix(0.1, 0.1, 0.1)
    T_guess[:3, 3] = np.random.rand(3)
    print("init guess T\n", T_guess)
    print("gt T\n", np.eye(4))

    madicp = MADicp()
    madicp.set_reference_cloud(ref_cloud)
    madicp.set_query_cloud(query_cloud)
    T_est = madicp.compute(T_guess, icp_iterations=MAX_ITERATIONS, print_stats=True)
    print("estimate \n", T_est)
    return T_est


if __name__ == "__main__":
    main()
