"""Configs, dataset IO, trajectory tooling."""

from madicp_tpu.utils.config import (  # noqa: F401
    DATASET_CONFIGS,
    MAD_PARAMS,
    load_dataset_config,
    load_mad_params,
)
from madicp_tpu.utils.trajectory import (  # noqa: F401
    write_transformed_pose,
    load_kitti_poses,
    save_kitti_poses,
    ate_rmse,
    kitti_drift,
)
from madicp_tpu.utils.fixtures import generate_four_walls_pointcloud  # noqa: F401
