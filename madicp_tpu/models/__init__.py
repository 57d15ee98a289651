"""User-facing engines mirroring the reference's public API surface."""

from madicp_tpu.models.nn import MADtree  # noqa: F401
from madicp_tpu.models.registration import MADicp  # noqa: F401
from madicp_tpu.models.vel_estimator import VelEstimator, estimate_velocity  # noqa: F401
from madicp_tpu.models.pipeline import Pipeline, PipelineConfig  # noqa: F401
