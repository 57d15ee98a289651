"""Device-mesh parallelism.

The reference's only parallel axes are (1) one OpenMP thread per keyframe
with per-thread H/b adders reduced serially (``pipeline.cpp:180-185``,
``mad_icp.cpp:100-110``) and (2) nothing for multiple sequences. Here both
become mesh axes (SURVEY.md §2 P1-P6):

- ``kf``: the keyframe local map is sharded across chips; each chip
  descends its keyframe trees and contributes a partial 6x6 ``H`` / 6-vec
  ``b``, reduced with ``jax.lax.psum`` over ICI.
- ``seq``: fleet mode — N sequences advance data-parallel, one pipeline
  state per sequence, batched over the mesh.
"""

from madicp_tpu.parallel.mesh import make_mesh, state_shardings  # noqa: F401
from madicp_tpu.parallel.sharded_icp import (  # noqa: F401
    icp_round_sharded,
    make_sharded_pipeline_step,
)
from madicp_tpu.parallel.fleet import Fleet  # noqa: F401
from madicp_tpu.parallel.distributed import (  # noqa: F401
    fleet_mesh,
    initialize,
    topology,
)
