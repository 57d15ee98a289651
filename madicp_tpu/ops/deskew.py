"""Motion-based deskewing of a spinning-LiDAR sweep.

The reference sorts points by azimuth and sweeps 1024 azimuth bins from
+pi downward, advancing a per-bin time offset from ``-ts`` to 0 and
rigidly moving each point by ``exp(v * t_bin)`` (``pipeline.cpp:79-123``).
That sequential sweep vectorises directly: a point's bin is a pure
function of its azimuth, so the whole cloud deskew is one batched bin
computation + a gather of 1024 precomputed rigid transforms — no sort.

(The reference advances the bin at most once per point — an artefact of
its ``if``-per-point loop — which coincides with the pure binning for the
dense clouds this is designed for; we implement the well-defined binning.)
"""

from __future__ import annotations

import jax.numpy as jnp

from madicp_tpu.ops.constants import CHUNKS
from madicp_tpu.ops.lie import exp_so3, log_so3, se3_inverse


def deskew_cloud(
    points: jnp.ndarray,
    T_prev: jnp.ndarray,
    T_now: jnp.ndarray,
    sensor_hz,
) -> jnp.ndarray:
    """Deskew (N, 3) points given the last two trajectory poses.

    Velocity is the naive finite difference of the last two poses over one
    scan period (``pipeline.cpp:82-86``); each azimuth bin gets the rigid
    motion ``[exp(w t) | v t]`` accumulated from scan start (t = -ts, at
    azimuth +pi) to scan end (t = 0, at azimuth -pi).
    """
    dtype = points.dtype
    ts = jnp.asarray(1.0, dtype) / jnp.asarray(sensor_hz, dtype)

    T_rel = se3_inverse(T_prev) @ T_now
    v_lin = T_rel[:3, 3] / ts
    v_ang = log_so3(T_rel[:3, :3]) / ts

    # per-bin times: t(bin) = -ts + bin * ts/(CHUNKS-1)
    delta = ts / (CHUNKS - 1)
    t_bins = -ts + delta * jnp.arange(CHUNKS, dtype=dtype)
    R_bins = exp_so3(v_ang[None, :] * t_bins[:, None])  # (CHUNKS, 3, 3)
    t_trans = v_lin[None, :] * t_bins[:, None]          # (CHUNKS, 3)

    azimuth = jnp.arctan2(points[:, 1], points[:, 0])
    resolution = 2.0 * jnp.pi / CHUNKS
    bins = jnp.clip(
        jnp.floor((jnp.pi - azimuth) / resolution).astype(jnp.int32),
        0,
        CHUNKS - 1,
    )

    Rp = jnp.take(R_bins, bins, axis=0)  # (N, 3, 3)
    tp = jnp.take(t_trans, bins, axis=0)
    return jnp.einsum("nij,nj->ni", Rp, points) + tp
