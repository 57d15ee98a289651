"""Motion-based deskewing of a spinning-LiDAR sweep.

The reference sorts points by azimuth and sweeps 1024 azimuth bins from
+pi downward, advancing a per-bin time offset from ``-ts`` to 0 and
rigidly moving each point by ``exp(v * t_bin)`` (``pipeline.cpp:79-123``).
Two modes are provided:

- ``mode="reference"`` (default): the reference's literal semantics. Its
  serial sweep advances the bin **at most once per point** — on sweeps
  with azimuth gaps wider than one bin the time offset LAGS pure binning.
  That recurrence (``k_j = k_{j-1} + [k_{j-1} < q_j]`` over descending
  azimuth, with nondecreasing targets ``q_j = (pi - az_j)/res - 1``) has
  the closed form ``k_j = min(j+1, j + prefixmin(ceil(q)_+ - j))``, so the
  whole sweep vectorises as one sort + one prefix-min — no serial loop.
  (Verified against the literal loop; the only possible deviation is
  azimuths within one ulp of a bin edge, where the reference's
  repeatedly-subtracted ``angle`` carries its own rounding.)
- ``mode="binned"``: pure binning — a point's bin is a direct function of
  its azimuth, no sort. Identical to "reference" on sweeps that occupy
  every bin (dense spinning-LiDAR clouds); cheaper on TPU (no sort). The
  delta on realistic sweeps is bounded by tests/test_vel_deskew.py.

Both modes keep the cloud in its ORIGINAL order (the reference rewrites
the cloud in azimuth-sorted order — a side effect its downstream never
relies on; point order only permutes tree-build tie-breaks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from madicp_tpu.ops.constants import CHUNKS
from madicp_tpu.ops.lie import exp_so3, log_so3, se3_inverse


def _bin_times_and_motion(T_prev, T_now, sensor_hz, dtype):
    """Naive velocity + per-bin rigid motions (``pipeline.cpp:82-108``)."""
    ts = jnp.asarray(1.0, dtype) / jnp.asarray(sensor_hz, dtype)
    T_rel = se3_inverse(T_prev) @ T_now
    v_lin = T_rel[:3, 3] / ts
    v_ang = log_so3(T_rel[:3, :3]) / ts

    # per-bin times: t(bin) = -ts + bin * ts/(CHUNKS-1)
    delta = ts / (CHUNKS - 1)
    t_bins = -ts + delta * jnp.arange(CHUNKS, dtype=dtype)
    R_bins = exp_so3(v_ang[None, :] * t_bins[:, None])  # (CHUNKS, 3, 3)
    t_trans = v_lin[None, :] * t_bins[:, None]          # (CHUNKS, 3)
    return R_bins, t_trans


def _bins_pure(azimuth: jnp.ndarray) -> jnp.ndarray:
    """Direct binning: bin = floor((pi - az) / res), clamped."""
    resolution = 2.0 * jnp.pi / CHUNKS
    return jnp.clip(
        jnp.floor((jnp.pi - azimuth) / resolution).astype(jnp.int32),
        0,
        CHUNKS - 1,
    )


def _bins_reference(azimuth: jnp.ndarray, valid) -> jnp.ndarray:
    """Once-per-point bin advance over descending azimuth, vectorised.

    The reference sweeps the sorted cloud from the highest azimuth down
    (``pipeline.cpp:109-122``), advancing the bin at most once per point:
    ``if az_j < angle: angle -= res; t += delta``. With ``q_j = (pi -
    az_j)/res - 1`` nondecreasing along the traversal, the advance count
    obeys ``k_j = min(k_{j-1}+1, max(k_{j-1}, ceil(q_j)_+))`` whose closed
    form is a prefix min (verified against the literal loop).

    ``valid=False`` points sort to the END of the traversal (azimuth
    -inf) where they cannot perturb the prefix min of real points.
    """
    dtype = azimuth.dtype
    az = jnp.where(valid, azimuth, -jnp.inf)
    # Traversal = descending azimuth with ties in REVERSE original order
    # (the reference sorts ascending and walks the array backwards,
    # pipeline.cpp:97-110; on equal azimuths the sweep still advances the
    # bin once per point, so the tie order is observable).
    order = jnp.flip(jnp.argsort(az))
    az_desc = jnp.take(az, order)

    resolution = 2.0 * jnp.pi / CHUNKS
    q = (jnp.pi - az_desc) / resolution - 1.0
    c = jnp.clip(jnp.ceil(q), 0.0, float(CHUNKS - 1))
    j = jnp.arange(az.shape[0], dtype=dtype)
    pref = jax.lax.associative_scan(jnp.minimum, c - j)
    k_desc = jnp.minimum(j + 1.0, j + pref).astype(jnp.int32)
    k_desc = jnp.clip(k_desc, 0, CHUNKS - 1)

    # scatter the advance counts back to the original point order
    return jnp.zeros_like(k_desc).at[order].set(k_desc)


def deskew_cloud(
    points: jnp.ndarray,
    T_prev: jnp.ndarray,
    T_now: jnp.ndarray,
    sensor_hz,
    valid: jnp.ndarray | None = None,
    mode: str = "reference",
) -> jnp.ndarray:
    """Deskew (N, 3) points given the last two trajectory poses.

    Velocity is the naive finite difference of the last two poses over one
    scan period (``pipeline.cpp:82-86``); each azimuth bin gets the rigid
    motion ``[exp(w t) | v t]`` accumulated from scan start (t = -ts, at
    azimuth +pi) to scan end (t = 0, at azimuth -pi). ``mode`` selects the
    reference's literal once-per-point bin advance ("reference") or pure
    binning ("binned") — see the module docstring.
    """
    dtype = points.dtype
    R_bins, t_trans = _bin_times_and_motion(T_prev, T_now, sensor_hz, dtype)

    azimuth = jnp.arctan2(points[:, 1], points[:, 0])
    if mode == "reference":
        if valid is None:
            valid = jnp.ones(points.shape[0], bool)
        bins = _bins_reference(azimuth, valid)
    elif mode == "binned":
        bins = _bins_pure(azimuth)
    else:
        raise ValueError(f"deskew mode must be 'reference' or 'binned', got {mode!r}")

    Rp = jnp.take(R_bins, bins, axis=0)  # (N, 3, 3)
    tp = jnp.take(t_trans, bins, axis=0)
    return jnp.einsum("nij,nj->ni", Rp, points) + tp
