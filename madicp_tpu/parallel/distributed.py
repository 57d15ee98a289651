"""Multi-host initialisation and fleet orchestration helpers.

The reference is strictly single-process shared-memory (SURVEY.md §2 P5).
The TPU-native communication backend is ``jax.distributed`` + XLA
collectives: hosts join one runtime, the global device set forms a
``(seq, kf)`` mesh (parallel/mesh.py), the per-GN-round ``psum`` of the
6x6 normal equations rides ICI, and DCN is touched only at
startup/result-gathering — never inside the per-scan loop.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    heartbeat_timeout_seconds: int = 600,
    shutdown_timeout_seconds: int = 1800,
) -> dict:
    """Join (or no-op into) the multi-host JAX runtime.

    With no arguments, auto-detection is used (TPU pod metadata); on a
    single host this is a no-op. Returns a summary of the topology.

    The heartbeat/shutdown deadlines default far above jax's own
    (100 s / 300 s): a cold-cache XLA compile on a loaded or 1-core host
    can stall one process for minutes while its peers idle, and the
    default shutdown barrier then declares the compiling process dead
    (observed: DEADLINE_EXCEEDED in the 2-process test on a cold cache).
    Odometry steps are sub-second once compiled, so a long deadline
    costs nothing in failure-detection latency that matters here.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            heartbeat_timeout_seconds=heartbeat_timeout_seconds,
            shutdown_timeout_seconds=shutdown_timeout_seconds,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return topology()


def barrier(name: str, *, timeout_seconds: int = 1800) -> None:
    """Block until every process reaches this barrier (single-process: no-op).

    Rides the coordination service's key-value store, NOT an XLA
    collective — crucially different from
    ``multihost_utils.sync_global_devices``: the first *collective*
    dispatched on the CPU backend initialises a Gloo context with a hard
    ~30 s connect deadline, so using a collective as the barrier just
    moves the deadline problem to the barrier itself. This barrier has
    the explicit timeout given here instead.

    Use it to line processes up before the first collective dispatch
    when their progress may be minutes apart (e.g. cold-cache XLA
    compiles on a loaded host); once aligned, the 30 s Gloo window is
    trivially met. Reference analog: the implicit OpenMP barrier after
    the keyframe loop, ``pipeline.cpp:185``.
    """
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is None or jax.process_count() == 1:
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_seconds * 1000)


def topology() -> dict:
    """Summarise the process/device topology for logging."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }


def fleet_mesh(num_keyframes_axis: int = 1):
    """Build the standard fleet mesh over ALL global devices.

    ``kf`` spans chips within a host (ICI) and ``seq`` spans the rest —
    sequences never communicate, so ``seq`` may safely cross hosts (DCN).
    """
    from madicp_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    if n % num_keyframes_axis != 0:
        raise ValueError(
            f"{n} devices not divisible by kf axis {num_keyframes_axis}"
        )
    return make_mesh(kf=num_keyframes_axis, seq=n // num_keyframes_axis)
