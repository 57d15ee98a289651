"""Worker for the 2-process multi-host smoke test.

Executed as a subprocess by ``tests/test_distributed.py`` (one per
process id): joins the ``jax.distributed`` runtime on CPU (2 virtual
devices per process -> 4 global), builds the standard fleet mesh across
BOTH processes, and advances a 4-sequence :class:`Fleet` whose ``seq``
axis spans the process boundary — executing the initialize/topology
path and cross-process sharded dispatch for real (the reference has no
distributed capability at all, SURVEY.md §2 P5; this is the TPU-native
framework's DCN axis exercised end-to-end).

Usage: python tests/distributed_worker.py <coordinator> <n_proc> <pid> <out.npy>
"""

from __future__ import annotations

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

# tiny shapes: this runs a full pipeline step per scan in every process
N_SEQ, N_SCANS, N_POINTS = 4, 3, 512
DEPTH, MAX_LEAVES, NUM_KF = 10, 512, 2
DEVICES_PER_PROC = 2


def make_scans():
    """Deterministic per-sequence scan streams (identical in every
    process; the fleet slices out each process's shard locally)."""
    rng = np.random.default_rng(7)
    n = N_POINTS // 4

    def plane(o, u, v, k):
        a = rng.uniform(0, 1, (k, 1))
        b = rng.uniform(0, 1, (k, 1))
        return np.asarray(o) + a * np.asarray(u) + b * np.asarray(v)

    stamps = np.zeros((N_SCANS, N_SEQ))
    points = np.zeros((N_SCANS, N_SEQ, N_POINTS, 3))
    valid = np.ones((N_SCANS, N_SEQ, N_POINTS), bool)
    for s in range(N_SEQ):
        world = np.vstack(
            [
                plane([0, 0, 0], [4, 0, 0], [0, 0, 2], n),
                plane([0, 4, 0], [4, 0, 0], [0, 0, 2], n),
                plane([0, 0, 0], [0, 4, 0], [0, 0, 2], n),
                plane([0, 0, 0], [4, 0, 0], [0, 4, 0], N_POINTS - 3 * n),
            ]
        ) + np.array([2.0 * s, 0.0, 0.0])
        for i in range(N_SCANS):
            t = np.array([1.0 + 0.05 * i * (1 + s), 1.0 + 0.02 * i, 0.5])
            stamps[i, s] = 0.1 * i
            points[i, s] = world - t
    return stamps, points, valid


def run_kf_sharded(mesh=None):
    """Drive the single-sequence KEYFRAME-sharded pipeline: the per-GN-
    round psum of the (6x6, 6) normal equations crosses the process
    boundary — the ICI-collective analog of the reference's OpenMP
    reduction (mad_icp.cpp:105-110), executed over a real 2-process
    runtime. Returns the (4, 4) final pose."""
    import jax.numpy as jnp

    from madicp_tpu.models.pipeline import (
        PipelineConfig,
        init_state,
        pipeline_step,
    )

    cfg = PipelineConfig(
        n_points=N_POINTS,
        depth=DEPTH,
        max_leaves=MAX_LEAVES,
        num_keyframes=4,  # one keyframe slot per global device
        dtype=jnp.float64,
    )
    stamps, points, valid = make_scans()  # reuse sequence 0's stream

    if mesh is None:
        state = init_state(cfg)
        for i in range(N_SCANS):
            state, _ = pipeline_step(
                cfg,
                state,
                jnp.asarray(points[i, 0]),
                jnp.asarray(valid[i, 0]),
                jnp.asarray(stamps[i, 0], cfg.dtype),
            )
        return np.asarray(state.X)

    from madicp_tpu.parallel.mesh import read_replicated
    from madicp_tpu.parallel.sharded_icp import make_sharded_pipeline_step

    from madicp_tpu.parallel.distributed import barrier

    step, place, place_inputs = make_sharded_pipeline_step(cfg, mesh)
    state = place(init_state(cfg))
    scans = [
        place_inputs(points[i, 0], valid[i, 0], np.asarray(stamps[i, 0]))
        for i in range(N_SCANS)
    ]
    # AOT-compile BEFORE the first dispatch, then line both processes up
    # at a coordination-service barrier: the first psum initialises a
    # Gloo collective context with a hard ~30 s connect deadline, and on
    # a 1-core host the two workers can finish this f64 compile minutes
    # apart — dispatching before both are ready deadlocks the context
    # init (VERDICT r4 weak #2). Once aligned, 30 s is trivially met.
    compiled = step.lower(state, *scans[0]).compile()
    barrier("madicp_kf_step_compiled")
    for scan in scans:
        state, _ = compiled(state, *scan)
    return read_replicated(state.X)


def run_fleet(mesh=None):
    """Drive the deterministic fleet; returns (N_SEQ, 4, 4) final poses."""
    import jax.numpy as jnp

    from madicp_tpu.models.pipeline import PipelineConfig
    from madicp_tpu.parallel.fleet import Fleet

    cfg = PipelineConfig(
        n_points=N_POINTS,
        depth=DEPTH,
        max_leaves=MAX_LEAVES,
        num_keyframes=NUM_KF,
        dtype=jnp.float64,
    )
    fleet = Fleet(cfg, N_SEQ, mesh=mesh)
    # establish the cross-process collective context NOW, while both
    # workers are synchronized from initialize(): the first Gloo context
    # has a hard ~30 s connect deadline, and compile-time skew between
    # the workers at the END of the run can exceed it on a loaded host
    _ = fleet.poses()
    stamps, points, valid = make_scans()
    for i in range(N_SCANS):
        fleet.compute(stamps[i], points[i], valid[i])
    return fleet.poses()


def main():
    import os

    coordinator, n_proc, pid, out_path = sys.argv[1:5]
    mode = sys.argv[5] if len(sys.argv) > 5 else "seq"
    n_proc, pid = int(n_proc), int(pid)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    )
    os.environ["JAX_ENABLE_X64"] = "1"

    import jax

    # belt and braces: JAX_PLATFORMS alone still lets other discovered
    # PJRT plugins (e.g. a remote-TPU tunnel) load during multi-process
    # init and hang when their backend is unreachable
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # share the suite's persistent compile cache: both workers compile
    # the SAME sharded step, so the second hits the first's entry (and
    # reruns skip the compile entirely)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MADICP_XLA_CACHE", "/tmp/madicp_xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from madicp_tpu.parallel.distributed import fleet_mesh, initialize

    topo = initialize(coordinator, n_proc, pid)
    assert topo["process_count"] == n_proc, topo
    assert topo["global_devices"] == n_proc * DEVICES_PER_PROC, topo
    assert topo["local_devices"] == DEVICES_PER_PROC, topo

    if mode == "kf":
        # keyframe axis spans BOTH processes: the per-round psum(H, b)
        # crosses the process boundary
        from madicp_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(kf=n_proc * DEVICES_PER_PROC, seq=1)
        cross = {d.process_index for d in mesh.devices.flat}
        assert cross == set(range(n_proc)), cross
        pose = run_kf_sharded(mesh)
        assert pose.shape == (4, 4)
        assert np.isfinite(pose).all()
        if pid == 0:
            np.save(out_path, pose)
    else:
        mesh = fleet_mesh(num_keyframes_axis=1)  # (seq=4, kf=1) across procs
        cross = {d.process_index for d in mesh.devices.flat}
        assert cross == set(range(n_proc)), cross

        poses = run_fleet(mesh)  # every process gets the gathered result
        assert poses.shape == (N_SEQ, 4, 4)
        assert np.isfinite(poses).all()
        if pid == 0:
            np.save(out_path, poses)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
