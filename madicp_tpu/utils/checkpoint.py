"""Pipeline checkpoint / resume.

The reference has no checkpointing — a crash loses the run and the only
artifact is the appended ``estimate.txt`` (SURVEY.md §5). Here the whole
odometry state (pose, velocity, trajectory window, keyframe and frame
rings) is a single pytree of device arrays, so a checkpoint is one
``.npz`` plus the static config as JSON; ``resume`` reconstructs a
Pipeline mid-sequence bit-for-bit.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
from pathlib import Path

import jax
import numpy as np


def save_pipeline(path, pipe, compress: bool = False, background: bool = False):
    """Write a Pipeline's static config + full device state to ``path``.

    The device->host snapshot is taken synchronously (a consistent
    checkpoint needs the state as of NOW), but the file write — the
    multi-second part at flagship scale (~1 GB of rings) — can run on a
    background thread (``background=True``; returns the ``Thread``, join
    it before process exit). ``compress`` defaults off: the state is
    float arenas that deflate poorly, and compression multiplies the
    critical-path stall the reference's realtime loop never pays
    (the reference has no checkpointing at all, SURVEY.md §5). The file
    is written to a temp sibling and atomically renamed, so a crash
    mid-write never corrupts the previous checkpoint.
    """
    from madicp_tpu.models.pipeline import PipelineConfig  # noqa: F401

    cfg = dataclasses.asdict(pipe.cfg)
    cfg["dtype"] = np.dtype(pipe.cfg.dtype).name
    leaves, treedef = jax.tree.flatten(pipe.state)
    host = jax.device_get(leaves)  # one batched transfer
    arrays = {f"leaf_{i}": np.asarray(a) for i, a in enumerate(host)}
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp.npz")

    def _write():
        save = np.savez_compressed if compress else np.savez
        save(
            tmp,
            __config__=json.dumps(cfg),
            __realtime__=np.asarray(pipe.realtime),
            # realtime-calibration host state lives OUTSIDE cfg: the
            # CONFIGURED iteration ceiling (cfg.max_icp_iterations may be
            # a temporarily shrunk value at save time) and the recal
            # cadence — without these a resumed run could never restore
            # its budget past the shrunk count
            __rt_its_max__=np.asarray(pipe._rt_its_max),
            __rt_every__=np.asarray(pipe._rt_every),
            **arrays,
        )
        os.replace(tmp, path)

    if background:
        t = threading.Thread(target=_write, name="madicp-ckpt", daemon=False)
        t.start()
        return t
    _write()
    return None


def load_pipeline(path):
    """Reconstruct a Pipeline (config + state) from a checkpoint file."""
    import jax.numpy as jnp

    from madicp_tpu.models.pipeline import Pipeline, PipelineConfig, init_state

    with np.load(path, allow_pickle=False) as z:
        cfg_d = json.loads(str(z["__config__"]))
        realtime = bool(z["__realtime__"])
        dtype = jnp.dtype(cfg_d.pop("dtype"))
        cfg = PipelineConfig(dtype=dtype, **cfg_d)

        pipe = Pipeline(
            sensor_hz=cfg.sensor_hz,
            deskew=cfg.deskew,
            b_max=cfg.b_max,
            rho_ker=cfg.rho_ker,
            p_th=cfg.p_th,
            b_min=cfg.b_min,
            b_ratio=cfg.b_ratio,
            num_keyframes=cfg.num_keyframes,
            realtime=realtime,
            n_points=cfg.n_points,
            depth=cfg.depth,
            max_leaves=cfg.max_leaves,
            max_icp_iterations=cfg.max_icp_iterations,
            dtype=dtype,
            assoc_mode=cfg.assoc_mode,
            reassoc_every=cfg.reassoc_every,
            reassoc_backup=cfg.reassoc_backup,
        )
        # the ctor args above cover the public surface; assign the fully
        # parsed config as well so NO field can silently fall back to a
        # default if the ctor signature lags behind PipelineConfig
        pipe.cfg = cfg
        # restore the realtime-calibration ceiling/cadence (older
        # checkpoints lack these keys: fall back to the saved cfg value,
        # the pre-fix behavior)
        if "__rt_its_max__" in z:
            pipe._rt_its_max = int(z["__rt_its_max__"])
            pipe._rt_every = int(z["__rt_every__"])
        # eval_shape: the treedef/dtypes without materialising another
        # ~1 GB state on device (Pipeline.__init__ already made one)
        proto = jax.eval_shape(lambda: init_state(cfg))
        leaves, treedef = jax.tree.flatten(proto)
        restored = [
            jnp.asarray(z[f"leaf_{i}"], leaves[i].dtype)
            for i in range(len(leaves))
        ]
        pipe.state = jax.tree.unflatten(treedef, restored)
        # restore the host-side first-scan flag from the restored state
        pipe._initialized = int(np.asarray(pipe.state.seq)) > 0
    return pipe


def checkpoint_path(estimate_dir, name: str = "pipeline.ckpt.npz") -> Path:
    return Path(estimate_dir) / name
