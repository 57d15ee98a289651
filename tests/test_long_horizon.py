"""Long-horizon accuracy regression (VERDICT r2 item 6).

The 10-12-scan oracle tests pin exact per-scan parity but cannot see
slow error accumulation; the reference's long-horizon guard is its
external KITTI evaluation (``/root/reference/README.md:39``), which
needs real data this image does not have. This is the in-repo stand-in:
a 110-scan synthetic corridor drive (~27 m, with keyframe promotions
throughout) scored by the framework's own evaluator
(``apps/evaluate.py`` drift/ATE, short segment lengths) — the same
metrics a KITTI run would use — with tolerances pinned well below any
regression that would matter at dataset scale, guarding the certified,
compact, and fast association schedules EQUALLY.

Runs in its own process shard (scripts/run_tests.py catch-all): three
~110-step drives are the suite's longest execution (not compile) load.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from madicp_tpu.models.pipeline import Pipeline
from tests_fixtures_helper import synthetic_corridor_scans

N_SCANS = 110
STEP_M = 0.25  # ~27 m total

# drift bar: the reference's published ballpark on KITTI is ~0.5-0.6%
# over 100-800 m segments; this synthetic corridor is far easier (planar,
# noise-free, dense overlap) — all schedules measure ~0.105% drift /
# 4.3 mm ATE / 2.5 cm end error here (r3 calibration). Bars at ~4-5x
# measured catch systematic accumulation the short oracles can't see
# while staying robust to fixture-level noise.
T_ERR_PCT_MAX = 0.5
ATE_M_MAX = 0.02
END_ERR_M_MAX = 0.1


def _drive(schedule: str, scans):
    kw = {}
    if schedule == "compact":
        kw = dict(certify=True, certify_compact=256)
    elif schedule == "certified":
        kw = dict(certify=True)
    elif schedule == "plain":
        kw = dict(certify=False)
    elif schedule == "fast":
        kw = dict(assoc_mode="fast", reassoc_every=7)
    p = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=4,
        n_points=2048, depth=11, max_leaves=2048, dtype=jnp.float64, **kw,
    )
    poses = []
    promotions = 0
    for i, s in enumerate(scans):
        p.compute(0.1 * i, s)
        poses.append(p.current_pose())
        promotions += int(p.is_map_updated())
    return np.stack(poses), promotions


@pytest.mark.parametrize("schedule", ["certified", "compact", "fast"])
def test_long_horizon_drift(schedule, tmp_path, rng):
    from madicp_tpu.apps.evaluate import evaluate
    from madicp_tpu.utils.trajectory import write_transformed_pose

    scans, gt = synthetic_corridor_scans(
        rng, n_scans=N_SCANS, n_points=2048, step=STEP_M
    )
    # ground truth relative to the first pose (odometry starts at I)
    T0_inv = np.linalg.inv(gt[0])
    gt_rel = np.stack([T0_inv @ T for T in gt])

    est, promotions = _drive(schedule, scans)
    # the drive must actually exercise the map machinery: the sensor
    # leaves the initial view several times over ~27 m
    assert promotions >= 5, f"{schedule}: only {promotions} promotions"

    E = np.eye(4)
    est_f, gt_f = tmp_path / "est.txt", tmp_path / "gt.txt"
    with open(est_f, "w") as f:
        for T in est:
            write_transformed_pose(f, T, E)
    with open(gt_f, "w") as f:
        for T in gt_rel:
            write_transformed_pose(f, T, E)

    m = evaluate(est_f, gt_f, lengths=(5.0, 10.0, 20.0))
    assert m["segments"] >= 15  # 19 on this 27 m / 110-pose drive
    end_err = np.linalg.norm(est[-1][:3, 3] - gt_rel[-1][:3, 3])
    print(f"{schedule}: drift {m['t_err_pct']:.4f}%  "
          f"ATE {m['ate_rmse_m']:.4f} m  end {end_err:.4f} m  "
          f"promotions {promotions}")
    assert m["t_err_pct"] < T_ERR_PCT_MAX, m
    assert m["ate_rmse_m"] < ATE_M_MAX, m
    assert end_err < END_ERR_M_MAX
