#!/usr/bin/env python
"""On-chip motion-recovery check: the accuracy half of /verify, scripted.

The CPU oracle/golden suite runs fma-exact matmuls and f64, so a whole
class of TPU-only numeric bugs (r4: default-precision bf16 matmul passes
corrupting geometry by gate-magnitude amounts) is invisible to it. This
probe is the chip-side guard: a synthetic world with walls in BOTH
orientations (bench's world is degenerate for x-translation), constant
known motion, full default pipeline, and a pass/fail bound on the
recovered per-scan motion.

Run on the TPU (or any backend): ``python scripts/accuracy_probe.py``.
Expected (chip, r4 after the precision fix): max per-scan motion error
~0.2-2 mm. Before the fix it was 1-2 cm/scan.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

STEP = 0.3        # metres per scan along +x
N_SCANS = 12
TOL = 0.01        # metres: generous; r4 chip measures ~2e-4


def world(rng):
    pts = [rng.uniform([-40, -40, -0.05], [40, 40, 0.05], (12000, 3))]
    for i in range(8):
        y = -35 + 10 * i + rng.uniform(-2, 2)
        pts.append(rng.uniform([-40, y - 0.03, 0], [40, y + 0.03, 6],
                               (1800, 3)))
    for i in range(8):
        x = -35 + 10 * i + rng.uniform(-2, 2)
        pts.append(rng.uniform([x - 0.03, -40, 0], [x + 0.03, 40, 6],
                               (1800, 3)))
    return np.concatenate(pts)


def run(verbose: bool = True) -> dict:
    """Drive the synthetic world and return the measured motion errors.

    Importable by scripts/chip_checks.py (the automated chip tier);
    the CLI below keeps the original pass/fail exit-code behavior.
    """
    from madicp_tpu.models.pipeline import Pipeline

    rng = np.random.default_rng(7)
    W = world(rng)
    pipe = Pipeline(
        sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1, p_th=0.8,
        b_min=0.1, b_ratio=0.02, num_keyframes=4,
        n_points=65536, depth=14, max_leaves=16384,
    )
    errs = []
    for k in range(N_SCANS):
        p = W - np.array([STEP * k, 0.0, 0.0])
        r = np.linalg.norm(p, axis=1)
        pipe.compute(0.1 * k, p[(r > 1.0) & (r < 80.0)])
        x = float(pipe.current_pose()[0, 3])
        errs.append(abs(x - STEP * k))
        if verbose:
            print(f"scan {k:2d}: x={x:8.4f}  truth={STEP * k:6.2f}  "
                  f"err={errs[-1]*1e3:7.2f} mm  "
                  f"inliers={pipe.inlier_ratio():.2f}", flush=True)
    worst = max(errs[1:])  # scan 0 is the identity bootstrap
    if verbose:
        print(f"max per-scan error {worst*1e3:.2f} mm (bound {TOL*1e3:.0f})")
    return {
        "max_err_mm": round(worst * 1e3, 3),
        "bound_mm": TOL * 1e3,
        "pass": bool(worst <= TOL),
    }


def main() -> int:
    result = run()
    if not result["pass"]:
        print("FAIL: motion recovery outside bound — check matmul "
              "precision (NOTES r4) and association health")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
