"""Odometry CLI.

Option and behavior parity with the reference Typer app
(``apps/mad_icp.py:71-216``): dataset-format sniffing by file extension,
config resolution by preset name or YAML path, per-stage timing prints,
KITTI-format pose output appended to ``estimate.txt``. Typer is not part
of this image, so the interface is argparse with the same option names.

Usage:
    python -m madicp_tpu --data-path DIR --estimate-path DIR \
        --dataset-config kitti [--mad-icp-params default] [...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mad_icp_tpu", description="TPU-native MAD-ICP LiDAR odometry"
    )
    p.add_argument("--data-path", type=Path, required=True,
                   help="directory with .bin files or rosbags")
    p.add_argument("--estimate-path", type=Path, required=True,
                   help="trajectory estimate output directory")
    p.add_argument("--dataset-config", type=str, required=True,
                   help="dataset preset name or YAML path")
    p.add_argument("--mad-icp-params", type=str, default="default",
                   help="solver preset name or YAML path")
    p.add_argument("--num-cores", type=int, default=4,
                   help="accepted for reference-CLI parity; unused on TPU")
    p.add_argument("--num-keyframes", type=int, default=4,
                   help="max keyframes kept in the local map")
    p.add_argument("--realtime", action="store_true",
                   help="anytime realtime (measured, not enforced)")
    p.add_argument("--noviz", action="store_true", help="disable visualizer")
    p.add_argument("--n-points", type=int, default=131072,
                   help="static padded cloud size")
    p.add_argument("--depth", type=int, default=16, help="static tree depth")
    p.add_argument("--max-leaves", type=int, default=0,
                   help="moving-leaf capacity (0 = n_points)")
    p.add_argument("--assoc-mode", type=str, default="exact",
                   choices=("exact", "fast"),
                   help="ICP association schedule: 'exact' re-descends "
                        "every GN round (reference behavior); 'fast' "
                        "re-descends periodically and re-gates cached "
                        "associations in between (~2.5x faster, "
                        "trajectory-level identical)")
    p.add_argument("--reassoc-every", type=int, default=7,
                   help="fast mode: rounds between full re-descents")
    p.add_argument("--no-certify", action="store_true",
                   help="exact mode: disable the certified re-association "
                        "(skip provably-unchanged descents; result-"
                        "identical, several-fold faster)")
    p.add_argument("--certify-compact", type=int, default=0,
                   help="EXPERIMENTAL, measured SLOWER than plain exact "
                        "on TPU (faster only on the CPU backend): "
                        "certified exact mode, compact each keyframe's "
                        "uncertified entries into a per-keyframe static "
                        "buffer of this size and descend only those "
                        "(0 = off; see PipelineConfig.certify_compact)")
    p.add_argument("--certify-prefix", type=int, default=0,
                   help="EXPERIMENTAL, measured SLOWER than plain exact "
                        "on TPU (its sorted prefix overflows into the "
                        "full-sweep fallback at flagship scale): "
                        "certified exact mode, per-round uncertified-"
                        "PREFIX buffer size under the global margin-"
                        "sorted order (0 = off; see "
                        "PipelineConfig.certify_prefix)")
    p.add_argument("--assoc-ladder", type=int, default=3,
                   help="descent levels whose block rows are computed "
                        "instead of gathered (bitwise-identical; see "
                        "PipelineConfig.assoc_ladder)")
    p.add_argument("--deskew-mode", type=str, default="reference",
                   choices=("reference", "binned"),
                   help="deskew semantics (when the dataset enables "
                        "deskew): 'reference' = the reference's literal "
                        "once-per-point azimuth-bin advance; 'binned' = "
                        "pure binning, sort-free (identical on bin-dense "
                        "sweeps)")
    p.add_argument("--max-scans", type=int, default=0,
                   help="stop after this many scans (0 = all)")
    p.add_argument("--no-prefetch", action="store_true",
                   help="disable background scan prefetching")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="save a resumable checkpoint every N scans (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the checkpoint in --estimate-path")
    p.add_argument("--profile", type=Path, default=None,
                   help="capture a jax.profiler trace into this directory")
    return p


def sniff_format(data_path: Path) -> str:
    """Dataset-format sniffing (reference ``apps/mad_icp.py:99-111``)."""
    if list(data_path.glob("*.bag")):
        return "ros1"
    if list(data_path.glob("*.db3")):
        return "ros2"
    if list(data_path.glob("*.mcap")):
        return "mcap"
    return "kitti"


def make_reader(fmt: str, data_path: Path, data_cf):
    from madicp_tpu.utils.kitti import KittiReader
    if fmt == "kitti":
        return KittiReader(
            data_path,
            data_cf.min_range,
            data_cf.max_range,
            apply_correction=data_cf.apply_correction,
            sensor_hz=data_cf.sensor_hz,
        )
    from madicp_tpu.utils.rosbag import McapReader, Ros1Reader, Ros2Reader
    cls = {"ros1": Ros1Reader, "ros2": Ros2Reader, "mcap": McapReader}[fmt]
    return cls(
        data_path,
        data_cf.min_range,
        data_cf.max_range,
        topic=data_cf.rosbag_topic,
        sensor_hz=data_cf.sensor_hz,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if not args.data_path.exists():
        print(f"error: {args.data_path} does not exist", file=sys.stderr)
        return -1
    args.estimate_path.mkdir(parents=True, exist_ok=True)

    from madicp_tpu.utils.config import load_dataset_config, load_mad_params
    from madicp_tpu.utils.trajectory import write_transformed_pose
    from madicp_tpu.models.pipeline import Pipeline

    fmt = sniff_format(args.data_path)
    print(f"dataset format: {fmt}")
    data_cf = load_dataset_config(args.dataset_config)
    mad_cf = load_mad_params(args.mad_icp_params)

    from madicp_tpu.utils.checkpoint import (
        checkpoint_path,
        load_pipeline,
        save_pipeline,
    )

    ckpt = checkpoint_path(args.estimate_path)
    start_scan = 0
    if args.resume and ckpt.exists():
        pipeline = load_pipeline(ckpt)
        start_scan = pipeline.current_id()
        print(f"resumed from {ckpt} at scan {start_scan}")
    else:
        pipeline = Pipeline(
            sensor_hz=data_cf.sensor_hz,
            deskew=data_cf.deskew,
            b_max=mad_cf.b_max,
            rho_ker=mad_cf.rho_ker,
            p_th=mad_cf.p_th,
            b_min=mad_cf.b_min,
            b_ratio=mad_cf.b_ratio,
            num_keyframes=args.num_keyframes,
            realtime=args.realtime,
            n_points=args.n_points,
            depth=args.depth,
            max_leaves=args.max_leaves,
            assoc_mode=args.assoc_mode,
            reassoc_every=args.reassoc_every,
            certify=not args.no_certify,
            certify_compact=args.certify_compact,
            certify_prefix=args.certify_prefix,
            assoc_ladder=args.assoc_ladder,
            deskew_mode=args.deskew_mode,
        )

    visualizer = None
    if not args.noviz:
        from madicp_tpu.utils.visualizer import Visualizer

        visualizer = Visualizer()

    estimate_path = args.estimate_path / "estimate.txt"
    if start_scan and estimate_path.exists():
        # poses written after the last checkpoint would be recomputed —
        # truncate the trajectory to exactly the checkpointed scan count
        with open(estimate_path) as f:
            kept = f.readlines()[:start_scan]
        with open(estimate_path, "w") as f:
            f.writelines(kept)
    estimate_file = open(estimate_path, "a" if start_scan else "w")
    lidar_to_base = data_cf.extrinsics

    reader = make_reader(fmt, args.data_path, data_cf)
    staged = False
    if not args.no_prefetch:
        from madicp_tpu.native.prefetch import Prefetcher

        def _stage(item):
            # producer thread: pad + start the host->device transfer so
            # it overlaps the previous scan's device step
            ts, points = item
            return (ts, *pipeline.stage(points))

        reader = Prefetcher(reader, transform=_stage)
        staged = True

    profile_ctx = None
    if args.profile is not None:
        import jax

        args.profile.mkdir(parents=True, exist_ok=True)
        profile_ctx = jax.profiler.trace(str(args.profile))
        profile_ctx.__enter__()

    n_scans = 0
    budget_ms = 1000.0 / data_cf.sensor_hz
    ckpt_thread = None
    with reader:
        t_read = time.perf_counter()
        for item in reader:
            ts = item[0]
            if n_scans < start_scan:  # resume: skip already-processed scans
                n_scans += 1
                t_read = time.perf_counter()
                continue
            read_ms = (time.perf_counter() - t_read) * 1000

            t0 = time.perf_counter()
            if staged:
                pipeline.compute_device(*item)
            else:
                pipeline.compute(ts, item[1])
            lidar_to_world = pipeline.current_pose()
            odom_ms = (time.perf_counter() - t0) * 1000

            write_transformed_pose(estimate_file, lidar_to_world, lidar_to_base)
            print(
                f"scan {pipeline.current_id():6d}  read {read_ms:7.2f} ms  "
                f"odometry {odom_ms:7.2f} ms  "
                f"(budget {budget_ms:.0f} ms)  "
                f"inliers {pipeline.inlier_ratio():.2f}"
            )
            dropped = pipeline.leaves_dropped()
            if dropped:
                print(
                    f"warning: scan {pipeline.current_id()} exceeded the "
                    f"leaf capacity by {dropped} leaves — raise "
                    f"--max-leaves (map and inlier ratio are truncated)",
                    file=sys.stderr,
                )
            pts_dropped = pipeline.points_dropped()
            if pts_dropped:
                print(
                    f"warning: scan {pipeline.current_id()} exceeded the "
                    f"point capacity by {pts_dropped} points — raise "
                    f"--n-points (the scan entered the pipeline "
                    f"truncated; the reference ingests every point)",
                    file=sys.stderr,
                )

            if visualizer is not None:
                if pipeline.is_map_updated():
                    visualizer.update(
                        pipeline.current_leaves(),
                        pipeline.model_leaves(),
                        lidar_to_world,
                        pipeline.keyframe_pose(),
                    )
                else:
                    visualizer.update(
                        pipeline.current_leaves(), None, lidar_to_world, None
                    )

            n_scans += 1
            if args.checkpoint_every and n_scans % args.checkpoint_every == 0:
                estimate_file.flush()
                if ckpt_thread is not None:
                    ckpt_thread.join()  # never two writers on the same file
                # snapshot synchronously, write on a background thread so
                # the (multi-second at flagship scale) file IO stays off
                # the per-scan critical path
                ckpt_thread = save_pipeline(ckpt, pipeline, background=True)
            if args.max_scans and n_scans >= args.max_scans:
                break
            t_read = time.perf_counter()

    if ckpt_thread is not None:
        ckpt_thread.join()
    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
        print(f"profiler trace written to {args.profile}")
    estimate_file.close()
    print(f"wrote {n_scans} poses to {args.estimate_path / 'estimate.txt'}")
    return 0


def run() -> None:
    raise SystemExit(main())


if __name__ == "__main__":
    run()
