"""Benchmark evaluation CLI — the reference ``test.py`` equivalent.

Examples:
    python scripts/evaluate.py --dataset 3DMatch --root ../datasets/ThreeDMatch
    python scripts/evaluate.py --dataset KITTI --root ../datasets/kitti \
        --pose-estimator gnc --enable-early-exit
    python scripts/evaluate.py --dataset TIERS_hetero --root ../datasets/tiers \
        --hetero os0_128:os1_64
    python scripts/evaluate.py --dataset Synthetic --num-pairs 20   # no data

Mirrors ``utils/test_args.py`` ablation flags (num_points_per_patch,
num_scales, num_fps, search_radius_thresholds, pose_refine) and the output
artifacts (per-sample CSV, aggregate CSV, summary table). For 3DMatch, the
estimated trajectories are written per scene and re-scored with the
RMSE/gt.info protocol when the gt files are present (``test.py:280-306``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    from bufferx_tpu.config import DATASETS

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--dataset", required=True,
        choices=sorted(DATASETS) + ["Synthetic"],
    )
    ap.add_argument("--root", default="", help="dataset root directory")
    ap.add_argument("--experiment-id", default="bufferx_tpu")
    ap.add_argument("--checkpoint-dir", default="",
                    help="snapshot dir with Desc/best.msgpack + Pose/best.msgpack")
    ap.add_argument("--pose-estimator", choices=["ransac", "gnc"], default=None)
    ap.add_argument("--pose-refine", action="store_true", default=None)
    ap.add_argument("--enable-early-exit", action="store_true", default=None)
    ap.add_argument("--num-points-per-patch", type=int, default=None)
    ap.add_argument("--num-scales", type=int, default=None)
    ap.add_argument("--num-fps", type=int, default=None)
    ap.add_argument("--search-radius-thresholds", type=float, nargs="+",
                    default=None)
    ap.add_argument("--desc-mode", choices=["sampled", "moments"],
                    default=None,
                    help="cell pooling mode (must match the checkpoint)")
    ap.add_argument("--hetero", default=None,
                    help="src_sensor:tgt_sensor for *_hetero datasets")
    ap.add_argument("--max-pairs", type=int, default=None)
    ap.add_argument("--num-pairs", type=int, default=16,
                    help="Synthetic dataset size")
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="shrunken capacities for smoke runs (esp. --cpu)")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--batched", type=int, default=0, metavar="B",
                    help="evaluate on the vmapped throughput path with "
                         "batch size B (same per-sample CSV/RMSE artifacts "
                         "as the sequential path)")
    ap.add_argument("--enable-timing", action="store_true",
                    help="per-phase desc/pose/pose-optim timing in the CSV "
                         "(separately fenced stage programs)")
    ap.add_argument("--profile-dir", default=None,
                    help="write a device trace of one steady-state pair")
    ap.add_argument("--progress", action="store_true",
                    help="single-line progress UI with failure call-outs")
    return ap.parse_args()


def apply_overrides(cfg, args):
    patch = {}
    if args.num_points_per_patch is not None:
        patch["num_points_per_patch"] = args.num_points_per_patch
    if args.num_fps is not None:
        patch["num_fps"] = args.num_fps
    if args.num_scales is not None:
        patch["num_scales"] = args.num_scales
        patch["search_radius_thresholds"] = tuple(
            (args.search_radius_thresholds or (5.0, 2.0, 0.5))[: args.num_scales]
        )
    if args.search_radius_thresholds is not None:
        patch["search_radius_thresholds"] = tuple(args.search_radius_thresholds)
        patch["num_scales"] = len(args.search_radius_thresholds)
    if args.desc_mode is not None:
        patch["desc_mode"] = args.desc_mode
    match = {}
    if args.pose_estimator is not None:
        match["pose_estimator"] = args.pose_estimator
    if args.enable_early_exit:
        match["enable_early_exit"] = True
    test = {"experiment_id": args.experiment_id}
    if args.pose_refine:
        test["pose_refine"] = True
    out = cfg
    if args.fast:
        out = out.override(
            capacity=dict(
                max_points=4096, num_ransac_hypotheses=2048,
                ransac_chunk=512, sphere_query_chunk=128,
            ),
            patch=dict(
                num_fps=384, num_points_radius_estimate=512,
                num_points_per_patch=192,
            ),
        )
    if patch:
        out = out.override(patch=patch)
    if match:
        out = out.override(match=match)
    return out.override(test=test)


def synthetic_pairs(n, seed=0, num_points=20000):
    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap

    for i in range(n):
        rs = np.random.RandomState(seed + i)
        s, t, T = synthetic_pair_full_overlap(rs, num_points=num_points)
        yield dict(
            src_points=s, tgt_points=t, relt_pose=T,
            src_id=f"synth/{i}a", tgt_id=f"synth/{i}b",
            is_aligned_to_global_z=False, dataset_name="Synthetic",
        )


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.eval.harness import evaluate_pairs
    from bufferx_tpu.pipeline.registration import init_params
    from bufferx_tpu.train.trainer import compose_staged_params
    from bufferx_tpu.utils.result_io import format_summary_table

    if args.dataset == "Synthetic":
        cfg = make_cfg("ModelNet40")
        pairs = synthetic_pairs(args.num_pairs, args.seed,
                                num_points=3500 if args.fast else 20000)
    else:
        cfg = make_cfg(args.dataset, args.root)
        from bufferx_tpu.data.datasets import get_dataset

        src_sensor = tgt_sensor = None
        if args.hetero:
            src_sensor, tgt_sensor = args.hetero.split(":")
        ds = get_dataset(cfg, "test", src_sensor, tgt_sensor)
        pairs = iter(ds)
        if args.max_pairs:
            import itertools

            pairs = itertools.islice(pairs, args.max_pairs)

    cfg = apply_overrides(cfg, args)
    if args.checkpoint_dir:
        # architecture knobs recorded with the checkpoint (desc_mode /
        # desc_pool change the parameter tree) take precedence
        from bufferx_tpu.train.trainer import load_snapshot_config

        snap_over = load_snapshot_config(args.checkpoint_dir)
        if snap_over:
            cfg = cfg.override(patch=snap_over)
            print(f"snapshot config: {snap_over}")

    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.checkpoint_dir:
        params = compose_staged_params(
            os.path.join(args.checkpoint_dir, "Desc", "best.msgpack"),
            os.path.join(args.checkpoint_dir, "Pose", "best.msgpack"),
            params,
        )
        print(f"loaded staged checkpoints from {args.checkpoint_dir}")

    out_dir = os.path.join(args.out_dir, args.experiment_id)
    if args.batched:
        from bufferx_tpu.eval.harness import evaluate_pairs_batched

        summary = evaluate_pairs_batched(
            cfg, list(pairs), params, batch_size=args.batched,
            csv_path=os.path.join(out_dir, f"{args.dataset}_per_sample.csv"),
            summary_csv_path=os.path.join(out_dir, "summary.csv"),
        )
        print(f"pairs/s (steady-state): {summary['pairs_per_second']:.2f}")
    else:
        summary = evaluate_pairs(
            cfg, pairs, params,
            csv_path=os.path.join(out_dir, f"{args.dataset}_per_sample.csv"),
            summary_csv_path=os.path.join(out_dir, "summary.csv"),
            log=print,
            profile_dir=args.profile_dir,
            progress=args.progress,
            enable_timing=args.enable_timing,
        )
    rows = summary.pop("rows")

    # 3DMatch protocol: write trajectories + RMSE re-scoring when gt.info is
    # available (reference test.py:150-165, 280-306)
    if args.dataset in ("3DMatch", "3DLoMatch") and rows:
        rmse_recall = rmse_protocol(cfg, args, rows, out_dir)
        if rmse_recall is not None:
            summary["rmse_recall"] = rmse_recall

    # config-parameter-keyed aggregate (sweep outputs self-describe:
    # ablation params in the filename, reference result_io.py:80-124)
    import time as _time

    from bufferx_tpu.utils.result_io import write_full_results_csv

    extra = {}
    if args.hetero:
        extra["hetero"] = args.hetero.replace(":", "-")
    if cfg.test.pose_refine:
        extra["refine"] = 1
    if cfg.match.pose_estimator != "ransac":
        extra["solver"] = cfg.match.pose_estimator
    full_csv = write_full_results_csv(
        os.path.join(out_dir, "full_results"),
        [summary],
        args.experiment_id,
        _time.strftime("%Y%m%d-%H%M%S"),
        num_points_per_patch=cfg.patch.num_points_per_patch,
        num_scales=cfg.patch.num_scales,
        num_fps=cfg.patch.num_fps,
        extra_params=extra,
    )
    print(f"full results: {full_csv}")

    print(format_summary_table([{k: v for k, v in summary.items()}]))
    return 0


def rmse_protocol(cfg, args, rows, out_dir):
    """Groups estimates per scene, writes .log files, scores vs gt.info."""
    from collections import defaultdict

    from bufferx_tpu.data.base import (
        read_trajectory_info,
        read_trajectory_log,
        write_trajectory_log,
    )
    from bufferx_tpu.eval.metrics import evaluate_registration_rmse

    per_scene = defaultdict(list)
    for r in rows:
        # src_id format: <...>/fragments/<scene>/cloud_bin_N.ply
        parts = str(r["src_id"]).split("/")
        scene = parts[-2] if len(parts) >= 2 else "scene"
        i = int(str(parts[-1]).split("_")[-1].split(".")[0])
        j = int(str(r["tgt_id"]).split("/")[-1].split("_")[-1].split(".")[0])
        per_scene[scene].append((i, j, np.linalg.inv(r["pose"])))

    recalls = []
    benchmark = cfg.benchmark or "3DMatch"
    for scene, items in per_scene.items():
        pairs = np.asarray([[i, j, 0] for i, j, _ in items])
        poses = np.stack([p for _, _, p in items])
        write_trajectory_log(
            os.path.join(out_dir, "logs", f"{scene}.log"), pairs, poses
        )
        if benchmark == "3DMatch":
            gt_dir = os.path.join(
                cfg.data.root, "test", "3DMatch", "gt_result", scene
            )
        else:
            gt_dir = os.path.join(cfg.data.root, "test", "3DLoMatch", scene)
        gt_log = os.path.join(gt_dir, "gt.log")
        gt_info = os.path.join(gt_dir, "gt.info")
        if not (os.path.exists(gt_log) and os.path.exists(gt_info)):
            continue
        gt_pairs, gts = read_trajectory_log(gt_log)
        info_pairs, infos = read_trajectory_info(gt_info)
        n_frag = int(gt_pairs[:, 2].max()) if len(gt_pairs) else 0
        recall, _, _, _ = evaluate_registration_rmse(
            n_frag, poses, pairs[:, :2], gt_pairs[:, :2], gts, infos
        )
        recalls.append(recall)
        print(f"[rmse protocol] {scene}: recall {recall:.4f}")
    return float(np.mean(recalls)) if recalls else None


if __name__ == "__main__":
    sys.exit(main())
