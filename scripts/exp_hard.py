#!/usr/bin/env python3
"""Hard synthetic quality benchmark (the round-2 quality gate).

Sweeps the 3DLoMatch-style operating axes on the HELD-OUT eval scene
family (``bufferx_tpu/data/hardsynth.py`` — independent surface sampling,
disjoint from the training family):

- overlap ratio {0.3, 0.5, 0.75}  x  Gaussian noise {0, 0.5, 1.0} voxels
- overlap ratio {0.3, 0.5, 0.75}  x  density mismatch {4:1, 10:1} (hetero
  sensors), at 0.5-voxel noise
- outlier clutter {10%, 20%} at overlap 0.5, 0.5-voxel noise

>= 50 pairs per cell (configurable). Reports recall (RTE < 0.3 m and
RRE < 15 deg, the indoor thresholds), median RTE/RRE per cell, and writes
one JSON line per cell so runs can be diffed.

Gate usage (RESULTS.md): run once per descriptor mode and once with
--exact-topk to quantify the approximate ball-query's quality effect:

    python scripts/exp_hard.py --desc-mode moments \
        --checkpoint-dir snapshot/hard_moments
    python scripts/exp_hard.py --desc-mode sampled \
        --checkpoint-dir snapshot/hard
    python scripts/exp_hard.py --desc-mode sampled --exact-topk ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_cells(quick: bool):
    cells = []
    overlaps = (0.3, 0.5, 0.75)
    noises = (0.0, 0.5, 1.0)
    if quick:
        overlaps, noises = (0.3, 0.75), (0.0, 1.0)
    for ov in overlaps:
        for nz in noises:
            cells.append(dict(overlap=ov, noise_vox=nz, density=1.0,
                              clutter=0.0))
    for ov in overlaps:
        for dr in ((4.0,) if quick else (4.0, 10.0)):
            cells.append(dict(overlap=ov, noise_vox=0.5, density=dr,
                              clutter=0.0))
    for cl in ((0.2,) if quick else (0.1, 0.2)):
        cells.append(dict(overlap=0.5, noise_vox=0.5, density=1.0,
                          clutter=cl))
    return cells


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--desc-mode", choices=["sampled", "moments"],
                    default="moments")
    ap.add_argument("--checkpoint-dir", default="")
    ap.add_argument("--pairs-per-cell", type=int, default=50)
    ap.add_argument("--num-points", type=int, default=24000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--voxel", type=float, default=0.025,
                    help="noise unit (meters); the sweep is in voxels")
    ap.add_argument("--exact-topk", action="store_true")
    ap.add_argument("--no-block-ball-query", action="store_true",
                    help="flat ball query instead of the two-level blocks")
    ap.add_argument("--strat", action="store_true",
                    help="(default on) stratified gather-free ball query")
    ap.add_argument("--no-strat", action="store_true",
                    help="force the flat/block ball query instead")
    ap.add_argument("--no-clutter-filter", action="store_true",
                    help="disable the density clutter prefilter")
    ap.add_argument("--quick", action="store_true",
                    help="reduced grid + capacities (CPU smoke)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=20240)
    ap.add_argument("--out", default="",
                    help="append JSON lines here as well as stdout")
    ap.add_argument("--cells", default="",
                    help="comma-separated cell indices to run (subset gate "
                         "for cheap A/Bs; indices follow build_cells order)")
    ap.add_argument("--set", action="append", default=[],
                    help="config override section.key=value, repeatable "
                         "(e.g. --set capacity.num_ransac_hypotheses=16384 "
                         "--set match.inlier_th=1.5)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.core import se3
    from bufferx_tpu.data.hardsynth import hard_pair
    from bufferx_tpu.pipeline.registration import (
        PipelineStatics,
        init_params,
        prepare_cloud,
        register_pair_jit,
        stack_clouds,
    )

    # --exact-topk gates the FLAT ball query's exact/approx top-k, so it
    # must also turn the block ball query off (block_ball_query takes
    # precedence in select_patches and would make the A/B a no-op).
    cfg = make_cfg("3DMatch").override(
        data=dict(root=""),
        patch=dict(
            desc_mode=args.desc_mode,
            exact_topk=args.exact_topk,
            block_ball_query=(
                False if args.exact_topk else not args.no_block_ball_query
            ),
            strat_ball_query=not args.no_strat,
        ),
        test=dict(pose_refine=True),
    )
    # architecture knobs travel with the checkpoint (desc_pool/desc_mode
    # change the param tree)
    if args.checkpoint_dir and os.path.isdir(args.checkpoint_dir):
        from bufferx_tpu.train.trainer import load_snapshot_config

        snap_over = load_snapshot_config(args.checkpoint_dir)
        if snap_over:
            cfg = cfg.override(patch=snap_over)
            log(f"snapshot config: {snap_over}")
    for ov in args.set:
        path, _, raw = ov.partition("=")
        sec, _, k = path.partition(".")
        for cast in (int, float):
            try:
                val = cast(raw)
                break
            except ValueError:
                continue
        else:
            val = {"true": True, "false": False}.get(raw.lower(), raw)
        cfg = cfg.override(**{sec: {k: val}})
        print(f"override: {sec}.{k} = {val!r}", file=sys.stderr)
    if args.no_clutter_filter:
        cfg = cfg.override(data=dict(clutter_filter=False))
    if args.quick:
        cfg = cfg.override(
            capacity=dict(max_points=4096, num_ransac_hypotheses=1024,
                          ransac_chunk=256, sphere_query_chunk=64),
            patch=dict(num_fps=384, num_points_radius_estimate=384,
                       num_points_per_patch=256),
        )
        args.num_points = min(args.num_points, 4096)
        args.pairs_per_cell = min(args.pairs_per_cell, args.batch)
    statics = PipelineStatics.from_config(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.checkpoint_dir and os.path.isdir(args.checkpoint_dir):
        from bufferx_tpu.train.trainer import compose_staged_params

        params = compose_staged_params(
            os.path.join(args.checkpoint_dir, "Desc", "best.msgpack"),
            os.path.join(args.checkpoint_dir, "Pose", "best.msgpack"),
            params,
        )
        log(f"checkpoint: {args.checkpoint_dir}")
    else:
        log("WARNING: untrained params (no --checkpoint-dir)")

    batched = jax.jit(jax.vmap(
        lambda s, t, a, k: register_pair_jit(params, statics, s, t, a, k)
    ))

    rte_th, rre_th = cfg.test.rte_thresh, cfg.test.rre_thresh
    cells = list(enumerate(build_cells(args.quick)))
    if args.cells:
        want = {int(c) for c in args.cells.split(",")}
        # keep ORIGINAL indices: cell seeds derive from them, so subset
        # runs score the exact same pairs as full runs
        cells = [(i, c) for i, c in cells if i in want]
    log(f"mode={args.desc_mode} exact_topk={args.exact_topk} "
        f"cells={len(cells)} pairs/cell={args.pairs_per_cell} "
        f"thresholds RTE<{rte_th} RRE<{rre_th}")

    out_f = open(args.out, "a") if args.out else None
    rows = []
    t_start = time.perf_counter()
    for run_i, (ci, cell) in enumerate(cells):
        rtes, rres = [], []
        key = jax.random.PRNGKey(args.seed + ci)
        n = args.pairs_per_cell
        b = args.batch
        for start in range(0, n, b):
            idx = [min(start + j, n - 1) for j in range(b)]
            srcs, tgts, gts = [], [], []
            for i in idx:
                rs = np.random.RandomState(args.seed * 1000 + ci * 101 + i)
                s, t, T = hard_pair(
                    rs,
                    family="eval",
                    num_points=args.num_points,
                    overlap_ratio=cell["overlap"],
                    noise=cell["noise_vox"] * args.voxel,
                    density_ratio=cell["density"],
                    outlier_frac=cell["clutter"],
                )
                srcs.append(prepare_cloud(s, cfg, seed=i))
                tgts.append(prepare_cloud(t, cfg, seed=i + 1))
                gts.append(T)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, b)
            res = batched(
                stack_clouds(srcs), stack_clouds(tgts),
                jnp.zeros((b,), bool), keys,
            )
            gt_b = jnp.asarray(np.stack(gts))
            rte = np.asarray(se3.compute_rte(res.pose, gt_b))
            rre = np.asarray(se3.compute_rre(res.pose, gt_b))
            real = min(b, n - start)
            rtes.extend(rte[:real].tolist())
            rres.extend(rre[:real].tolist())
        rtes, rres = np.asarray(rtes), np.asarray(rres)
        succ = (rtes < rte_th) & (rres < rre_th)
        # 95% Wilson score interval: the binomial noise on a recall from n
        # pairs (decision cells need n >= 200 for ±0.05 at p ~ 0.5 —
        # round-4 VERDICT weak #4)
        nn_ = len(rtes)
        p_ = float(succ.mean())
        z = 1.959964
        denom = 1.0 + z * z / nn_
        center = (p_ + z * z / (2 * nn_)) / denom
        half = z * np.sqrt(p_ * (1 - p_) / nn_ + z * z / (4 * nn_ * nn_)) / denom
        row = dict(
            cell, mode=args.desc_mode, exact_topk=args.exact_topk,
            n=nn_, recall=round(p_, 4),
            wilson_lo=round(max(center - half, 0.0), 4),
            wilson_hi=round(min(center + half, 1.0), 4),
            rte_med=round(float(np.median(rtes)), 4),
            rre_med=round(float(np.median(rres)), 3),
            rte_med_succ=(round(float(np.median(rtes[succ])), 4)
                          if succ.any() else None),
        )
        rows.append(row)
        line = json.dumps(row)
        print(line, flush=True)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()
        log(f"[{run_i + 1}/{len(cells)} cell {ci}] ov={cell['overlap']} "
            f"nz={cell['noise_vox']} dr={cell['density']} "
            f"cl={cell['clutter']}: recall {row['recall']:.2f} "
            f"rte_med {row['rte_med'] * 1000:.0f}mm rre {row['rre_med']:.2f}")

    mean_recall = float(np.mean([r["recall"] for r in rows]))
    summary = dict(metric="hard_synth_mean_recall", mode=args.desc_mode,
                   exact_topk=args.exact_topk,
                   value=round(mean_recall, 4),
                   elapsed_s=round(time.perf_counter() - t_start, 1))
    print(json.dumps(summary), flush=True)
    if out_f:
        out_f.write(json.dumps(summary) + "\n")
        out_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
