#!/usr/bin/env python3
"""Default-knob ablation on the serving benchmark (round-3 regression gate).

BENCH_r02 regressed 16.7 -> 11.3 pairs/s because two round-2 features
(`clutter_filter`, `block_ball_query`) shipped default-on without being
re-gated on the serving benchmark. This script measures the batched
serving path (B=8, scale-0 — the early-exit phase that produces the
headline number — plus the full 3-scale program) across knob combos so
defaults are chosen from measurements, not hope.

Usage: python scripts/exp_ablate_defaults.py [--combos all|quick]
Writes one JSON line per combo.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="tiny capacities (CPU smoke)")
    ap.add_argument("--skip-full", action="store_true",
                    help="measure only the scale-0 serving program")
    ap.add_argument("--use-split", action="store_true",
                    help="dispatch candidates/solve as two programs "
                         "(register_batch_split) instead of the fused one")
    ap.add_argument("--only", default="",
                    help="substring filter on combo names")
    ap.add_argument("--checkpoint-dir", default="snapshot/hard_moments_r4ft2")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.core import se3
    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
    from bufferx_tpu.pipeline.registration import (
        PipelineStatics,
        _register_batch_jit,
        init_params,
        prepare_cloud,
        register_batch_split,
        stack_clouds,
    )

    run_batch = register_batch_split if args.use_split else _register_batch_jit

    base = make_cfg("ModelNet40")
    if args.quick:
        base = base.override(
            capacity=dict(max_points=4096, num_ransac_hypotheses=1024,
                          ransac_chunk=256, sphere_query_chunk=64),
            patch=dict(num_fps=384, num_points_radius_estimate=384,
                       num_points_per_patch=192),
        )
    base = base.override(patch=dict(desc_mode="moments"))
    params = init_params(base, jax.random.PRNGKey(0))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(here, args.checkpoint_dir)
    if os.path.isdir(ckpt) and not args.quick:
        from bufferx_tpu.train.trainer import compose_staged_params

        params = compose_staged_params(
            os.path.join(ckpt, "Desc", "best.msgpack"),
            os.path.join(ckpt, "Pose", "best.msgpack"),
            params,
        )
        log(f"checkpoint: {ckpt}")

    B = args.batch
    n_pairs = args.pairs
    num_points = 4096 if args.quick else 24000
    pairs = []
    for i in range(n_pairs):
        rs = np.random.RandomState(i)
        s, t, T = synthetic_pair_full_overlap(rs, num_points=num_points)
        pairs.append((prepare_cloud(s, base, seed=i),
                      prepare_cloud(t, base, seed=i), T))
    batches = []
    for start in range(0, n_pairs, B):
        idx = [min(start + j, n_pairs - 1) for j in range(B)]
        batches.append((
            stack_clouds([pairs[i][0] for i in idx]),
            stack_clouds([pairs[i][1] for i in idx]),
            np.stack([pairs[i][2] for i in idx]),
        ))
    aligned = jnp.zeros((B,), bool)

    combos = [
        # (name, clutter_filter, block_ball_query, bq_block, bq_cand)
        ("r01-defaults: no-filter flat", False, False, 16, 128),
        ("r02-defaults: filter + blocks8x256", True, True, 8, 256),
        ("filter-only flat", True, False, 16, 128),
        ("blocks8x256 only", False, True, 8, 256),
        ("blocks16x128 only", False, True, 16, 128),
        ("blocks32x64 only", False, True, 32, 64),
        ("filter + blocks16x128", True, True, 16, 128),
        ("filter + blocks32x64", True, True, 32, 64),
        ("blocks64x32 only", False, True, 64, 32),
        ("filter + blocks64x32", True, True, 64, 32),
    ]

    if args.only:
        combos = [c for c in combos if args.only in c[0]]
    out_f = open(args.out, "a") if args.out else None
    for name, cf, bq, bqb, bqc in combos:
        cfg = base.override(
            data=dict(clutter_filter=cf),
            patch=dict(block_ball_query=bq, bq_block=bqb,
                       bq_cand_blocks=bqc),
        )
        statics = PipelineStatics.from_config(cfg)
        row = dict(name=name, clutter_filter=cf, block_ball_query=bq,
                   bq_block=bqb, bq_cand_blocks=bqc, split=args.use_split)
        for scales, tag in ([((0,), "scale0")] if args.skip_full
                            else [((0,), "scale0"),
                                  (tuple(range(statics.num_scales)), "full")]):
            key = jax.random.PRNGKey(7)
            keys = jax.random.split(key, B)
            t0 = time.perf_counter()
            res = run_batch(
                params, statics, batches[0][0], batches[0][1], aligned,
                keys, scales,
            )
            np.asarray(res.pose)
            compile_s = time.perf_counter() - t0
            # timed: reps sweeps over all batches, one device_get per batch
            t0 = time.perf_counter()
            rtes = []
            for _ in range(args.reps):
                res_h = None
                for sb, tb, gts in batches:
                    res = run_batch(
                        params, statics, sb, tb, aligned, keys, scales
                    )
                    res_h = jax.device_get(res)
                    rtes.append(np.asarray(se3.compute_rte(
                        jnp.asarray(res_h.pose), jnp.asarray(gts))))
            dt = time.perf_counter() - t0
            pps = args.reps * n_pairs / dt
            row[f"{tag}_pairs_per_s"] = round(pps, 3)
            row[f"{tag}_ms_per_pair"] = round(1000.0 / pps, 1)
            row[f"{tag}_compile_s"] = round(compile_s, 1)
            row[f"{tag}_rte_med"] = round(float(np.median(
                np.concatenate([r.ravel() for r in rtes]))), 4)
            log(f"{name:36s} {tag:6s} {pps:7.2f} pairs/s "
                f"({1000.0 / pps:6.1f} ms/pair) compile {compile_s:.0f}s")
        line = json.dumps(row)
        print(line, flush=True)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()
    if out_f:
        out_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
