#!/usr/bin/env python3
"""Head-to-head serving-knob comparison with interleaved rounds.

Sequential per-combo measurement over the axon tunnel is bimodal (~±50%:
the tunnel/queue state drifts between slow and fast regimes — the same
effect scripts/exp_order.py documented for program interleaving), so
exp_ablate_defaults.py's one-window-per-combo protocol cannot rank combos
reliably. This script compiles every candidate ONCE, then measures them
ROUND-ROBIN — each round times each combo on the same batches — and
reports the per-combo MIN and MEDIAN across rounds. Slow-regime rounds hit
every combo equally; the min estimates the clean-device time.

Usage: python scripts/exp_headtohead.py [--rounds 6]
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
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--full-scales", action="store_true",
                    help="measure the full multi-scale program instead of "
                         "scale-0")
    ap.add_argument("--checkpoint-dir", default="snapshot/hard_moments_r4ft2")
    ap.add_argument("--out", default="")
    ap.add_argument("--chunks", action="store_true",
                    help="sweep capacity.sphere_query_chunk instead of the "
                         "ball-query/filter combos")
    ap.add_argument("--geom", action="store_true",
                    help="sweep block-ball-query geometries (block x "
                         "cand_blocks) against the flat path")
    ap.add_argument("--r5", action="store_true",
                    help="round-5 sweep: scale-batched conv calls vs the "
                         "r4-shipped per-scale calls")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
    from bufferx_tpu.pipeline.registration import (
        PipelineStatics,
        _register_batch_jit,
        init_params,
        prepare_cloud,
        register_batch_split,
        stack_clouds,
    )

    base = make_cfg("ModelNet40").override(patch=dict(desc_mode="moments"))
    if args.quick:
        base = base.override(
            capacity=dict(max_points=4096, num_ransac_hypotheses=1024,
                          ransac_chunk=256, sphere_query_chunk=64),
            patch=dict(num_fps=384, num_points_radius_estimate=384,
                       num_points_per_patch=256),
        )
    params = init_params(base, jax.random.PRNGKey(0))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(here, args.checkpoint_dir)
    if os.path.isdir(ckpt) and not args.quick:
        from bufferx_tpu.train.trainer import compose_staged_params

        params = compose_staged_params(
            os.path.join(ckpt, "Desc", "best.msgpack"),
            os.path.join(ckpt, "Pose", "best.msgpack"), params,
        )
        log(f"checkpoint: {ckpt}")

    B, n_pairs = args.batch, args.pairs
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
        ))
    aligned = jnp.zeros((B,), bool)
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    # candidates: (name, cfg-overrides, split?)
    if args.r5:
        shipped = dict(cf=False, bq=False, b=32, c=64, st=True, vm=False)
        combos = [
            ("shipped-ransac", dict(**shipped), False),
            ("shipped-gnc", dict(**shipped, solver="gnc"), False),
            ("mxu-gather", dict(**shipped, mxg=True), False),
            ("mxu-gather+gnc", dict(**shipped, mxg=True, solver="gnc"),
             False),
        ]
    elif args.geom:
        # Round-4 sweep: the round-3 "blocks32x64" rows were a fallback
        # artifact (30000 % 32 != 0 silently ran the flat path) — this is
        # the first honest block-vs-flat ranking at production shapes.
        # Gather cost scales with cand_blocks (rows/center); bigger blocks
        # with fewer candidate rows cut both the gather and the level-1
        # top_k width, at coarser capture granularity.
        combos = [
            ("flat", dict(cf=False, bq=False, b=32, c=64), False),
            ("stratified", dict(cf=False, bq=False, b=32, c=64, st=True),
             False),
            ("strat+unrolled-scales",
             dict(cf=False, bq=False, b=32, c=64, st=True, vm=False),
             False),
            ("strat+unrolled+poolsub2",
             dict(cf=False, bq=False, b=32, c=64, st=True, vm=False,
                  sub=2), False),
        ]
    elif args.chunks:
        combos = [
            (f"chunk{sc}", dict(cf=True, bq=True, b=32, c=64, chunk=sc),
             False)
            for sc in (128, 256, 512, 1024)
        ]
    else:
        combos = [
            ("flat", dict(cf=False, bq=False, b=32, c=64), False),
            ("filter+flat", dict(cf=True, bq=False, b=32, c=64), False),
            ("blocks32x64", dict(cf=False, bq=True, b=32, c=64), False),
            ("filter+blocks32x64", dict(cf=True, bq=True, b=32, c=64),
             False),
            ("filter+blocks32x64 SPLIT", dict(cf=True, bq=True, b=32, c=64),
             True),
            ("filter+flat SPLIT", dict(cf=True, bq=False, b=32, c=64), True),
        ]

    prepared = []
    for name, o, split in combos:
        cfg = base.override(
            data=dict(clutter_filter=o["cf"]),
            patch=dict(block_ball_query=o["bq"], bq_block=o["b"],
                       bq_cand_blocks=o["c"],
                       strat_ball_query=o.get("st", False),
                       vmap_scales=o.get("vm", True),
                       spt_pool_subsample=o.get("sub", 1),
                       scale_batch_conv=o.get("sbc", False),
                       mxu_gather=o.get("mxg", False)),
        )
        if "chunk" in o:
            cfg = cfg.override(capacity=dict(sphere_query_chunk=o["chunk"]))
        if "solver" in o:
            cfg = cfg.override(match=dict(pose_estimator=o["solver"]))
        statics = PipelineStatics.from_config(cfg)
        scales = (tuple(range(statics.num_scales)) if args.full_scales
                  else (0,))
        fn = register_batch_split if split else _register_batch_jit
        t0 = time.perf_counter()
        res = fn(params, statics, batches[0][0], batches[0][1], aligned,
                 keys, scales)
        np.asarray(res.pose)
        log(f"compiled {name}: {time.perf_counter() - t0:.0f}s")
        prepared.append((name, statics, fn, scales))

    times = {name: [] for name, *_ in combos}
    for r in range(args.rounds):
        for name, statics, fn, scales in prepared:
            t0 = time.perf_counter()
            for sb, tb in batches:
                res = fn(params, statics, sb, tb, aligned, keys, scales)
                jax.device_get(res.pose)
            dt = (time.perf_counter() - t0) / n_pairs * 1000
            times[name].append(dt)
        log(f"round {r}: " + "  ".join(
            f"{n}={times[n][-1]:.1f}" for n in times))

    rows = []
    for name in times:
        ts = np.asarray(times[name])
        row = dict(name=name,
                   full_scales=bool(args.full_scales),
                   ms_per_pair_min=round(float(ts.min()), 1),
                   ms_per_pair_med=round(float(np.median(ts)), 1),
                   pairs_per_s_at_min=round(1000.0 / float(ts.min()), 2),
                   rounds=args.rounds)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
