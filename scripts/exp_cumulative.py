#!/usr/bin/env python3
"""Cumulative-prefix profiling of the batched registration program.

Round-3 found that timing stages as SEPARATE programs under-reports the
fused program (stage programs see friendlier input layouts), so the stage
split could not explain where the B=8 full-pipeline time goes. This script
measures stage costs IN FUSED CONTEXT instead: it compiles a family of
programs, each running the pipeline from the start up to stage k (with a
scalar fence derived from every live intermediate so XLA cannot DCE the
prefix), and reports consecutive differences under the interleaved
round-robin protocol (the only reliable ranking over the axon tunnel —
see .claude/skills/verify/SKILL.md).

Usage: python scripts/exp_cumulative.py [--batch 8] [--rounds 4]


ROUND-5 CAVEAT: phase-fenced attribution charges XLA's cross-phase
layout/fusion ops to whichever phase contains them — round 4's "conv
stacks cost 41 ms/pair in context" was actually ~8 ms of convolutions
plus ~30 ms of gather/relayout fusions (fixed by patch.mxu_gather).
Prefer scripts/exp_trace.py (device trace, per-op) for attribution;
use this script only for coarse phase deltas.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


STAGES = [
    "precompute",        # FPS + d2 matrices + density radii
    "patches0",          # scale-0 patch selection (both clouds)
    "lrf0",              # scale-0 LRF alignment
    "spt0",              # scale-0 SPT / moment pooling + features
    "desc0",             # scale-0 descriptor conv net
    "match0",            # scale-0 mutual matching
    "pose_head0",        # scale-0 SO(2) cost volume + candidates
    "scales12",          # scales 1-2 candidates (everything again, twice)
    "solve",             # consensus + pool + solver + refinement
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
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
    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
    from bufferx_tpu.geometry.lrf import align_patches
    from bufferx_tpu.geometry.patches import select_patches
    from bufferx_tpu.kernels.neighbors import mutual_nearest
    from bufferx_tpu.pipeline.registration import (
        Cloud,
        PipelineStatics,
        _cat_candidates,
        _Candidates,
        _models_from_statics,
        _pool_and_solve,
        _precompute,
        _scale_candidates,
        _spt_features,
        init_params,
        prepare_cloud,
        stack_clouds,
    )
    from bufferx_tpu.solver.so2 import so2_pose_candidates

    cfg = make_cfg("ModelNet40").override(
        patch=dict(desc_mode="moments", block_ball_query=False)
    )
    statics = PipelineStatics.from_config(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(here, args.checkpoint_dir)
    if os.path.isdir(ckpt):
        from bufferx_tpu.train.trainer import compose_staged_params

        params = compose_staged_params(
            os.path.join(ckpt, "Desc", "best.msgpack"),
            os.path.join(ckpt, "Pose", "best.msgpack"), params,
        )

    def fsum(x):
        return jnp.sum(x.astype(jnp.float32))

    def upto(params, src, tgt, key, last: int):
        """Pipeline prefix through STAGES[last]; returns a scalar fence."""
        desc_model, pose_model = _models_from_statics(statics)
        keys = jax.random.split(key, 10)
        fence = jnp.float32(0.0)

        pre = _precompute(statics, src, tgt, keys[1], (0, 1, 2))
        fence += fsum(pre.radii) + fsum(pre.src_kpts)
        if pre.src_patches is not None:
            fence += fsum(pre.src_patches) + fsum(pre.tgt_patches)
        if last == 0:
            return fence

        def embed_stages(scale: int, key, stop: int):
            """Scale-``scale`` candidate chain, cut at ``stop``."""
            f = jnp.float32(0.0)
            des_r = jnp.maximum(pre.radii[scale], 1e-3)
            nf = statics.num_fps
            if pre.src_patches is not None:
                sp, sm = pre.src_patches[scale], pre.src_pvalid[scale]
                tp, tm = pre.tgt_patches[scale], pre.tgt_pvalid[scale]
            else:
                ks1, ks2 = jax.random.split(key)
                sp, sm = select_patches(
                    src.xyz, pre.src_mask, pre.src_kpts, des_r, ks1,
                    statics.patch_sample, use_approx=not statics.exact_topk,
                    d2=pre.d2_src[:nf], use_strat=statics.strat_ball_query,
                )
                tp, tm = select_patches(
                    tgt.xyz, pre.tgt_mask, pre.tgt_kpts, des_r, ks2,
                    statics.patch_sample, use_approx=not statics.exact_topk,
                    d2=pre.d2_tgt[:nf], use_strat=statics.strat_ball_query,
                )
            patches = jnp.concatenate([sp, tp])
            pmask = jnp.concatenate([sm, tm])
            if stop == 1:
                return f + fsum(patches) + fsum(pmask), None
            kpts = jnp.concatenate([pre.src_kpts, pre.tgt_kpts])
            delta = patches - kpts[:, None, :]
            aligned, _ax, R = align_patches(
                delta, kpts, jnp.asarray(False)
            )
            if stop == 2:
                return f + fsum(aligned) + fsum(R), None
            normed = aligned / des_r
            inv = _spt_features(normed, pmask, statics)
            if stop == 3:
                return f + fsum(inv), None
            out = desc_model.apply(params["desc"], inv, train=False)
            desc2, equi2 = out["desc"], out["equi"]
            if stop == 4:
                return f + fsum(desc2) + fsum(equi2), None
            s_desc, t_desc = desc2[:nf], desc2[nf:]
            nn, mutual, nn_d2 = mutual_nearest(
                s_desc, t_desc, pre.src_kpts_v, pre.tgt_kpts_v
            )
            if stop == 5:
                return f + fsum(nn) + fsum(mutual) + fsum(equi2), None
            e = statics.ele_n
            s_equi, t_equi = equi2[:nf], equi2[nf:]
            tt_kpts = pre.tgt_kpts[nn]
            ind = pose_model.apply(
                params["pose"],
                s_equi[:, :, 1 : e - 1], t_equi[nn][:, :, 1 : e - 1],
                train=False,
            )
            R_c, t_c = so2_pose_candidates(
                pre.src_kpts, tt_kpts, R[:nf], R[nf:][nn], ind, statics.azi_n
            )
            cand = _Candidates(
                ss=pre.src_kpts, tt=tt_kpts, Rc=R_c, tc=t_c, valid=mutual,
                d2=nn_d2,
            )
            return f + fsum(R_c) + fsum(t_c) + fsum(nn_d2), cand

        f0, cand0 = embed_stages(0, keys[4], min(last, 6))
        fence += f0
        if last <= 6:
            return fence
        cands = [cand0]
        for j, scale in enumerate((1, 2)):
            fj, cj = embed_stages(scale, keys[5 + j], 6)
            fence += fj
            cands.append(cj)
        if last == 7:
            return fence
        res = _pool_and_solve(
            statics, _cat_candidates(cands), keys[0], src, tgt, 3
        )
        return fence + fsum(res.pose) + fsum(res.num_inliers)

    B = args.batch
    pairs = []
    for i in range(B):
        rs = np.random.RandomState(i)
        s, t, _T = synthetic_pair_full_overlap(rs, num_points=24000)
        pairs.append((prepare_cloud(s, cfg, seed=i),
                      prepare_cloud(t, cfg, seed=i)))
    sb = stack_clouds([p[0] for p in pairs])
    tb = stack_clouds([p[1] for p in pairs])
    keys = jax.random.split(jax.random.PRNGKey(3), B)

    progs = []
    for k in range(len(STAGES)):
        fn = jax.jit(
            jax.vmap(
                lambda s, t, key, k=k: upto(
                    params, Cloud(*s), Cloud(*t), key, k
                )
            )
        )
        t0 = time.perf_counter()
        out = fn(tuple(sb), tuple(tb), keys)
        np.asarray(out)
        log(f"compiled upto {STAGES[k]}: {time.perf_counter() - t0:.0f}s")
        progs.append(fn)

    times = np.zeros((args.rounds, len(STAGES)))
    for r in range(args.rounds):
        for k, fn in enumerate(progs):
            t0 = time.perf_counter()
            out = fn(tuple(sb), tuple(tb), keys)
            np.asarray(out)
            times[r, k] = (time.perf_counter() - t0) / B * 1000
        log(f"round {r}: " + " ".join(
            f"{STAGES[k]}={times[r, k]:.1f}" for k in range(len(STAGES))))

    mins = times.min(axis=0)
    rows = []
    prev = 0.0
    for k, name in enumerate(STAGES):
        row = dict(stage=name, cum_ms_per_pair=round(float(mins[k]), 1),
                   marginal_ms_per_pair=round(float(mins[k] - prev), 1))
        prev = float(mins[k])
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
