#!/usr/bin/env python3
"""Speed-of-light accounting for the registration pipeline on one chip.

For each pipeline stage, computes an analytic lower bound from first
principles (FLOPs on the MXU at bf16 peak, or bytes over HBM at peak
bandwidth — whichever binds) and compares it with measured per-stage time
from the phase-fenced pipeline (``register_pair_timed``) plus a config-
ablation split. Emits the RESULTS.md roofline table and an MFU figure for
the serving mode.

v5e (v5 lite) peaks used: 394 TFLOP/s bf16, 197 TFLOP/s f32, 819 GB/s HBM.

    python scripts/roofline.py [--desc-mode moments] [--checkpoint-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_BF16 = 394e12
PEAK_F32 = 197e12
PEAK_HBM = 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def conv_stack_flops(k_patches, ele, azi, cin_stem):
    """CylindricalConvNet FLOPs for one call over k_patches."""
    pos = k_patches * ele * azi
    f = pos * 27 * cin_stem * 64 * 2                      # 3x3x3 stem (rad 3->1)
    for ci, co in ((64, 64), (64, 128), (128, 128), (128, 64), (64, 64),
                   (64, 32), (32, 32)):
        f += pos * 9 * ci * co * 2
    return f


def costvolume_flops(b, ke, azi):
    """CostNet 3D conv stack FLOPs for one call over b correspondences."""
    s_dims = (azi, ke, azi)                                # (S, Ke, L)
    specs = [(32, 32, (3, 3, 3)), (32, 64, (3, 3, 3)),
             (64, 64, (3, 1, 3)), (64, 128, (3, 1, 3)),
             (128, 128, (3, 1, 3)), (128, 64, (3, 1, 3)),
             (64, 64, (3, 1, 3)), (64, 32, (3, 1, 3)),
             (32, 32, (3, 1, 3))]
    f = 0
    d = list(s_dims)
    for ci, co, k in specs:
        d = [d[i] - k[i] + 1 for i in range(3)]
        if min(d) < 1:
            d = [max(x, 1) for x in d]
        f += b * int(np.prod(d)) * int(np.prod(k)) * ci * co * 2
    return f


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--desc-mode", choices=["sampled", "moments"],
                    default="moments")
    ap.add_argument("--checkpoint-dir", default="")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--num-points", type=int, default=24000)
    ap.add_argument("--batch", type=int, default=8,
                    help="serving batch for the MFU figure")
    ap.add_argument("--cpu", action="store_true")
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
        init_params,
        prepare_cloud,
        register_pair_jit,
        register_pair_timed,
        stack_clouds,
    )

    cfg = make_cfg("ModelNet40")
    if args.desc_mode == "moments":
        cfg = cfg.override(patch=dict(desc_mode="moments"))
    s = PipelineStatics.from_config(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.checkpoint_dir and os.path.isdir(args.checkpoint_dir):
        from bufferx_tpu.train.trainer import compose_staged_params

        params = compose_staged_params(
            os.path.join(args.checkpoint_dir, "Desc", "best.msgpack"),
            os.path.join(args.checkpoint_dir, "Pose", "best.msgpack"),
            params,
        )

    # ---------------- analytic lower bounds (per pair, all scales) -------
    K2 = 2 * s.num_fps                         # patches per embed call
    n_scales = s.num_scales
    bounds = {}

    # FPS: sequential argmax chain — latency-bound, not roofline; report
    # the distance-update traffic as the floor
    fps_bytes = 2 * s.num_probe * s.max_points * 4
    bounds["fps"] = dict(bound_ms=fps_bytes / PEAK_HBM * 1e3,
                         basis="HBM (sequential chain; latency-dominated)")

    # dense keypoint-to-cloud d2 matrices (written once, read per scale)
    d2_bytes = 2 * s.num_probe * s.max_points * 4 * (1 + n_scales)
    bounds["d2_matrix"] = dict(bound_ms=d2_bytes / PEAK_HBM * 1e3,
                               basis="HBM")

    # patch gather: [K2, P, 3] reads per scale
    gather_bytes = n_scales * K2 * s.patch_sample * 3 * 4 * 2
    bounds["patch_gather_lrf"] = dict(bound_ms=gather_bytes / PEAK_HBM * 1e3,
                                      basis="HBM")

    g = s.rad_n * s.ele_n * s.azi_n
    if s.desc_mode == "moments":
        # indicator @ moments matmul: [K2, G, P] x [P, 10]
        spt_flops = n_scales * K2 * g * s.patch_sample * 10 * 2
        spt_bytes = n_scales * K2 * g * s.patch_sample * 2  # bf16 indicator
        bounds["spt_pool"] = dict(
            bound_ms=max(spt_flops / PEAK_BF16, spt_bytes / PEAK_HBM) * 1e3,
            basis="max(MXU, HBM indicator)")
    else:
        spt_bytes = n_scales * K2 * g * s.voxel_sample * 3 * 4 * 2
        bounds["spt_sample"] = dict(bound_ms=spt_bytes / PEAK_HBM * 1e3,
                                    basis="HBM out-slots")

    conv_f = n_scales * conv_stack_flops(
        K2, s.ele_n, s.azi_n, 16 if s.desc_mode == "sampled" else 10
    )
    conv_act_bytes = n_scales * K2 * s.ele_n * s.azi_n * 2 * 2 * (64 * 5 + 128 * 2)
    bounds["desc_convnet"] = dict(
        bound_ms=max(conv_f / PEAK_BF16, conv_act_bytes / PEAK_HBM) * 1e3,
        basis=f"MXU bf16 ({conv_f / 1e9:.0f} GFLOP)")

    cost_f = n_scales * costvolume_flops(s.num_fps, s.ele_n - 2, s.azi_n)
    bounds["cost_volume"] = dict(
        bound_ms=cost_f / PEAK_BF16 * 1e3,
        basis=f"MXU bf16 ({cost_f / 1e9:.0f} GFLOP)")

    mm_f = n_scales * 2 * s.num_fps * s.num_fps * 32 * 2
    bounds["mutual_match"] = dict(bound_ms=mm_f / PEAK_BF16 * 1e3, basis="MXU")

    ransac_bytes = s.num_hypotheses * 3 * s.num_fps * 4  # score matrix traffic
    bounds["ransac"] = dict(bound_ms=ransac_bytes / PEAK_HBM * 1e3,
                            basis="HBM hypothesis scores")

    total_bound = sum(v["bound_ms"] for v in bounds.values())

    # ---------------- measurements --------------------------------------
    pairs = []
    for i in range(args.reps + 2):
        rs = np.random.RandomState(i)
        a, b, _ = synthetic_pair_full_overlap(rs, num_points=args.num_points)
        pairs.append((prepare_cloud(a, cfg, seed=2 * i),
                      prepare_cloud(b, cfg, seed=2 * i + 1)))
    aligned = jnp.asarray(False)
    key = jax.random.PRNGKey(0)

    # warm both programs
    key, k1 = jax.random.split(key)
    res, _ = register_pair_timed(params, s, pairs[0][0], pairs[0][1],
                                 aligned, k1)
    np.asarray(res.pose)
    phases = {"desc_time": [], "pose_time": [], "pose_optim_time": []}
    for i in range(2, args.reps + 2):
        key, k1 = jax.random.split(key)
        _, ph = register_pair_timed(params, s, pairs[i][0], pairs[i][1],
                                    aligned, k1)
        for k, v in ph.items():
            phases[k].append(v)
    meas = {k: float(np.median(v)) * 1e3 for k, v in phases.items()}

    # serving-mode MFU: batched full pipeline, useful-FLOP model =
    # conv + cost volume + spt matmuls (the MXU work)
    useful_flops = conv_f + cost_f + mm_f + (
        spt_flops if s.desc_mode == "moments" else 0
    )
    bsz = args.batch
    batched = jax.jit(jax.vmap(
        lambda a, b, al, k: register_pair_jit(params, s, a, b, al, k)
    ))
    sb = stack_clouds([p[0] for p in pairs[:bsz]])
    tb = stack_clouds([p[1] for p in pairs[:bsz]])
    keys = jax.random.split(jax.random.PRNGKey(1), bsz)
    al = jnp.zeros((bsz,), bool)
    r = batched(sb, tb, al, keys)
    np.asarray(r.pose)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = batched(sb, tb, al, keys)
        np.asarray(r.pose)
    dt = (time.perf_counter() - t0) / reps
    per_pair_ms = dt / bsz * 1e3
    mfu = useful_flops / (dt / bsz) / PEAK_BF16

    # ---------------- report --------------------------------------------
    print(f"\n## Roofline (one v5e chip, mode={s.desc_mode}, "
          f"{s.max_points} pts, {s.num_fps} kpts, {n_scales} scales)\n")
    print("| stage | lower bound (ms/pair) | basis |")
    print("|---|---|---|")
    for name, v in bounds.items():
        print(f"| {name} | {v['bound_ms']:.2f} | {v['basis']} |")
    print(f"| **total bound** | **{total_bound:.2f}** | |")
    print(f"\nmeasured phases (B=1, fenced): desc {meas['desc_time']:.1f} ms, "
          f"pose {meas['pose_time']:.1f} ms, "
          f"pose-optim {meas['pose_optim_time']:.1f} ms")
    print(f"batched serving (B={bsz}): {per_pair_ms:.1f} ms/pair "
          f"({1e3 / per_pair_ms:.1f} pairs/s), MXU-work MFU {mfu:.1%} "
          f"(useful {useful_flops / 1e9:.0f} GFLOP/pair)")
    print(json.dumps({
        "metric": "roofline", "mode": s.desc_mode,
        "total_bound_ms": round(total_bound, 2),
        "measured_batched_ms": round(per_pair_ms, 2),
        "mfu": round(mfu, 4),
        "gap_x": round(per_pair_ms / total_bound, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
