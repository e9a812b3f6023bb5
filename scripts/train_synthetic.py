"""Train Desc + Pose stages on procedural synthetic pairs.

Demonstrates the full two-stage training path end-to-end without external
datasets and produces a checkpoint that measurably improves partial-overlap
registration over untrained weights. Batches are pre-generated on host and
kept device-resident (the axon tunnel makes per-step host->device transfers
expensive); steps index into the resident pool.

Usage: python scripts/train_synthetic.py [--steps N] [--out DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--pose-steps", type=int, default=600)
    ap.add_argument("--pool", type=int, default=96, help="resident batches")
    ap.add_argument("--out", default="snapshot/synthetic")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--num-points", type=int, default=4000)
    ap.add_argument("--desc-mode", default="sampled",
                    choices=["sampled", "moments"])
    ap.add_argument("--hard", action="store_true",
                    help="hetero-robust stream: hard_training_stream "
                         "(randomized overlap/noise/density/clutter on the "
                         "TRAIN scene family; the eval family stays held "
                         "out for scripts/exp_hard.py)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.data.training import synthetic_training_stream
    from bufferx_tpu.pipeline.registration import init_params
    from bufferx_tpu.train.trainer import (
        make_optimizer,
        make_train_step,
        save_params,
    )

    cfg = make_cfg("ModelNet40").override(
        capacity=dict(max_points=4096, sphere_query_chunk=128),
        patch=dict(num_points_per_patch=256, desc_mode=args.desc_mode),
        train=dict(pos_num=256),
    )
    params = init_params(cfg, jax.random.PRNGKey(0))

    print(f"generating {args.pool} resident batches...", flush=True)
    t0 = time.time()
    if args.hard:
        from bufferx_tpu.data.hardsynth import hard_training_stream

        pool = list(
            hard_training_stream(
                cfg, args.pool, seed=7, num_points=args.num_points
            )
        )
    else:
        pool = list(
            synthetic_training_stream(
                cfg, args.pool, seed=7, num_points=args.num_points,
                overlap=0.8,
            )
        )
    batch_pool = jax.tree.map(lambda *x: jnp.stack(x), *pool)
    jax.block_until_ready(batch_pool)
    print(f"pool ready in {time.time() - t0:.0f}s", flush=True)

    def run_stage(stage, variables, frozen, steps):
        opt = make_optimizer(cfg, stage, steps_per_epoch=max(steps // 4, 1))
        step_fn = make_train_step(cfg, stage, opt)
        opt_state = opt.init(variables["params"])
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        loss_hist = []
        for i in range(steps):
            key, sub = jax.random.split(key)
            batch = jax.tree.map(lambda x: x[i % args.pool], batch_pool)
            if stage == "Desc":
                variables, opt_state, m = step_fn(
                    variables, opt_state, batch, sub
                )
            else:
                variables, opt_state, m = step_fn(
                    variables, opt_state, frozen, batch, sub
                )
            if i % 50 == 0 or i == steps - 1:
                md = {k: float(v) for k, v in m.items()}
                loss_hist.append(md["loss"])
                print(
                    f"[{stage} {i:5d}] "
                    + " ".join(f"{k}:{v:.4f}" for k, v in sorted(md.items()))
                    + f" ({(time.time() - t0):.0f}s)",
                    flush=True,
                )
        return variables

    desc_vars = run_stage("Desc", params["desc"], None, args.steps)
    save_params(os.path.join(args.out, "Desc", "best.msgpack"), desc_vars)
    pose_vars = run_stage("Pose", params["pose"], desc_vars, args.pose_steps)
    save_params(os.path.join(args.out, "Pose", "best.msgpack"), pose_vars)
    print("saved to", args.out, flush=True)


if __name__ == "__main__":
    main()
