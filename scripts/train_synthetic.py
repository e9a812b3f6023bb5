"""Train Desc + Pose stages on procedural synthetic pairs.

Demonstrates the full two-stage training path end-to-end without external
datasets and produces a checkpoint that measurably improves partial-overlap
registration over untrained weights. Batches are pre-generated on host and
kept device-resident (the axon tunnel makes per-step host->device transfers
expensive); steps index into the resident pool.

``--curriculum`` (round 3) trains the Desc stage through phases of
progressively harder pair distributions (overlap down to 0.1, density
mismatch up to 10:1, clutter up to 20% — the 3DLoMatch-style axes the
round-2 gate exposed as the weak cells), regenerating the resident pool
between phases. Training scalars stream to ``<out>/scalars.jsonl``.

Usage: python scripts/train_synthetic.py [--steps N] [--out DIR] [--cpu]
       [--hard] [--curriculum] [--desc-mode moments]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Desc-stage curriculum phases (fractions of --steps; knobs are
# hard_training_stream arguments). The last phase sits AT the gate's hard
# operating point (overlap 0.1-0.6 spans the 3DLoMatch 10-30% regime).
CURRICULUM = [
    dict(frac=0.12, overlap_range=(0.5, 0.9), noise_range=(0.0, 0.5),
         density_choices=(1.0, 1.0, 2.0), clutter_choices=(0.0, 0.0)),
    dict(frac=0.18, overlap_range=(0.35, 0.8), noise_range=(0.0, 0.8),
         density_choices=(1.0, 1.0, 2.0, 4.0),
         clutter_choices=(0.0, 0.0, 0.05)),
    dict(frac=0.25, overlap_range=(0.2, 0.7), noise_range=(0.0, 1.0),
         density_choices=(1.0, 1.0, 2.0, 4.0, 8.0),
         clutter_choices=(0.0, 0.0, 0.05, 0.1)),
    dict(frac=0.25, overlap_range=(0.1, 0.6), noise_range=(0.0, 1.2),
         density_choices=(1.0, 2.0, 4.0, 8.0, 10.0),
         clutter_choices=(0.0, 0.05, 0.1, 0.2)),
    # round-4 low-overlap tail: the gate's open frontier is the
    # 0.1-0.3-overlap band (3DLoMatch's operating point), so the final
    # fifth of the schedule centers there. Density/clutter pressure STAYS
    # at the phase-3 level: the first tail variant dropped density to <=4
    # and the fine-tuned gate lost the 10:1 cells wholesale
    # (GATE_r04_ft.jsonl: 0.5@10:1 0.28 -> 0.14) while buying only +0.06
    # at 0.3-overlap — ending on a narrower distribution forgets the
    # wider one.
    dict(frac=0.2, overlap_range=(0.1, 0.4), noise_range=(0.0, 1.0),
         density_choices=(1.0, 2.0, 4.0, 8.0, 10.0),
         clutter_choices=(0.0, 0.05, 0.1, 0.2)),
]


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
    ap.add_argument("--desc-pool", default="gated",
                    choices=["gated", "softmax"],
                    help="attention pooling head (softmax = round-4 "
                         "non-dying redesign)")
    ap.add_argument("--desc-width", type=float, default=1.0,
                    help="conv-backbone channel multiplier (capacity "
                         "experiment; recorded in the snapshot config)")
    ap.add_argument("--hard", action="store_true",
                    help="hetero-robust stream: hard_training_stream "
                         "(randomized overlap/noise/density/clutter on the "
                         "TRAIN scene family; the eval family stays held "
                         "out for scripts/exp_hard.py)")
    ap.add_argument("--curriculum", action="store_true",
                    help="phase the Desc stage through progressively harder "
                         "distributions (implies --hard)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--init-from", default="",
                    help="snapshot dir to initialize BOTH stages from "
                         "(fine-tuning continuation)")
    ap.add_argument("--lr-scale", type=float, default=1.0,
                    help="scale both stage learning rates (fine-tune runs)")
    ap.add_argument("--phases", default="",
                    help="JSON list of Desc phases "
                         "[{\"steps\": N, ...hard_training_stream knobs}] — "
                         "overrides --curriculum's schedule (targeted "
                         "fine-tune tails at specific gate cells); implies "
                         "--hard. Pose keeps the mid-hard distribution.")
    args = ap.parse_args()
    if args.curriculum or args.phases:
        args.hard = True

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
        patch=dict(num_points_per_patch=256, desc_mode=args.desc_mode,
                   desc_pool=args.desc_pool, desc_width=args.desc_width),
        train=dict(pos_num=256),
    )
    if args.lr_scale != 1.0:
        cfg = cfg.override(optim=dict(
            lr_desc=cfg.optim.lr_desc * args.lr_scale,
            lr_pose=cfg.optim.lr_pose * args.lr_scale,
        ))
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.init_from:
        from bufferx_tpu.train.trainer import load_params

        params = {
            "desc": load_params(
                os.path.join(args.init_from, "Desc", "best.msgpack"),
                params["desc"]),
            "pose": load_params(
                os.path.join(args.init_from, "Pose", "best.msgpack"),
                params["pose"]),
        }
        import jax as _jax
        params = _jax.device_put(params)
        print(f"initialized from {args.init_from}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    from bufferx_tpu.train.trainer import save_snapshot_config

    save_snapshot_config(args.out, cfg)
    scalars_f = open(os.path.join(args.out, "scalars.jsonl"), "a")

    def emit(stage, step, metrics, elapsed):
        rec = dict(stage=stage, step=step, elapsed_s=round(elapsed, 1),
                   **{k: round(float(v), 5) for k, v in metrics.items()})
        scalars_f.write(json.dumps(rec) + "\n")
        scalars_f.flush()

    def make_pool(n, seed, knobs=None):
        t0 = time.time()
        if args.hard:
            from bufferx_tpu.data.hardsynth import hard_training_stream

            batches = list(
                hard_training_stream(
                    cfg, n, seed=seed, num_points=args.num_points,
                    host_arrays=True, **(knobs or {}),
                )
            )
        else:
            batches = list(
                synthetic_training_stream(
                    cfg, n, seed=seed, num_points=args.num_points,
                    overlap=0.8, host_arrays=True,
                )
            )
        # stack on HOST, ship once: per-batch device_puts over the axon
        # tunnel are RTT-bound (a 256-batch pool took >19 min that way)
        import numpy as _np

        pool = jax.tree.map(lambda *x: _np.stack(x), *batches)
        pool = jax.device_put(pool)
        jax.block_until_ready(pool)
        print(f"pool({n}, seed={seed}) ready in {time.time() - t0:.0f}s",
              flush=True)
        return pool

    def run_stage(stage, variables, frozen, steps, phases):
        """phases: list of (num_steps, pool_knobs-or-None)."""
        from bufferx_tpu.train.guard import CollapseGuard

        opt = make_optimizer(cfg, stage, steps_per_epoch=max(steps // 4, 1))
        step_fn = make_train_step(cfg, stage, opt)
        opt_state = opt.init(variables["params"])
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        gstep = 0
        # collapse rescue (round-3 postmortem: a fine-tune pass re-entered
        # the contrastive saddle and destroyed the checkpoint): snapshot
        # the last healthy state; on sustained saddle, restore it and
        # stop. detect_crash=False: the curriculum's phase transitions
        # legitimately drop desc_acc below any fixed floor.
        guard = (
            CollapseGuard(detect_crash=False) if stage == "Desc" else None
        )
        init_fallback = jax.device_get(variables)
        for pi, (n_steps, knobs) in enumerate(phases):
            batch_pool = make_pool(args.pool, args.seed + 1009 * pi, knobs)
            if knobs:
                print(f"[{stage}] phase {pi}: {n_steps} steps, "
                      f"overlap={knobs.get('overlap_range')}", flush=True)
            for i in range(n_steps):
                key, sub = jax.random.split(key)
                batch = jax.tree.map(
                    lambda x: x[gstep % args.pool], batch_pool
                )
                if stage == "Desc":
                    variables, opt_state, m = step_fn(
                        variables, opt_state, batch, sub
                    )
                else:
                    variables, opt_state, m = step_fn(
                        variables, opt_state, frozen, batch, sub
                    )
                if gstep % 50 == 0 or gstep == steps - 1:
                    md = {k: float(v) for k, v in m.items()}
                    emit(stage, gstep, md, time.time() - t0)
                    print(
                        f"[{stage} {gstep:6d}] "
                        + " ".join(
                            f"{k}:{v:.4f}" for k, v in sorted(md.items())
                        )
                        + f" ({(time.time() - t0):.0f}s)",
                        flush=True,
                    )
                    if guard is not None and guard.update(
                        gstep, md, variables
                    ):
                        print(
                            f"[{stage}] COLLAPSE at step {gstep} "
                            f"(saddle/non-finite streak); restoring last "
                            f"good state from step {guard.last_good_step}",
                            flush=True,
                        )
                        return guard.restore(jax.device_put(init_fallback))
                gstep += 1
            del batch_pool
        return variables

    if args.phases:
        spec = json.loads(args.phases)
        desc_phases = []
        for p in spec:
            knobs = {k: (tuple(v) if isinstance(v, list) else v)
                     for k, v in p.items() if k != "steps"}
            desc_phases.append((int(p["steps"]), knobs))
        args.steps = sum(n for n, _ in desc_phases)
        pose_knobs = {
            k: v for k, v in CURRICULUM[2].items() if k != "frac"
        }
        pose_phases = [(args.pose_steps, pose_knobs)]
    elif args.curriculum:
        desc_phases = [
            (max(int(args.steps * p["frac"]), 1),
             {k: v for k, v in p.items() if k != "frac"})
            for p in CURRICULUM
        ]
        # Pose stage trains at the mid-hard distribution (it learns the
        # SO(2) matcher on descriptors that are already frozen)
        pose_knobs = {
            k: v for k, v in CURRICULUM[2].items() if k != "frac"
        }
        pose_phases = [(args.pose_steps, pose_knobs)]
    else:
        desc_phases = [(args.steps, None)]
        pose_phases = [(args.pose_steps, None)]

    desc_vars = run_stage("Desc", params["desc"], None, args.steps,
                          desc_phases)
    save_params(os.path.join(args.out, "Desc", "best.msgpack"), desc_vars)
    pose_vars = run_stage("Pose", params["pose"], desc_vars,
                          args.pose_steps, pose_phases)
    save_params(os.path.join(args.out, "Pose", "best.msgpack"), pose_vars)
    scalars_f.close()
    print("saved to", args.out, flush=True)


if __name__ == "__main__":
    main()
