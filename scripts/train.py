"""Two-stage training CLI — the reference ``train.py`` equivalent.

    python scripts/train.py --dataset 3DMatch --root ../datasets/ThreeDMatch
    python scripts/train.py --dataset KITTI --root ../datasets/kitti \
        --stages Desc Pose --epochs 50

Each stage trains with the other stage's best checkpoint frozen
(``/root/reference/train.py:36-48``); snapshots land in
``snapshot/<dataset>/<experiment>/<stage>/``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="3DMatch",
                    choices=["3DMatch", "KITTI", "Synthetic"])
    ap.add_argument("--root", default="")
    ap.add_argument("--experiment-id", default="bufferx_tpu")
    ap.add_argument("--stages", nargs="+", default=["Desc", "Pose"])
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--steps-per-epoch", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pretrain", default="",
                    help="snapshot dir to warm start from")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.data.training import (
        build_training_batch,
        synthetic_training_stream,
    )
    from bufferx_tpu.pipeline.registration import init_params
    from bufferx_tpu.train.trainer import Trainer, load_params

    name = "ModelNet40" if args.dataset == "Synthetic" else args.dataset
    cfg = make_cfg(name, args.root)
    params = init_params(cfg, jax.random.PRNGKey(0))
    snap_dir = os.path.join("snapshot", args.dataset, args.experiment_id)

    if args.pretrain:
        for stage in ("Desc", "Pose"):
            p = os.path.join(args.pretrain, stage, "best.msgpack")
            if os.path.exists(p):
                key = stage.lower() if stage.lower() in params else stage
                params["desc" if stage == "Desc" else "pose"] = load_params(
                    p, params["desc" if stage == "Desc" else "pose"]
                )
                print(f"warm start {stage} from {p}")

    if args.dataset == "Synthetic":
        def train_batches():
            return synthetic_training_stream(
                cfg, args.steps_per_epoch, seed=1, num_points=4000
            )

        def val_batches():
            return synthetic_training_stream(
                cfg, max(args.steps_per_epoch // 10, 2), seed=999,
                num_points=4000,
            )
    else:
        from bufferx_tpu.data.datasets import get_dataset

        ds_train = get_dataset(cfg, "train")
        ds_val = get_dataset(cfg, "val")
        rs = np.random.RandomState(cfg.data.manual_seed)

        def _stream(ds, n):
            def gen():
                key = jax.random.PRNGKey(rs.randint(1 << 31))
                order = rs.permutation(len(ds))[:n]
                for idx in order:
                    s = ds[int(idx)]
                    nonlocal key
                    key, sub = jax.random.split(key)
                    yield build_training_batch(
                        cfg, s["src_points"], s["tgt_points"],
                        s["relt_pose"], rs, sub,
                    )
            return gen

        train_batches = _stream(ds_train, args.steps_per_epoch)
        val_batches = _stream(ds_val, max(args.steps_per_epoch // 10, 2))

    variables = {"Desc": params["desc"], "Pose": params["pose"]}
    for stage in args.stages:
        frozen = variables["Desc"] if stage == "Pose" else None
        trainer = Trainer(
            cfg.with_stage(stage), stage, variables[stage], frozen,
            train_batches, val_batches,
            steps_per_epoch=args.steps_per_epoch,
            snapshot_dir=snap_dir,
        )
        variables[stage] = trainer.train(args.epochs)
    print("done; snapshots in", snap_dir)


if __name__ == "__main__":
    main()
