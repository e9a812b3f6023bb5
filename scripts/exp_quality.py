"""Experiment: partial-overlap registration quality of a checkpoint.

Replicates the round's quality gate (overlap 0.75, independent shuffles,
reduced keypoint budget so the partial-overlap regime actually stresses the
descriptors) for any (checkpoint, desc_mode) combination.

Usage: python scripts/exp_quality.py [--ckpt snapshot/synthetic]
           [--desc-mode sampled] [--pairs 12] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="snapshot/synthetic")
    ap.add_argument("--desc-mode", default="sampled",
                    choices=["sampled", "moments"])
    ap.add_argument("--pairs", type=int, default=12)
    ap.add_argument("--overlap", type=float, default=0.75)
    ap.add_argument("--num-points", type=int, default=12000)
    ap.add_argument("--untrained", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.core import se3
    from bufferx_tpu.data.modelnet import synthetic_pair
    from bufferx_tpu.pipeline.registration import (
        init_params,
        prepare_cloud,
        register_pair,
    )
    from bufferx_tpu.train.trainer import compose_staged_params

    cfg = make_cfg("ModelNet40").override(
        patch=dict(num_fps=768, desc_mode=args.desc_mode),
        capacity=dict(max_points=16384),
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    if not args.untrained:
        params = compose_staged_params(
            os.path.join(args.ckpt, "Desc", "best.msgpack"),
            os.path.join(args.ckpt, "Pose", "best.msgpack"), params)
        print(f"checkpoint: {args.ckpt} (desc_mode={args.desc_mode})")
    else:
        print(f"untrained (desc_mode={args.desc_mode})")

    rtes, rres, ok = [], [], 0
    t0 = time.time()
    for i in range(args.pairs):
        rs = np.random.RandomState(100 + i)
        src, tgt, T_gt = synthetic_pair(
            rs, num_points=args.num_points, overlap=args.overlap)
        out = register_pair(
            cfg,
            prepare_cloud(src, cfg, seed=2 * i),      # independent shuffles
            prepare_cloud(tgt, cfg, seed=2 * i + 1),
            jax.random.PRNGKey(i),
            params=params,
        )
        rte = float(se3.compute_rte(out.pose, jnp.asarray(T_gt)))
        rre = float(se3.compute_rre(out.pose, jnp.asarray(T_gt)))
        good = rte < cfg.test.rte_thresh and rre < cfg.test.rre_thresh
        ok += int(good)
        rtes.append(rte)
        rres.append(rre)
        print(f"pair {i:2d}: RTE {rte * 1000:7.1f} mm  RRE {rre:6.2f} deg  "
              f"inl {int(out.num_inliers):4d} cons {int(out.num_consensus):4d}"
              f"  {'ok' if good else 'FAIL'}", flush=True)
    print(f"recall {ok}/{args.pairs}  median RTE {np.median(rtes)*1000:.1f} mm"
          f"  median RRE {np.median(rres):.2f} deg  ({time.time()-t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
