"""Experiment: does running the B=1 sections before the batched section
change the batched throughput within one process? (bench.py measured ~11
pairs/s for the identical batched call that scripts/exp_batch.py measures
at ~16.5.)"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # noqa: F401

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
    from bufferx_tpu.pipeline.registration import (
        PipelineStatics,
        init_params,
        prepare_cloud,
        register_pair_jit,
        register_pairs_batched,
    )
    from bufferx_tpu.train.trainer import compose_staged_params

    cfg = make_cfg("ModelNet40").override(patch=dict(desc_mode="moments"))
    cfg_ee = cfg.override(match=dict(enable_early_exit=True))
    statics = PipelineStatics.from_config(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(here, "snapshot", "synthetic_moments")
    params = compose_staged_params(
        os.path.join(ckpt, "Desc", "best.msgpack"),
        os.path.join(ckpt, "Pose", "best.msgpack"), params)

    pairs = []
    for i in range(18):
        rs = np.random.RandomState(i)
        s, t, T = synthetic_pair_full_overlap(rs, num_points=24000)
        pairs.append((prepare_cloud(s, cfg, seed=i),
                      prepare_cloud(t, cfg, seed=i), T))
    srcs = [p[0] for p in pairs]
    tgts = [p[1] for p in pairs]
    bsz = 8

    def timed_batched(label):
        key = jax.random.PRNGKey(0)
        _ = register_pairs_batched(cfg_ee, srcs[:bsz], tgts[:bsz],
                                   jax.random.PRNGKey(9), params, False,
                                   batch_size=bsz)
        t0 = time.perf_counter()
        _ = register_pairs_batched(cfg_ee, srcs[2:], tgts[2:], key, params,
                                   False, batch_size=bsz)
        dt = time.perf_counter() - t0
        print(f"batched {label}: 16 pairs in {dt:.2f}s -> "
              f"{16 / dt:.2f} pairs/s", flush=True)

    from bufferx_tpu.core import se3

    timed_batched("BEFORE B=1 sections")

    # B=1 full-pipeline section, replicating bench.py exactly: 18 calls
    # (2 warmup + 16 timed) with per-pair compute_rte fetches
    key = jax.random.PRNGKey(0)
    aligned = jnp.asarray(False)
    for i in range(2):
        key, sub = jax.random.split(key)
        res = register_pair_jit(params, statics, pairs[i][0], pairs[i][1],
                                aligned, sub)
        jax.block_until_ready(res)
    for i in range(2, 18):
        key, sub = jax.random.split(key)
        res = register_pair_jit(params, statics, pairs[i][0], pairs[i][1],
                                aligned, sub)
        _ = float(se3.compute_rte(res.pose, jnp.asarray(pairs[i][2])))

    timed_batched("AFTER bench-exact 18x B=1 full")
    timed_batched("AFTER (repeat)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
