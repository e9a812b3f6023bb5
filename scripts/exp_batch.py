"""Experiment: batched serving throughput vs batch size (TPU)."""

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
    import jax.numpy as jnp

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.core import se3
    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
    from bufferx_tpu.pipeline.registration import (
        init_params,
        prepare_cloud,
        register_pairs_batched,
    )
    from bufferx_tpu.train.trainer import compose_staged_params

    mode = os.environ.get("BX_DESC_MODE", "moments")
    cfg = make_cfg("ModelNet40").override(
        match=dict(enable_early_exit=True),
        patch=dict(desc_mode=mode),
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    snap = "synthetic_moments" if mode == "moments" else "synthetic"
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "snapshot", snap)
    params = compose_staged_params(
        os.path.join(ckpt, "Desc", "best.msgpack"),
        os.path.join(ckpt, "Pose", "best.msgpack"), params)

    n = 16
    pairs = []
    for i in range(n):
        rs = np.random.RandomState(i)
        s, t, T = synthetic_pair_full_overlap(rs, num_points=24000)
        pairs.append((prepare_cloud(s, cfg, seed=i),
                      prepare_cloud(t, cfg, seed=i), T))
    srcs = [p[0] for p in pairs]
    tgts = [p[1] for p in pairs]

    for bsz in [int(x) for x in sys.argv[1:]] or [4, 8]:
        key = jax.random.PRNGKey(0)
        _ = register_pairs_batched(cfg, srcs[:bsz], tgts[:bsz],
                                   jax.random.PRNGKey(9), params, False,
                                   batch_size=bsz)
        t0 = time.perf_counter()
        res = register_pairs_batched(cfg, srcs, tgts, key, params, False,
                                     batch_size=bsz)
        dt = time.perf_counter() - t0
        rtes = [float(se3.compute_rte(r.pose, jnp.asarray(pairs[i][2])))
                for i, r in enumerate(res)]
        print(f"B={bsz:3d}: {n} pairs in {dt:.2f}s -> {n / dt:.2f} pairs/s "
              f"(median RTE {np.median(rtes) * 1000:.1f} mm)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
