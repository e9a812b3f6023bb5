#!/usr/bin/env python3
"""Scaling-efficiency benchmark: pair-sharded evaluation over a device mesh.

Measures scan-pairs/s at mesh sizes 1, 2, 4, ... N and reports scaling
efficiency (throughput_N / (N * throughput_1)) — the BASELINE.md target is
>= 80% on a real multi-host slice.

Modes:
- real devices (TPU slice): run as-is; with multiple hosts, launch one
  process per host with the usual JAX distributed env (or pass
  --distributed to call ``jax.distributed.initialize()``).
- virtual mesh (functional validation on CPU):
  ``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
  python scripts/bench_scaling.py --pairs-per-device 2 --small``
  (virtual CPU devices share one socket, so the printed efficiency is not
  a hardware measurement there — use it to validate the sharded program.)

Prints one JSON line per mesh size plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _spawn_multiprocess(args) -> int:
    """Parent of --multiprocess-cpu: spawn 2 workers, relay rank 0."""
    import os
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    cmd = [sys.executable, os.path.abspath(__file__),
           "--multiprocess-cpu", "--small",
           "--pairs-per-device", str(args.pairs_per_device)]
    procs = [
        subprocess.Popen(
            cmd + ["--mp-worker", f"{port}:{i}"],
            stdout=subprocess.PIPE if i else None,
            stderr=subprocess.STDOUT if i else None,
            env=env,
        )
        for i in range(2)
    ]
    rc = [p.wait() for p in procs]
    if any(rc):
        log(f"worker exit codes: {rc}")
        return 1
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pairs-per-device", type=int, default=4)
    p.add_argument("--points", type=int, default=24000)
    p.add_argument("--small", action="store_true",
                   help="small capacities (CPU/virtual-mesh validation)")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() first")
    p.add_argument("--multiprocess-cpu", action="store_true",
                   help="spawn 2 local processes (4 virtual CPU devices "
                        "each) and run the pair-sharded eval across one "
                        "8-device multi-controller mesh — functional "
                        "validation of the REAL jax.distributed path "
                        "without a slice")
    p.add_argument("--mp-worker", default=None, help=argparse.SUPPRESS)
    p.add_argument("--checkpoint-dir", default="snapshot/synthetic")
    args = p.parse_args()

    if args.multiprocess_cpu and args.mp_worker is None:
        return _spawn_multiprocess(args)

    import os

    if args.mp_worker is not None:
        port, pid = args.mp_worker.split(":")
        os.environ["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=4 "
            + os.environ.get("XLA_FLAGS", "")
        )

    import jax

    if args.mp_worker is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=2, process_id=int(pid),
        )
        log(f"worker {pid}: {jax.process_count()} processes, "
            f"{jax.device_count()} global devices")
        args.small = True
    elif args.distributed:
        jax.distributed.initialize()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
    from bufferx_tpu.parallel.mesh import make_mesh
    from bufferx_tpu.parallel.sharded import make_sharded_eval
    from bufferx_tpu.pipeline.registration import (
        PipelineStatics, init_params, prepare_cloud, stack_clouds,
    )

    cfg = make_cfg("ModelNet40")
    if args.small:
        cfg = cfg.override(
            capacity=dict(max_points=2048, num_ransac_hypotheses=512,
                          ransac_chunk=256, sphere_query_chunk=64),
            patch=dict(num_fps=256, num_points_radius_estimate=256,
                       num_points_per_patch=128, num_scales=1,
                       search_radius_thresholds=(5.0,)),
        )
        args.points = min(args.points, 2048)
    statics = PipelineStatics.from_config(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    import os

    if os.path.isdir(args.checkpoint_dir) and not args.small:
        from bufferx_tpu.train.trainer import compose_staged_params

        params = compose_staged_params(
            os.path.join(args.checkpoint_dir, "Desc", "best.msgpack"),
            os.path.join(args.checkpoint_dir, "Pose", "best.msgpack"),
            params,
        )

    n_dev = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    if args.mp_worker is not None:
        sizes = [n_dev]  # one global mesh spanning both processes
    log(f"devices: {n_dev} x {jax.devices()[0].platform}; mesh sizes {sizes}")

    from jax.sharding import NamedSharding, PartitionSpec as P

    base = None
    results = []
    for n in sizes:
        mesh = make_mesh(n)
        eval_fn = make_sharded_eval(params, statics, mesh)
        b = n * args.pairs_per_device
        srcs, tgts = [], []
        for i in range(b):
            rs = np.random.RandomState(i)
            s, t, _ = synthetic_pair_full_overlap(rs, num_points=args.points)
            srcs.append(prepare_cloud(s, cfg, seed=i))
            tgts.append(prepare_cloud(t, cfg, seed=i))
        sb, tb = stack_clouds(srcs), stack_clouds(tgts)
        aligned = jnp.zeros((b,), bool)
        keys = jax.random.split(jax.random.PRNGKey(0), b)
        if args.mp_worker is not None:
            # multi-controller: commit inputs as GLOBAL sharded arrays
            shard = NamedSharding(mesh, P("dp"))
            sb, tb, aligned, keys = jax.device_put(
                (sb, tb, aligned, keys), shard
            )
            fence = jax.jit(
                lambda r: jnp.sum(r.num_inliers),
                out_shardings=NamedSharding(mesh, P()),
            )
        else:
            fence = lambda r: np.asarray(r.num_inliers).sum()  # noqa: E731

        res = eval_fn(sb, tb, aligned, keys)       # compile + warm
        float(fence(res))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            res = eval_fn(sb, tb, aligned, keys)
            float(fence(res))
        dt = (time.perf_counter() - t0) / reps
        pps = b / dt
        if base is None:
            base = pps
        eff = pps / (base * n)
        results.append({"mesh": n, "pairs_per_s": round(pps, 3),
                        "scaling_efficiency": round(eff, 3)})
        log(f"mesh={n}: {b} pairs in {dt:.2f}s -> {pps:.2f} pairs/s, "
            f"efficiency {eff:.2%}")
        print(json.dumps(results[-1]))

    print(json.dumps({"metric": "scaling_efficiency",
                      "value": results[-1]["scaling_efficiency"],
                      "unit": "ratio", "sizes": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
