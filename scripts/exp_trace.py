"""Device-trace the batched serving program and print the op-level time
breakdown — the ground-truth answer to WHERE the in-context time goes
(round-5: the conv stacks cost ~3x their isolated time in context; this
names the ops responsible instead of inferring from phase fences).

Runs ONE traced batch after warmup, parses the XSpace proto with the
tensorboard profiler plugin, and prints the top ops by self time as JSON
lines plus a category rollup (convolution / fusion / copy-transpose /
all-else).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

# must precede ANY protobuf import (jax pulls it in): the bundled
# tf xplane_pb2 was generated with an older protoc and only loads under
# the pure-python implementation
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--checkpoint-dir", default="snapshot/hard_moments_r4ft2")
    ap.add_argument("--trace-dir", default="/tmp/r5_trace")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
    from bufferx_tpu.pipeline.registration import (
        PipelineStatics,
        _register_batch_jit,
        init_params,
        prepare_cloud,
        stack_clouds,
    )
    from bufferx_tpu.train.trainer import (
        compose_staged_params,
        load_snapshot_config,
    )

    cfg = make_cfg("ModelNet40").override(patch=dict(desc_mode="moments"))
    snap = load_snapshot_config(args.checkpoint_dir)
    if snap:
        cfg = cfg.override(patch=snap)
    statics = PipelineStatics.from_config(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if os.path.isdir(args.checkpoint_dir):
        params = compose_staged_params(
            os.path.join(args.checkpoint_dir, "Desc", "best.msgpack"),
            os.path.join(args.checkpoint_dir, "Pose", "best.msgpack"),
            params,
        )

    B = args.batch
    srcs, tgts = [], []
    for i in range(B):
        rs = np.random.RandomState(i)
        s, t, _ = synthetic_pair_full_overlap(rs, num_points=24000)
        srcs.append(prepare_cloud(s, cfg, seed=i))
        tgts.append(prepare_cloud(t, cfg, seed=i))
    sb, tb = stack_clouds(srcs), stack_clouds(tgts)
    aligned = jnp.zeros((B,), bool)
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    scales = tuple(range(statics.num_scales))

    def run():
        res = _register_batch_jit(params, statics, sb, tb, aligned, keys,
                                  scales)
        return float(jnp.sum(res.num_inliers))

    t0 = time.perf_counter()
    run()
    log(f"compiled in {time.perf_counter() - t0:.0f}s")
    for _ in range(2):
        run()

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        run()
    log(f"trace written to {args.trace_dir}")

    # ---- parse the XSpace: per-op self times off the device line ------
    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True
    ))
    if not paths:
        log("no xplane.pb found — raw trace left for manual inspection")
        return 1
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    def is_device_plane(name: str) -> bool:
        return ("TPU" in name or "/device:" in name
                or name.startswith("/host:CPU"))

    ops = {}
    total = 0.0
    for plane in xs.planes:
        if not is_device_plane(plane.name):
            continue
        stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/annotation lines
            if "xla op" not in lname and "ops" != lname:
                continue
            for ev in line.events:
                dur = ev.duration_ps / 1e9  # ms
                name = ev_meta.get(ev.metadata_id, "?")
                ops[name] = ops.get(name, 0.0) + dur
                total += dur
    if not ops:
        # fallback: use every line of the device planes
        for plane in xs.planes:
            if not is_device_plane(plane.name):
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    dur = ev.duration_ps / 1e9
                    name = ev_meta.get(ev.metadata_id, "?")
                    ops[name] = ops.get(name, 0.0) + dur
                    total += dur

    cats = {"convolution": 0.0, "fusion": 0.0, "copy/transpose": 0.0,
            "dot": 0.0, "other": 0.0}
    for name, ms in ops.items():
        n = name.lower()
        if "conv" in n:
            cats["convolution"] += ms
        elif n.startswith("fusion") or ".fusion" in n:
            cats["fusion"] += ms
        elif "copy" in n or "transpose" in n or "bitcast" in n:
            cats["copy/transpose"] += ms
        elif "dot" in n:
            cats["dot"] += ms
        else:
            cats["other"] += ms

    lines_out = []
    for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[: args.top]:
        rec = {"op": name[:120], "ms": round(ms, 3),
               "pct": round(100 * ms / max(total, 1e-9), 2)}
        print(json.dumps(rec), flush=True)
        lines_out.append(rec)
    summary = {"total_ms": round(total, 2),
               "categories": {k: round(v, 2) for k, v in cats.items()}}
    print(json.dumps(summary), flush=True)
    lines_out.append(summary)
    if args.out:
        with open(args.out, "w") as f:
            for rec in lines_out:
                f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
