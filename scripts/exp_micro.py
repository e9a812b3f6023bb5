#!/usr/bin/env python3
"""Standalone component microbenchmarks with achieved-FLOP/bandwidth rates.

The cumulative-prefix profile (``scripts/exp_cumulative.py``) reports what
each stage costs IN CONTEXT; this script measures the same components in
ISOLATION at identical shapes and computes their achieved fraction of the
chip's analytic ceiling (v5e: 394 TFLOP/s bf16, 819 GB/s HBM). The pair of
numbers separates two very different optimization targets:

- component slow in isolation  -> the kernel/formulation itself is the
  problem (reformulate: shift-matmul conv, Pallas, better layout);
- component fast in isolation but slow in context -> the surrounding
  program is the problem (layout boundaries, fusion breaks, scheduling).

Round-robin protocol per .claude/skills/verify/SKILL.md (sequential timing
over the axon tunnel is bimodal).

Usage: python scripts/exp_micro.py [--batch 8] [--rounds 5] [--cpu]
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
PEAK_HBM = 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8, help="pairs per batch")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.geometry.moments import moments_to_features
    from bufferx_tpu.models.heads import CostVolume
    from bufferx_tpu.models.spinnet import MiniSpinNet

    cfg = make_cfg("ModelNet40").override(patch=dict(desc_mode="moments"))
    p = cfg.patch
    B = args.batch
    K2 = 2 * p.num_fps                 # patches per embed call (src+tgt)
    S = p.num_scales
    G = p.rad_n * p.ele_n * p.azi_n
    P = p.num_points_per_patch
    N = cfg.capacity.max_points
    rng = np.random.RandomState(0)

    # the production vmapped program embeds B*S*K2 patches per conv call
    KC = B * S * K2
    log(f"shapes: B={B} scales={S} K2={K2} -> conv batch {KC}, "
        f"G={G}, P={P}, N={N}")

    cases = {}

    # ---- descriptor conv stack (moments mode input [K, G, 10]) ----------
    desc = MiniSpinNet(rad_n=p.rad_n, ele_n=p.ele_n, azi_n=p.azi_n,
                       compute_dtype=jnp.bfloat16, mode="moments",
                       pool="softmax")
    inv = jnp.asarray(rng.randn(KC, 10, G), jnp.float32)  # moments-major
    dvars = desc.init(jax.random.PRNGKey(0), inv[:2], train=False)
    desc_fn = jax.jit(lambda v, x: desc.apply(v, x, train=False))

    pos = KC * p.ele_n * p.azi_n
    fl = pos * 27 * 10 * 64 * 2
    for ci, co in ((64, 64), (64, 128), (128, 128), (128, 64), (64, 64),
                   (64, 32), (32, 32)):
        fl += pos * 9 * ci * co * 2
    fl += KC * G * 10 * 16 * 2          # moments 1x1 stem
    cases["desc_convnet"] = dict(
        fn=lambda v, x: desc.apply(v, x, train=False)["desc"],
        args=(dvars, inv),
        flops=fl, bytes=pos * 2 * (10 + 64 * 5 + 128 * 2 + 32 * 3))

    # ---- SO(2) cost-volume head ----------------------------------------
    KH = B * S * p.num_fps
    pose = CostVolume(azi_n=p.azi_n, compute_dtype=jnp.bfloat16)
    e1 = jnp.asarray(rng.randn(KH, 32, p.ele_n - 2, p.azi_n), jnp.float32)
    e2 = jnp.asarray(rng.randn(KH, 32, p.ele_n - 2, p.azi_n), jnp.float32)
    pvars = pose.init(jax.random.PRNGKey(1), e1[:2], e2[:2], train=False)
    pose_fn = jax.jit(lambda v, a, b: pose.apply(v, a, b, train=False))

    def costvolume_flops(b, ke, azi):
        d = [azi, ke, azi]
        f = 0
        specs = [(32, 32, (3, 3, 3)), (32, 64, (3, 3, 3)),
                 (64, 64, (3, 1, 3)), (64, 128, (3, 1, 3)),
                 (128, 128, (3, 1, 3)), (128, 64, (3, 1, 3)),
                 (64, 64, (3, 1, 3)), (64, 32, (3, 1, 3)),
                 (32, 32, (3, 1, 3))]
        for ci, co, k in specs:
            d = [max(d[i] - k[i] + 1, 1) for i in range(3)]
            f += b * int(np.prod(d)) * int(np.prod(k)) * ci * co * 2
        return f

    cases["cost_volume"] = dict(
        fn=lambda v, a, b: pose.apply(v, a, b, train=False),
        args=(pvars, e1, e2),
        flops=costvolume_flops(KH, p.ele_n - 2, p.azi_n), bytes=0)

    # ---- SPT moments pooling (per-call shape: [B*K2, P]) ----------------
    # production calls it S times (vmapped) on [K2, P, 3] per pair; here one
    # call at the full batched shape
    KM = B * S * K2
    patches = jnp.asarray(rng.randn(KM, P, 3) * 0.3, jnp.float32)
    pmask = jnp.ones((KM, P), bool)

    from bufferx_tpu.geometry.moments import pool_cell_moments

    cases["spt_moments"] = dict(
        fn=lambda pa, ma: pool_cell_moments(
            pa, ma, rad_n=p.rad_n, ele_n=p.ele_n, azi_n=p.azi_n,
            delta=p.delta, chunk=cfg.capacity.sphere_query_chunk,
            moments_major=True),
        args=(patches, pmask),
        flops=KM * G * P * (10 + 2) * 2,   # distance field + ok@psi matmuls
        bytes=KM * 8 * P * 4)

    # ---- moments -> features (derotation) ------------------------------
    raw = jnp.abs(jnp.asarray(rng.randn(KM, 10, G), jnp.float32))
    from bufferx_tpu.geometry.moments import moments_to_features_mm

    cases["moments_to_features"] = dict(
        fn=lambda r: moments_to_features_mm(
            r, rad_n=p.rad_n, ele_n=p.ele_n,
            azi_n=p.azi_n, delta=p.delta),
        args=(raw,),
        flops=KM * G * (9 + 27) * 2, bytes=KM * G * 10 * 4 * 2)

    # ---- FPS (per cloud; batched 2B clouds as in _precompute) -----------
    from bufferx_tpu.kernels.fps import fps as fps_fn

    clouds = jnp.asarray(rng.randn(2 * B, N, 3), jnp.float32)
    masks = jnp.ones((2 * B, N), bool)
    nprobe = max(p.num_points_radius_estimate, p.num_fps)
    cases["fps"] = dict(
        fn=jax.vmap(lambda x, m: fps_fn(x, m, nprobe)[0]),
        args=(clouds, masks),
        flops=0, bytes=2 * B * nprobe * N * 4)

    # ---- d2 matrix build ------------------------------------------------
    from bufferx_tpu.kernels.neighbors import masked_sqdist

    probes = jnp.asarray(rng.randn(2 * B, nprobe, 3), jnp.float32)
    pv = jnp.ones((2 * B, nprobe), bool)
    d2_jit = jax.jit(jax.vmap(masked_sqdist))
    cases["d2_matrix"] = dict(
        fn=jax.vmap(masked_sqdist),
        args=(probes, clouds, pv, masks),
        flops=2 * B * nprobe * N * 3 * 2,
        bytes=2 * B * nprobe * N * 4)

    # ---- stratified ball query (per scale: 2B clouds) -------------------
    from bufferx_tpu.kernels.neighbors import ball_query_stratified

    d2m = d2_jit(probes, clouds, pv, masks)[:, : p.num_fps]
    qkeys = jax.random.split(jax.random.PRNGKey(5), 2 * B)

    cases["strat_query_x1"] = dict(
        fn=jax.vmap(
            lambda x, m, c, d2, k: ball_query_stratified(
                x, m, c, jnp.float32(0.3), k, P, d2
            )
        ),
        args=(clouds, masks, probes[:, : p.num_fps], d2m, qkeys),
        flops=0, bytes=2 * B * p.num_fps * N * 4)

    # ---- run: compile all, then interleaved rounds ----------------------
    # Fence protocol: every case is wrapped in ONE jitted program whose
    # output is a f32 SCALAR (sum over all result leaves) — fetching a
    # slice of a large device array would ship megabytes through the axon
    # tunnel and time the TRANSFER, not the compute (the first version of
    # this script measured spt_moments at 400 ms/pair that way; the
    # compute is ~3 ms/pair).
    import jax as _jax

    def scalarize(fn):
        def run(*a):
            out = fn(*a)
            return sum(
                jnp.sum(l.astype(jnp.float32))
                for l in _jax.tree_util.tree_leaves(out)
            )
        return _jax.jit(run)

    compiled = {}
    for name, c in cases.items():
        run = scalarize(c["fn"])
        t0 = time.perf_counter()
        np.asarray(run(*c["args"]))
        log(f"compiled {name}: {time.perf_counter() - t0:.1f}s")
        compiled[name] = dict(c, run=run)

    times = {name: [] for name in compiled}
    for r in range(args.rounds):
        for name, c in compiled.items():
            t0 = time.perf_counter()
            np.asarray(c["run"](*c["args"]))
            times[name].append(time.perf_counter() - t0)
        log(f"round {r}: " + " ".join(
            f"{n}={times[n][-1] * 1e3:.0f}ms" for n in compiled))

    rows = []
    for name, c in compiled.items():
        best = min(times[name])
        med = float(np.median(times[name]))
        row = dict(
            name=name,
            ms_min=round(best * 1e3, 2),
            ms_med=round(med * 1e3, 2),
            ms_per_pair=round(best * 1e3 / B, 2),
            tflops=round(c["flops"] / best / 1e12, 1) if c["flops"] else None,
            mxu_frac=round(c["flops"] / best / PEAK_BF16, 3)
            if c["flops"] else None,
            gbps=round(c["bytes"] / best / 1e9, 0) if c["bytes"] else None,
            hbm_frac=round(c["bytes"] / best / PEAK_HBM, 3)
            if c["bytes"] else None,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
