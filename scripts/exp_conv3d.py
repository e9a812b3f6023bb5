#!/usr/bin/env python3
"""Probe: do the pipeline's 3D convolutions lower poorly on TPU?

Three suspicious patterns, each timed against a mathematically identical
2D reformulation at production shapes (B=8, 3 scales vmapped):

1. desc stem: [K, 3, 9, 22, 16] conv (3,3,3) VALID -> depth collapses to
   1. Fold: depth into channels, conv (3,3) with 48 input channels.
2. costnet layer 2: [B, S, 3, L, C] conv (3,3,3) -> Ke collapses.
   Fold: Ke into channels, conv (3,3) over (S, L).
3. costnet tail: [B, S, 1, L, C] conv (3,1,3) with singleton middle.
   Fold: squeeze, conv (3,3).

All in bf16 with f32 accumulation, scalar-fenced, round-robin.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    K = 72000           # 8 pairs x 3 scales x 3000 patches
    BH = 36000          # 8 pairs x 3 scales x 1500 correspondences
    dn3 = ("NDHWC", "DHWIO", "NDHWC")
    dn2 = ("NHWC", "HWIO", "NHWC")
    bf = jnp.bfloat16

    cases = {}

    # --- 1. desc stem ----------------------------------------------------
    x1 = jnp.asarray(rng.randn(K, 3, 9, 22, 16), bf)
    w1 = jnp.asarray(rng.randn(3, 3, 3, 16, 64) * 0.05, bf)

    def stem3d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID", dimension_numbers=dn3,
            preferred_element_type=jnp.float32)

    def stem2d(x, w):
        # fold depth into channels: x [K,3,9,22,16] -> [K,9,22,48]
        xf = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(K, 9, 22, 48)
        wf = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 48, 64)
        return jax.lax.conv_general_dilated(
            xf, wf, (1, 1), "VALID", dimension_numbers=dn2,
            preferred_element_type=jnp.float32)

    cases["stem3d"] = (stem3d, (x1, w1))
    cases["stem2d_folded"] = (stem2d, (x1, w1))

    # --- 2. costnet layer 2 ---------------------------------------------
    x2 = jnp.asarray(rng.randn(BH, 18, 3, 18, 32), bf)
    w2 = jnp.asarray(rng.randn(3, 3, 3, 32, 64) * 0.05, bf)

    def cost3d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID", dimension_numbers=dn3,
            preferred_element_type=jnp.float32)

    def cost2d(x, w):
        xf = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(BH, 18, 18, 96)
        wf = jnp.transpose(w, (0, 2, 1, 3, 4)).reshape(3, 3, 96, 64)
        return jax.lax.conv_general_dilated(
            xf, wf, (1, 1), "VALID", dimension_numbers=dn2,
            preferred_element_type=jnp.float32)

    cases["cost3d"] = (cost3d, (x2, w2))
    cases["cost2d_folded"] = (cost2d, (x2, w2))

    # --- 3. costnet tail (3,1,3) on singleton middle ---------------------
    x3 = jnp.asarray(rng.randn(BH, 14, 1, 14, 128), bf)
    w3 = jnp.asarray(rng.randn(3, 1, 3, 128, 128) * 0.05, bf)

    def tail3d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID", dimension_numbers=dn3,
            preferred_element_type=jnp.float32)

    def tail2d(x, w):
        xf = x.reshape(BH, 14, 14, 128)
        wf = w.reshape(3, 3, 128, 128)
        return jax.lax.conv_general_dilated(
            xf, wf, (1, 1), "VALID", dimension_numbers=dn2,
            preferred_element_type=jnp.float32)

    cases["tail3d"] = (tail3d, (x3, w3))
    cases["tail2d_squeezed"] = (tail2d, (x3, w3))

    def scalarize(fn):
        return jax.jit(
            lambda *a: jnp.sum(fn(*a).astype(jnp.float32))
        )

    compiled = {}
    for name, (fn, a) in cases.items():
        run = scalarize(fn)
        t0 = time.perf_counter()
        v = float(np.asarray(run(*a)))
        log(f"compiled {name}: {time.perf_counter() - t0:.1f}s (sum {v:.3e})")
        compiled[name] = (run, a)

    # equivalence spot checks
    for a, b in (("stem3d", "stem2d_folded"), ("cost3d", "cost2d_folded"),
                 ("tail3d", "tail2d_squeezed")):
        va = float(np.asarray(compiled[a][0](*compiled[a][1])))
        vb = float(np.asarray(compiled[b][0](*compiled[b][1])))
        log(f"equiv {a} vs {b}: {va:.6e} vs {vb:.6e}")

    times = {n: [] for n in compiled}
    for r in range(args.rounds):
        for n, (run, a) in compiled.items():
            t0 = time.perf_counter()
            np.asarray(run(*a))
            times[n].append(time.perf_counter() - t0)
        log(f"round {r}: " + " ".join(
            f"{n}={times[n][-1] * 1e3:.0f}ms" for n in compiled))

    for n in compiled:
        print(json.dumps({
            "name": n, "ms_min": round(min(times[n]) * 1e3, 2),
            "ms_med": round(float(np.median(times[n])) * 1e3, 2)}),
            flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
