"""Isolation benchmark: fused Pallas cylindrical conv stack vs the flax
XLA stack at the production serving shape (KC = B*S*2*num_fps patches).

Round-robin timing with scalar fences (see .claude/skills/verify/SKILL.md);
prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bks", default="8,16,32")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from bufferx_tpu.kernels.conv_pallas import cyl_conv_stack_fused
    from bufferx_tpu.models.layers import CylindricalConvNet

    import tests.test_conv_pallas as tp  # reuse fold helpers

    B, S, NF = args.batch, 3, 1500
    KC = B * S * 2 * NF
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(KC, 3, 7, 20, 16), jnp.float32)

    net, variables = tp._random_variables(jax.random.PRNGKey(0))
    w, b = tp._fold_from_variables(variables)

    # per-position MACs of the full 8-layer stack (CYL_LAYER_CHANNELS)
    macs_pos = 9 * sum(
        ci * co
        for ci, co in ((48, 64), (64, 64), (64, 128), (128, 128),
                       (128, 64), (64, 64), (64, 32), (32, 32))
    )
    flops = KC * 7 * 20 * macs_pos * 2

    variants = {
        "flax_xla": jax.jit(
            lambda v, xx: jnp.sum(net.apply(v, xx, train=False)[0])
        ),
    }
    for bk in [int(s) for s in args.bks.split(",") if s]:
        variants[f"pallas_bk{bk}"] = jax.jit(
            lambda xx, ww, bb, _bk=bk: jnp.sum(
                cyl_conv_stack_fused(xx, ww, bb, bk=_bk)
            ),
            static_argnames=(),
        )

    def call(name):
        if name == "flax_xla":
            return variants[name](variables, x)
        return variants[name](x, w, b)

    # compile all
    for name in list(variants):
        t0 = time.perf_counter()
        try:
            float(call(name))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "error": str(e)[:300]}))
            del variants[name]
            continue
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    results = {n: [] for n in variants}
    for _ in range(args.rounds):
        for name in variants:
            t0 = time.perf_counter()
            float(call(name))
            results[name].append((time.perf_counter() - t0) * 1e3)

    lines = []
    for name, ms in results.items():
        ms_min = min(ms)
        rec = {
            "name": name,
            "ms_min": round(ms_min, 2),
            "ms_med": round(sorted(ms)[len(ms) // 2], 2),
            "ms_per_pair": round(ms_min / B, 2),
            "tflops": round(flops / (ms_min * 1e-3) / 1e12, 1),
        }
        print(json.dumps(rec), flush=True)
        lines.append(rec)
    if args.out:
        with open(args.out, "w") as f:
            for rec in lines:
                f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
