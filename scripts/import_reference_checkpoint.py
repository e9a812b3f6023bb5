#!/usr/bin/env python3
"""Import a reference BUFFER-X checkpoint into bufferx_tpu snapshots.

    python scripts/import_reference_checkpoint.py \
        --src snapshot_ref/threedmatch --out snapshot/threedmatch

``--src`` must hold the reference layout ``{Desc,Pose}/best.pth`` (what
``/root/reference/scripts/download_pretrained_models.py`` fetches); the
output is this framework's ``{Desc,Pose}/best.msgpack`` staged snapshot,
loadable by ``compose_staged_params`` and every eval/bench entry point.

Reference weights encode the SAMPLED descriptor mode (the reference's
point-MLP SPT semantics); the importer refuses the moments mode. After a
successful import, run the layerwise parity suite to validate the mapping
numerically: ``pytest tests/test_import.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True,
                    help="reference snapshot dir holding {Desc,Pose}/best.pth")
    ap.add_argument("--out", required=True,
                    help="output snapshot dir for {Desc,Pose}/best.msgpack")
    ap.add_argument("--dataset", default="3DMatch",
                    help="config preset used to shape-check the import")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.pipeline.registration import init_params
    from bufferx_tpu.tools.torch_import import import_reference_snapshot

    cfg = make_cfg(args.dataset)
    if cfg.patch.desc_mode != "sampled":
        print("reference weights require desc_mode='sampled'", file=sys.stderr)
        return 1
    template = init_params(cfg, jax.random.PRNGKey(0))
    import_reference_snapshot(args.src, args.out, template)
    n = sum(
        x.size for x in jax.tree.leaves(template)
    )
    print(f"imported {args.src} -> {args.out} "
          f"({n:,} params shape-checked against {args.dataset})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
