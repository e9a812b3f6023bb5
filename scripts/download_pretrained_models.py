#!/usr/bin/env python3
"""Download pretrained BUFFER-X TPU snapshots.

Functional counterpart of the reference's downloader
(``/root/reference/scripts/download_pretrained_models.py``): fetches the
staged checkpoints into ``snapshot/{threedmatch,kitti}/{Desc,Pose}/
best.msgpack`` (this framework's flax-serialized format) from a Hugging
Face model repo. The repo id comes from ``--repo-id`` or the
``BUFFERX_TPU_HF_MODEL_REPO`` environment variable.

Offline environments: the in-repo ``snapshot/synthetic`` checkpoint (trained
on procedural pairs) is always available and is what ``bench.py`` and the
smoke paths use; this script is only needed for the real-data checkpoints.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

EXPECTED = [
    "snapshot/threedmatch/Desc/best.msgpack",
    "snapshot/threedmatch/Pose/best.msgpack",
    "snapshot/kitti/Desc/best.msgpack",
    "snapshot/kitti/Pose/best.msgpack",
]


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--repo-id",
        default=os.environ.get("BUFFERX_TPU_HF_MODEL_REPO", ""),
        help="Hugging Face model repo id, e.g. <org>/BUFFER-X-TPU.",
    )
    p.add_argument("--revision", default=None,
                   help="Optional branch / tag / commit.")
    p.add_argument("--output-dir", default=str(Path(__file__).resolve().parents[1]),
                   help="Repo root to place snapshot/ under.")
    return p.parse_args()


def main() -> int:
    args = parse_args()
    if not args.repo_id:
        print("No --repo-id / BUFFERX_TPU_HF_MODEL_REPO set.\n"
              "The in-repo snapshot/synthetic checkpoint is available "
              "without any download.", file=sys.stderr)
        return 1
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print("huggingface_hub is not installed; "
              "pip install huggingface_hub", file=sys.stderr)
        return 1

    out = Path(args.output_dir)
    snapshot_download(
        repo_id=args.repo_id,
        revision=args.revision,
        repo_type="model",
        local_dir=out,
        allow_patterns=["snapshot/**"],
    )
    missing = [f for f in EXPECTED if not (out / f).exists()]
    if missing:
        print("downloaded, but missing expected files:", file=sys.stderr)
        for f in missing:
            print(f"  {f}", file=sys.stderr)
        return 1
    print(f"snapshots ready under {out / 'snapshot'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
