#!/usr/bin/env python3
"""Create/update Hugging Face model (and optional Space) repos.

Functional counterpart of the reference's uploader
(``/root/reference/scripts/upload_to_huggingface.py``): pushes the model
card plus the staged ``snapshot/`` checkpoints to a model repo, and the
``huggingface/space`` demo app to a Space repo. All network actions are
gated behind ``huggingface_hub``; ``--dry-run`` lists what would be pushed.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
MODEL_CARD = ROOT / "huggingface" / "model_card" / "README.md"
SPACE_DIR = ROOT / "huggingface" / "space"
SNAPSHOT_DIR = ROOT / "snapshot"


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-repo-id",
                   default=os.environ.get("BUFFERX_TPU_HF_MODEL_REPO", ""))
    p.add_argument("--space-repo-id",
                   default=os.environ.get("BUFFERX_TPU_HF_SPACE_REPO", ""))
    p.add_argument("--private", action="store_true")
    p.add_argument("--dry-run", action="store_true",
                   help="List planned uploads without any network calls.")
    return p.parse_args()


def planned_files():
    files = []
    if MODEL_CARD.exists():
        files.append(("README.md", MODEL_CARD))
    for f in sorted(SNAPSHOT_DIR.rglob("*.msgpack")):
        files.append((str(f.relative_to(ROOT)), f))
    for f in sorted(SNAPSHOT_DIR.rglob("*.json")):
        files.append((str(f.relative_to(ROOT)), f))
    return files


def main() -> int:
    args = parse_args()
    files = planned_files()
    if args.dry_run:
        print("model repo uploads:")
        for rel, f in files:
            print(f"  {rel}  ({f.stat().st_size} bytes)")
        if SPACE_DIR.exists():
            print("space uploads:")
            for f in sorted(SPACE_DIR.rglob("*")):
                if f.is_file():
                    print(f"  {f.relative_to(SPACE_DIR)}")
        return 0
    if not args.model_repo_id:
        print("--model-repo-id / BUFFERX_TPU_HF_MODEL_REPO required",
              file=sys.stderr)
        return 2
    try:
        from huggingface_hub import HfApi
    except ImportError:
        print("huggingface_hub is not installed; "
              "pip install huggingface_hub", file=sys.stderr)
        return 1

    api = HfApi()
    api.create_repo(args.model_repo_id, repo_type="model",
                    private=args.private, exist_ok=True)
    for rel, f in files:
        api.upload_file(path_or_fileobj=str(f), path_in_repo=rel,
                        repo_id=args.model_repo_id, repo_type="model")
        print(f"uploaded {rel}")

    if args.space_repo_id and SPACE_DIR.exists():
        api.create_repo(args.space_repo_id, repo_type="space",
                        space_sdk="gradio", private=args.private,
                        exist_ok=True)
        api.upload_folder(folder_path=str(SPACE_DIR),
                          repo_id=args.space_repo_id, repo_type="space")
        print(f"space updated: {args.space_repo_id}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
