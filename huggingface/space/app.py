"""Gradio Space: snapshot discovery, integrity audit and TPU run recipes.

Companion Space for BUFFER-X TPU model repos. Design goals (this
framework's own, not a port of any upstream helper):

- DISCOVER staged snapshots instead of checking a hardcoded file list:
  any ``snapshot/<name>/{Desc,Pose}/best.msgpack`` pair in the repo is a
  usable checkpoint (``compose_staged_params`` merges the two subtrees).
- AUDIT each snapshot's msgpack payloads: decode the flax serialization
  envelope, count tensors/parameters, and flag truncated or non-msgpack
  files before anyone burns TPU time on a corrupt download.
- EMIT TPU-ready run recipes per snapshot (download + evaluate + bench),
  including the virtual-CPU-mesh variant for machines without a TPU.
"""

from __future__ import annotations

import os
import tempfile

import gradio as gr
import msgpack
import numpy as np
from huggingface_hub import HfApi, hf_hub_download

STAGES = ("Desc", "Pose")


def _leaf_stats(obj) -> tuple[int, int]:
    """(num_tensors, num_scalar_params) over a decoded msgpack tree.

    Flax's serialization stores arrays as msgpack ext/bin payloads or
    nested dicts of them; anything bytes-like counts as one tensor and its
    element count is recovered from the numpy header when possible.
    """
    if isinstance(obj, dict):
        t = p = 0
        for v in obj.values():
            dt, dp = _leaf_stats(v)
            t, p = t + dt, p + dp
        return t, p
    if isinstance(obj, (list, tuple)):
        t = p = 0
        for v in obj:
            dt, dp = _leaf_stats(v)
            t, p = t + dt, p + dp
        return t, p
    if isinstance(obj, msgpack.ExtType):
        try:  # flax encodes ndarrays as ext type 1: (shape, dtype, bytes)
            shape, dtype, _buf = msgpack.unpackb(obj.data)
            return 1, int(np.prod(shape)) if shape else 1
        except Exception:  # noqa: BLE001 — malformed ext payload
            return 1, 0
    if isinstance(obj, (bytes, bytearray)):
        return 1, 0
    return 0, 0


def _audit_msgpack(path: str) -> str:
    """One-line integrity verdict for a checkpoint file."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        data = f.read()
    try:
        tree = msgpack.unpackb(data, strict_map_key=False)
    except Exception as exc:  # noqa: BLE001 — verdict, not crash
        return f"CORRUPT ({size} bytes): {type(exc).__name__}: {exc}"
    tensors, params = _leaf_stats(tree)
    mb = size / 1e6
    return f"ok — {tensors} tensors, ~{params:,} params, {mb:.1f} MB"


def _discover(files: list[str]) -> dict[str, dict[str, str]]:
    """Repo file list -> {snapshot_name: {stage: path}} for complete pairs."""
    found: dict[str, dict[str, str]] = {}
    for f in files:
        parts = f.split("/")
        if (
            len(parts) == 4
            and parts[0] == "snapshot"
            and parts[2] in STAGES
            and parts[3] == "best.msgpack"
        ):
            found.setdefault(parts[1], {})[parts[2]] = f
    return {k: v for k, v in found.items() if len(v) == len(STAGES)}


def _recipe(repo_id: str, name: str) -> str:
    dataset = {"threedmatch": "3DMatch", "kitti": "KITTI"}.get(name, name)
    return "\n".join([
        "```bash",
        f"python scripts/download_pretrained_models.py --repo-id {repo_id}",
        f"python scripts/evaluate.py --dataset {dataset} "
        f"--checkpoint-dir snapshot/{name}   # one TPU chip",
        "python bench.py   # serving throughput on the same snapshot",
        "# no TPU? validate the program on a virtual 8-device CPU mesh:",
        "python __graft_entry__.py",
        "```",
    ])


def audit_repo(repo_id: str, deep: bool) -> str:
    repo_id = repo_id.strip()
    if not repo_id:
        return ("Enter a model repo id (`org/name`). The Space scans it "
                "for `snapshot/<name>/{Desc,Pose}/best.msgpack` pairs.")
    api = HfApi()
    try:
        files = api.list_repo_files(repo_id=repo_id, repo_type="model")
    except Exception as exc:  # noqa: BLE001 — surface to the UI
        return f"Could not list `{repo_id}`: {exc}"

    snaps = _discover(files)
    partial = {
        p.split("/")[1]
        for p in files
        if p.startswith("snapshot/") and p.endswith("best.msgpack")
    } - set(snaps)

    out = [f"## `{repo_id}`", ""]
    if not snaps:
        out.append("No complete snapshots found — a usable checkpoint "
                   "needs BOTH stage files: "
                   "`snapshot/<name>/Desc/best.msgpack` and "
                   "`snapshot/<name>/Pose/best.msgpack`.")
    for name, stages in sorted(snaps.items()):
        out.append(f"### snapshot `{name}` — complete")
        if deep:
            with tempfile.TemporaryDirectory() as td:
                for stage in STAGES:
                    try:
                        local = hf_hub_download(
                            repo_id=repo_id, filename=stages[stage],
                            local_dir=td,
                        )
                        out.append(f"- {stage}: {_audit_msgpack(local)}")
                    except Exception as exc:  # noqa: BLE001
                        out.append(f"- {stage}: download failed: {exc}")
        else:
            for stage in STAGES:
                out.append(f"- {stage}: `{stages[stage]}` present "
                           "(enable the deep audit to decode it)")
        out += ["", _recipe(repo_id, name), ""]
    if partial:
        out += ["### Incomplete (missing a stage):"]
        out += [f"- `{n}`" for n in sorted(partial)]
    return "\n".join(out)


with gr.Blocks(title="BUFFER-X TPU snapshot auditor") as demo:
    gr.Markdown(
        "# BUFFER-X TPU snapshot auditor\n"
        "Scans a Hugging Face model repo for staged BUFFER-X TPU "
        "checkpoints, optionally decodes the msgpack payloads to verify "
        "integrity and parameter counts, and prints TPU run recipes."
    )
    with gr.Row():
        repo_box = gr.Textbox(
            label="Model repo id",
            value=os.environ.get("BUFFERX_TPU_HF_MODEL_REPO", ""),
            placeholder="org/BUFFER-X-TPU",
        )
        deep_box = gr.Checkbox(
            label="Deep audit (download + decode each checkpoint)",
            value=False,
        )
    report = gr.Markdown()
    gr.Button("Audit").click(audit_repo, [repo_box, deep_box], report)

if __name__ == "__main__":
    demo.launch()
