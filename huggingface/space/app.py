"""Gradio Space: checkpoint-repo checker + eval-command generator.

Functional counterpart of the reference's Space helper
(``/root/reference/huggingface/space/app.py``): verifies a Hugging Face
model repo contains the staged BUFFER-X TPU snapshots and generates the
matching download/evaluate commands.
"""

import os

import gradio as gr
from huggingface_hub import HfApi

DEFAULT_MODEL_REPO = os.environ.get("BUFFERX_TPU_HF_MODEL_REPO", "")
EXPECTED_FILES = [
    "snapshot/threedmatch/Desc/best.msgpack",
    "snapshot/threedmatch/Pose/best.msgpack",
    "snapshot/kitti/Desc/best.msgpack",
    "snapshot/kitti/Pose/best.msgpack",
]


def check_model_repo(repo_id: str) -> str:
    repo_id = repo_id.strip()
    if not repo_id:
        return ("No repo id given — paste the `user/name` of the model "
                "repo holding the staged snapshots.")
    try:
        files = set(HfApi().list_repo_files(repo_id=repo_id,
                                            repo_type="model"))
    except Exception as exc:  # noqa: BLE001 — surface everything to the UI
        return f"Listing `{repo_id}` failed: {exc}"

    present = [f for f in EXPECTED_FILES if f in files]
    missing = [f for f in EXPECTED_FILES if f not in files]
    lines = [f"Model repo: `{repo_id}`", "",
             f"Snapshot files found: {len(present)}/{len(EXPECTED_FILES)}"]
    for title, items in (("Found", present), ("Missing", missing)):
        if items:
            lines += ["", f"{title}:"] + [f"- `{f}`" for f in items]
    if not missing:
        lines += ["", "Layout matches the BUFFER-X TPU downloader. Run:",
                  "```bash",
                  f"python scripts/download_pretrained_models.py "
                  f"--repo-id {repo_id}",
                  "python scripts/evaluate.py --dataset 3DMatch "
                  "--checkpoint-dir snapshot/threedmatch",
                  "```"]
    return "\n".join(lines)


demo = gr.Interface(
    fn=check_model_repo,
    inputs=gr.Textbox(label="Model repo id", value=DEFAULT_MODEL_REPO),
    outputs=gr.Markdown(),
    title="BUFFER-X TPU checkpoint checker",
    description="Checks that a model repo contains the staged "
                "Desc/Pose snapshots and prints the eval commands.",
)

if __name__ == "__main__":
    demo.launch()
