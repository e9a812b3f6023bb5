#!/usr/bin/env bash
# Installer for the BUFFER-X TPU framework.
#
# Functional counterpart of the reference's unified installer
# (/root/reference/scripts/install.sh) redesigned for the TPU stack: there
# is no CUDA toolchain to build against — the device compute path is
# JAX/XLA/Pallas (pure Python packages) and the only native artifact is the
# host-side C++ helper library (voxel downsample / radius search / knn used
# by the input pipeline), built here with plain g++.
#
# Usage:
#   ./scripts/install.sh [--tpu | --cpu] [--dev]
#     --tpu   install jax with TPU support (libtpu)       [default]
#     --cpu   install CPU-only jax (CI / laptops)
#     --dev   also install dev extras (pytest, ruff, pre-commit)
set -euo pipefail

cd "$(dirname "$0")/.."

MODE=tpu
DEV=0
for arg in "$@"; do
  case "$arg" in
    --tpu) MODE=tpu ;;
    --cpu) MODE=cpu ;;
    --dev) DEV=1 ;;
    *) echo "unknown arg: $arg" >&2; exit 2 ;;
  esac
done

have() { python -c "import $1" >/dev/null 2>&1; }

echo "== python deps =="
if ! have jax; then
  if [ "$MODE" = tpu ]; then
    pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
  else
    pip install jax
  fi
fi
for pkg in flax optax einops numpy; do
  have "$pkg" || pip install "$pkg"
done

if [ "$DEV" = 1 ]; then
  echo "== dev extras =="
  pip install pytest ruff pre-commit
  pre-commit install || true
fi

echo "== native host library =="
make -C native

echo "== smoke check =="
python - <<'EOF'
import jax
print("jax", jax.__version__, "devices:", jax.devices())
import bufferx_tpu
from bufferx_tpu import make_cfg
cfg = make_cfg("3DMatch")
print("config OK:", cfg.data.dataset)
from bufferx_tpu.native import native_available
print("native host lib:", "loaded" if native_available() else "numpy fallback")
EOF
echo "install complete."
