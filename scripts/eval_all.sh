#!/usr/bin/env bash
# Full generalization-benchmark sweep (reference scripts/eval_all.sh:22-34).
# Usage: ./scripts/eval_all.sh <datasets_root> [extra evaluate.py args...]
set -euo pipefail
ROOT=${1:-../datasets}
shift || true
cd "$(dirname "$0")/.."

declare -A DIRS=(
  [3DMatch]=ThreeDMatch [3DLoMatch]=ThreeDMatch
  [Scannetpp_iphone]=scannetpp_iphone [Scannetpp_faro]=scannetpp_faro
  [TIERS]=tiers_indoor [KITTI]=kitti [WOD]=WOD [MIT]=kimera-multi
  [KAIST]=helipr_kaist05 [ETH]=ETH [Oxford]=newer-college
)
for ds in 3DMatch 3DLoMatch Scannetpp_iphone Scannetpp_faro TIERS KITTI WOD MIT KAIST ETH Oxford; do
  echo "=== $ds ==="
  python scripts/evaluate.py --dataset "$ds" --root "$ROOT/${DIRS[$ds]}" "$@" || echo "[skip] $ds failed"
done
