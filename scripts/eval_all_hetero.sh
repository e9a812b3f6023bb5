#!/usr/bin/env bash
# Heterogeneous-sensor sweep (reference scripts/eval_all_hetero.sh:22-29).
set -euo pipefail
ROOT=${1:-../datasets}
shift || true
cd "$(dirname "$0")/.."

for spec in "KAIST_hetero:helipr_kaist05:Aeva:Avia" "KAIST_hetero:helipr_kaist05:Avia:Ouster" \
            "KAIST_hetero:helipr_kaist05:Ouster:Aeva" "TIERS_hetero:tiers_indoor:os0_128:os1_64" \
            "TIERS_hetero:tiers_indoor:os1_64:vel16" "TIERS_hetero:tiers_indoor:vel16:os0_128"; do
  IFS=: read -r ds dir src tgt <<<"$spec"
  echo "=== $ds $src->$tgt ==="
  python scripts/evaluate.py --dataset "$ds" --root "$ROOT/$dir" --hetero "$src:$tgt" "$@" || echo "[skip] $spec failed"
done
