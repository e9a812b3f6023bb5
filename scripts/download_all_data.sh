#!/usr/bin/env bash
# Download the 13-target benchmark data (~130 GB) into ../datasets/.
#
# Functional counterpart of the reference's data driver
# (/root/reference/scripts/download_all_data.sh). The benchmark archives are
# distributed by the upstream BUFFER-X project; set BUFFERX_DATA_MANIFEST to
# a manifest file of "<name> <url>" lines (one per archive) — by default the
# script uses manifest entries baked in below if present, otherwise it
# prints the expected layout and exits.
#
# Expected layout after extraction (what the dataset loaders in
# bufferx_tpu/data/datasets.py read — identical to the reference's):
#   ../datasets/ThreeDMatch/        fragments + gt.log/gt.info + overlap pkl
#   ../datasets/scannetpp_iphone/   TSDF fragments + gt.log
#   ../datasets/scannetpp_faro/     simulated scans + gt.log
#   ../datasets/kitti/              velodyne sequences + poses + calib
#   ../datasets/WOD/                preprocessed .bin scans + poses
#   ../datasets/tiers_indoor/       os0_128 / os1_64 / vel16 scans + poses
#   ../datasets/helipr_kaist05/     Aeva / Avia / Ouster scans + poses
#   ../datasets/kimera-multi/       .pcd scans + poses
#   ../datasets/ETH/                Hokuyo .ply scenes + gt.log
#   ../datasets/newer-college/      .pcd scans + poses
#   ../datasets/modelnet40/         processed object pairs (or generate with
#                                   python -m bufferx_tpu.tools.pairgen)
set -euo pipefail

DATA_ROOT="${BUFFERX_DATA_ROOT:-$(dirname "$0")/../../datasets}"
MANIFEST="${BUFFERX_DATA_MANIFEST:-}"

mkdir -p "$DATA_ROOT"

if [ -z "$MANIFEST" ] || [ ! -f "$MANIFEST" ]; then
  echo "No BUFFERX_DATA_MANIFEST provided." >&2
  echo "Obtain the benchmark archives from the upstream BUFFER-X release" >&2
  echo "and extract them into $DATA_ROOT with the layout documented in" >&2
  echo "this script's header. ModelNet40 pairs can be generated offline:" >&2
  echo "  python -m bufferx_tpu.tools.pairgen --out $DATA_ROOT/modelnet40" >&2
  exit 1
fi

while read -r name url; do
  [ -z "$name" ] && continue
  case "$name" in \#*) continue ;; esac
  zip="$DATA_ROOT/$name.zip"
  if [ -e "$DATA_ROOT/$name" ]; then
    echo "$name: already present, skipping"
    continue
  fi
  echo "$name: downloading"
  curl -L --retry 3 -o "$zip" "$url"
  echo "$name: extracting"
  unzip -q "$zip" -d "$DATA_ROOT"
  rm -f "$zip"
done < "$MANIFEST"

echo "datasets ready under $DATA_ROOT"
