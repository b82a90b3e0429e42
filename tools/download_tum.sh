#!/bin/bash
# Fetch the TUM-RGBD freiburg1 sequences into datasets/TUM-RGBD.
set -euo pipefail
DEST=${1:-datasets/TUM-RGBD}
BASE="https://cvg.cit.tum.de/rgbd/dataset/freiburg1"
mkdir -p "$DEST"

for name in 360 desk desk2 floor plant room rpy teddy xyz; do
  seq="rgbd_dataset_freiburg1_$name"
  [ -d "$DEST/$seq" ] && { echo "$seq already present"; continue; }
  echo "fetching $seq"
  wget -c "$BASE/$seq.tgz" -O "$DEST/$seq.tgz"
  tar -zxf "$DEST/$seq.tgz" -C "$DEST"
  rm -f "$DEST/$seq.tgz"
done
