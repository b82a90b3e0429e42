#!/bin/bash
# Fetch the TartanAir CVPR-challenge test split (mono images + groundtruth)
# into datasets/tartanair_test.
set -euo pipefail
DEST=${1:-datasets/tartanair_test}
mkdir -p "$DEST"

command -v gdown >/dev/null 2>&1 || {
  echo "gdown required for the image archive (Google Drive)"; exit 1; }

gdown 1N8qoU-oEjRKdaKSrHPWA-xsnRtofR_jJ --output "$DEST/images.tar.gz"
wget -c "https://cmu.box.com/shared/static/3p1sf0eljfwrz4qgbpc6g95xtn2alyfk.zip" \
  -O "$DEST/groundtruth.zip"

unzip -oq "$DEST/groundtruth.zip" -d "$DEST"
tar -zxf "$DEST/images.tar.gz" -C "$DEST"
