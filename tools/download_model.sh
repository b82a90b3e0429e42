#!/bin/bash
# Fetch the published DROID-SLAM checkpoint (droid.pth, Google Drive id from
# the reference release) and convert it to this framework's .npz format.
set -euo pipefail

OUT=${1:-droid.pth}

if command -v gdown >/dev/null 2>&1; then
  gdown 1PpqVt1H4maBa_GbPJp4NwxRsd9jk-elh -O "$OUT"
else
  echo "gdown not available — download droid.pth manually:"
  echo "  https://drive.google.com/uc?id=1PpqVt1H4maBa_GbPJp4NwxRsd9jk-elh"
  exit 1
fi

# convert to native npz next to it (loadable without torch at runtime)
python - "$OUT" <<'EOF'
import sys
from droid_slam_tpu.models.weights import load_droid_pth, save_npz
params = load_droid_pth(sys.argv[1])
out = sys.argv[1].rsplit(".", 1)[0] + ".npz"
save_npz(out, params)
print("wrote", out)
EOF
