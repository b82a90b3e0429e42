#!/bin/bash
# Fetch the 11 EuRoC MAV sequences (ASL dataset server) into datasets/EuRoC.
set -euo pipefail
DEST=${1:-datasets/EuRoC}
BASE="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"
mkdir -p "$DEST"

room_of() {
  case "$1" in
    MH_*) echo machine_hall ;;
    V1_*) echo vicon_room1 ;;
    V2_*) echo vicon_room2 ;;
  esac
}

for seq in MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult \
           V1_01_easy V1_02_medium V1_03_difficult \
           V2_01_easy V2_02_medium V2_03_difficult; do
  [ -d "$DEST/$seq/mav0" ] && { echo "$seq already present"; continue; }
  url="$BASE/$(room_of "$seq")/$seq/$seq.zip"
  echo "fetching $seq"
  wget -c "$url" -O "$DEST/$seq.zip"
  mkdir -p "$DEST/$seq"
  unzip -oq "$DEST/$seq.zip" -d "$DEST/$seq"
  rm -f "$DEST/$seq.zip"
done
