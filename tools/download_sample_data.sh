#!/bin/bash
# Fetch the small demo datasets (ETH3D sfm_bench, TUM fr3/cabinet, EuRoC
# MH_03) used by demo.py and the README examples.
set -euo pipefail
mkdir -p data

fetch_zip() {  # url
  local f; f=data/$(basename "$1")
  wget -c "$1" -O "$f" && unzip -oq "$f" -d data && rm -f "$f"
}

fetch_tgz() {  # url
  local f; f=data/$(basename "$1")
  wget -c "$1" -O "$f" && tar -zxf "$f" -C data && rm -f "$f"
}

fetch_zip https://www.eth3d.net/data/slam/datasets/sfm_bench_mono.zip
fetch_tgz https://vision.in.tum.de/rgbd/dataset/freiburg3/rgbd_dataset_freiburg3_cabinet.tgz
fetch_zip http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/machine_hall/MH_03_medium/MH_03_medium.zip
