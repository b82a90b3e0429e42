#!/bin/bash
# ETH3D-SLAM RGB-D training-set sweep (parity with /root/reference/tools/evaluate_eth3d.sh)
ETH_PATH=${1:-datasets/ETH3D-SLAM/training}
WEIGHTS=${2:-droid.npz}
for d in $ETH_PATH/*/; do
  python evaluation_scripts/test_eth3d.py --datapath=$d --weights=$WEIGHTS
done
