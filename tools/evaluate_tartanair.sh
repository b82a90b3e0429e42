#!/bin/bash
# TartanAir test set (parity with /root/reference/tools/validate_tartanair.sh)
DATAPATH=${1:-datasets/mono}
GT=${2:-datasets/mono_gt}
WEIGHTS=${3:-droid.npz}
python evaluation_scripts/test_tartanair.py --datapath=$DATAPATH --gt_path=$GT --weights=$WEIGHTS "$@"
