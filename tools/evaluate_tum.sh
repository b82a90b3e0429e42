#!/bin/bash
# TUM-RGBD freiburg1 sweep (parity with /root/reference/tools/evaluate_tum.sh)
TUM_PATH=${1:-datasets/TUM-RGBD}
WEIGHTS=${2:-droid.npz}
for seq in rgbd_dataset_freiburg1_360 rgbd_dataset_freiburg1_desk \
           rgbd_dataset_freiburg1_desk2 rgbd_dataset_freiburg1_floor \
           rgbd_dataset_freiburg1_plant rgbd_dataset_freiburg1_room \
           rgbd_dataset_freiburg1_rpy rgbd_dataset_freiburg1_teddy \
           rgbd_dataset_freiburg1_xyz; do
  python evaluation_scripts/test_tum.py --datapath=$TUM_PATH/$seq --weights=$WEIGHTS
done
