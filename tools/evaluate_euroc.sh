#!/bin/bash
# EuRoC sweep (parity with /root/reference/tools/evaluate_euroc.sh)
EUROC_PATH=${1:-datasets/EuRoC}
WEIGHTS=${2:-droid.npz}
for seq in MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult \
           V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult; do
  python evaluation_scripts/test_euroc.py \
    --datapath=$EUROC_PATH/$seq \
    --gt=data/euroc_groundtruth/$seq.txt \
    --weights=$WEIGHTS
done
