#!/bin/bash
# Async-vs-sync accuracy delta (VERDICT r4 item 6): final ATE on held-out
# synthetic sequences, 3 seeds, sync vs DroidAsync, same weights.
# Reference claims async is typically MORE accurate (README.md:140).
# Usage: tools/async_accuracy.sh [weights] ; writes runs/async_accuracy.json
set -u
W=${1:-checkpoints/r7_014000.npz}
mkdir -p runs
{
  echo '{"weights": "'$W'", "runs": {'
  first=1
  for mode in sync async; do
    flag=""
    [ $mode = async ] && flag="--asynchronous"
    out=$(python evaluation_scripts/test_synthetic.py --weights "$W" \
          --seeds 3 4 5 $flag 2>&1 | grep -E "seed [0-9]+: ATE|mean ATE")
    ates=$(echo "$out" | grep -oE "RMSE [0-9.]+" | awk '{print $2}' | paste -sd,)
    [ $first = 0 ] && echo ','
    first=0
    echo -n '"'$mode'": ['$ates']'
  done
  echo '}}'
} | tee runs/async_accuracy.json
