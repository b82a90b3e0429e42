#!/bin/bash
# Run the TartanAir validation-split sweep (parity with the reference's
# tools/validate_tartanair.sh -> validate_tartanair.py).
DATAPATH=${1:-datasets/TartanAir}
WEIGHTS=${2:-droid.npz}
shift $(( $# > 2 ? 2 : $# ))
python evaluation_scripts/validate_tartanair.py \
  --datapath="$DATAPATH" --weights="$WEIGHTS" "$@"
