#!/bin/bash
# Placeholder for the reference's dataset download scripts (tools/download_*.sh).
# This environment has no egress; point the evaluation scripts at local data.
echo "No network egress in this environment; mount datasets locally."
