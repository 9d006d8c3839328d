#!/bin/bash
# Select the accelerator index for a run (reference: scripts/set_gpu.sh used
# FMOD_GPU; SRES_DEVICE is the TPU-native equivalent, FMOD_GPU still honored).
export SRES_DEVICE=${1:-0}
echo "SRES_DEVICE=$SRES_DEVICE"
