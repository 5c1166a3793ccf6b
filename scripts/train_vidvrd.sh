#!/usr/bin/env bash
# Train the VidVRD relation model. One process drives the whole TPU mesh —
# no torchrun/NCCL (the reference's scripts/train_vidvrd.sh wraps torchrun);
# XLA handles cross-chip collectives.
set -e
python train.py \
    --data_name vidvrd \
    --cfg_path configs/vidvrd.yaml \
    --exp_dir "${1:-experiments/vidvrd}"
