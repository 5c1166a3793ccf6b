#!/usr/bin/env bash
# Windowed-attention VidOR variant (reference scripts/train_vidor_local.sh).
set -e
python train.py \
    --data_name vidor \
    --cfg_path configs/vidor_local.yaml \
    --exp_dir "${1:-experiments/vidor_local}"
