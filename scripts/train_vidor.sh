#!/usr/bin/env bash
set -e
python train.py \
    --data_name vidor \
    --cfg_path configs/vidor.yaml \
    --exp_dir "${1:-experiments/vidor}"
