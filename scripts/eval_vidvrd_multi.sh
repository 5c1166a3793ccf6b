#!/usr/bin/env bash
# Sweep all epoch checkpoints (reference scripts/eval_vidvrd_multi.sh).
set -e
python eval.py \
    --data_name vidvrd \
    --cfg_path configs/vidvrd.yaml \
    --exp_dir "${1:-experiments/vidvrd}" \
    --eval_exp_dir --eval_start_epoch 3 --epochs 15 \
    --topk 8
