#!/usr/bin/env bash
# Evaluate one checkpoint (reference scripts/eval_vidvrd_ckpt.sh: topk 8).
set -e
python eval.py \
    --data_name vidvrd \
    --cfg_path configs/vidvrd.yaml \
    --exp_dir "${1:-experiments/vidvrd}" \
    --ckpt_path "${2:?usage: eval_vidvrd_ckpt.sh EXP_DIR CKPT}" \
    --topk 8
