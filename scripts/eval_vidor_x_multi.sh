#!/usr/bin/env bash
# Checkpoint sweep for VrdONE-X (reference scripts/eval_vidor_x_multi.sh).
set -e
python eval.py \
    --data_name vidor \
    --cfg_path configs/vidor_x.yaml \
    --exp_dir "${1:-experiments/vidor_x}" \
    --eval_exp_dir \
    --topk 4
