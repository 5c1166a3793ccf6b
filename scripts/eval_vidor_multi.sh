#!/usr/bin/env bash
set -e
python eval.py \
    --data_name vidor \
    --cfg_path configs/vidor.yaml \
    --exp_dir "${1:-experiments/vidor}" \
    --eval_exp_dir --eval_start_epoch 3 --epochs 12 \
    --topk 6
