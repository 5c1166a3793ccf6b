#!/usr/bin/env bash
set -e
python eval.py \
    --data_name vidor \
    --cfg_path configs/vidor_x.yaml \
    --exp_dir "${1:-experiments/vidor_x}" \
    --ckpt_path "${2:?usage: eval_vidor_x_ckpt.sh EXP_DIR CKPT}" \
    --topk 4
