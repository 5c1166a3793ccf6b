#!/usr/bin/env bash
# MEGA detector finetune from a pre-trained checkpoint (reference
# datasets/mega/scripts/finetune_mega_vidvrd.sh: --lr_rate 1, 210k iters).
set -e
python tools/train_detector.py \
    --cfg configs/detector/mega_vidvrd.yaml \
    --dataset vidvrd \
    --anno_dir datasets/vidvrd/annotations/train \
    --frames_dir datasets/vidvrd/frames \
    --exp_dir "${1:-experiments/detector_vidvrd_finetune}" \
    --init_ckpt "${2:?usage: finetune_mega_vidvrd.sh EXP_DIR INIT_CKPT}" \
    --lr_rate 1.0 \
    --iters 210000
