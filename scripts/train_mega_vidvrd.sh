#!/usr/bin/env bash
# MEGA detector training on COCO-21 + VidVRD (reference
# datasets/mega/scripts/train_mega_vidvrd.sh; one process drives the dp
# mesh instead of torch.distributed.launch).
set -e
python tools/train_detector.py \
    --cfg configs/detector/mega_vidvrd.yaml \
    --dataset vidvrd \
    --anno_dir datasets/vidvrd/annotations/train \
    --frames_dir datasets/vidvrd/frames \
    --exp_dir "${1:-experiments/detector_vidvrd}"
