#!/usr/bin/env bash
# MEGA detector training on COCO-34 + VidOR (reference recipe
# configs/MEGA/vidor_R_101_C4_MEGA_1x.yaml; the reference ships no VidOR
# train script — its released VidOR tracklets come from this recipe).
set -e
python tools/train_detector.py \
    --cfg configs/detector/mega_vidor.yaml \
    --dataset vidor \
    --anno_dir datasets/vidor/annotations/training \
    --frames_dir datasets/vidor/frames \
    --exp_dir "${1:-experiments/detector_vidor}"
