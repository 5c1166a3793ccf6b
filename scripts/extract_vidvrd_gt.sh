#!/usr/bin/env bash
# GT-box feature extraction, sharded in parts
# (reference datasets/mega/scripts/extract_vidvrd_gt.sh runs 8 parts).
set -e
PART=${1:-0}
NUM_PARTS=${2:-8}
python tools/extract_gt_features.py \
    --anno_dir datasets/vidvrd/annotations/train \
    --frames_dir datasets/vidvrd/frames \
    --out_dir datasets/vidvrd/features/GT_boxfeatures_training \
    --num_classes 35 --part "$PART" --num_parts "$NUM_PARTS"
