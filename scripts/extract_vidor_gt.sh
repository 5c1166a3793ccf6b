#!/usr/bin/env bash
# VidOR GT-box feature extraction, part-sharded (the reference loops 700
# parts across GPUs, datasets/mega/scripts/extract_vidor_gt.sh; one TPU
# chip streams a part with batched precompute).
set -e
PART=${1:-0}
NUM_PARTS=${2:-700}
python tools/extract_gt_features.py \
    --anno_dir datasets/vidor/annotations/training \
    --frames_dir datasets/vidor/frames \
    --out_dir datasets/vidor/features/GT_boxfeatures_training \
    --num_classes 80 --part "$PART" --num_parts "$NUM_PARTS"
