"""Extract per-entity CLIP ViT-B/32 crop features (VrdONE-X inputs).

Counterpart of reference datasets/mega/extract_gt_clip_features_vidor.py
and extract_val_clip_features_vidor.py (:174 loads CLIP ViT-B/32): crop
each annotated entity box per frame, encode with CLIP's image tower, save
per-video pickles {tid: float32[T, 512]}.

Uses the HuggingFace transformers CLIP implementation (baked into this
image); weights must be available locally (--clip_path) since the
environment has no egress.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle
from collections import defaultdict

import numpy as np


def load_clip(clip_path: str):
    import torch
    from transformers import CLIPModel, CLIPImageProcessor
    model = CLIPModel.from_pretrained(clip_path).eval()
    proc = CLIPImageProcessor.from_pretrained(clip_path)
    return model, proc


def encode_crops(model, proc, crops):
    import torch
    with torch.no_grad():
        inputs = proc(images=crops, return_tensors="pt")
        feats = model.get_image_features(**inputs)
    return feats.cpu().numpy().astype(np.float32)


def extract_video(model, proc, anno: dict, frames_dir: str, video: str,
                  batch: int = 64) -> dict:
    from PIL import Image
    trajectories = anno["trajectories"]
    per_tid = defaultdict(dict)  # tid -> {fid: vector}
    pending = []   # (tid, fid, crop)
    for fid, frame_anno in enumerate(trajectories):
        if not frame_anno:
            continue
        img = Image.open(os.path.join(frames_dir, video,
                                      f"{fid + 1:06d}.jpg"))
        for b in frame_anno:
            bb = b["bbox"]
            crop = img.crop((bb["xmin"], bb["ymin"], bb["xmax"], bb["ymax"]))
            pending.append((b["tid"], fid, crop))
        while len(pending) >= batch:
            chunk, pending = pending[:batch], pending[batch:]
            feats = encode_crops(model, proc, [c for _, _, c in chunk])
            for (tid, f, _), v in zip(chunk, feats):
                per_tid[tid][f] = v
    if pending:
        feats = encode_crops(model, proc, [c for _, _, c in pending])
        for (tid, f, _), v in zip(pending, feats):
            per_tid[tid][f] = v

    # dense [min_fid, max_fid] arrays per tid (contract of the dataloader:
    # gt_clip_features[tid][interval] slices by frame index)
    out = {}
    n_frames = len(trajectories)
    for tid, fmap in per_tid.items():
        arr = np.zeros((n_frames, 512), np.float32)
        for f, v in fmap.items():
            arr[f] = v
        out[tid] = arr
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--anno_dir", required=True)
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--clip_path", required=True,
                   help="local CLIP ViT-B/32 weights directory")
    p.add_argument("--part", type=int, default=0)
    p.add_argument("--num_parts", type=int, default=1)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    model, proc = load_clip(args.clip_path)
    videos = sorted(v[:-5] for v in os.listdir(args.anno_dir)
                    if v.endswith(".json"))
    for video in videos[args.part::args.num_parts]:
        dst = os.path.join(args.out_dir, video + ".pkl")
        if os.path.exists(dst):
            continue
        with open(os.path.join(args.anno_dir, video + ".json")) as f:
            anno = json.load(f)
        data = extract_video(model, proc, anno, args.frames_dir, video)
        with open(dst, "wb") as f:
            pickle.dump(data, f)
        print(f"{video}: {len(data)} tracks")


if __name__ == "__main__":
    main()
