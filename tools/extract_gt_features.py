"""Extract per-frame GT-box RoI features for relation-model training.

TPU-native counterpart of reference
datasets/mega/extract_gt_features_vidvrd.py (+_vidor): for each video, run
frames through the MegaDetector backbone, RoIAlign the annotated GT boxes,
enhance with the relation-attention ring-buffer memory, and write the
per-video pickle contract the dataloaders consume:

    {frame_id(1-based): {"frame_id": int, "tids": int64[n],
                         "visual_features": float32[n, 1024]}}

Frames are processed in fixed-size box slots (padded + masked) so a whole
video is two compiled XLA programs (backbone batch + per-frame head scan).
Part sharding (--part/--num_parts) mirrors the reference's 8/700-part
loops so extraction can fan out across hosts.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp

from vrdone_tpu.models.detector import MegaDetector
from vrdone_tpu.models.mega import init_memory
from vrdone_tpu.train.checkpoint import restore_params_for_eval


def load_frame(frames_dir: str, video: str, idx: int) -> np.ndarray:
    from PIL import Image
    path = os.path.join(frames_dir, video, f"{idx + 1:06d}.jpg")
    img = np.asarray(Image.open(path), dtype=np.float32)
    return img[..., ::-1]  # RGB -> BGR (Caffe2-lineage preprocessing)


def _frame_rois(frame_anno, box_slots):
    boxes = np.zeros((box_slots, 4), np.float32)
    valid = np.zeros((box_slots,), bool)
    for i, b in enumerate(frame_anno[:box_slots]):
        bb = b["bbox"]
        boxes[i] = [bb["xmin"], bb["ymin"], bb["xmax"], bb["ymax"]]
        valid[i] = True
    return boxes, valid


def extract_video(det: MegaDetector, params, anno: dict, frames_dir: str,
                  video: str, *, box_slots: int = 16,
                  mem_frames: int = 25, global_frames: int = 0) -> dict:
    """Stream one video through the extractor.

    global_frames > 0 enables the MEGA global stage (reference
    roi_box_feature_extractors.py:658-700 update_global): a first pass
    collects RAW box features of `global_frames` stride-sampled frames;
    the per-frame enhancement then attends to that video-level set in
    addition to the local ring-buffer memory.
    """
    trajectories = anno["trajectories"]
    n_frames = len(trajectories)
    mem = init_memory(mem_frames, box_slots, 1024)

    @jax.jit
    def raw_features(params, image, rois):
        c4 = det.apply(params, image,
                       method=lambda m, im: m.features(im))[0]
        return det.apply(params, c4, rois,
                         method=lambda m, c, r:
                         m.box_head.visual_features(c, r))

    use_global = global_frames > 0
    if use_global:
        g = global_frames * box_slots
        g_feat = np.zeros((g, 1024), np.float32)
        g_boxes = np.zeros((g, 4), np.float32)
        g_valid = np.zeros((g,), bool)
        annotated = [f for f in range(n_frames) if trajectories[f]]
        picks = annotated[::max(1, len(annotated) // global_frames)][
            :global_frames]
        for slot, fid in enumerate(picks):
            boxes, valid = _frame_rois(trajectories[fid], box_slots)
            image = load_frame(frames_dir, video, fid)[None]
            feats = np.asarray(raw_features(params, jnp.asarray(image),
                                            jnp.asarray(boxes)))
            lo = slot * box_slots
            g_feat[lo:lo + box_slots] = feats * valid[:, None]
            g_boxes[lo:lo + box_slots] = boxes
            g_valid[lo:lo + box_slots] = valid
        g_args = (jnp.asarray(g_feat), jnp.asarray(g_boxes),
                  jnp.asarray(g_valid))
    else:
        g_args = ()

    @jax.jit
    def step(params, image, rois, rois_valid, mem, *g_args):
        c4 = det.apply(params, image,
                       method=lambda m, im: m.features(im))[0]
        feats = det.apply(
            params, c4, rois, rois_valid, *mem, *g_args,
            method=lambda m, c, r, v, mf, mb, mv, *ga:
            m.enhancer(m.box_head.visual_features(c, r)
                       * v[:, None].astype(jnp.float32), r, v,
                       mf, mb, mv, *ga))
        mem_feat, mem_boxes, mem_valid = mem
        n = rois.shape[0]
        mem_feat = jnp.roll(mem_feat, -n, axis=0).at[-n:].set(feats)
        mem_boxes = jnp.roll(mem_boxes, -n, axis=0).at[-n:].set(rois)
        mem_valid = jnp.roll(mem_valid, -n, axis=0).at[-n:].set(rois_valid)
        return feats, (mem_feat, mem_boxes, mem_valid)

    out = {}
    for fid in range(n_frames):
        frame_anno = trajectories[fid]
        if len(frame_anno) == 0:
            continue
        tids = np.asarray([b["tid"] for b in frame_anno], np.int64)
        boxes, valid = _frame_rois(frame_anno, box_slots)
        image = load_frame(frames_dir, video, fid)[None]
        feats, mem = step(params, jnp.asarray(image), jnp.asarray(boxes),
                          jnp.asarray(valid), mem, *g_args)
        n = min(len(tids), box_slots)
        out[fid + 1] = {
            "frame_id": fid + 1,
            "tids": tids[:n],
            "visual_features": np.asarray(feats)[:n],
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--anno_dir", required=True)
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--ckpt_path", default=None,
                   help="detector checkpoint (random init if omitted)")
    p.add_argument("--num_classes", type=int, default=35)
    p.add_argument("--resnet_layers", type=str, default="3,4,23")
    p.add_argument("--part", type=int, default=0)
    p.add_argument("--num_parts", type=int, default=1)
    p.add_argument("--box_slots", type=int, default=16)
    p.add_argument("--global_frames", type=int, default=0,
                   help=">0 enables the MEGA global stage with this many "
                        "stride-sampled frames per video")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    layers = tuple(int(x) for x in args.resnet_layers.split(","))
    det = MegaDetector(num_classes=args.num_classes, resnet_layers=layers,
                       props_per_frame=args.box_slots)

    videos = sorted(v[:-5] for v in os.listdir(args.anno_dir)
                    if v.endswith(".json"))
    videos = videos[args.part::args.num_parts]

    params = None
    for video in videos:
        dst = os.path.join(args.out_dir, video + ".pkl")
        if os.path.exists(dst):
            continue
        with open(os.path.join(args.anno_dir, video + ".json")) as f:
            anno = json.load(f)
        if params is None:
            if args.ckpt_path:
                params = {"params": restore_params_for_eval(args.ckpt_path,
                                                            None)}
            else:
                img = load_frame(args.frames_dir, video, 0)[None]
                rois = jnp.zeros((args.box_slots, 4), jnp.float32)
                valid = jnp.zeros((args.box_slots,), bool)
                mem = init_memory(det.mem_frames, args.box_slots, 1024)
                if args.global_frames > 0:
                    g = args.global_frames * args.box_slots
                    gargs = (jnp.zeros((g, 1024), jnp.float32),
                             jnp.zeros((g, 4), jnp.float32),
                             jnp.zeros((g,), bool))
                else:
                    gargs = ()

                def run(m, im):
                    c4 = m.features(im)[0]
                    visual = m.box_head.visual_features(c4, rois)
                    return m.enhancer(visual, rois, valid, *mem, *gargs)
                params = det.init(jax.random.key(0), jnp.asarray(img),
                                  method=run)
        data = extract_video(det, params, anno, args.frames_dir, video,
                             box_slots=args.box_slots,
                             mem_frames=det.mem_frames,
                             global_frames=args.global_frames)
        with open(dst, "wb") as f:
            pickle.dump(data, f)
        print(f"{video}: {len(data)} frames")


if __name__ == "__main__":
    main()
