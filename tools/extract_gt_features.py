"""Extract per-frame GT-box RoI features for relation-model training.

TPU-native counterpart of reference
datasets/mega/extract_gt_features_vidvrd.py (+_vidor): for each video,
compute fc0-level features of the annotated GT boxes in one batched
backbone pass, then stream the frames through the full MEGA head
(25-frame sliding window, per-stage long-range memory, shuffled global
set — reference feature_extractor_vidvrd.py) and write the per-video
pickle contract the dataloaders consume:

    {frame_id(1-based): {"frame_id": int, "tids": int64[n],
                         "visual_features": float32[n, 1024]}}

As in the reference, the streamed frame sequence contains only annotated
frames (filtered_frame_idx). Frames are processed in fixed-size box slots
(padded + masked) so a whole video is two compiled XLA programs (batched
fc0 precompute + the set-attention scan). Part sharding (--part/
--num_parts) mirrors the reference's 8/700-part loops so extraction can
fan out across hosts.
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

from vrdone_tpu.models.detector import MegaDetector, extract_video_features
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
                  seed: int = 0, compute_dtype: str = "float32") -> dict:
    """Stream one video's annotated frames through the MEGA extractor."""
    trajectories = anno["trajectories"]
    fids = [f for f in range(len(trajectories)) if trajectories[f]]
    if not fids:
        return {}

    rois = np.zeros((len(fids), box_slots, 4), np.float32)
    valid = np.zeros((len(fids), box_slots), bool)
    tids = []
    for i, fid in enumerate(fids):
        rois[i], valid[i] = _frame_rois(trajectories[fid], box_slots)
        tids.append(np.asarray([b["tid"] for b in trajectories[fid]],
                               np.int64))

    def load(lo, hi):
        return np.stack([load_frame(frames_dir, video, fid)
                         for fid in fids[lo:hi]])

    feats = extract_video_features(det, params, load, rois, valid,
                                   seed=seed, compute_dtype=compute_dtype)

    out = {}
    for i, fid in enumerate(fids):
        n = min(len(tids[i]), box_slots)
        out[fid + 1] = {
            "frame_id": fid + 1,
            "tids": tids[i][:n],
            "visual_features": np.asarray(feats[i][:n]),
        }
    return out


def init_extractor_params(det: MegaDetector, frames_dir: str, video: str,
                          box_slots: int, seed: int = 0):
    """Initialize all parameters used by the extraction path."""
    import jax
    import jax.numpy as jnp

    img = load_frame(frames_dir, video, 0)[None]
    rois = jnp.zeros((1, box_slots, 4), jnp.float32)
    valid = jnp.zeros((1, box_slots), bool)

    def run(m):
        from vrdone_tpu.models.mega import BoxSet, flatten_set
        c4 = m.features(jnp.asarray(img))
        fc0 = jax.vmap(m.frame_fc0)(c4, rois, valid)
        win = BoxSet(jnp.repeat(fc0, det.window, 0),
                     jnp.repeat(rois, det.window, 0),
                     jnp.repeat(valid, det.window, 0))
        glob = flatten_set(BoxSet(fc0, rois, valid))
        return m.enhance(fc0[0], rois[0], valid[0], win, None, glob,
                         key_is_fc0=True)
    return jax.jit(lambda k: det.init(k, method=run))(jax.random.key(seed))


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
    p.add_argument("--window", type=int, default=25)
    p.add_argument("--global_size", type=int, default=10,
                   help="0 disables the MEGA global stage")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="backbone/RoI pass dtype (bf16 = fast extraction; "
                        "features always emitted fp32)")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    layers = tuple(int(x) for x in args.resnet_layers.split(","))
    det = MegaDetector(num_classes=args.num_classes, resnet_layers=layers,
                       base_num=args.box_slots,
                       advanced_num_override=min(15, args.box_slots),
                       window=args.window,
                       key_loc=args.window // 2,
                       global_size=args.global_size,
                       global_enable=args.global_size > 0)

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
                params = init_extractor_params(det, args.frames_dir, video,
                                               args.box_slots, args.seed)
        data = extract_video(det, params, anno, args.frames_dir, video,
                             box_slots=args.box_slots, seed=args.seed,
                             compute_dtype=args.compute_dtype)
        with open(dst, "wb") as f:
            pickle.dump(data, f)
        print(f"{video}: {len(data)} frames")


if __name__ == "__main__":
    main()
