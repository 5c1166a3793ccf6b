"""Extract per-frame proposal-box RoI features for relation-model TEST
inference.

TPU-native counterpart of reference
datasets/mega/extract_test_features_vidvrd.py:23-126 (+ the
VidVRDDatasetProposal loader, vidvrd_dataset.py:338-560): for each video,
read the BIG repackaged proposal pickle ({"traj_proposal": {cat_ids,
bboxes_list, traj_durations, ...}}), materialise the per-frame live
proposal boxes from the trajectory durations, run them through the MEGA
feature extractor (batched fc0 precompute + 25-frame sliding-window
set-attention scan, models/mega.py stream_video), and write the
test_boxfeatures per-video pickle contract consumed by
VidVRDDataset._prepare_test (data/datasets.py:617-652):

    {frame_id: {"frame_id": int, "tids": int64[n],
                "visual_features": float32[n, 1024]}}

Frame ids are in the proposal pickle's own duration coordinates
(traj_durations closed [start, end]; a proposal is live at fid iff
start <= fid <= end, box index fid - start — the loader asserts exactly
this plus per-trajectory frame counts, so no truncation is allowed: box
slots are sized to the video's max live count). The box clipping to
[0, w-1] x [0, h-1] mirrors the reference _preprocess_info
(vidvrd_dataset.py:481-494).
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import pickle

import numpy as np

from vrdone_tpu.models.detector import MegaDetector, extract_video_features
from vrdone_tpu.train.checkpoint import restore_params_for_eval
from tools.extract_gt_features import init_extractor_params, load_frame


def _np(x):
    return x.numpy() if hasattr(x, "numpy") else np.asarray(x)


def frame_table(proposal: dict):
    """Per-frame (rois, tids) from trajectory durations.

    Returns (fids, rois (F, S, 4), valid (F, S), tids list[int64 array])
    with S = max live proposals over the video rounded up to a multiple
    of 8 (static shape -> one compiled program per bucket)."""
    durations = _np(proposal["traj_durations"]).astype(np.int64)
    bboxes_list = [_np(b).astype(np.float32)
                   for b in proposal["bboxes_list"]]
    w, h = proposal["video_wh"]
    lo = int(durations[:, 0].min())
    hi = int(durations[:, 1].max())
    fids = list(range(lo, hi + 1))

    live = [[] for _ in fids]
    for e, (s, t) in enumerate(durations):
        for fid in range(int(s), int(t) + 1):
            live[fid - lo].append(e)
    max_live = max((len(l) for l in live), default=0)
    slots = max(8, int(np.ceil(max_live / 8)) * 8)

    rois = np.zeros((len(fids), slots, 4), np.float32)
    valid = np.zeros((len(fids), slots), bool)
    tids = []
    for i, fid in enumerate(fids):
        ent = live[i]
        tids.append(np.asarray(ent, np.int64))
        for j, e in enumerate(ent):
            b = bboxes_list[e][fid - int(durations[e, 0])]
            rois[i, j] = [max(b[0], 0.0), max(b[1], 0.0),
                          min(b[2], w - 1.0), min(b[3], h - 1.0)]
            valid[i, j] = True
    return fids, rois, valid, tids


def extract_video(det: MegaDetector, params, proposal: dict,
                  frames_dir: str, video: str, *, seed: int = 0,
                  compute_dtype: str = "float32") -> dict:
    fids, rois, valid, tids = frame_table(proposal)
    if not fids:
        return {}

    def load(lo, hi):
        return np.stack([load_frame(frames_dir, video, fid)
                         for fid in fids[lo:hi]])

    feats = extract_video_features(det, params, load, rois, valid,
                                   seed=seed, compute_dtype=compute_dtype)
    out = {}
    for i, fid in enumerate(fids):
        if len(tids[i]) == 0:
            continue
        out[fid] = {
            "frame_id": fid,
            "tids": tids[i],
            "visual_features": np.asarray(feats[i][:len(tids[i])]),
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--proposal_dir", required=True,
                   help="per-video BIG proposal pickles "
                        "(features/per_video_val layout)")
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--out_dir", required=True,
                   help="test_boxfeatures output directory")
    p.add_argument("--ckpt_path", default=None,
                   help="detector checkpoint (random init if omitted; "
                        "accepts tools/convert_mega_checkpoint.py output)")
    p.add_argument("--num_classes", type=int, default=35)
    p.add_argument("--resnet_layers", type=str, default="3,4,23")
    p.add_argument("--part", type=int, default=0)
    p.add_argument("--num_parts", type=int, default=1)
    p.add_argument("--window", type=int, default=25)
    p.add_argument("--global_size", type=int, default=10,
                   help="0 disables the MEGA global stage")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="float32",
                   choices=("float32", "bfloat16"))
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    layers = tuple(int(x) for x in args.resnet_layers.split(","))

    videos = sorted(v[:-4] for v in os.listdir(args.proposal_dir)
                    if v.endswith(".pkl"))
    videos = videos[args.part::args.num_parts]

    params = None
    det = None
    for video in videos:
        dst = os.path.join(args.out_dir, video + ".pkl")
        if os.path.exists(dst):
            continue
        with open(os.path.join(args.proposal_dir, video + ".pkl"),
                  "rb") as f:
            proposal = pickle.load(f)["traj_proposal"]
        if det is None:
            # box slots vary per video; the detector module itself is
            # slot-agnostic (advanced_num must just not exceed slots)
            det = MegaDetector(
                num_classes=args.num_classes, resnet_layers=layers,
                base_num=8, advanced_num_override=8,
                window=args.window, key_loc=args.window // 2,
                global_size=args.global_size,
                global_enable=args.global_size > 0)
            if args.ckpt_path:
                params = {"params": restore_params_for_eval(
                    args.ckpt_path, None)}
            else:
                params = init_extractor_params(det, args.frames_dir,
                                               video, 8, args.seed)
        data = extract_video(det, params, proposal, args.frames_dir,
                             video, seed=args.seed,
                             compute_dtype=args.compute_dtype)
        with open(dst, "wb") as f:
            pickle.dump(data, f)
        print(f"{video}: {len(data)} frames")


if __name__ == "__main__":
    main()
