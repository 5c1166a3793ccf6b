"""Raw frames -> detections -> tracklets -> eval proposal pickles.

End-to-end proposal generation with no external dependency: the reference
stack consumes tracklets *released* by VidSGG-BIG; this tool produces the
same per-video {"traj_proposal": ...} pickle from our own detector + IoU
tracker, so the full pipeline (video -> frames -> detections -> tracklets
-> SO-pair relation detection) runs inside this framework. Detection uses
the full MEGA semantics (sliding window + per-stage memory + global set,
models/detector.py detect_video), classifying from the enhanced features.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp

from vrdone_tpu.data.proposals import build_traj_proposal
from vrdone_tpu.data.tracking import IoUTracker
from vrdone_tpu.models.detector import (MegaDetector, detect_video,
                                        postprocess_frame)
from vrdone_tpu.train.checkpoint import restore_params_for_eval


class FrameLoader:
    """Lazy per-frame canvas loader for detect_video."""

    def __init__(self, frames_dir, video, frames, canvas_hw):
        self.frames_dir = frames_dir
        self.video = video
        self.frames = frames
        self.canvas_hw = canvas_hw
        self.image_wh = None

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i):
        from PIL import Image
        img = np.asarray(Image.open(
            os.path.join(self.frames_dir, self.video, self.frames[i])),
            np.float32)[..., ::-1]
        h, w = img.shape[:2]
        self.image_wh = (w, h)
        ch, cw = self.canvas_hw
        canvas = np.zeros((ch, cw, 3), np.float32)
        canvas[:min(h, ch), :min(w, cw)] = img[:ch, :cw]
        return canvas


def init_detector_params(det: MegaDetector, canvas: np.ndarray,
                         image_hw, *, key_post_nms: int, seed: int = 0):
    """Initialize every parameter the detection path touches."""
    from vrdone_tpu.models.mega import BoxSet, flatten_set

    def run(m):
        c4 = m.features(jnp.asarray(canvas[None]))[0]
        kb, _, kv = m.propose(c4, image_hw, post_nms_top_n=key_post_nms)
        rb, _, rv = m.propose(c4, image_hw, post_nms_top_n=det.base_num)
        key_fc0 = m.frame_fc0(c4, kb, kv)
        ref_fc0 = m.frame_fc0(c4, rb, rv)
        win = BoxSet(jnp.repeat(ref_fc0[None], det.window, 0),
                     jnp.repeat(rb[None], det.window, 0),
                     jnp.repeat(rv[None], det.window, 0))
        glob = flatten_set(BoxSet(ref_fc0[None], rb[None], rv[None]))
        x = m.enhance(key_fc0, kb, kv, win, None,
                      glob if det.global_enable else None,
                      key_is_fc0=True)
        return m.box_head.predictions(x)
    return jax.jit(lambda k: det.init(k, method=run))(jax.random.key(seed))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--num_classes", type=int, default=35)
    p.add_argument("--resnet_layers", type=str, default="3,4,23")
    p.add_argument("--canvas", type=int, nargs=2, default=(608, 1088))
    p.add_argument("--score_thresh", type=float, default=0.4)
    p.add_argument("--max_proposal", type=int, default=180)
    p.add_argument("--post_nms_top_n", type=int, default=64,
                   help="key-frame proposals per frame")
    p.add_argument("--base_num", type=int, default=16,
                   help="window/global ref proposals per frame")
    p.add_argument("--window", type=int, default=25)
    p.add_argument("--global_size", type=int, default=10)
    p.add_argument("--part", type=int, default=0)
    p.add_argument("--num_parts", type=int, default=1)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=("float32", "bfloat16"),
                   help="backbone/RoI precompute dtype (bf16 = serving "
                        "fast path; box decode/NMS stay fp32 either way)")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    layers = tuple(int(x) for x in args.resnet_layers.split(","))
    det = MegaDetector(num_classes=args.num_classes, resnet_layers=layers,
                       base_num=args.base_num, window=args.window,
                       key_loc=args.window // 2,
                       global_size=args.global_size,
                       global_enable=args.global_size > 0)
    ch, cw = args.canvas
    image_hw = jnp.asarray(args.canvas)

    videos = sorted(os.listdir(args.frames_dir))[args.part::args.num_parts]
    params = None
    for video in videos:
        dst = os.path.join(args.out_dir, video + ".pkl")
        if os.path.exists(dst):
            continue
        frames = sorted(os.listdir(os.path.join(args.frames_dir, video)))
        loader = FrameLoader(args.frames_dir, video, frames, (ch, cw))
        if params is None:
            if args.ckpt_path:
                params = {"params": restore_params_for_eval(
                    args.ckpt_path, None)}
            else:
                params = init_detector_params(
                    det, loader[0], image_hw,
                    key_post_nms=args.post_nms_top_n)
        out = detect_video(det, params, loader, np.asarray(args.canvas),
                           key_post_nms=args.post_nms_top_n,
                           compute_dtype=args.compute_dtype)

        tracker = IoUTracker()
        for fid in range(len(frames)):
            res = postprocess_frame(
                out["proposals"][fid], out["cls_logits"][fid],
                out["bbox_deltas"][fid], out["valid"][fid],
                tuple(args.canvas), score_thresh=args.score_thresh)
            visual = out["visual"][fid]
            props = out["proposals"][fid]
            feats = np.zeros((len(res["boxes"]), 1024), np.float32)
            if len(res["boxes"]):
                from vrdone_tpu.data.tracking import iou_matrix
                nn = np.argmax(iou_matrix(res["boxes"], props), axis=1)
                feats = visual[nn]
            tracker.update(fid, res["boxes"], res["labels"],
                           res["scores"], feats)
        tracks = tracker.finish()
        w, h = loader.image_wh
        prop = build_traj_proposal(video, tracks, (w, h), len(frames),
                                   max_proposal=args.max_proposal)
        with open(dst, "wb") as f:
            pickle.dump({"traj_proposal": prop}, f)
        print(f"{video}: {prop['num_proposals']} tracklets")


if __name__ == "__main__":
    main()
