"""Raw frames -> detections -> tracklets -> eval proposal pickles.

End-to-end proposal generation with no external dependency: the reference
stack consumes tracklets *released* by VidSGG-BIG; this tool produces the
same per-video {"traj_proposal": ...} pickle from our own detector + IoU
tracker, so the full pipeline (video -> frames -> detections -> tracklets
-> SO-pair relation detection) runs inside this framework.
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
from vrdone_tpu.models.detector import MegaDetector, postprocess_frame
from vrdone_tpu.models.mega import init_memory
from vrdone_tpu.train.checkpoint import restore_params_for_eval


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
    p.add_argument("--post_nms_top_n", type=int, default=64)
    p.add_argument("--part", type=int, default=0)
    p.add_argument("--num_parts", type=int, default=1)
    args = p.parse_args()

    from PIL import Image
    os.makedirs(args.out_dir, exist_ok=True)
    layers = tuple(int(x) for x in args.resnet_layers.split(","))
    det = MegaDetector(num_classes=args.num_classes, resnet_layers=layers,
                       props_per_frame=args.post_nms_top_n)
    mem0 = init_memory(det.mem_frames, args.post_nms_top_n, 1024)
    ch, cw = args.canvas
    image_hw = jnp.asarray(args.canvas)

    @jax.jit
    def detect(params, image, mem):
        c4 = det.apply(params, image,
                       method=lambda m, im: m.features(im))[0]
        out = det.apply(params, c4, image_hw, *mem,
                        method=lambda m, c, hw, mf, mb, mv:
                        m.detect_frame(c, hw, mf, mb, mv,
                                       post_nms_top_n=args.post_nms_top_n))
        mf, mb, mv = mem
        n = out["proposals"].shape[0]
        mf = jnp.roll(mf, -n, axis=0).at[-n:].set(out["visual"])
        mb = jnp.roll(mb, -n, axis=0).at[-n:].set(out["proposals"])
        mv = jnp.roll(mv, -n, axis=0).at[-n:].set(out["valid"])
        return out, (mf, mb, mv)

    videos = sorted(os.listdir(args.frames_dir))[args.part::args.num_parts]
    params = None
    for video in videos:
        dst = os.path.join(args.out_dir, video + ".pkl")
        if os.path.exists(dst):
            continue
        frames = sorted(os.listdir(os.path.join(args.frames_dir, video)))
        tracker = IoUTracker()
        mem = mem0
        for fid, fname in enumerate(frames):
            img = np.asarray(Image.open(
                os.path.join(args.frames_dir, video, fname)),
                np.float32)[..., ::-1]
            h, w = img.shape[:2]
            canvas = np.zeros((ch, cw, 3), np.float32)
            canvas[:min(h, ch), :min(w, cw)] = img[:ch, :cw]
            if params is None:
                if args.ckpt_path:
                    params = {"params": restore_params_for_eval(
                        args.ckpt_path, None)}
                else:
                    def init_run(m, im):
                        c4 = m.features(im)[0]
                        return m.detect_frame(
                            c4, image_hw, *mem0,
                            post_nms_top_n=args.post_nms_top_n)
                    params = det.init(jax.random.key(0),
                                      jnp.asarray(canvas[None]),
                                      method=init_run)
            out, mem = detect(params, jnp.asarray(canvas[None]), mem)
            res = postprocess_frame(
                np.asarray(out["proposals"]), np.asarray(out["cls_logits"]),
                np.asarray(out["bbox_deltas"]), np.asarray(out["valid"]),
                (h, w), score_thresh=args.score_thresh)
            # per-box visual features: nearest proposal's enhanced feature
            visual = np.asarray(out["visual"])
            props = np.asarray(out["proposals"])
            feats = np.zeros((len(res["boxes"]), 1024), np.float32)
            if len(res["boxes"]):
                from vrdone_tpu.data.tracking import iou_matrix
                nn = np.argmax(iou_matrix(res["boxes"], props), axis=1)
                feats = visual[nn]
            tracker.update(fid, res["boxes"], res["labels"],
                           res["scores"], feats)
        tracks = tracker.finish()
        prop = build_traj_proposal(video, tracks, (w, h), len(frames),
                                   max_proposal=args.max_proposal)
        with open(dst, "wb") as f:
            pickle.dump({"traj_proposal": prop}, f)
        print(f"{video}: {prop['num_proposals']} tracklets")


if __name__ == "__main__":
    main()
