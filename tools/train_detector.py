"""Train a video detector (any MODEL.VID.METHOD) on annotated frames.

Counterpart of reference datasets/mega/train_mega.py (+finetune_mega.py),
which trains whichever method the config selects through one entry:
`--method {mega,base,rdn,fgfa,dff}` picks the training scheme:

  * mega (default): key + local / memory / global reference frames
    through the shared backbone, box-head losses on the MEGA-enhanced
    predictions (reference generalized_rcnn_mega.py:_forward_train).
  * base: plain single-frame Faster-RCNN
    (reference generalized_rcnn.py:48-65).
  * rdn: key + REF_NUM sampled refs; box-head losses on RDN-enhanced
    predictions (reference generalized_rcnn_rdn.py:75-106).
  * fgfa: flow-warped cosine-softmax aggregation of ref features; RPN +
    head on the aggregate (reference generalized_rcnn_fgfa.py:107-139).
  * dff: features propagated from one ref frame by flow x scale map
    (reference generalized_rcnn_dff.py:92-115).

Image-dataset (COCO) samples use copies of the key image as reference
frames, exactly like the reference (vid_mega.py:65-73).

Images are resized so the short side matches --min_size — or, with
--min_sizes, a scale sampled per iteration from the tuple (reference
INPUT.MIN_SIZE_TRAIN multi-scale training, transforms/build.py:8-20 +
maskrcnn Resize random.choice) — and padded to a per-scale fixed canvas
so each (aspect-group, scale) pair is one XLA program.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from vrdone_tpu.models.detector import MegaDetector
from vrdone_tpu.models.detector_train import (init_train_params,
                                              sample_ref_indices)
from vrdone_tpu.train.optim import multistep_schedule
from vrdone_tpu.utils.logging import setup_logger


def load_frame(frames_dir, video, idx):
    from PIL import Image
    path = os.path.join(frames_dir, video, f"{idx + 1:06d}.jpg")
    img = np.asarray(Image.open(path), dtype=np.float32)
    return img[..., ::-1]  # BGR


def resize_and_pad(img, boxes, min_size, canvas_hw):
    h, w = img.shape[:2]
    scale = min_size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    from PIL import Image
    im = Image.fromarray(img.astype(np.uint8)[..., ::-1])
    im = im.resize((nw, nh))
    img_r = np.asarray(im, np.float32)[..., ::-1]
    ch, cw = canvas_hw
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:min(nh, ch), :min(nw, cw)] = img_r[:ch, :cw]
    return canvas, boxes * scale, (min(nh, ch), min(nw, cw))


def coco_index(coco_ann: str, images_dir: str):
    """(path, boxes, category_ids, landscape) samples from a COCO-format
    JSON (e.g. the COCO-in-VidVRD subset from tools/build_coco_subset.py)
    — the reference pre-trains MEGA on COCO-21 + VidVRD jointly
    (datasets/mega/configs/MEGA/vidvrd_..._freq5.yaml)."""
    import json as _json
    from collections import defaultdict as _dd
    with open(coco_ann) as f:
        coco = _json.load(f)
    per_img = _dd(list)
    for a in coco["annotations"]:
        x, y, w, h = a["bbox"]
        per_img[a["image_id"]].append(([x, y, x + w, y + h],
                                       a["category_id"]))
    out = []
    for im in coco["images"]:
        anns = per_img.get(im["id"])
        if not anns:
            continue
        boxes = np.asarray([b for b, _ in anns], np.float32)
        cats = np.asarray([c for _, c in anns], np.int64)
        out.append((os.path.join(images_dir, im["file_name"]), boxes, cats,
                    im.get("width", 2) >= im.get("height", 1)))
    return out


def sample_frames(anno):
    """(frame_idx, boxes (N,4), labels (N,)) for frames with annotations."""
    out = []
    tid_to_cat = {so["tid"]: so["category"]
                  for so in anno["subject/objects"]}
    for fid, frame in enumerate(anno["trajectories"]):
        if not frame:
            continue
        boxes = np.asarray([[b["bbox"]["xmin"], b["bbox"]["ymin"],
                             b["bbox"]["xmax"], b["bbox"]["ymax"]]
                            for b in frame], np.float32)
        out.append((fid, boxes, [tid_to_cat[b["tid"]] for b in frame]))
    return out


def _detect_fn_of(method: str):
    """Whole-video detection driver per method, for periodic validation
    (evaluate_video_detections detect_fn)."""
    if method == "mega":
        return None   # evaluate_video_detections default
    if method == "base":
        from vrdone_tpu.models.base_rcnn import base_detect_video
        return base_detect_video
    if method == "rdn":
        from vrdone_tpu.models.rdn import rdn_detect_video
        return rdn_detect_video
    if method == "fgfa":
        from vrdone_tpu.models.flownet import fgfa_detect_video
        return lambda det, params, images, hw: fgfa_detect_video(
            det, params, images, hw)
    from vrdone_tpu.models.flownet import dff_detect_video
    return lambda det, params, images, hw: dff_detect_video(
        det, params, images, hw)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--anno_dir", default=None,
                   help="video annotation JSONs (VidVRD/VidOR mode)")
    p.add_argument("--frames_dir", default=None)
    p.add_argument("--coco_ann", default=None,
                   help="COCO-format instances JSON (image mode; ids must "
                        "already be dataset entity ids, see "
                        "tools/build_coco_subset.py)")
    p.add_argument("--images_dir", default=None)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--dataset", choices=["vidvrd", "vidor"],
                   default="vidvrd")
    p.add_argument("--method", default="mega",
                   choices=["mega", "base", "rdn", "fgfa", "dff"],
                   help="training scheme (reference MODEL.VID.METHOD)")
    p.add_argument("--iters", type=int, default=150000)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--min_size", type=int, default=600)
    p.add_argument("--min_sizes", type=int, nargs="+", default=None,
                   help="multi-scale training: short-side sizes sampled "
                        "per iteration (reference INPUT.MIN_SIZE_TRAIN "
                        "tuple); overrides --min_size")
    p.add_argument("--canvas", type=int, nargs=2, default=(608, 1088))
    p.add_argument("--max_gt", type=int, default=16)
    p.add_argument("--n_local", type=int, default=2,
                   help="local ref frames (reference REF_NUM_LOCAL)")
    p.add_argument("--n_mem", type=int, default=3,
                   help="memory ref frames (reference REF_NUM_MEM)")
    p.add_argument("--n_glob", type=int, default=2,
                   help="global ref frames (reference REF_NUM_GLOBAL)")
    p.add_argument("--base_num", type=int, default=75,
                   help="ref proposals per frame (REF_POST_NMS_TOP_N)")
    p.add_argument("--post_nms_top_n", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=1,
                   help="samples per step; sharded over the dp mesh when "
                        "divisible by the device count (reference "
                        "IMS_PER_BATCH over DDP ranks)")
    p.add_argument("--log_interval", type=int, default=50)
    p.add_argument("--save_interval", type=int, default=10000)
    p.add_argument("--eval_interval", type=int, default=0,
                   help=">0: run detector evaluation on --val_anno_dir "
                        "every N iters")
    p.add_argument("--val_anno_dir", default=None)
    p.add_argument("--val_frames_dir", default=None)
    p.add_argument("--val_videos", type=int, default=5,
                   help="videos per validation sweep")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resnet_layers", type=str, default="3,4,23",
                   help="C2,C3,C4 block counts (3,4,23 = R-101)")
    p.add_argument("--cfg", default=None,
                   help="detector YAML in the reference's nested layout "
                        "(configs/detector/*.yaml; the reference's own "
                        "configs/MEGA/*.yaml parse too). CLI flags set "
                        "to non-default values override it.")
    p.add_argument("--backbone_pkl", default=None,
                   help="converted torchvision ResNet pickle "
                        "(tools/convert_torch_resnet.py) to seed C4/C5 — "
                        "replaces catalog://ImageNetPretrained")
    p.add_argument("--init_ckpt", default=None,
                   help="detector checkpoint to finetune from "
                        "(weights-only; reference finetune_mega.py)")
    p.add_argument("--resume", action="store_true", default=False,
                   help="continue from the newest detector_*.ckpt in "
                        "--exp_dir, restoring optimizer state and "
                        "iteration (reference Checkpointer "
                        "last_checkpoint behavior)")
    p.add_argument("--lr_rate", type=float, default=1.0,
                   help="finetune lr multiplier "
                        "(reference finetune_mega.py:93-96)")
    p.add_argument("--frame_stride", type=int, default=1,
                   help="sample every Nth annotated frame (reference "
                        "VidVRDtrain_freq5 image-index lists use 5)")
    p.add_argument("--hflip_prob", type=float, default=0.5,
                   help="train-time random horizontal flip (reference "
                        "INPUT.HORIZONTAL_FLIP_PROB_TRAIN, transforms/"
                        "build.py:9,41); flips the key and all reference "
                        "frames of a sample together")
    p.add_argument("--group_aspect", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="aspect-ratio grouped batching (reference "
                        "GroupedBatchSampler / ASPECT_RATIO_GROUPING): "
                        "each batch is all-landscape or all-portrait and "
                        "uses a matching canvas orientation — at most two "
                        "XLA programs, no wasted padding compute")
    args = p.parse_args()

    cfg = None
    if args.cfg:
        from vrdone_tpu.detector_config import load_detector_config
        cfg = load_detector_config(args.cfg)
        for name, v in (("method", cfg.method), ("lr", cfg.base_lr),
                        ("iters", cfg.max_iter),
                        ("base_num", cfg.ref_post_nms_top_n),
                        ("n_local", cfg.ref_num_local),
                        ("n_mem", cfg.ref_num_mem),
                        ("n_glob", cfg.ref_num_global),
                        ("batch_size", cfg.ims_per_batch),
                        ("resnet_layers",
                         ",".join(map(str, cfg.resnet_layers)))):
            if getattr(args, name) == p.get_default(name):
                setattr(args, name, v)

    from vrdone_tpu.data.category import get_vocab
    entity_vocab, _ = get_vocab(args.dataset)
    name_to_id = {v: k for k, v in entity_vocab.items()}
    num_classes = len(entity_vocab) - 1

    os.makedirs(args.exp_dir, exist_ok=True)
    logger = setup_logger("TrainDetector",
                          os.path.join(args.exp_dir, "logfile"))

    if args.min_sizes is None:
        if cfg is not None and args.min_size == p.get_default("min_size"):
            args.min_sizes = [int(s) for s in cfg.min_size_train]
        else:
            args.min_sizes = [args.min_size]
    args.min_size = args.min_sizes[0]

    layers = tuple(int(x) for x in args.resnet_layers.split(","))
    method = args.method
    if method == "mega":
        det_kw = dict(num_classes=num_classes, resnet_layers=layers,
                      base_num=args.base_num,
                      memory_enable=args.n_mem > 0,
                      global_enable=args.n_glob > 0)
        if cfg is not None:
            det_kw.update(stage=cfg.stage, groups=cfg.groups,
                          global_res_stage=cfg.global_res_stage,
                          ratio=cfg.ratio, window=cfg.mega_window,
                          key_loc=cfg.mega_key_loc,
                          global_size=cfg.global_size,
                          memory_enable=cfg.memory_enable
                          and args.n_mem > 0,
                          global_enable=cfg.global_enable
                          and args.n_glob > 0)
        det = MegaDetector(**det_kw)
    elif method == "base":
        from vrdone_tpu.models.base_rcnn import BaseDetector
        det = BaseDetector(num_classes=num_classes, resnet_layers=layers)
    elif method == "rdn":
        from vrdone_tpu.models.rdn import RDNDetector
        det = RDNDetector(
            num_classes=num_classes, resnet_layers=layers,
            base_num=args.base_num,
            base_stage=cfg.stage if cfg else 2,
            advanced_stage=cfg.advanced_stage if cfg else 0,
            groups=cfg.groups if cfg else 16,
            ratio=cfg.rdn_ratio if cfg else 0.2,
            window=cfg.rdn_window if cfg else 37,
            key_loc=cfg.rdn_key_loc if cfg else 18)
    elif method == "fgfa":
        from vrdone_tpu.models.flownet import FGFADetector
        det = FGFADetector(num_classes=num_classes, resnet_layers=layers,
                           window=cfg.fgfa_window if cfg else 19,
                           key_loc=cfg.fgfa_key_loc if cfg else 9)
    else:
        from vrdone_tpu.models.flownet import DFFDetector
        det = DFFDetector(num_classes=num_classes, resnet_layers=layers)

    from vrdone_tpu.models.detector_train import (METHOD_REF_OFFSETS,
                                                  sample_method_refs)
    if method == "mega":
        n_refs = None
    else:
        n_refs = METHOD_REF_OFFSETS[method][2]
        if cfg is not None and method in ("rdn", "fgfa"):
            n_refs = getattr(cfg, f"{method}_ref_num")

    rng = np.random.default_rng(args.seed)
    assert args.coco_ann or args.anno_dir, \
        "need --coco_ann and/or --anno_dir"

    # datasets concatenate (reference DATASETS.TRAIN tuples, e.g.
    # ("COCO_train_21classes", "COCO_val_21classes", "VidVRDtrain_freq5"),
    # mega_core/data/build.py:18-60): any mix of COCO-image and
    # video-annotation sources forms one sample pool
    coco_samples, index, annos = [], [], {}
    if args.coco_ann:
        assert args.images_dir, "--images_dir required with --coco_ann"
        coco_samples = coco_index(args.coco_ann, args.images_dir)
        logger.info(f"COCO source: {len(coco_samples)} images")
    if args.anno_dir:
        assert args.frames_dir
        videos = sorted(v[:-5] for v in os.listdir(args.anno_dir)
                        if v.endswith(".json"))
        for v in videos:
            with open(os.path.join(args.anno_dir, v + ".json")) as f:
                annos[v] = json.load(f)
        index = [(v, *s) for v in videos
                 for s in sample_frames(annos[v])[::args.frame_stride]]
        logger.info(f"video source: {len(videos)} videos, {len(index)} "
                    f"frames (stride {args.frame_stride})")

    def load_coco(i):
        """COCO image mode: reference frames are copies of the key frame
        (reference vid_mega.py:65-73 / vid_rdn.py:34-35)."""
        from PIL import Image
        path, boxes, cats_ids, _ = coco_samples[i]
        img = np.asarray(Image.open(path).convert("RGB"),
                         np.float32)[..., ::-1]
        cats = np.asarray(cats_ids, np.int32)
        if method != "mega":
            return img, [img] * n_refs, [], [], boxes, cats
        return img, [img] * args.n_local, [img] * args.n_mem, \
            [img] * args.n_glob, boxes, cats

    def load_video(i):
        v, fid, boxes, cats = index[i]
        seg_len = len(annos[v]["trajectories"])
        labels = np.asarray([name_to_id[c] for c in cats], np.int32)
        if method != "mega":
            ref_ids = sample_method_refs(rng, method, fid, seg_len,
                                         ref_num=n_refs)
            return (load_frame(args.frames_dir, v, fid),
                    [load_frame(args.frames_dir, v, int(j))
                     for j in ref_ids],
                    [], [], boxes, labels)
        refs = sample_ref_indices(rng, fid, seg_len,
                                  n_local=args.n_local,
                                  n_mem=args.n_mem,
                                  n_glob=args.n_glob)
        return (load_frame(args.frames_dir, v, fid),
                [load_frame(args.frames_dir, v, int(j))
                 for j in refs["local"]],
                [load_frame(args.frames_dir, v, int(j))
                 for j in refs["mem"]],
                [load_frame(args.frames_dir, v, int(j))
                 for j in refs["glob"]],
                boxes, labels)

    def load_sample(i):
        if i < len(coco_samples):
            return load_coco(i)
        return load_video(i - len(coco_samples))

    n_samples = len(coco_samples) + len(index)
    sample_landscape = [s[3] for s in coco_samples] + \
        [annos[v]["width"] >= annos[v]["height"] for v, *_ in index]

    # aspect-ratio groups (reference GroupedBatchSampler,
    # mega_core/data/samplers/grouped_batch_sampler.py): homogeneous
    # batches, one canvas orientation per group
    lo, hi = min(args.canvas), max(args.canvas)
    canvas_of = {True: (lo, hi), False: (hi, lo)}   # landscape / portrait
    if args.group_aspect:
        groups = {g: [i for i in range(n_samples)
                      if sample_landscape[i] == g]
                  for g in (True, False)}
        groups = {g: ix for g, ix in groups.items() if ix}
    else:
        canvas_of = {True: tuple(args.canvas), False: tuple(args.canvas)}
        groups = {True: list(range(n_samples))}
    group_keys = sorted(groups)
    group_weights = np.asarray([len(groups[g]) for g in group_keys],
                               np.float64)
    group_weights /= group_weights.sum()
    logger.info("aspect groups: " + ", ".join(
        f"{'landscape' if g else 'portrait'}={len(groups[g])}"
        for g in group_keys))

    def pack(img, boxes, ref_imgs, canvas_hw, min_size):
        canvas, boxes_r, _ = resize_and_pad(img, boxes, min_size,
                                            canvas_hw)
        packed = []
        for group in ref_imgs:
            cs = [resize_and_pad(r, np.zeros((0, 4), np.float32),
                                 min_size, canvas_hw)[0]
                  for r in group]
            packed.append(np.stack(cs) if cs else
                          np.zeros((0, *canvas_hw, 3), np.float32))
        return canvas, boxes_r, packed

    # per-(aspect-group, scale) canvases: the --canvas dims correspond to
    # the first scale in --min_sizes; other scales get proportionally
    # scaled canvases rounded up to the 32-pixel feature-grid quantum
    base_ms = args.min_sizes[0]

    def round32(x):
        return int(np.ceil(x / 32) * 32)

    canvas_hw_of = {
        (g, ms): tuple(round32(d * ms / base_ms) for d in canvas_of[g])
        for g in group_keys for ms in args.min_sizes}
    if len(args.min_sizes) > 1:
        logger.info(f"multi-scale training: min_sizes={args.min_sizes}, "
                    f"canvases={canvas_hw_of}")

    g0 = group_keys[0]
    img0, loc0, mem0, glob0, boxes0, _ = load_sample(groups[g0][0])
    canvas0, _, (locc0, memc0, globc0) = pack(img0, boxes0,
                                              [loc0, mem0, glob0],
                                              canvas_of[g0], base_ms)

    t0 = time.time()
    if method == "mega":
        params = init_train_params(
            det, jax.random.key(args.seed), jnp.asarray(canvas0),
            jnp.asarray(locc0),
            jnp.asarray(memc0) if args.n_mem else None,
            jnp.asarray(globc0) if args.n_glob else None,
            jnp.asarray(canvas_of[g0]),
            post_nms_top_n=args.post_nms_top_n)
    else:
        from vrdone_tpu.models.detector_train import \
            init_method_train_params
        params = init_method_train_params(
            method, det, jax.random.key(args.seed),
            {"key": jnp.asarray(canvas0), "ref": jnp.asarray(locc0)},
            jnp.asarray(canvas_of[g0]),
            post_nms_top_n=args.post_nms_top_n)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    logger.info(f"detector params: {n_params} "
                f"(init {time.time() - t0:.1f}s)")

    if args.backbone_pkl:
        import pickle
        from vrdone_tpu.models.detector_train import graft_backbone
        with open(args.backbone_pkl, "rb") as f:
            params = graft_backbone(params, pickle.load(f))
        logger.info(f"backbone seeded from {args.backbone_pkl}")
    if args.init_ckpt:
        from vrdone_tpu.models.detector_train import load_finetune_params
        params = load_finetune_params(params, args.init_ckpt)
        logger.info(f"finetuning from {args.init_ckpt}")

    args.lr *= args.lr_rate     # finetune rescale (finetune_mega.py:93-96)
    from vrdone_tpu.train.optim import detector_sgd
    schedule = multistep_schedule(
        args.lr,
        warmup_steps=cfg.warmup_iters if cfg else 500,
        milestones=(tuple(cfg.steps) if cfg else
                    (int(args.iters * 2 / 3), int(args.iters * 8 / 9))),
        gamma=cfg.gamma if cfg else 0.1,
        warmup_start_lr=args.lr * (cfg.warmup_factor if cfg else 1 / 3))
    tx = detector_sgd(
        schedule, params,
        momentum=cfg.momentum if cfg else 0.9,
        weight_decay=cfg.weight_decay if cfg else 1e-4,
        bias_lr_factor=cfg.bias_lr_factor if cfg else 2.0,
        weight_decay_bias=cfg.weight_decay_bias if cfg else 0.0)
    opt_state = tx.init(params)

    from vrdone_tpu.models.detector_train import (make_detector_train_step,
                                                  make_method_train_step)
    from vrdone_tpu.parallel.mesh import make_mesh, shard_batch
    if method == "mega":
        steps = {key: make_detector_train_step(
            det, tx, image_hw=canvas_hw_of[key],
            post_nms_top_n=args.post_nms_top_n)
            for key in canvas_hw_of}
    else:
        steps = {key: make_method_train_step(
            method, det, tx, image_hw=canvas_hw_of[key],
            post_nms_top_n=args.post_nms_top_n)
            for key in canvas_hw_of}
    n_dev = len(jax.devices())
    n_dp = n_dev if args.batch_size % n_dev == 0 else 1
    mesh = make_mesh(n_dp=n_dp)
    logger.info(f"batch {args.batch_size} over dp={n_dp} mesh, "
                f"method={method}")

    def make_batch(gk, ms):
        bs = args.batch_size
        g = args.max_gt
        members = groups[gk]
        batch = {"key": [], "local": [], "mem": [], "glob": [],
                 "gt_boxes": np.zeros((bs, g, 4), np.float32),
                 "gt_labels": np.zeros((bs, g), np.int32),
                 "gt_valid": np.zeros((bs, g), bool)}
        for i in range(bs):
            img, loc_i, mem_i, glob_i, boxes, cats = load_sample(
                members[int(rng.integers(0, len(members)))])
            if rng.random() < args.hflip_prob:
                from vrdone_tpu.models.detector import hflip_boxes
                w_img = img.shape[1]
                boxes = hflip_boxes(np.asarray(boxes, np.float32), w_img)
                img = img[:, ::-1]
                loc_i = [r[:, ::-1] for r in loc_i]
                mem_i = [r[:, ::-1] for r in mem_i]
                glob_i = [r[:, ::-1] for r in glob_i]
            canvas, boxes_r, (locc, memc, globc) = pack(
                img, boxes, [loc_i, mem_i, glob_i],
                canvas_hw_of[(gk, ms)], ms)
            batch["key"].append(canvas)
            batch["local"].append(locc)
            batch["mem"].append(memc)
            batch["glob"].append(globc)
            n = min(len(boxes_r), g)
            batch["gt_boxes"][i, :n] = boxes_r[:n]
            batch["gt_labels"][i, :n] = cats[:n]
            batch["gt_valid"][i, :n] = True
        for k in ("key", "local", "mem", "glob"):
            batch[k] = np.stack(batch[k])
        if method != "mega":
            # key/ref contract of make_method_train_step
            batch["ref"] = batch.pop("local")
            del batch["mem"], batch["glob"]
        return batch

    start_it = 0
    if args.resume:
        import glob as _glob
        import orbax.checkpoint as ocp
        ckpts = sorted(
            _glob.glob(os.path.join(args.exp_dir, "detector_*.ckpt")),
            key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
        if ckpts:
            path = os.path.abspath(ckpts[-1])
            template = {"params": params["params"], "opt_state": opt_state,
                        "it": np.zeros((), np.int64)}
            restored = ocp.StandardCheckpointer().restore(path, template)
            params = {**params, "params": restored["params"]}
            opt_state = restored["opt_state"]
            start_it = int(restored["it"])
            logger.info(f"resumed from {path} at iteration {start_it}")
        else:
            logger.info("--resume: no checkpoint found, starting fresh")

    from vrdone_tpu.utils.metric_logger import MetricLogger
    meters = MetricLogger()
    key = jax.random.key(args.seed)
    t0 = time.time()
    t_data = time.time()
    for it in range(start_it, args.iters):
        gk = group_keys[int(rng.choice(len(group_keys), p=group_weights))]
        # per-iteration scale sampling (reference MIN_SIZE_TRAIN tuple ->
        # maskrcnn Resize random.choice, transforms/build.py:8-20)
        ms = int(rng.choice(args.min_sizes))
        batch = make_batch(gk, ms)
        data_time = time.time() - t_data

        with mesh:
            sharded = shard_batch(mesh, {k: jnp.asarray(v)
                                         for k, v in batch.items()})
            params, opt_state, losses = steps[(gk, ms)](
                params, opt_state, sharded, jax.random.fold_in(key, it))

        meters.update(data_time=data_time,
                      batch_time=time.time() - t_data,
                      **{k: float(x) for k, x in losses.items()})
        t_data = time.time()
        if it % args.log_interval == 0:
            logger.info(f"[{it}/{args.iters}] {meters}"
                        f"  lr={float(schedule(it)):.2e}"
                        f"  {time.time() - t0:.1f}s")
        if (it + 1) % args.save_interval == 0 or it + 1 == args.iters:
            import orbax.checkpoint as ocp
            path = os.path.abspath(
                os.path.join(args.exp_dir, f"detector_{it + 1}.ckpt"))
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, {"params": params["params"],
                              "opt_state": opt_state,
                              "it": np.asarray(it + 1, np.int64)},
                       force=True)
            ckptr.wait_until_finished()
            logger.info(f"saved {path}")
        if (args.eval_interval and (it + 1) % args.eval_interval == 0
                and args.val_anno_dir):
            from vrdone_tpu.eval.detection import evaluate_video_detections
            stats = evaluate_video_detections(
                det, params, args.val_anno_dir,
                args.val_frames_dir or args.frames_dir,
                name_to_id=name_to_id, min_size=args.min_size,
                canvas=args.canvas, max_videos=args.val_videos,
                detect_fn=_detect_fn_of(method))
            logger.info(f"[{it + 1}] detector eval: " + "  ".join(
                f"{k}={v:.4f}" for k, v in stats.items()))


if __name__ == "__main__":
    main()
