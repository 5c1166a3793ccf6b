"""Video object detector (MEGA-equivalent): ResNet-C4 + RPN + RoI head with
relation-attention feature enhancement.

This is the offline feature producer of the stack (reference layer L9,
SURVEY.md §1): it exists to (a) detect/track entities and (b) emit the
per-frame 1024-d RoI visual features the relation model consumes. The
reference implementation is maskrcnn-benchmark's GeneralizedRCNN{MEGA}
(reference datasets/mega/mega_core/modeling/detector/generalized_rcnn_mega.py)
with stateful deque memory; here every stage is static-shape and the video
dimension is a lax.scan (see models/mega.py).

Weights: the reference starts from a Caffe2 R-101 catalog checkpoint. No
pretrained weights ship in this environment; tools/convert_torch_resnet.py
transplants torchvision-format ResNet state dicts when available.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import boxes as box_ops
from . import rpn as rpn_lib
from .mega import MegaEnhancer
from .resnet import ResNetC4, ResNetC5Head

Array = jax.Array

# ImageNet mean/std in BGR order, matching the Caffe2-lineage preprocessing
# (reference mega_core/config/defaults.py PIXEL_MEAN)
PIXEL_MEAN = np.array([102.9801, 115.9465, 122.7717], np.float32)


class BoxHead(nn.Module):
    """RoIAlign(14x14) on C4 -> C5 stage -> pooled features + predictors."""
    num_classes: int
    c5_blocks: int = 3

    def setup(self):
        self.c5 = ResNetC5Head(self.c5_blocks, name="c5")
        self.cls_score = nn.Dense(self.num_classes + 1,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name="cls_score")
        self.bbox_pred = nn.Dense(4 * (self.num_classes + 1),
                                  kernel_init=nn.initializers.normal(0.001),
                                  name="bbox_pred")
        self.to_visual = nn.Dense(1024, name="to_visual")

    def pooled_features(self, c4_feat: Array, rois: Array) -> Array:
        """c4_feat: (H, W, C) NHWC single image; rois: (R, 4).
        Returns (R, 2048)."""
        chw = c4_feat.transpose(2, 0, 1)
        crops = box_ops.roi_align(chw, rois, spatial_scale=1.0 / 16,
                                  output_size=(14, 14), sampling_ratio=2)
        crops = crops.transpose(0, 2, 3, 1)       # (R, 14, 14, C) NHWC
        return self.c5(crops)

    def visual_features(self, c4_feat: Array, rois: Array) -> Array:
        """The 1024-d per-box visual feature the relation model consumes."""
        return self.to_visual(self.pooled_features(c4_feat, rois))

    def predictions(self, pooled: Array) -> tuple[Array, Array]:
        return self.cls_score(pooled), self.bbox_pred(pooled)


class MegaDetector(nn.Module):
    """Full per-frame detector with relation-attention enhancement."""
    num_classes: int
    resnet_layers: tuple[int, ...] = (3, 4, 23)
    mem_frames: int = 25
    props_per_frame: int = 16
    enhancer_stages: int = 2

    def setup(self):
        self.backbone = ResNetC4(self.resnet_layers, name="backbone")
        self.rpn_head = rpn_lib.RPNHead(name="rpn")
        self.box_head = BoxHead(self.num_classes, name="box_head")
        self.enhancer = MegaEnhancer(
            feat_dim=1024, num_stages=self.enhancer_stages,
            mem_frames=self.mem_frames,
            props_per_frame=self.props_per_frame, name="enhancer")

    def features(self, images: Array) -> Array:
        """images: (N, H, W, 3) raw pixels -> C4 features (N, H/16, W/16, C).
        Mean subtraction happens here (BGR channel order expected)."""
        x = images - PIXEL_MEAN
        return self.backbone(x)

    def propose(self, c4_feat: Array, image_hw: Array, *,
                pre_nms_top_n: int = 6000, post_nms_top_n: int = 300
                ) -> tuple[Array, Array, Array]:
        """Single image: c4_feat (H', W', C) -> (boxes, scores, valid)."""
        logits, deltas = self.rpn_head(c4_feat[None])
        hp, wp, a = logits.shape[1], logits.shape[2], logits.shape[3]
        anchors = jnp.asarray(rpn_lib.make_anchors(hp, wp))
        logits = logits[0].reshape(-1)
        deltas = deltas[0].reshape(hp * wp * a, 4)
        return rpn_lib.select_proposals(
            anchors, logits, deltas, image_hw,
            pre_nms_top_n=pre_nms_top_n, post_nms_top_n=post_nms_top_n)

    def extract_box_features(self, c4_feat: Array, rois: Array,
                             rois_valid: Array, mem_feat: Array,
                             mem_boxes: Array, mem_valid: Array) -> Array:
        """GT-box / proposal feature extraction for one frame, enhanced by
        the memory (the FeatureExtractor path,
        reference datasets/mega/feature_extractor_vidvrd.py:92-120)."""
        visual = self.box_head.visual_features(c4_feat, rois)
        visual = visual * rois_valid[:, None].astype(visual.dtype)
        return self.enhancer(visual, rois, rois_valid,
                             mem_feat, mem_boxes, mem_valid)

    def detect_frame(self, c4_feat: Array, image_hw: Array,
                     mem_feat: Array, mem_boxes: Array, mem_valid: Array,
                     *, post_nms_top_n: int = 300
                     ) -> dict:
        """Single-frame detection with enhancement. Returns raw per-proposal
        (boxes, cls_logits, bbox_deltas, valid) for host post-processing."""
        boxes, scores, valid = self.propose(c4_feat, image_hw,
                                            post_nms_top_n=post_nms_top_n)
        pooled = self.box_head.pooled_features(c4_feat, boxes)
        visual = self.box_head.to_visual(pooled)
        visual = self.enhancer(visual, boxes, valid,
                               mem_feat, mem_boxes, mem_valid)
        cls_logits, bbox_deltas = self.box_head.predictions(pooled)
        return {"proposals": boxes, "proposal_scores": scores,
                "valid": valid, "cls_logits": cls_logits,
                "bbox_deltas": bbox_deltas, "visual": visual}


def _decode_candidates(boxes, cls_logits, bbox_deltas, valid, image_hw,
                       score_thresh):
    """Per-class decoded candidate pools: {class: (boxes, scores)}."""
    num_classes = cls_logits.shape[1] - 1
    probs = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    h, w = image_hw
    out = {}
    for c in range(1, num_classes + 1):
        scores_c = probs[:, c]
        keep = (scores_c > score_thresh) & valid
        if not keep.any():
            continue
        deltas_c = bbox_deltas[keep, 4 * c:4 * (c + 1)]
        boxes_c = np.array(rpn_lib.decode_boxes(
            jnp.asarray(boxes[keep]), jnp.asarray(deltas_c),
            weights=(10.0, 10.0, 5.0, 5.0)))
        boxes_c[:, 0::2] = boxes_c[:, 0::2].clip(0, w - 1)
        boxes_c[:, 1::2] = boxes_c[:, 1::2].clip(0, h - 1)
        out[c] = (boxes_c, scores_c[keep])
    return out


def hflip_boxes(boxes: np.ndarray, width: float) -> np.ndarray:
    """Mirror xyxy boxes around the vertical image axis."""
    out = boxes.copy()
    out[:, 0] = width - 1 - boxes[:, 2]
    out[:, 2] = width - 1 - boxes[:, 0]
    return out


def postprocess_frame(boxes: np.ndarray, cls_logits: np.ndarray,
                      bbox_deltas: np.ndarray, valid: np.ndarray,
                      image_hw, *, score_thresh: float = 0.05,
                      nms_thresh: float = 0.5,
                      dets_per_img: int = 100) -> dict:
    """Per-class decode + NMS (host-side numpy; mirrors maskrcnn-benchmark
    PostProcessor semantics). Returns dict of boxes/scores/labels arrays."""
    return postprocess_frame_tta(
        [(boxes, cls_logits, bbox_deltas, valid, False)], image_hw,
        score_thresh=score_thresh, nms_thresh=nms_thresh,
        dets_per_img=dets_per_img)


def postprocess_frame_tta(views, image_hw, *, score_thresh: float = 0.05,
                          nms_thresh: float = 0.5,
                          dets_per_img: int = 100) -> dict:
    """Decode + NMS over one or more augmented views.

    views: list of (boxes, cls_logits, bbox_deltas, valid, flipped) — the
    horizontal-flip test-time augmentation of the reference's bbox_aug
    (reference mega_core/engine/bbox_aug.py semantics): flipped views are
    decoded in their own frame, mirrored back, and all candidate pools
    share one per-class NMS.
    """
    h, w = image_hw
    merged: dict[int, list] = {}
    for boxes, cls_logits, bbox_deltas, valid, flipped in views:
        cands = _decode_candidates(boxes, cls_logits, bbox_deltas, valid,
                                   image_hw, score_thresh)
        for c, (bx, sc) in cands.items():
            if flipped:
                bx = hflip_boxes(bx, w)
            merged.setdefault(c, []).append((bx, sc))

    out_boxes, out_scores, out_labels = [], [], []
    for c, pools in merged.items():
        boxes_c = np.concatenate([b for b, _ in pools])
        scores_c = np.concatenate([s for _, s in pools])
        keep_idx, keep_valid = box_ops.nms(
            jnp.asarray(boxes_c), jnp.asarray(scores_c), nms_thresh)
        ki = np.asarray(keep_idx)[np.asarray(keep_valid)]
        out_boxes.append(boxes_c[ki])
        out_scores.append(scores_c[ki])
        out_labels.append(np.full(len(ki), c, np.int64))
    if not out_boxes:
        return {"boxes": np.zeros((0, 4), np.float32),
                "scores": np.zeros((0,), np.float32),
                "labels": np.zeros((0,), np.int64)}
    boxes = np.concatenate(out_boxes)
    scores = np.concatenate(out_scores)
    labels = np.concatenate(out_labels)
    order = np.argsort(-scores)[:dets_per_img]
    return {"boxes": boxes[order], "scores": scores[order],
            "labels": labels[order]}
