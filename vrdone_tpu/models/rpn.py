"""Region Proposal Network (inference path) for the C4 detector.

Mirrors the behaviour of the reference RPN
(reference datasets/mega/mega_core/modeling/rpn/rpn.py + anchor_generator.py
+ inference.py) with static shapes: fixed anchor grid, static pre-NMS top-k,
XLA NMS to a fixed post-NMS count with validity flags.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import boxes as box_ops

Array = jax.Array

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
STRIDE = 16
BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)


def make_anchors(feat_h: int, feat_w: int,
                 sizes=ANCHOR_SIZES, ratios=ANCHOR_RATIOS,
                 stride: int = STRIDE) -> np.ndarray:
    """(feat_h * feat_w * A, 4) xyxy anchor grid (host-side constant)."""
    base = []
    for s in sizes:
        area = float(s) ** 2
        for r in ratios:
            w = np.sqrt(area / r)
            h = w * r
            base.append([-w / 2, -h / 2, w / 2, h / 2])
    base = np.asarray(base, np.float32)                  # (A, 4)
    xs = (np.arange(feat_w) + 0.5) * stride
    ys = (np.arange(feat_h) + 0.5) * stride
    cx, cy = np.meshgrid(xs, ys)
    shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
    anchors = shifts + base[None]                        # (HW, A, 4)
    return anchors.reshape(-1, 4).astype(np.float32)


def decode_boxes(anchors: Array, deltas: Array,
                 weights=BBOX_REG_WEIGHTS) -> Array:
    """Apply (dx, dy, dw, dh) regression deltas to anchors (Faster-RCNN
    box coder, reference mega_core/modeling/box_coder.py semantics)."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.clip(deltas[:, 2] / ww, None, np.log(1000.0 / 16))
    dh = jnp.clip(deltas[:, 3] / wh, None, np.log(1000.0 / 16))
    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack([
        pred_ctr_x - 0.5 * pred_w, pred_ctr_y - 0.5 * pred_h,
        pred_ctr_x + 0.5 * pred_w, pred_ctr_y + 0.5 * pred_h], axis=1)


def encode_boxes(ref: Array, proposals: Array,
                 weights=BBOX_REG_WEIGHTS) -> Array:
    """Inverse of decode_boxes (for training targets)."""
    wx, wy, ww, wh = weights
    # degenerate (clipped / padded) proposals would put inf/nan into the
    # log-space targets; clamp to 1px (losses gate them out anyway)
    pw = jnp.maximum(proposals[:, 2] - proposals[:, 0], 1.0)
    ph = jnp.maximum(proposals[:, 3] - proposals[:, 1], 1.0)
    px = proposals[:, 0] + 0.5 * pw
    py = proposals[:, 1] + 0.5 * ph
    gw = jnp.maximum(ref[:, 2] - ref[:, 0], 1.0)
    gh = jnp.maximum(ref[:, 3] - ref[:, 1], 1.0)
    gx = ref[:, 0] + 0.5 * gw
    gy = ref[:, 1] + 0.5 * gh
    return jnp.stack([
        wx * (gx - px) / pw, wy * (gy - py) / ph,
        ww * jnp.log(gw / pw), wh * jnp.log(gh / ph)], axis=1)


class RPNHead(nn.Module):
    """3x3 conv + 1x1 objectness / bbox heads over NHWC features."""
    num_anchors: int = len(ANCHOR_SIZES) * len(ANCHOR_RATIOS)

    @nn.compact
    def __call__(self, feat: Array) -> tuple[Array, Array]:
        c = feat.shape[-1]
        h = nn.Conv(c, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.normal(0.01),
                    name="conv")(feat)
        h = jax.nn.relu(h)
        logits = nn.Conv(self.num_anchors, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         name="cls_logits")(h)
        bbox = nn.Conv(self.num_anchors * 4, (1, 1),
                       kernel_init=nn.initializers.normal(0.01),
                       name="bbox_pred")(h)
        return logits, bbox


@functools.partial(jax.jit, static_argnames=("pre_nms_top_n",
                                             "post_nms_top_n", "min_size"))
def select_proposals(anchors: Array, logits: Array, bbox_deltas: Array,
                     image_hw: Array, *, pre_nms_top_n: int = 6000,
                     post_nms_top_n: int = 300, nms_thresh: float = 0.7,
                     min_size: int = 0) -> tuple[Array, Array, Array]:
    """Anchor scores + deltas -> post-NMS proposal set (static shapes).

    anchors: (N, 4); logits: (N,); bbox_deltas: (N, 4); image_hw: (2,).
    Returns (boxes (P, 4), scores (P,), valid (P,)) with P = post_nms_top_n.
    """
    n = anchors.shape[0]
    k = min(pre_nms_top_n, n)
    top_scores, top_idx = jax.lax.top_k(logits, k)
    boxes = decode_boxes(anchors[top_idx], bbox_deltas[top_idx])
    h, w = image_hw[0], image_hw[1]
    boxes = jnp.stack([
        jnp.clip(boxes[:, 0], 0, w - 1), jnp.clip(boxes[:, 1], 0, h - 1),
        jnp.clip(boxes[:, 2], 0, w - 1), jnp.clip(boxes[:, 3], 0, h - 1),
    ], axis=1)
    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    keep = (ws >= min_size) & (hs >= min_size)
    scores = jnp.where(keep, top_scores, -jnp.inf)
    keep_idx, keep_valid = box_ops.nms(boxes, scores, nms_thresh,
                                       max_out=post_nms_top_n)
    out_boxes = boxes[keep_idx]
    out_scores = jax.nn.sigmoid(scores[keep_idx])
    return out_boxes, out_scores, keep_valid
