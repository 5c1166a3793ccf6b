"""RetinaNet single-stage detector (reference
mega_core/modeling/rpn/retinanet/{retinanet,loss,inference}.py +
backbone/fpn.py `build_resnet_fpn_p3p7_backbone`).

No VID config enables it (defaults.py:26 RETINANET_ON=False) but it is
part of the reference's modeling surface: ResNet C3-C5 -> FPN P3-P7 ->
shared conv towers -> per-anchor sigmoid classification + box
regression, trained with sigmoid focal loss and smooth-L1.

Layout is NHWC; anchors reproduce the reference cell-anchor math exactly
(anchor_generator.py:220-290, incl. the historic np.round in
_ratio_enum), golden-tested in tests/test_retinanet.py.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import Conv, FrozenBatchNorm, ResStage
from . import rpn as rpn_lib
from .detector_train import match_boxes, smooth_l1
from ..ops import boxes as box_ops

Array = jax.Array

# reference defaults.py:295-350
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_STRIDES = (8, 16, 32, 64, 128)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
OCTAVE = 2.0
SCALES_PER_OCTAVE = 3
BOX_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def generate_cell_anchors(stride: int, sizes: Sequence[float],
                          ratios: Sequence[float] = ASPECT_RATIOS
                          ) -> np.ndarray:
    """Reference generate_anchors (anchor_generator.py:220-290): windows
    around (0,0,stride-1,stride-1) with the historic rounding."""
    scales = np.asarray(sizes, np.float32) / stride
    ratios = np.asarray(ratios, np.float32)
    base = np.asarray([0, 0, stride - 1, stride - 1], np.float32)

    def whctrs(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mk(ws, hs, xc, yc):
        ws, hs = ws[:, None], hs[:, None]
        return np.hstack([xc - 0.5 * (ws - 1), yc - 0.5 * (hs - 1),
                          xc + 0.5 * (ws - 1), yc + 0.5 * (hs - 1)])

    w, h, xc, yc = whctrs(base)
    ws = np.round(np.sqrt(w * h / ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = mk(ws, hs, xc, yc)
    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, xc, yc = whctrs(ratio_anchors[i])
        out.append(mk(w * scales, h * scales, xc, yc))
    return np.vstack(out).astype(np.float32)


def octave_sizes(base_sizes=ANCHOR_SIZES, octave: float = OCTAVE,
                 scales_per_octave: int = SCALES_PER_OCTAVE):
    """Per-level anchor-size tuples (make_anchor_generator_retinanet,
    anchor_generator.py:146-166)."""
    return [tuple(size * octave ** (i / scales_per_octave)
                  for i in range(scales_per_octave))
            for size in base_sizes]


def level_anchors(feat_h: int, feat_w: int, stride: int,
                  cell: np.ndarray) -> np.ndarray:
    """(H*W*A, 4) anchors; shifts at multiples of the stride (reference
    grid_anchors, anchor_generator.py:73-95 — no half-cell offset)."""
    xs = np.arange(feat_w, dtype=np.float32) * stride
    ys = np.arange(feat_h, dtype=np.float32) * stride
    cx, cy = np.meshgrid(xs, ys)
    shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
    return (shifts + cell[None]).reshape(-1, 4).astype(np.float32)


def _kaiming_a1():
    # conv_with_kaiming_uniform(a=1) == uniform(+-sqrt(3/fan_in))
    return nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


class ResNetBody(nn.Module):
    """Stem + C2..C5 returning the (C3, C4, C5) pyramid (strides
    8/16/32). layers=(3, 4, 23, 3) => ResNet-101."""
    layers: Sequence[int] = (3, 4, 23, 3)
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array, Array]:
        h = Conv(64, 7, stride=2, name="stem")(x)
        h = FrozenBatchNorm(64, name="stem_bn")(h)
        h = jax.nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        h = ResStage(64, self.layers[0], stride=1,
                     stride_in_1x1=self.stride_in_1x1, name="layer1")(h)
        c3 = ResStage(128, self.layers[1], stride=2,
                      stride_in_1x1=self.stride_in_1x1, name="layer2")(h)
        c4 = ResStage(256, self.layers[2], stride=2,
                      stride_in_1x1=self.stride_in_1x1, name="layer3")(c3)
        c5 = ResStage(512, self.layers[3], stride=2,
                      stride_in_1x1=self.stride_in_1x1, name="layer4")(c4)
        return c3, c4, c5


class FPNP3P7(nn.Module):
    """FPN over (C3, C4, C5) plus P6/P7 extra levels (reference fpn.py:7-79
    + LastLevelP6P7 :82-99; build_resnet_fpn_p3p7_backbone wires P6's
    input to C5 when USE_C5, backbone.py:50-71)."""
    out_channels: int = 256
    use_c5: bool = True

    @nn.compact
    def __call__(self, c3: Array, c4: Array, c5: Array) -> list[Array]:
        init = _kaiming_a1()

        def conv(x, k, name, stride=1):
            return nn.Conv(self.out_channels, (k, k), strides=(stride,) * 2,
                           padding=[(k // 2,) * 2] * 2, kernel_init=init,
                           name=name)(x)

        inner5 = conv(c5, 1, "fpn_inner3")
        inner4 = conv(c4, 1, "fpn_inner2")
        inner3 = conv(c3, 1, "fpn_inner1")
        p5 = conv(inner5, 3, "fpn_layer3")
        up5 = jnp.repeat(jnp.repeat(inner5, 2, axis=1), 2, axis=2)
        last4 = inner4 + up5[:, :inner4.shape[1], :inner4.shape[2]]
        p4 = conv(last4, 3, "fpn_layer2")
        up4 = jnp.repeat(jnp.repeat(last4, 2, axis=1), 2, axis=2)
        p3 = conv(inner3 + up4[:, :inner3.shape[1], :inner3.shape[2]], 3,
                  "fpn_layer1")
        p6 = conv(c5 if self.use_c5 else p5, 3, "p6", stride=2)
        p7 = conv(jax.nn.relu(p6), 3, "p7", stride=2)
        return [p3, p4, p5, p6, p7]


class RetinaNetHead(nn.Module):
    """Shared cls/bbox conv towers (reference retinanet.py:13-88)."""
    num_classes: int                       # foreground classes (no bg)
    num_convs: int = 4
    num_anchors: int = len(ASPECT_RATIOS) * SCALES_PER_OCTAVE
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, feats: list[Array]):
        std = nn.initializers.normal(0.01)
        c = feats[0].shape[-1]
        convs = {}
        for tower in ("cls_tower", "bbox_tower"):
            convs[tower] = [nn.Conv(c, (3, 3), padding="SAME",
                                    kernel_init=std,
                                    name=f"{tower}{i}")
                            for i in range(self.num_convs)]
        bias = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding="SAME", kernel_init=std, bias_init=bias,
                          name="cls_logits")
        box_out = nn.Conv(self.num_anchors * 4, (3, 3), padding="SAME",
                          kernel_init=std, name="bbox_pred")

        logits, bbox = [], []
        for f in feats:
            h = f
            for cv in convs["cls_tower"]:
                h = jax.nn.relu(cv(h))
            logits.append(cls_out(h))
            h = f
            for cv in convs["bbox_tower"]:
                h = jax.nn.relu(cv(h))
            bbox.append(box_out(h))
        return logits, bbox


class RetinaNet(nn.Module):
    """backbone -> FPN P3-P7 -> RetinaNetHead (GeneralizedRCNN with
    RETINANET_ON: the rpn IS the detector, roi_heads empty)."""
    num_classes: int
    resnet_layers: Sequence[int] = (3, 4, 23, 3)
    out_channels: int = 256

    def setup(self):
        from .detector import PIXEL_MEAN
        self._pixel_mean = PIXEL_MEAN
        self.body = ResNetBody(self.resnet_layers, name="body")
        self.fpn = FPNP3P7(self.out_channels, name="fpn")
        self.head = RetinaNetHead(self.num_classes, name="head")

    def __call__(self, images: Array, compute_dtype=jnp.float32):
        """images (N, H, W, 3) BGR 0-255 (uint8 fine; cast on device).
        compute_dtype=bfloat16 runs body/FPN/head at half the activation
        bandwidth (pass bf16-cast params alongside). Returns per-level
        (logits, bbox_deltas) lists, NHWC."""
        x = (images.astype(jnp.float32)
             - self._pixel_mean).astype(compute_dtype)
        feats = self.fpn(*self.body(x))
        return self.head(feats)


def flatten_levels(level_outputs: list[Array], last_dim: int) -> Array:
    """[(N, H, W, A*D)...] -> (N, sum(H*W*A), D), anchor-major per cell
    (matches level_anchors ordering)."""
    outs = []
    for x in level_outputs:
        n, h, w, _ = x.shape
        outs.append(x.reshape(n, h * w * (x.shape[-1] // last_dim),
                              last_dim))
    return jnp.concatenate(outs, axis=1)


def all_anchors(image_hw: tuple[int, int],
                strides=ANCHOR_STRIDES) -> np.ndarray:
    """(sum H*W*A, 4) anchors for a padded canvas (host-side constant)."""
    hh, ww = image_hw
    cells = [generate_cell_anchors(s, sz)
             for s, sz in zip(strides, octave_sizes())]
    levels = []
    for stride, cell in zip(strides, cells):
        fh = -(-hh // stride)
        fw = -(-ww // stride)
        levels.append(level_anchors(fh, fw, stride, cell))
    return np.concatenate(levels, axis=0)


def sigmoid_focal_loss(logits: Array, targets_onehot: Array,
                       valid: Array, *, alpha: float = 0.25,
                       gamma: float = 2.0) -> Array:
    """Reference SigmoidFocalLoss semantics (sum over anchors x classes;
    ignored anchors excluded)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets_onehot)
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    a_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    loss = a_t * (1 - p_t) ** gamma * ce
    return jnp.sum(loss * valid[..., None])


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def retinanet_losses(anchors: Array, cls_logits: Array, bbox_deltas: Array,
                     gt_boxes: Array, gt_labels: Array, gt_valid: Array,
                     *, num_classes: int,
                     reg_beta: float = 0.11,
                     reg_norm: float = 4.0) -> dict:
    """Batch loss (reference retinanet/loss.py:43-82). Per-batch
    normalization: cls / (num_pos + N images), reg / (num_pos * 4).

    anchors (A, 4); cls_logits (N, A, K); bbox_deltas (N, A, 4);
    gt_* padded per image with gt_valid masks; labels 1..K."""
    n = cls_logits.shape[0]

    def per_image(gtb, gtl, gtv):
        m = match_boxes(anchors, gtb, gtv, high=0.5, low=0.4,
                        force_match=True)
        tgt = jnp.where(m.labels == 1, gtl[m.matched_idx], 0)
        reg_t = rpn_lib.encode_boxes(gtb[m.matched_idx], anchors,
                                     weights=BOX_WEIGHTS)
        return m.labels, tgt, reg_t

    labels, tgt_cls, reg_t = jax.vmap(per_image)(
        gt_boxes, gt_labels.astype(jnp.int32), gt_valid)
    pos = labels == 1
    n_pos = jnp.sum(pos)

    onehot = (jax.nn.one_hot(tgt_cls - 1, num_classes)
              * pos[..., None])
    cls_loss = sigmoid_focal_loss(cls_logits, onehot,
                                  (labels >= 0).astype(jnp.float32))
    cls_loss = cls_loss / (n_pos + n)

    reg = jnp.sum(smooth_l1(bbox_deltas - reg_t, beta=reg_beta), axis=-1)
    reg_loss = jnp.sum(reg * pos) / jnp.maximum(1.0, n_pos * reg_norm)
    return {"loss_retina_cls": cls_loss, "loss_retina_reg": reg_loss,
            "num_pos": n_pos}


def detect_image(model: RetinaNet, params, image: Array, image_hw,
                 *, pre_nms_top_n: int = 1000, score_thresh: float = 0.05,
                 nms_thresh: float = 0.4, dets_per_img: int = 100,
                 compute_dtype: str = "float32") -> dict:
    """Single-image inference (reference retinanet/inference.py): per-level
    thresholded top-k candidates, decode, clip, class-wise NMS, global
    top dets_per_img. compute_dtype="bfloat16" runs the network in bf16
    (callers pass bf16-cast params for the full win); decode/NMS below
    always run fp32 on the flattened fp32-cast logits/deltas."""
    dt = jnp.dtype(compute_dtype)
    logits_l, bbox_l = model.apply(params, image[None], dt)
    logits_l = [x.astype(jnp.float32) for x in logits_l]
    bbox_l = [x.astype(jnp.float32) for x in bbox_l]
    k = model.num_classes
    anchors = jnp.asarray(all_anchors(
        (int(image.shape[0]), int(image.shape[1]))))
    logits = flatten_levels(logits_l, k)[0]       # (A, K)
    deltas = flatten_levels(bbox_l, 4)[0]         # (A, 4)

    # per-level top pre_nms_top_n candidate anchors by best-class score
    scores = jax.nn.sigmoid(logits)
    best = jnp.max(scores, axis=-1)
    off = 0
    keep_idx = []
    hh, ww = int(image.shape[0]), int(image.shape[1])
    for stride in ANCHOR_STRIDES:
        na = (-(-hh // stride)) * (-(-ww // stride)) * \
            len(ASPECT_RATIOS) * SCALES_PER_OCTAVE
        kl = min(pre_nms_top_n, na)
        _, idx = jax.lax.top_k(best[off:off + na], kl)
        keep_idx.append(idx + off)
        off += na
    cand = jnp.concatenate(keep_idx)
    cand_scores = scores[cand]                    # (C, K)
    boxes = rpn_lib.decode_boxes(anchors[cand], deltas[cand],
                                 weights=BOX_WEIGHTS)
    ihw = jnp.asarray(image_hw, boxes.dtype)
    boxes = jnp.stack([
        jnp.clip(boxes[:, 0], 0, ihw[1] - 1),
        jnp.clip(boxes[:, 1], 0, ihw[0] - 1),
        jnp.clip(boxes[:, 2], 0, ihw[1] - 1),
        jnp.clip(boxes[:, 3], 0, ihw[0] - 1)], axis=1)

    # class-wise NMS via per-class coordinate offsets, one fused pass
    c = boxes.shape[0]
    cls_scores = jnp.where(cand_scores > score_thresh, cand_scores,
                           -jnp.inf).T.reshape(-1)        # (K*C,)
    offs = (jnp.arange(k, dtype=boxes.dtype) *
            (max(hh, ww) + 2.0))[:, None, None]
    boxes_off = (boxes[None] + offs).reshape(-1, 4)
    keep, valid = box_ops.nms(boxes_off, cls_scores, nms_thresh,
                              max_out=dets_per_img)
    out_scores = jnp.where(valid, cls_scores[keep], 0.0)
    out_labels = keep // c + 1
    out_boxes = boxes[keep % c]
    return {"boxes": out_boxes, "scores": out_scores,
            "labels": jnp.where(valid, out_labels, 0), "valid": valid}
