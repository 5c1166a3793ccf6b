"""Mask and keypoint RoI heads (Mask-RCNN / Keypoint-RCNN machinery).

The last maskrcnn-benchmark surface the reference carries (reference
datasets/mega/mega_core/modeling/roi_heads/mask_head/{mask_head,
roi_mask_feature_extractors,roi_mask_predictors,loss,inference}.py and
keypoint_head/*). No shipped VID recipe enables them (MASK_ON /
KEYPOINT_ON are False in every config the pipeline runs), but they are
part of the framework's declared component inventory, so they exist here
as first-class static-shape modules:

  * BoxList dissolves into arrays + validity masks, the per-image python
    loops into batched ops;
  * "only positive boxes" (mask_head.py keep_only_positive_boxes) becomes
    a weight mask instead of a dynamic gather;
  * the CPU polygon crop/resize target projection
    (loss.py project_masks_on_boxes) becomes an on-device bilinear
    crop-resize of GT bitmaps via the same separable one-hot-einsum
    trick as ops/boxes.roi_align (MXU, not gather);
  * keypoints_to_heat_map (structures/keypoint.py:154-188) is ported
    exactly (integer math, golden-tested);
  * host-side inference (Masker paste, heatmaps_to_keypoints) stays on
    the host as numpy post-processing, like the detector's
    postprocess_frame.

Deviation pinned here: heatmaps_to_keypoints upsamples per-roi heatmaps
with bilinear interpolation instead of the reference's cv2 INTER_CUBIC
(inference.py:73-75) — argmax locations agree except near plateau ties.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .detector_train import match_boxes

Array = jax.Array


def _kaiming_out(key, shape, dtype=jnp.float32):
    """kaiming_normal_(mode="fan_out", relu) for HWIO conv kernels — the
    Caffe2 MSRAFill init both reference predictors use."""
    fan_out = shape[0] * shape[1] * shape[3]
    std = np.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


class Deconv(nn.Module):
    """torch ConvTranspose2d(k, s, p) on NHWC via zero-insertion
    (lhs_dilation) + a regular VALID-ish conv.

    Kernel stored (kh, kw, in, out) pre-flipped: transplant torch weight
    W (in, out, kh, kw) as W.transpose(2, 3, 0, 1)[::-1, ::-1]."""
    features: int
    kernel: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.param("kernel", _kaiming_out,
                       (self.kernel, self.kernel, in_ch, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = self.kernel - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(y.dtype)


class MaskHead(nn.Module):
    """MaskRCNNFPNFeatureExtractor conv tower + MaskRCNNC4Predictor.

    conv_layers=() degenerates to the bare predictor — the C4 /
    SHARE_BOX_FEATURE_EXTRACTOR path, where the input is the box head's
    (R, 7, 7, 2048) C5 features (mask_head.py:67-70). num_classes counts
    background like the reference channel dim (ROI_BOX_HEAD.NUM_CLASSES).

    (R, res, res, C) pooled features -> (R, 2*res, 2*res, num_classes)
    per-class mask logits."""
    num_classes: int
    conv_layers: Sequence[int] = (256, 256, 256, 256)
    # deconv width; None = conv_layers[-1], the reference's
    # dim_reduced = CONV_LAYERS[-1] (roi_mask_predictors.py:14)
    dim_reduced: int | None = None
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dilation
        for i, ch in enumerate(self.conv_layers):
            x = nn.Conv(ch, (3, 3), padding=[(d, d), (d, d)],
                        kernel_dilation=(d, d),
                        kernel_init=_kaiming_out,
                        name=f"mask_fcn{i + 1}")(x)
            x = jax.nn.relu(x)
        dim = self.dim_reduced if self.dim_reduced is not None else (
            self.conv_layers[-1] if self.conv_layers else 256)
        x = Deconv(dim, 2, 2, 0, name="conv5_mask")(x)
        x = jax.nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=_kaiming_out,
                       name="mask_fcn_logits")(x)


class KeypointHead(nn.Module):
    """KeypointRCNNFeatureExtractor (8x conv3x3-512) +
    KeypointRCNNPredictor (deconv k4 s2 p1, then 2x bilinear upsample,
    align_corners=False == jax.image.resize half-pixel sampling).

    (R, res, res, C) -> (R, 4*res, 4*res, num_keypoints) heatmap logits."""
    num_keypoints: int = 17
    conv_layers: Sequence[int] = (512,) * 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, ch in enumerate(self.conv_layers):
            x = nn.Conv(ch, (3, 3), padding="SAME",
                        kernel_init=_kaiming_out,
                        name=f"conv_fcn{i + 1}")(x)
            x = jax.nn.relu(x)
        x = Deconv(self.num_keypoints, 4, 2, 1, name="kps_score_lowres")(x)
        r, h, w, k = x.shape
        return jax.image.resize(x, (r, 2 * h, 2 * w, k), method="bilinear")


# ---------------------------------------------------------------------------
# Training targets + losses
# ---------------------------------------------------------------------------

def project_masks_on_boxes(gt_bitmaps: Array, boxes: Array, m: int) -> Array:
    """Crop+resize GT bitmaps to per-roi (m, m) binary targets.

    gt_bitmaps: (R, Hm, Wm) each roi's MATCHED gt mask rasterized in image
    coordinates; boxes: (R, 4) xyxy in the same frame. Bilinear sample at
    the m x m bin centers inside each box, thresholded at 0.5 — the
    static-shape equivalent of the reference's per-roi polygon
    crop->resize->get_mask_tensor (mask_head/loss.py:11-42), which it
    matches up to rasterization of the polygon boundary.

    Runs as two one-hot einsums per plane (MXU) like ops/boxes.roi_align.
    """
    r, hm, wm = gt_bitmaps.shape
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # crop width = xmax - xmin, floor 1px (segmentation_mask.py crop)
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    xs = x1[:, None] + (jnp.arange(m) + 0.5)[None, :] / m * bw[:, None]
    ys = y1[:, None] + (jnp.arange(m) + 0.5)[None, :] / m * bh[:, None]

    def weights(coords, size):
        cc = jnp.clip(coords, 0.0, size - 1.0)
        lo = jnp.floor(cc).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        f = cc - lo
        return ((1.0 - f)[..., None] * jax.nn.one_hot(lo, size)
                + f[..., None] * jax.nn.one_hot(hi, size))

    wy = weights(ys, hm)                      # (R, m, Hm)
    wx = weights(xs, wm)                      # (R, m, Wm)
    vals = jnp.einsum("rmh,rhw,rnw->rmn", wy, gt_bitmaps.astype(wy.dtype),
                      wx)
    return (vals >= 0.5).astype(jnp.float32)


def mask_head_targets(proposals: Array, proposals_valid: Array,
                      gt_boxes: Array, gt_labels: Array, gt_valid: Array,
                      gt_bitmaps: Array, m: int, *,
                      fg_iou: float = 0.5, bg_iou: float = 0.5):
    """Match proposals to GT and build mask targets (static shapes).

    Reference MaskRCNNLossComputation.prepare_targets: matcher without
    low-quality matches, positives = matched labels > 0. Returns
    (labels (P,) matched class ids, pos_weight (P,) float 1.0 on
    positives, mask_targets (P, m, m))."""
    match = match_boxes(proposals, gt_boxes, gt_valid,
                        high=fg_iou, low=bg_iou, force_match=False)
    pos = (match.labels == 1) & proposals_valid
    labels = jnp.where(pos, gt_labels[match.matched_idx], 0)
    targets = project_masks_on_boxes(gt_bitmaps[match.matched_idx],
                                     proposals, m)
    return labels, pos.astype(jnp.float32), targets


def mask_loss(mask_logits: Array, labels: Array, pos_weight: Array,
              mask_targets: Array) -> Array:
    """BCE-with-logits on each positive roi's own-class channel, averaged
    over every element of the positive set (reference mask_head/
    loss.py:117-121; F.binary_cross_entropy_with_logits default mean).

    mask_logits: (P, M, M, K); labels: (P,) int class ids; pos_weight:
    (P,) float; mask_targets: (P, M, M) in {0, 1}."""
    sel = jnp.take_along_axis(
        mask_logits, labels[:, None, None, None], axis=-1)[..., 0]
    bce = (jnp.maximum(sel, 0) - sel * mask_targets
           + jnp.log1p(jnp.exp(-jnp.abs(sel))))
    per_roi = jnp.mean(bce, axis=(1, 2))
    denom = jnp.maximum(jnp.sum(pos_weight), 1.0)
    return jnp.sum(pos_weight * per_roi) / denom


def keypoints_to_heatmap(keypoints: Array, rois: Array,
                         heatmap_size: int) -> tuple[Array, Array]:
    """Exact port of reference keypoints_to_heat_map
    (structures/keypoint.py:154-188): linear heatmap bin + validity per
    (roi, keypoint). keypoints: (R, K, 3) xyv; rois: (R, 4)."""
    hs = heatmap_size
    offset_x = rois[:, 0:1]
    offset_y = rois[:, 1:2]
    scale_x = hs / (rois[:, 2:3] - rois[:, 0:1])
    scale_y = hs / (rois[:, 3:4] - rois[:, 1:2])

    x_raw = keypoints[..., 0]
    y_raw = keypoints[..., 1]
    x_boundary = x_raw == rois[:, 2:3]
    y_boundary = y_raw == rois[:, 3:4]
    x = jnp.floor((x_raw - offset_x) * scale_x).astype(jnp.int32)
    y = jnp.floor((y_raw - offset_y) * scale_y).astype(jnp.int32)
    x = jnp.where(x_boundary, hs - 1, x)
    y = jnp.where(y_boundary, hs - 1, y)

    valid_loc = (x >= 0) & (y >= 0) & (x < hs) & (y < hs)
    vis = keypoints[..., 2] > 0
    valid = (valid_loc & vis).astype(jnp.int32)
    heatmaps = (y * hs + x) * valid
    return heatmaps, valid


def keypoint_loss(kp_logits: Array, heatmaps: Array, valid: Array,
                  roi_weight: Array | None = None) -> Array:
    """Spatial-softmax cross entropy over heatmap bins at valid keypoints
    (reference keypoint_head/loss.py:167-177).

    kp_logits: (P, H, W, K); heatmaps: (P, K) linear bin targets;
    valid: (P, K) {0,1}; roi_weight optionally masks sampled rois."""
    p, h, w, k = kp_logits.shape
    flat = kp_logits.transpose(0, 3, 1, 2).reshape(p * k, h * w)
    logp = jax.nn.log_softmax(flat, axis=-1)
    ce = -jnp.take_along_axis(logp, heatmaps.reshape(p * k, 1), axis=-1)[:, 0]
    wgt = valid.astype(jnp.float32)
    if roi_weight is not None:
        wgt = wgt * roi_weight[:, None]
    wgt = wgt.reshape(p * k)
    return jnp.sum(wgt * ce) / jnp.maximum(jnp.sum(wgt), 1.0)


def keypoint_head_targets(proposals: Array, proposals_valid: Array,
                          gt_boxes: Array, gt_valid: Array,
                          gt_keypoints: Array, heatmap_size: int, *,
                          fg_iou: float = 0.5, bg_iou: float = 0.5):
    """Match proposals to GT keypoint sets and build heatmap targets.

    gt_keypoints: (G, K, 3). A positive needs >=1 visible keypoint inside
    the matched box (reference keypoint_head/loss.py _within_box +
    is_visible). Returns (pos_weight (P,), heatmaps (P, K), valid (P, K))
    — heatmap validity is additionally gated by pos_weight in
    keypoint_loss via roi_weight."""
    match = match_boxes(proposals, gt_boxes, gt_valid,
                        high=fg_iou, low=bg_iou, force_match=False)
    kp = gt_keypoints[match.matched_idx]                # (P, K, 3)
    boxes = gt_boxes[match.matched_idx]
    within = ((kp[..., 0] >= boxes[:, 0:1]) & (kp[..., 0] <= boxes[:, 2:3])
              & (kp[..., 1] >= boxes[:, 1:2])
              & (kp[..., 1] <= boxes[:, 3:4]))
    vis = kp[..., 2] > 0
    is_visible = jnp.sum(within & vis, axis=1) > 0
    pos = (match.labels == 1) & proposals_valid & is_visible
    heatmaps, valid = keypoints_to_heatmap(kp, proposals, heatmap_size)
    return pos.astype(jnp.float32), heatmaps, valid


# ---------------------------------------------------------------------------
# Inference post-processing
# ---------------------------------------------------------------------------

def select_mask_probs(mask_logits: Array, labels: Array) -> Array:
    """sigmoid + per-roi predicted-class channel (reference
    MaskPostProcessor.forward): (R, M, M, K), (R,) -> (R, M, M)."""
    probs = jax.nn.sigmoid(mask_logits)
    return jnp.take_along_axis(
        probs, labels[:, None, None, None], axis=-1)[..., 0]


def _bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """numpy bilinear resize, half-pixel centers (align_corners=False) —
    matches torch F.interpolate(mode="bilinear")."""
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def paste_masks_in_image(mask_probs: np.ndarray, boxes: np.ndarray,
                         image_hw, *, thresh: float = 0.5,
                         padding: int = 1) -> np.ndarray:
    """Project per-roi (M, M) mask probabilities into full-image binary
    masks (reference Masker / paste_mask_in_image,
    mask_head/inference.py:110-160): pad by 1, expand the box by the same
    ratio, bilinear-resize to the box, threshold, paste.

    Host numpy, like the detector's postprocess_frame. Returns
    (R, H, W) bool."""
    im_h, im_w = int(image_hw[0]), int(image_hw[1])
    r, m, _ = mask_probs.shape
    out = np.zeros((r, im_h, im_w), bool)
    scale = float(m + 2 * padding) / m
    for i in range(r):
        padded = np.zeros((m + 2 * padding, m + 2 * padding), np.float32)
        padded[padding:-padding or None, padding:-padding or None] = \
            mask_probs[i]
        b = boxes[i].astype(np.float64)
        w_half = (b[2] - b[0]) * 0.5 * scale
        h_half = (b[3] - b[1]) * 0.5 * scale
        x_c = (b[2] + b[0]) * 0.5
        y_c = (b[3] + b[1]) * 0.5
        box = np.array([x_c - w_half, y_c - h_half,
                        x_c + w_half, y_c + h_half]).astype(np.int32)
        w = max(int(box[2] - box[0] + 1), 1)
        h = max(int(box[3] - box[1] + 1), 1)
        resized = _bilinear_resize(padded, h, w) > thresh
        x_0, x_1 = max(box[0], 0), min(box[2] + 1, im_w)
        y_0, y_1 = max(box[1], 0), min(box[3] + 1, im_h)
        if x_1 > x_0 and y_1 > y_0:
            out[i, y_0:y_1, x_0:x_1] = resized[
                y_0 - box[1]:y_1 - box[1], x_0 - box[0]:x_1 - box[0]]
    return out


def heatmaps_to_keypoints(maps: np.ndarray, rois: np.ndarray
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Heatmap logits -> keypoint coordinates + scores (reference
    keypoint_head/inference.py:40-93 semantics; bilinear instead of
    cv2 INTER_CUBIC upsampling — see module docstring).

    maps: (R, H, W, K); rois: (R, 4). Returns (xy_preds (R, K, 3) with
    (x, y, 1), scores (R, K))."""
    r, _, _, k = maps.shape
    xy = np.zeros((r, k, 3), np.float32)
    scores = np.zeros((r, k), np.float32)
    widths = np.maximum(rois[:, 2] - rois[:, 0], 1)
    heights = np.maximum(rois[:, 3] - rois[:, 1], 1)
    for i in range(r):
        rw = int(np.ceil(widths[i]))
        rh = int(np.ceil(heights[i]))
        wc = widths[i] / rw
        hc = heights[i] / rh
        for kk in range(k):
            roi_map = _bilinear_resize(maps[i, :, :, kk], rh, rw)
            pos = roi_map.reshape(-1).argmax()
            x_int = pos % rw
            y_int = pos // rw
            xy[i, kk, 0] = (x_int + 0.5) * wc + rois[i, 0]
            xy[i, kk, 1] = (y_int + 0.5) * hc + rois[i, 1]
            xy[i, kk, 2] = 1.0
            scores[i, kk] = roi_map[y_int, x_int]
    return xy, scores
