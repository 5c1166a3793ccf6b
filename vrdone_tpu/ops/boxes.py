"""Box ops for the detection stage: IoU, NMS, RoIAlign.

The reference delegates these to torchvision's compiled C++/CUDA ops
(reference datasets/mega/mega_core/structures/boxlist_ops.py:28,
layers/roi_align.py:47-64). TPU-native versions here are pure XLA with
static shapes:

  * NMS: O(N^2) IoU-suppression sweep via lax.fori_loop over a fixed-size
    candidate set (N is a few hundred pre-NMS proposals — the N^2 matrix is
    one small MXU/VPU tile, far cheaper than a host round-trip),
  * RoIAlign: bilinear gather with a static number of (padded) RoIs,
    matching torchvision's aligned=False, sampling_ratio>0 semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def box_iou(a: Array, b: Array) -> Array:
    """Pairwise IoU. a: (N, 4), b: (M, 4) in xyxy. Returns (N, M)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-9)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms(boxes: Array, scores: Array, iou_threshold: float,
        max_out: int | None = None) -> tuple[Array, Array]:
    """Greedy NMS over a fixed-size box set.

    boxes: (N, 4), scores: (N,) with suppressed/invalid entries at -inf.
    Returns (keep_idx (K,), keep_valid (K,)) where K = max_out or N;
    keep_idx is score-sorted like torchvision.ops.nms.
    """
    n = boxes.shape[0]
    k = max_out if max_out is not None else n
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    iou = box_iou(boxes_s, boxes_s)

    def body(i, alive):
        # if i alive, suppress all j > i with IoU > thr
        row = (iou[i] > iou_threshold) & (jnp.arange(n) > i)
        return jnp.where(alive[i], alive & ~row, alive)

    alive = jnp.isfinite(scores_s)
    alive = jax.lax.fori_loop(0, n, body, alive)
    # survivors, in score order, scattered into the first k output slots
    rank = jnp.cumsum(alive) - 1
    dest = jnp.where(alive & (rank < k), rank, k)  # k -> dropped
    keep_idx = jnp.zeros((k,), jnp.int32).at[dest].set(
        order.astype(jnp.int32), mode="drop")
    keep_valid = jnp.arange(k) < jnp.minimum(jnp.sum(alive), k)
    return keep_idx, keep_valid


@functools.partial(jax.jit,
                   static_argnames=("output_size", "sampling_ratio"))
def roi_align(features: Array, rois: Array, *, spatial_scale: float,
              output_size: tuple[int, int], sampling_ratio: int = 2) -> Array:
    """RoIAlign (torchvision semantics, aligned=False).

    features: (C, H, W); rois: (R, 4) xyxy in image coords.
    Returns (R, C, oh, ow). R is static — pad rois and mask downstream.
    """
    c, h, w = features.shape
    oh, ow = output_size
    sr = sampling_ratio

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    # sample grid: (R, oh*sr) y coords and (R, ow*sr) x coords
    iy = (jnp.arange(oh * sr) // sr)
    off_y = (jnp.arange(oh * sr) % sr + 0.5) / sr
    ys = y1[:, None] + (iy[None, :] + 0.0) * bin_h[:, None] \
        + off_y[None, :] * bin_h[:, None]
    ix = (jnp.arange(ow * sr) // sr)
    off_x = (jnp.arange(ow * sr) % sr + 0.5) / sr
    xs = x1[:, None] + (ix[None, :] + 0.0) * bin_w[:, None] \
        + off_x[None, :] * bin_w[:, None]

    def bilinear(coords, size):
        cc = jnp.clip(coords, 0.0, size - 1.0)
        lo = jnp.floor(cc).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        frac = cc - lo
        return lo, hi, frac

    y_lo, y_hi, fy = bilinear(ys, h)          # (R, oh*sr)
    x_lo, x_hi, fx = bilinear(xs, w)          # (R, ow*sr)

    # Separable bilinear sampling as two einsums over one-hot weight
    # matrices: pooled[r,c,s,t] = sum_hw Wy[r,s,h] Wx[r,t,w] feat[c,h,w].
    # Exactly the same math as 4-point gather+lerp, but it runs on the
    # MXU instead of XLA gather, which is the difference between ~55 ms
    # and ~2 ms per frame for 300 rois at 14x14 on a (1024, 38, 68) map.
    wy = ((1.0 - fy)[..., None] * jax.nn.one_hot(y_lo, h, dtype=fy.dtype)
          + fy[..., None] * jax.nn.one_hot(y_hi, h, dtype=fy.dtype))
    wx = ((1.0 - fx)[..., None] * jax.nn.one_hot(x_lo, w, dtype=fx.dtype)
          + fx[..., None] * jax.nn.one_hot(x_hi, w, dtype=fx.dtype))
    tmp = jnp.einsum("rsh,chw->rscw", wy, features)
    vals = jnp.einsum("rtw,rscw->rcst", wx, tmp)   # (R, C, S_y, S_x)
    r = rois.shape[0]
    # average sr x sr samples per bin
    out = vals.reshape(r, c, oh, sr, ow, sr).mean(axis=(3, 5))
    # torchvision zeroes samples fully outside; with clipping semantics the
    # edge behaviour matches for rois inside the image (our usage: clamped
    # boxes), which golden tests assert
    return out
