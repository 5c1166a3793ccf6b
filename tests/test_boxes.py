"""Box ops vs independent numpy oracles (torchvision — the reference's
native-op provider — is not in this image, so the oracles are direct
per-definition implementations: greedy NMS and explicit bilinear RoIAlign
with torchvision's aligned=False sampling semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.ops import boxes as B


def rand_boxes(rng, n, size=200):
    x1 = rng.uniform(0, size - 20, n)
    y1 = rng.uniform(0, size - 20, n)
    x2 = x1 + rng.uniform(5, 60, n)
    y2 = y1 + rng.uniform(5, 60, n)
    return np.stack([x1, y1, np.minimum(x2, size - 1),
                     np.minimum(y2, size - 1)], axis=1).astype(np.float32)


def np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def np_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = np_iou(boxes[i:i + 1], boxes)[0]
        suppressed |= (ious > thr)
        suppressed[i] = True
    return np.asarray(keep)


def np_roi_align(feats, rois, spatial_scale, out_size, sr):
    c, h, w = feats.shape
    oh, ow = out_size
    out = np.zeros((len(rois), c, oh, ow), np.float32)

    def bilin(y, x):
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        fy, fx = y - y0, x - x0
        return ((feats[:, y0, x0] * (1 - fx) + feats[:, y0, x1] * fx)
                * (1 - fy)
                + (feats[:, y1, x0] * (1 - fx) + feats[:, y1, x1] * fx) * fy)

    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * spatial_scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / ow, rh / oh
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(c, np.float32)
                for si in range(sr):
                    for sj in range(sr):
                        y = y1 + i * bh + (si + 0.5) / sr * bh
                        x = x1 + j * bw + (sj + 0.5) / sr * bw
                        acc += bilin(y, x)
                out[r, :, i, j] = acc / (sr * sr)
    return out


def test_box_iou():
    rng = np.random.default_rng(0)
    a, b = rand_boxes(rng, 20), rand_boxes(rng, 15)
    ours = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, np_iou(a, b), atol=1e-5)


@pytest.mark.parametrize("seed,thr", [(0, 0.5), (1, 0.3), (2, 0.7)])
def test_nms_vs_numpy(seed, thr):
    rng = np.random.default_rng(seed)
    boxes = rand_boxes(rng, 64)
    scores = rng.random(64).astype(np.float32)
    keep_idx, keep_valid = B.nms(jnp.asarray(boxes), jnp.asarray(scores), thr)
    ours = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(ours, np_nms(boxes, scores, thr))


def test_nms_max_out():
    rng = np.random.default_rng(3)
    boxes = rand_boxes(rng, 64)
    scores = rng.random(64).astype(np.float32)
    keep_idx, keep_valid = B.nms(jnp.asarray(boxes), jnp.asarray(scores),
                                 0.5, max_out=5)
    assert keep_idx.shape == (5,)
    full = np_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(
        np.asarray(keep_idx)[np.asarray(keep_valid)], full[:5])


@pytest.mark.parametrize("seed,thr", [(0, 0.5), (1, 0.3)])
def test_nms_multiblock_chains(seed, thr):
    """Blocked NMS == greedy oracle across block boundaries: 1000 boxes
    crowded into a small canvas (long suppression chains + resurrection,
    where a suppressed suppressor un-suppresses a later box), block=64
    so ~16 blocks are exercised."""
    rng = np.random.default_rng(seed)
    # crowded: centers in a 100x100 region, sizes 10-40 -> heavy overlap
    cx = rng.uniform(20, 120, (1000, 1))
    cy = rng.uniform(20, 120, (1000, 1))
    w = rng.uniform(10, 40, (1000, 1))
    h = rng.uniform(10, 40, (1000, 1))
    boxes = np.concatenate([cx - w / 2, cy - h / 2, cx + w / 2,
                            cy + h / 2], 1).astype(np.float32)
    scores = rng.random(1000).astype(np.float32)
    keep_idx, keep_valid = B.nms(jnp.asarray(boxes), jnp.asarray(scores),
                                 thr, block=64)
    ours = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(ours, np_nms(boxes, scores, thr))


def test_nms_vmapped_frames():
    """vmap over a frame axis (the chunked serving RPN) matches
    per-frame results."""
    rng = np.random.default_rng(7)
    boxes = np.stack([rand_boxes(rng, 128) for _ in range(4)])
    scores = rng.random((4, 128)).astype(np.float32)
    f = jax.vmap(lambda b, s: B.nms(b, s, 0.5, max_out=20, block=32))
    vi, vv = f(jnp.asarray(boxes), jnp.asarray(scores))
    for t in range(4):
        ki, kv = B.nms(jnp.asarray(boxes[t]), jnp.asarray(scores[t]),
                       0.5, max_out=20, block=32)
        np.testing.assert_array_equal(np.asarray(vi[t]), np.asarray(ki))
        np.testing.assert_array_equal(np.asarray(vv[t]), np.asarray(kv))


def test_nms_neg_inf_scores_excluded():
    rng = np.random.default_rng(5)
    boxes = rand_boxes(rng, 16)
    scores = rng.random(16).astype(np.float32)
    scores[3] = -np.inf
    scores[7] = -np.inf
    keep_idx, keep_valid = B.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.9)
    kept = set(np.asarray(keep_idx)[np.asarray(keep_valid)].tolist())
    assert 3 not in kept and 7 not in kept


@pytest.mark.parametrize("out_size,sr", [((7, 7), 2), ((4, 4), 1)])
def test_roi_align_vs_numpy(out_size, sr):
    rng = np.random.default_rng(4)
    c, h, w = 4, 24, 30
    feats = rng.standard_normal((c, h, w)).astype(np.float32)
    rois = rand_boxes(rng, 5, size=min(h, w) * 4)
    ours = np.asarray(B.roi_align(jnp.asarray(feats), jnp.asarray(rois),
                                  spatial_scale=0.25, output_size=out_size,
                                  sampling_ratio=sr))
    theirs = np_roi_align(feats, rois, 0.25, out_size, sr)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)
