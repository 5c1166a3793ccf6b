"""Mask / keypoint RoI heads: golden parity vs the live reference modules
(reference datasets/mega/mega_core/modeling/roi_heads/{mask,keypoint}_head)
plus target/loss/inference semantics tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import oracle
from vrdone_tpu.models.mask_keypoint import (
    KeypointHead, MaskHead, heatmaps_to_keypoints, keypoint_head_targets,
    keypoint_loss, keypoints_to_heatmap, mask_head_targets, mask_loss,
    paste_masks_in_image, project_masks_on_boxes, select_mask_probs,
    _bilinear_resize)

torch = pytest.importorskip("torch")


def test_mask_head_parity():
    """FPN conv tower + C4 predictor (deconv 2x + 1x1 logits) vs the
    reference modules with transplanted weights."""
    ext, pred = oracle.make_reference_mask_modules(
        num_classes=5, conv_layers=(8, 8), in_channels=6)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4, 4, 6)).astype(np.float32)

    with torch.no_grad():
        h = torch.from_numpy(x.transpose(0, 3, 1, 2))
        for name in ext.blocks:
            h = torch.nn.functional.relu(getattr(ext, name)(h))
        want = pred(h)

    ours = MaskHead(num_classes=5, conv_layers=(8, 8))
    params = {"params": oracle.mask_head_params(ext, pred)}
    got = ours.apply(params, jnp.asarray(x))
    assert got.shape == (3, 8, 8, 5)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=1e-4, atol=1e-4)


def test_mask_head_dilation_parity():
    ext, pred = oracle.make_reference_mask_modules(
        num_classes=3, conv_layers=(4,), in_channels=4, dilation=2, seed=3)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x.transpose(0, 3, 1, 2))
        for name in ext.blocks:
            h = torch.nn.functional.relu(getattr(ext, name)(h))
        want = pred(h)
    ours = MaskHead(num_classes=3, conv_layers=(4,), dilation=2)
    got = ours.apply({"params": oracle.mask_head_params(ext, pred)},
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=1e-4, atol=1e-4)


def test_mask_head_c4_path_shape():
    """conv_layers=() = bare predictor on shared box-head C5 features
    (SHARE_BOX_FEATURE_EXTRACTOR, mask_head.py:67-70)."""
    head = MaskHead(num_classes=4, conv_layers=())
    x = jnp.zeros((2, 7, 7, 16))
    params = head.init(jax.random.key(0), x)
    out = head.apply(params, x)
    assert out.shape == (2, 14, 14, 4)


def test_keypoint_head_parity():
    """conv tower + deconv(k4 s2 p1) + 2x bilinear upsample vs the
    reference (includes interpolate align_corners=False semantics)."""
    ext, pred = oracle.make_reference_keypoint_modules(
        num_keypoints=3, conv_layers=(8, 8), in_channels=4)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)

    with torch.no_grad():
        h = torch.from_numpy(x.transpose(0, 3, 1, 2))
        for name in ext.blocks:
            h = torch.nn.functional.relu(getattr(ext, name)(h))
        want = pred(h)

    ours = KeypointHead(num_keypoints=3, conv_layers=(8, 8))
    params = {"params": oracle.keypoint_head_params(ext, pred)}
    got = ours.apply(params, jnp.asarray(x))
    assert got.shape == (2, 24, 24, 3)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=1e-4, atol=1e-4)


def test_keypoints_to_heatmap_golden():
    """Exact integer parity with reference keypoints_to_heat_map
    (structures/keypoint.py:154-188), incl. boundary snap and
    out-of-box/invisible invalidation."""
    from mega_core.structures.keypoint import keypoints_to_heat_map

    rng = np.random.default_rng(2)
    r, k, hs = 6, 4, 14
    rois = rng.uniform(0, 50, (r, 2))
    rois = np.concatenate([rois, rois + rng.uniform(5, 60, (r, 2))],
                          axis=1).astype(np.float32)
    kp = np.zeros((r, k, 3), np.float32)
    kp[..., 0] = rng.uniform(-10, 120, (r, k))
    kp[..., 1] = rng.uniform(-10, 120, (r, k))
    kp[..., 2] = rng.integers(0, 3, (r, k))
    kp[0, 0, :2] = rois[0, 2:]            # exact boundary snap case
    kp[0, 0, 2] = 2

    want_hm, want_valid = keypoints_to_heat_map(
        torch.from_numpy(kp), torch.from_numpy(rois), hs)
    got_hm, got_valid = keypoints_to_heatmap(
        jnp.asarray(kp), jnp.asarray(rois), hs)
    np.testing.assert_array_equal(np.asarray(got_valid),
                                  oracle.t2n(want_valid))
    # reference leaves garbage bins where valid==0 (multiplied to 0 there
    # too); compare bins only where valid
    v = np.asarray(got_valid).astype(bool)
    np.testing.assert_array_equal(np.asarray(got_hm)[v],
                                  oracle.t2n(want_hm)[v])


def test_mask_loss_matches_torch_bce():
    """Selection + mean semantics vs the reference loss computation
    (mask_head/loss.py:117-121: BCE on positives' own-class channel,
    mean over all elements)."""
    rng = np.random.default_rng(4)
    p, m, k = 5, 4, 6
    logits = rng.standard_normal((p, m, m, k)).astype(np.float32)
    labels = rng.integers(1, k, (p,)).astype(np.int32)
    targets = (rng.uniform(size=(p, m, m)) > 0.5).astype(np.float32)
    pos = np.array([1, 1, 0, 1, 0], np.float32)

    got = mask_loss(jnp.asarray(logits), jnp.asarray(labels),
                    jnp.asarray(pos), jnp.asarray(targets))

    idx = pos.astype(bool)
    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    sel = tl[np.arange(p)[idx], labels[idx]]
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        sel, torch.from_numpy(targets[idx]))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_keypoint_loss_matches_torch_ce():
    """Spatial-softmax CE over valid keypoints vs F.cross_entropy
    (keypoint_head/loss.py:167-177)."""
    rng = np.random.default_rng(5)
    p, h, k = 4, 6, 3
    logits = rng.standard_normal((p, h, h, k)).astype(np.float32)
    heatmaps = rng.integers(0, h * h, (p, k)).astype(np.int32)
    valid = (rng.uniform(size=(p, k)) > 0.4).astype(np.int32)

    got = keypoint_loss(jnp.asarray(logits), jnp.asarray(heatmaps),
                        jnp.asarray(valid))

    tl = torch.from_numpy(
        logits.transpose(0, 3, 1, 2)).reshape(p * k, h * h)
    v = valid.reshape(-1).astype(bool)
    want = torch.nn.functional.cross_entropy(
        tl[v], torch.from_numpy(heatmaps.reshape(-1)[v]).long())
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_project_masks_on_boxes_rectangle():
    """Crop-resize of an axis-aligned rectangle bitmap: bins fully inside
    are 1, fully outside 0."""
    hm, wm = 40, 40
    bitmap = np.zeros((2, hm, wm), np.float32)
    bitmap[0, 10:30, 10:30] = 1.0
    bitmap[1, :, :] = 1.0
    boxes = np.array([[10, 10, 30, 30],      # exactly the rectangle
                      [5, 5, 35, 35]], np.float32)
    m = 8
    t = np.asarray(project_masks_on_boxes(jnp.asarray(bitmap),
                                          jnp.asarray(boxes), m))
    assert t.shape == (2, m, m)
    assert t[0, 2:-2, 2:-2].min() == 1.0     # interior of box 0
    assert t[1].min() == 1.0                 # all-ones bitmap
    # a box fully outside the rectangle
    t2 = np.asarray(project_masks_on_boxes(
        jnp.asarray(bitmap[:1]), jnp.asarray([[32, 32, 39, 39]],
                                             np.float32), m))
    assert t2.max() == 0.0


def test_bilinear_resize_matches_torch():
    rng = np.random.default_rng(6)
    img = rng.standard_normal((7, 9)).astype(np.float32)
    for oh, ow in ((14, 18), (5, 3), (21, 4)):
        got = _bilinear_resize(img, oh, ow)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(img)[None, None], size=(oh, ow),
            mode="bilinear", align_corners=False)[0, 0]
        np.testing.assert_allclose(got, oracle.t2n(want),
                                   rtol=1e-5, atol=1e-5)


def test_paste_masks_golden():
    """Full-image paste vs reference paste_mask_in_image
    (mask_head/inference.py:110-160)."""
    oracle.load_mega_reference()
    from mega_core.modeling.roi_heads.mask_head.inference import (
        paste_mask_in_image)

    rng = np.random.default_rng(7)
    m = 6
    probs = rng.uniform(size=(3, m, m)).astype(np.float32)
    boxes = np.array([[4, 6, 20, 25], [0, 0, 10, 10], [30, 20, 47, 31]],
                     np.float32)
    im_h, im_w = 32, 48
    got = paste_masks_in_image(probs, boxes, (im_h, im_w))
    for i in range(3):
        want = paste_mask_in_image(torch.from_numpy(probs[i]),
                                   torch.from_numpy(boxes[i]),
                                   im_h, im_w)
        agree = (got[i] == oracle.t2n(want).astype(bool)).mean()
        assert agree > 0.99, f"mask {i}: paste agreement {agree}"


def test_heatmap_keypoint_roundtrip():
    """encode (keypoints_to_heatmap) -> peaked logits -> decode
    (heatmaps_to_keypoints) recovers keypoints to within one heatmap bin."""
    rng = np.random.default_rng(8)
    r, k, hs = 3, 2, 28
    rois = np.array([[0, 0, 56, 56], [10, 20, 66, 76], [5, 5, 33, 47]],
                    np.float32)
    kp = np.zeros((r, k, 3), np.float32)
    for i in range(r):
        kp[i, :, 0] = rng.uniform(rois[i, 0] + 1, rois[i, 2] - 1, k)
        kp[i, :, 1] = rng.uniform(rois[i, 1] + 1, rois[i, 3] - 1, k)
    kp[..., 2] = 2

    heatmaps, valid = keypoints_to_heatmap(jnp.asarray(kp),
                                           jnp.asarray(rois), hs)
    assert np.asarray(valid).all()
    maps = np.full((r, hs, hs, k), -10.0, np.float32)
    hm = np.asarray(heatmaps)
    for i in range(r):
        for j in range(k):
            maps[i, hm[i, j] // hs, hm[i, j] % hs, j] = 10.0
    xy, scores = heatmaps_to_keypoints(maps, rois)
    bin_w = (rois[:, 2] - rois[:, 0]) / hs
    bin_h = (rois[:, 3] - rois[:, 1]) / hs
    assert (np.abs(xy[..., 0] - kp[..., 0]) <= 1.5 * bin_w[:, None]).all()
    assert (np.abs(xy[..., 1] - kp[..., 1]) <= 1.5 * bin_h[:, None]).all()
    assert (scores > 0).all()


def test_mask_and_keypoint_targets_pipeline():
    """End-to-end target building on static shapes: matched positives get
    their class + projected mask; keypoint positives need a visible
    keypoint inside the matched box."""
    gt_boxes = jnp.asarray([[8.0, 8.0, 24.0, 24.0],
                            [30.0, 30.0, 44.0, 44.0],
                            [0.0, 0.0, 0.0, 0.0]])
    gt_valid = jnp.asarray([True, True, False])
    gt_labels = jnp.asarray([2, 4, 0])
    bitmaps = np.zeros((3, 48, 48), np.float32)
    bitmaps[0, 8:24, 8:24] = 1
    bitmaps[1, 30:44, 30:44] = 1

    proposals = jnp.asarray([[9.0, 9.0, 23.0, 23.0],     # iou~ gt0
                             [29.0, 31.0, 45.0, 43.0],   # iou~ gt1
                             [0.0, 40.0, 8.0, 47.0],     # background
                             [0.0, 0.0, 0.0, 0.0]])      # padded
    pvalid = jnp.asarray([True, True, True, False])

    labels, pos, targets = mask_head_targets(
        proposals, pvalid, gt_boxes, gt_labels, gt_valid,
        jnp.asarray(bitmaps), m=8)
    pos = np.asarray(pos)
    assert pos.tolist() == [1.0, 1.0, 0.0, 0.0]
    assert np.asarray(labels)[:2].tolist() == [2, 4]
    assert np.asarray(targets)[0].mean() > 0.8   # proposal inside gt mask

    mask_logits = jnp.zeros((4, 8, 8, 6))
    loss = mask_loss(mask_logits, labels, jnp.asarray(pos), targets)
    assert np.isfinite(float(loss))

    kp = np.zeros((3, 2, 3), np.float32)
    kp[0, :, :2] = [[12, 12], [20, 20]]
    kp[0, :, 2] = 2
    kp[1, :, :2] = [[35, 35], [40, 40]]   # visible=0 -> not a positive
    pos_w, heatmaps, kvalid = keypoint_head_targets(
        proposals, pvalid, gt_boxes, gt_valid, jnp.asarray(kp),
        heatmap_size=14)
    assert np.asarray(pos_w).tolist() == [1.0, 0.0, 0.0, 0.0]
    kp_logits = jnp.zeros((4, 14, 14, 2))
    kl = keypoint_loss(kp_logits, heatmaps, kvalid, roi_weight=pos_w)
    np.testing.assert_allclose(float(kl), np.log(14 * 14), rtol=1e-5)


def test_select_mask_probs():
    rng = np.random.default_rng(9)
    logits = rng.standard_normal((3, 4, 4, 5)).astype(np.float32)
    labels = np.array([1, 3, 2])
    got = np.asarray(select_mask_probs(jnp.asarray(logits),
                                       jnp.asarray(labels)))
    for i in range(3):
        want = 1.0 / (1.0 + np.exp(-logits[i, :, :, labels[i]]))
        np.testing.assert_allclose(got[i], want, rtol=1e-5)
