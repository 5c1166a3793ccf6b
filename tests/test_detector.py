"""Detector-stage tests: shapes, masking, scan-vs-loop equivalence of the
ring-buffer memory, and RPN proposal machinery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.models import rpn as rpn_lib
from vrdone_tpu.models.detector import MegaDetector, postprocess_frame
from vrdone_tpu.models.mega import MegaEnhancer, init_memory, scan_video


def test_anchor_grid():
    anchors = rpn_lib.make_anchors(4, 5)
    assert anchors.shape == (4 * 5 * 15, 4)
    # center of first cell's first anchor
    a0 = anchors[0]
    cx = (a0[0] + a0[2]) / 2
    cy = (a0[1] + a0[3]) / 2
    assert abs(cx - 8.0) < 1e-4 and abs(cy - 8.0) < 1e-4


def test_box_coder_roundtrip():
    rng = np.random.default_rng(0)
    ref = rng.uniform(10, 100, (8, 2))
    ref = np.concatenate([ref, ref + rng.uniform(5, 50, (8, 2))], axis=1)
    props = rng.uniform(10, 100, (8, 2))
    props = np.concatenate([props, props + rng.uniform(5, 50, (8, 2))],
                           axis=1)
    deltas = rpn_lib.encode_boxes(jnp.asarray(ref, jnp.float32),
                                  jnp.asarray(props, jnp.float32))
    back = rpn_lib.decode_boxes(jnp.asarray(props, jnp.float32), deltas)
    np.testing.assert_allclose(np.asarray(back), ref, atol=1e-3, rtol=1e-4)


def test_select_proposals_static_shapes():
    rng = np.random.default_rng(1)
    anchors = jnp.asarray(rpn_lib.make_anchors(8, 8))
    n = anchors.shape[0]
    logits = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    deltas = jnp.asarray(
        0.1 * rng.standard_normal((n, 4)).astype(np.float32))
    boxes, scores, valid = rpn_lib.select_proposals(
        anchors, logits, deltas, jnp.asarray([128, 128]),
        pre_nms_top_n=200, post_nms_top_n=50)
    assert boxes.shape == (50, 4) and valid.shape == (50,)
    b = np.asarray(boxes)[np.asarray(valid)]
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 127).all()
    s = np.asarray(scores)[np.asarray(valid)]
    assert (np.diff(s) <= 1e-6).all()  # score-sorted


def test_mega_scan_matches_python_loop():
    """lax.scan ring buffer == explicit python-loop deque semantics."""
    d, n, t, mem = 32, 4, 6, 3
    enh = MegaEnhancer(feat_dim=d, n_head=4, num_stages=1, mem_frames=mem,
                       props_per_frame=n)
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((t, n, d)).astype(np.float32)
    boxes = rng.uniform(0, 100, (t, n, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    valid = rng.random((t, n)) < 0.8
    valid[:, 0] = True

    mem_feat, mem_boxes, mem_valid = init_memory(mem, n, d)
    params = enh.init(jax.random.key(0), jnp.asarray(feats[0]),
                      jnp.asarray(boxes[0]), jnp.asarray(valid[0]),
                      mem_feat, mem_boxes, mem_valid)

    def apply_fn(p, f, b, vl, mf, mb, mv):
        return enh.apply(p, f, b, vl, mf, mb, mv)

    scanned = scan_video(apply_fn, params, jnp.asarray(feats),
                         jnp.asarray(boxes), jnp.asarray(valid),
                         mem_frames=mem)

    # python loop reference
    mf, mb, mv = init_memory(mem, n, d)
    outs = []
    for i in range(t):
        o = apply_fn(params, jnp.asarray(feats[i]), jnp.asarray(boxes[i]),
                     jnp.asarray(valid[i]), mf, mb, mv)
        outs.append(np.asarray(o))
        mf = jnp.roll(mf, -n, axis=0).at[-n:].set(jnp.asarray(feats[i]))
        mb = jnp.roll(mb, -n, axis=0).at[-n:].set(jnp.asarray(boxes[i]))
        mv = jnp.roll(mv, -n, axis=0).at[-n:].set(jnp.asarray(valid[i]))
    np.testing.assert_allclose(np.asarray(scanned), np.stack(outs),
                               atol=1e-5, rtol=1e-5)


def test_enhancer_masks_invalid():
    """Invalid memory slots must not influence the output."""
    d, n, mem = 32, 4, 2
    enh = MegaEnhancer(feat_dim=d, n_head=4, num_stages=1, mem_frames=mem,
                       props_per_frame=n)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    b = jnp.asarray(np.abs(rng.uniform(0, 50, (n, 4))).astype(np.float32))
    b = b.at[:, 2:].add(b[:, :2])
    vl = jnp.ones((n,), bool)
    mf, mb, mv = init_memory(mem, n, d)
    params = enh.init(jax.random.key(0), f, b, vl, mf, mb, mv)
    out1 = np.asarray(enh.apply(params, f, b, vl, mf, mb, mv))
    # scribble on invalid memory slots
    mf2 = mf + 123.0
    out2 = np.asarray(enh.apply(params, f, b, vl, mf2, mb, mv))
    np.testing.assert_allclose(out1, out2, atol=1e-5)


@pytest.mark.slow
def test_detector_end_to_end_shapes():
    det = MegaDetector(num_classes=35, resnet_layers=(1, 1, 1),
                       mem_frames=2, props_per_frame=8, enhancer_stages=1)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 255, (1, 128, 160, 3)).astype(np.float32))

    mf, mb, mv = init_memory(2, 8, 1024)

    def run(m, image):
        c4 = m.features(image)[0]
        return m.detect_frame(c4, jnp.asarray([128, 160]), mf, mb, mv,
                              post_nms_top_n=8)

    params = det.init(jax.random.key(0), img, method=run)
    out = det.apply(params, img, method=run)
    assert out["proposals"].shape == (8, 4)
    assert out["cls_logits"].shape == (8, 36)
    assert out["bbox_deltas"].shape == (8, 4 * 36)
    assert out["visual"].shape == (8, 1024)

    res = postprocess_frame(np.asarray(out["proposals"]),
                            np.asarray(out["cls_logits"]),
                            np.asarray(out["bbox_deltas"]),
                            np.asarray(out["valid"]), (128, 160))
    assert res["boxes"].shape[1] == 4
    assert len(res["scores"]) == len(res["labels"]) == len(res["boxes"])


@pytest.mark.slow
def test_gt_feature_extraction_path():
    det = MegaDetector(num_classes=35, resnet_layers=(1, 1, 1),
                       mem_frames=2, props_per_frame=4, enhancer_stages=1)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 255, (1, 96, 96, 3)).astype(np.float32))
    rois = jnp.asarray(np.array([[4, 4, 40, 40], [10, 20, 60, 80],
                                 [0, 0, 95, 95], [0, 0, 1, 1]], np.float32))
    rois_valid = jnp.asarray([True, True, True, False])
    mf, mb, mv = init_memory(2, 4, 1024)

    def run(m, image):
        c4 = m.features(image)[0]
        return m.extract_box_features(c4, rois, rois_valid, mf, mb, mv)

    params = det.init(jax.random.key(0), img, method=run)
    feats = np.asarray(det.apply(params, img, method=run))
    assert feats.shape == (4, 1024)
    assert np.abs(feats[3]).max() == 0.0  # invalid roi zeroed
    assert np.abs(feats[:3]).max() > 0.0


def test_hflip_boxes_involution():
    from vrdone_tpu.models.detector import hflip_boxes
    rng = np.random.default_rng(0)
    b = rng.uniform(0, 100, (5, 2)).astype(np.float32)
    boxes = np.concatenate([b, b + rng.uniform(5, 30, (5, 2))], axis=1)
    np.testing.assert_allclose(hflip_boxes(hflip_boxes(boxes, 200), 200),
                               boxes)
    flipped = hflip_boxes(boxes, 200)
    assert (flipped[:, 2] > flipped[:, 0]).all()


def test_postprocess_tta_merges_views():
    from vrdone_tpu.models.detector import (postprocess_frame,
                                            postprocess_frame_tta,
                                            hflip_boxes)
    rng = np.random.default_rng(1)
    n, k = 12, 3
    boxes = rng.uniform(0, 60, (n, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 30, (n, 2))],
                           axis=1).astype(np.float32)
    logits = rng.standard_normal((n, k + 1)).astype(np.float32)
    deltas = np.zeros((n, 4 * (k + 1)), np.float32)
    valid = np.ones(n, bool)
    hw = (100, 120)

    single = postprocess_frame(boxes, logits, deltas, valid, hw,
                               score_thresh=0.1)
    # a flipped view with identical content (boxes pre-flipped so they
    # unflip onto the originals) must reproduce the single-view detections
    # (duplicates suppressed by the shared NMS)
    both = postprocess_frame_tta(
        [(boxes, logits, deltas, valid, False),
         (hflip_boxes(boxes, hw[1]), logits, deltas, valid, True)],
        hw, score_thresh=0.1)
    assert len(both["boxes"]) == len(single["boxes"])
    np.testing.assert_allclose(
        np.sort(both["scores"]), np.sort(single["scores"]), atol=1e-6)
