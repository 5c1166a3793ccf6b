"""Detector-stage tests: RPN machinery, whole-video MEGA detection
(enhanced features feed the predictions; memory influences detections),
GT feature extraction, and TTA post-processing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.models import rpn as rpn_lib
from vrdone_tpu.models.detector import (MegaDetector, detect_video,
                                        extract_video_features,
                                        postprocess_frame)


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


def _tiny_detector():
    return MegaDetector(num_classes=5, resnet_layers=(1, 1, 1),
                        stage=2, groups=4, base_num=4, window=3,
                        key_loc=1, global_size=2, global_res_stage=1)


@pytest.mark.slow
def test_detect_video_end_to_end():
    """Whole-video detection: shapes, finiteness, and the MEGA memory
    property — frame t's detections change when an EARLIER frame's
    content changes (the enhanced features feed cls/bbox predictions)."""
    det = _tiny_detector()
    rng = np.random.default_rng(4)
    t = 4
    images = rng.uniform(0, 255, (t, 96, 128, 3)).astype(np.float32)
    hw = np.asarray([96, 128], np.float32)

    from tools.detect_and_track import init_detector_params
    params = init_detector_params(det, images[0], jnp.asarray(hw),
                                  key_post_nms=8)
    out = detect_video(det, params, images, hw, key_post_nms=8)
    assert out["proposals"].shape == (t, 8, 4)
    assert out["cls_logits"].shape == (t, 8, 6)
    assert out["bbox_deltas"].shape == (t, 8, 24)
    assert out["visual"].shape == (t, 8, 1024)
    assert np.isfinite(out["cls_logits"]).all()

    res = postprocess_frame(out["proposals"][0], out["cls_logits"][0],
                            out["bbox_deltas"][0], out["valid"][0],
                            (96, 128))
    assert res["boxes"].shape[1] == 4
    assert len(res["scores"]) == len(res["labels"]) == len(res["boxes"])

    # memory/window influence: change frame 0, logits at frame 3 move
    images2 = images.copy()
    images2[0] = rng.uniform(0, 255, (96, 128, 3)).astype(np.float32)
    out2 = detect_video(det, params, images2, hw, key_post_nms=8)
    diff = np.abs(out2["cls_logits"][3] - out["cls_logits"][3]).max()
    assert diff > 1e-6, "later-frame detections ignore earlier frames"

    # fused pallas position bias (the default above) == dense composition
    out_dense = detect_video(det, params, images, hw, key_post_nms=8,
                             fused_pe_bias=False)
    np.testing.assert_allclose(out["cls_logits"], out_dense["cls_logits"],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(out["visual"], out_dense["visual"],
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_bf16_precompute_parity():
    """Serving fast path: the bf16 backbone/RoI precompute tracks the fp32
    one. NMS keep decisions can flip on near-tied random-init scores, so
    parity is pinned where it is deterministic — the C4 feature map and
    the fc0 features of FIXED rois — and the full detect_video bf16 path
    is smoke-checked (shapes + finiteness; boxes stay fp32-decoded)."""
    det = _tiny_detector()
    rng = np.random.default_rng(11)
    images = rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32)
    hw = np.asarray([96, 128], np.float32)

    from tools.detect_and_track import init_detector_params
    from vrdone_tpu.models.detector import _cast_f32_leaves
    params = init_detector_params(det, images[0], jnp.asarray(hw),
                                  key_post_nms=8)
    bf16_params = _cast_f32_leaves(params, jnp.bfloat16)

    rois = jnp.asarray([[4.0, 4.0, 60.0, 50.0], [20.0, 10.0, 120.0, 90.0]])
    valid = jnp.ones((2,), bool)

    def fwd(m, imgs, dt):
        c4 = m.features(imgs, compute_dtype=dt)
        fc0 = m.frame_fc0(c4[0], rois, valid)
        return c4, fc0

    c4_32, fc0_32 = det.apply(params, jnp.asarray(images),
                              jnp.float32, method=fwd)
    c4_16, fc0_16 = det.apply(bf16_params, jnp.asarray(images),
                              jnp.bfloat16, method=fwd)
    assert c4_16.dtype == jnp.bfloat16
    for a32, a16 in ((c4_32, c4_16), (fc0_32, fc0_16)):
        a16 = np.asarray(a16, np.float32)
        a32 = np.asarray(a32)
        scale = np.abs(a32).max()
        assert np.abs(a16 - a32).max() < 0.05 * scale
        assert np.abs(a16 - a32).mean() < 0.005 * scale

    out = detect_video(det, params, images, hw, key_post_nms=8,
                       compute_dtype="bfloat16")
    assert out["visual"].dtype == np.float32
    assert np.isfinite(out["cls_logits"]).all()
    assert np.isfinite(out["proposals"]).all()


@pytest.mark.slow
def test_bf16_stream_parity():
    """bf16 streaming set-attention tracks the fp32 scan on FIXED fc0
    inputs (deterministic — no RPN/NMS in the loop)."""
    from vrdone_tpu.models.detector import make_mega_head
    from vrdone_tpu.models.mega import (BoxSet, MEGAHead, flatten_set,
                                        global_indices, stream_video)

    det = _tiny_detector()
    head = make_mega_head(det)
    rng = np.random.default_rng(12)
    t, nk, nb, d = 4, 6, 4, 1024
    feats = rng.standard_normal((t, nb, d)).astype(np.float32)
    kfeats = rng.standard_normal((t, nk, d)).astype(np.float32)

    def boxes(n):
        xy = rng.uniform(0, 60, (t, n, 2))
        return np.concatenate([xy, xy + rng.uniform(5, 30, (t, n, 2))],
                              axis=-1).astype(np.float32)

    krois, rrois = boxes(nk), boxes(nb)
    kvalid = np.ones((t, nk), bool)
    rvalid = np.ones((t, nb), bool)
    # init through enhance WITH a global set so the lazy GroupedLinear
    # g_Wv params materialize (setup only declares the submodules)
    glob0 = flatten_set(BoxSet(jnp.asarray(feats[:2]),
                               jnp.asarray(rrois[:2]),
                               jnp.asarray(rvalid[:2])))
    params = head.init(jax.random.key(0), jnp.asarray(kfeats[0]),
                       jnp.asarray(krois[0]), jnp.asarray(kvalid[0]),
                       BoxSet(jnp.asarray(feats[:2]),
                              jnp.asarray(rrois[:2]),
                              jnp.asarray(rvalid[:2])),
                       None, glob0, key_is_fc0=True,
                       method=MEGAHead.enhance)
    gi = global_indices(t, 2)

    kw = dict(key_feat=jnp.asarray(kfeats), key_rois=jnp.asarray(krois),
              key_valid=jnp.asarray(kvalid), key_is_fc0=True,
              ref_feat=jnp.asarray(feats), ref_rois=jnp.asarray(rrois),
              ref_valid=jnp.asarray(rvalid), mem_size=det.window,
              window=det.window, key_loc=det.key_loc, glob_idx=gi)
    v32 = np.asarray(stream_video(head, params, **kw))
    v16 = np.asarray(stream_video(head, params, compute_dtype="bfloat16",
                                  **kw))
    assert v16.dtype == np.float32
    scale = np.abs(v32).max()
    assert np.abs(v16 - v32).max() < 0.05 * scale
    assert np.abs(v16 - v32).mean() < 0.005 * scale


@pytest.mark.slow
def test_gt_feature_extraction_path():
    det = _tiny_detector()
    rng = np.random.default_rng(5)
    t, n = 3, 4
    images = rng.uniform(0, 255, (t, 96, 96, 3)).astype(np.float32)
    rois = np.tile(np.array([[4, 4, 40, 40], [10, 20, 60, 80],
                             [0, 0, 95, 95], [0, 0, 1, 1]], np.float32),
                   (t, 1, 1))
    valid = np.tile(np.array([True, True, True, False]), (t, 1))

    from tools.extract_gt_features import init_extractor_params
    import tempfile
    import os
    from PIL import Image
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(os.path.join(d, "v0"))
        Image.fromarray(images[0].astype(np.uint8)).save(
            os.path.join(d, "v0", "000001.jpg"))
        params = init_extractor_params(det, d, "v0", n)

    feats = extract_video_features(det, params, images, rois, valid,
                                   batch=2)
    assert feats.shape == (t, n, 1024)
    assert np.abs(feats[:, 3]).max() == 0.0  # invalid roi zeroed
    assert np.abs(feats[:, :3]).max() > 0.0


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
        [(boxes, logits, deltas, valid, None),
         (hflip_boxes(boxes, hw[1]), logits, deltas, valid, "hflip")],
        hw, score_thresh=0.1)
    assert len(both["boxes"]) == len(single["boxes"])
    np.testing.assert_allclose(
        np.sort(both["scores"]), np.sort(single["scores"]), atol=1e-6)


def test_postprocess_tta_multiscale():
    """A 2x-scaled view (boxes computed in the scaled frame) must map
    back onto the original detections — reference bbox_aug multi-scale
    semantics (mega_core/engine/bbox_aug.py:33-47)."""
    from vrdone_tpu.models.detector import (postprocess_frame,
                                            postprocess_frame_tta,
                                            scale_boxes, hflip_boxes)
    rng = np.random.default_rng(2)
    n, k = 10, 3
    boxes = rng.uniform(0, 50, (n, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 25, (n, 2))],
                           axis=1).astype(np.float32)
    logits = rng.standard_normal((n, k + 1)).astype(np.float32)
    deltas = np.zeros((n, 4 * (k + 1)), np.float32)
    valid = np.ones(n, bool)
    hw = (100, 120)

    single = postprocess_frame(boxes, logits, deltas, valid, hw,
                               score_thresh=0.1)
    scaled = postprocess_frame_tta(
        [(boxes, logits, deltas, valid, None),
         (scale_boxes(boxes, (2.0, 2.0)), logits, deltas, valid,
          ("scale", 2.0, 2.0))],
        hw, score_thresh=0.1)
    assert len(scaled["boxes"]) == len(single["boxes"])
    np.testing.assert_allclose(np.sort(scaled["scores"]),
                               np.sort(single["scores"]), atol=1e-6)

    # scale+hflip view composes both mappings
    v = hflip_boxes(scale_boxes(boxes, (2.0, 2.0)), hw[1] * 2.0)
    combo = postprocess_frame_tta(
        [(boxes, logits, deltas, valid, None),
         (v, logits, deltas, valid, ("scale_hflip", 2.0, 2.0))],
        hw, score_thresh=0.1)
    assert len(combo["boxes"]) == len(single["boxes"])
    np.testing.assert_allclose(np.sort(combo["scores"]),
                               np.sort(single["scores"]), atol=1e-6)


@pytest.mark.slow
def test_detect_video_tta_end_to_end():
    """Full TTA sweep (identity + hflip + 0.75x scale +- flip): runs all
    views through the model and merges per-class pools in the original
    frame — every returned box must lie inside the original canvas."""
    from vrdone_tpu.models.detector import detect_video_tta

    det = _tiny_detector()
    rng = np.random.default_rng(7)
    t = 3
    images = rng.uniform(0, 255, (t, 96, 128, 3)).astype(np.float32)
    hw = np.asarray([96, 128], np.float32)

    from tools.detect_and_track import init_detector_params
    params = init_detector_params(det, images[0], jnp.asarray(hw),
                                  key_post_nms=8)
    results = detect_video_tta(det, params, images, hw, scales=(0.75,),
                               hflip=True, key_post_nms=8,
                               score_thresh=0.01)
    assert len(results) == t
    for res in results:
        assert set(res) == {"boxes", "scores", "labels"}
        if len(res["boxes"]):
            assert (res["boxes"][:, 0] >= 0).all()
            assert (res["boxes"][:, 2] <= 127).all()
            assert (res["boxes"][:, 3] <= 95).all()
