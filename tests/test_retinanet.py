"""RetinaNet parity and behavior tests (reference
mega_core/modeling/rpn/retinanet + anchor_generator)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.models import retinanet as RN

from . import oracle


def test_cell_anchors_match_reference():
    """Our cell-anchor math reproduces the reference generate_anchors
    (incl. the historic rounding) for every retinanet level."""
    oracle.load_mega_reference()
    from mega_core.modeling.rpn.anchor_generator import generate_anchors

    for stride, sizes in zip(RN.ANCHOR_STRIDES, RN.octave_sizes()):
        ref = generate_anchors(stride, sizes, RN.ASPECT_RATIOS).numpy()
        ours = RN.generate_cell_anchors(stride, sizes)
        np.testing.assert_allclose(ours, ref, atol=1e-4), stride


def test_level_anchor_grid_matches_reference_shifts():
    """Grid anchors shift by multiples of the stride with no half-cell
    offset (anchor_generator.py grid_anchors :73-95)."""
    cell = RN.generate_cell_anchors(8, (32.0,))
    a = RN.level_anchors(2, 3, 8, cell)
    assert a.shape == (2 * 3 * 3, 4)
    np.testing.assert_allclose(a[3] - a[0], [8, 0, 8, 0])      # +1 col
    np.testing.assert_allclose(a[3 * 3] - a[0], [0, 8, 0, 8])  # +1 row


def test_head_matches_reference_with_transplant():
    """Reference RetinaNetHead forward == ours with transplanted weights
    on a two-level pyramid."""
    import torch

    mega = oracle.load_mega_reference()
    del mega
    from mega_core.modeling.rpn.retinanet.retinanet import RetinaNetHead

    class _CN(dict):
        def __getattr__(self, k):
            return self[k]

    cfg = _CN(MODEL=_CN(RETINANET=_CN(
        NUM_CLASSES=6, ASPECT_RATIOS=(0.5, 1.0, 2.0), SCALES_PER_OCTAVE=3,
        NUM_CONVS=2, PRIOR_PROB=0.01)))
    torch.manual_seed(0)
    ref = RetinaNetHead(cfg, in_channels=16).eval()

    ours = RN.RetinaNetHead(num_classes=5, num_convs=2)
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((1, 8, 8, 16)).astype(np.float32),
             rng.standard_normal((1, 4, 4, 16)).astype(np.float32)]
    params = ours.init(jax.random.key(0), [jnp.asarray(f) for f in feats])

    def conv_w(t):
        return np.asarray(t.detach()).transpose(2, 3, 1, 0)

    p = {"params": {}}
    for tower in ("cls_tower", "bbox_tower"):
        seq = getattr(ref, tower)
        for i, idx in enumerate((0, 2)):   # convs at 0, 2 (relu between)
            p["params"][f"{tower}{i}"] = {
                "kernel": conv_w(seq[idx].weight),
                "bias": np.asarray(seq[idx].bias.detach())}
    p["params"]["cls_logits"] = {
        "kernel": conv_w(ref.cls_logits.weight),
        "bias": np.asarray(ref.cls_logits.bias.detach())}
    p["params"]["bbox_pred"] = {
        "kernel": conv_w(ref.bbox_pred.weight),
        "bias": np.asarray(ref.bbox_pred.bias.detach())}
    jax.tree.map(lambda a, b: None, params["params"], p["params"])

    logits, bbox = ours.apply(p, [jnp.asarray(f) for f in feats])
    with torch.no_grad():
        tfeats = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]
        ref_logits, ref_bbox = ref(tfeats)
    for l, rl in zip(logits, ref_logits):
        np.testing.assert_allclose(
            np.asarray(l), rl.numpy().transpose(0, 2, 3, 1), atol=1e-4)
    for b, rb in zip(bbox, ref_bbox):
        np.testing.assert_allclose(
            np.asarray(b), rb.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_losses_and_grads():
    """Matching thresholds (0.5/0.4 + low-quality), focal normalization
    by (num_pos + N), reg loss vanishes on perfect deltas."""
    anchors = jnp.asarray([[0, 0, 10, 10], [20, 20, 40, 40],
                           [100, 100, 140, 140]], jnp.float32)
    gt_boxes = jnp.asarray([[[0, 0, 10, 10], [0, 0, 0, 0]]], jnp.float32)
    gt_labels = jnp.asarray([[3, 0]])
    gt_valid = jnp.asarray([[True, False]])

    from vrdone_tpu.models.rpn import encode_boxes
    perfect = encode_boxes(jnp.broadcast_to(gt_boxes[0, 0], (3, 4)),
                           anchors, weights=RN.BOX_WEIGHTS)[None]
    logits = jnp.full((1, 3, 5), -10.0).at[0, 0, 2].set(10.0)
    out = RN.retinanet_losses(anchors, logits, perfect, gt_boxes,
                              gt_labels, gt_valid, num_classes=5)
    assert int(out["num_pos"]) == 1
    assert float(out["loss_retina_reg"]) < 1e-6
    assert float(out["loss_retina_cls"]) < 0.05  # confident + correct

    # wrong class -> much larger cls loss; grads flow
    bad_logits = jnp.full((1, 3, 5), -10.0).at[0, 0, 4].set(10.0)
    out_bad = RN.retinanet_losses(anchors, bad_logits, perfect, gt_boxes,
                                  gt_labels, gt_valid, num_classes=5)
    assert float(out_bad["loss_retina_cls"]) > 10 * float(
        out["loss_retina_cls"])

    g = jax.grad(lambda lg: RN.retinanet_losses(
        anchors, lg, perfect, gt_boxes, gt_labels, gt_valid,
        num_classes=5)["loss_retina_cls"])(logits)
    assert np.isfinite(np.asarray(g)).all() and np.abs(g).max() > 0


@pytest.mark.slow
def test_retinanet_detect_smoke():
    """End-to-end detect on a tiny model: shapes, finiteness, and the
    prior-prob bias keeps initial scores near 0.01."""
    model = RN.RetinaNet(num_classes=5, resnet_layers=(1, 1, 1, 1))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (64, 96, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), img[None])
    out = jax.jit(lambda p, im: RN.detect_image(
        model, p, im, jnp.asarray([64, 96]), dets_per_img=20))(params, img)
    assert out["boxes"].shape == (20, 4)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    sc = np.asarray(out["scores"])
    assert ((sc >= 0) | np.isneginf(sc)).all()

    logits, bbox = model.apply(params, img[None])
    assert len(logits) == 5 and len(bbox) == 5
    # strides 8..128 over a 64x96 canvas
    assert logits[0].shape[1:3] == (8, 12)
    assert logits[4].shape[1:3] == (1, 1)  # ceil(64/128), ceil(96/128)
    # prior-prob bias init (retinanet.py:76-78)
    import math
    bias = np.asarray(params["params"]["head"]["cls_logits"]["bias"])
    np.testing.assert_allclose(bias, -math.log((1 - 0.01) / 0.01),
                               rtol=1e-5)
