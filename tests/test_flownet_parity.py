"""Golden parity: FlowNetS / EmbedNet / warp / FGFA / DFF vs the
reference (datasets/mega/mega_core/modeling/backbone/{flownet,embednet}
.py, detector/generalized_rcnn_{fgfa,dff}.py)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tests import oracle
from vrdone_tpu.models.flownet import (DFF, FGFA, EmbedNet, FlowNetS,
                                       avg_pool_ceil, cosine_weights)
from vrdone_tpu.ops.warp import grid_sample_bilinear, warp_features

torch = pytest.importorskip("torch")

H, W = 64, 96


@pytest.fixture(scope="module")
def refs():
    return oracle.load_flownet_reference()


def test_avg_pool_ceil_parity():
    rng = np.random.default_rng(0)
    for h, w in [(8, 8), (7, 9), (5, 5)]:
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        want = torch.nn.AvgPool2d(2, stride=2, ceil_mode=True)(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
        got = avg_pool_ceil(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   oracle.t2n(want), rtol=1e-5, atol=1e-5)


def test_grid_sample_parity():
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 9, 13, 4)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 6, 7, 2)).astype(np.float32)
    want = torch.nn.functional.grid_sample(
        torch.from_numpy(feats.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid), mode="bilinear", padding_mode="border",
        align_corners=False)
    got = grid_sample_bilinear(jnp.asarray(feats), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=1e-4, atol=1e-5)


def test_warp_features_matches_reference_resample(refs):
    """get_grid + resample composition (fgfa.py:46-62), including the
    reference's align_corners grid/sample mismatch."""
    _, _, fgfa_mod, _ = refs
    M = fgfa_mod.GeneralizedRCNNFGFA.__new__(fgfa_mod.GeneralizedRCNNFGFA)
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((3, 8, 12, 5)).astype(np.float32)
    flow = (3 * rng.standard_normal((3, 2, 8, 12))).astype(np.float32)
    with torch.no_grad():
        want = M.resample(torch.from_numpy(feats.transpose(0, 3, 1, 2)),
                          torch.from_numpy(flow))
    got = warp_features(jnp.asarray(feats),
                        jnp.asarray(flow.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("method", ["fgfa", "dff"])
def test_flownet_parity(refs, method):
    ref_flownet, _, _, _ = refs
    M = oracle.make_reference_flownet(ref_flownet, method=method, seed=5)
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, H, W, 6)).astype(np.float32)
    with torch.no_grad():
        want = M(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    ours = FlowNetS(dff_scale=method == "dff")
    params = {"params": oracle.flownet_params(M)}
    got = ours.apply(params, jnp.asarray(x))
    if method == "dff":
        for g, wnt in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g).transpose(0, 3, 1, 2), oracle.t2n(wnt),
                rtol=5e-4, atol=5e-4)
    else:
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), oracle.t2n(want),
            rtol=5e-4, atol=5e-4)


def test_embednet_parity(refs):
    _, ref_embednet, _, _ = refs
    torch.manual_seed(4)
    M = ref_embednet.EmbedNet(None).eval()
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 6, 7, 1024)).astype(np.float32)
    with torch.no_grad():
        want = M(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = EmbedNet().apply({"params": oracle.embednet_params(M)},
                           jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=2e-4, atol=2e-4)


def test_fgfa_train_aggregation_parity(refs):
    """Full train composition (fgfa.py:108-132): flow, warp, embed,
    cosine softmax, weighted sum."""
    ref_flownet, ref_embednet, fgfa_mod, _ = refs
    FN = oracle.make_reference_flownet(ref_flownet, "fgfa", seed=6)
    torch.manual_seed(7)
    EN = ref_embednet.EmbedNet(None).eval()
    G = fgfa_mod.GeneralizedRCNNFGFA.__new__(fgfa_mod.GeneralizedRCNNFGFA)

    rng = np.random.default_rng(6)
    r = 2
    img_cur = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    imgs_ref = rng.uniform(0, 255, (r, H, W, 3)).astype(np.float32)
    feats_cur = rng.standard_normal((1, H // 16, W // 16, 1024)).astype(
        np.float32)
    feats_refs = rng.standard_normal((r, H // 16, W // 16, 1024)).astype(
        np.float32)

    with torch.no_grad():
        tc = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))
        pair = torch.cat([tc(img_cur).repeat(r, 1, 1, 1) / 255,
                          tc(imgs_ref) / 255], dim=1)
        flow = FN(pair)
        warped = G.resample(tc(feats_refs), flow)
        embeds = EN(torch.cat([tc(feats_cur), warped], dim=0))
        e_cur, e_refs = torch.split(embeds, (1, r), dim=0)
        wgt = torch.nn.functional.softmax(
            G.compute_weight(e_refs, e_cur), dim=0)
        want = torch.sum(wgt * warped, dim=0, keepdim=True)

    model = FGFA()
    params = {"params": {"flownet": oracle.flownet_params(FN),
                         "embednet": oracle.embednet_params(EN)}}
    got = model.apply(params, jnp.asarray(img_cur), jnp.asarray(imgs_ref),
                      jnp.asarray(feats_cur), jnp.asarray(feats_refs))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=2e-3, atol=2e-3)


def test_dff_propagation_parity(refs):
    """DFF: warp key features by flow and multiply by the scale map
    (dff.py:92-109)."""
    ref_flownet, _, fgfa_mod, _ = refs
    FN = oracle.make_reference_flownet(ref_flownet, "dff", seed=8)
    G = fgfa_mod.GeneralizedRCNNFGFA.__new__(fgfa_mod.GeneralizedRCNNFGFA)

    rng = np.random.default_rng(8)
    img_cur = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img_key = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    feats_key = rng.standard_normal((1, H // 16, W // 16, 1024)).astype(
        np.float32)

    with torch.no_grad():
        tc = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))
        flow, scale = FN(torch.cat([tc(img_cur) / 255, tc(img_key) / 255],
                                   dim=1))
        want = G.resample(tc(feats_key), flow) * scale

    model = DFF()
    params = {"params": {"flownet": oracle.flownet_params(FN)}}
    got = model.apply(params, jnp.asarray(img_cur), jnp.asarray(img_key),
                      jnp.asarray(feats_key))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=2e-3, atol=2e-3)


def test_cosine_weights_sum_to_one():
    rng = np.random.default_rng(9)
    refs_e = jnp.asarray(rng.standard_normal((4, 5, 6, 16)).astype(
        np.float32))
    cur_e = jnp.asarray(rng.standard_normal((1, 5, 6, 16)).astype(
        np.float32))
    w = cosine_weights(refs_e, cur_e)
    np.testing.assert_allclose(np.asarray(w.sum(axis=0)), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_fgfa_detector_smoke():
    """FGFADetector end to end: aggregation feeds RPN + 2-FC head; the
    reference frames influence the detections."""
    import jax

    from vrdone_tpu.models.flownet import FGFADetector

    det = FGFADetector(num_classes=5, resnet_layers=(1, 1, 1))
    rng = np.random.default_rng(10)
    img_cur = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(
        np.float32))
    imgs_ref = jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)).astype(
        np.float32))
    hw = jnp.asarray([64, 96])

    def run(m, cur, refs):
        return m.detect_frame(cur, refs, hw, post_nms_top_n=8)

    params = jax.jit(lambda k: det.init(k, img_cur, imgs_ref,
                                        method=run))(jax.random.key(0))
    out = jax.jit(lambda c, r: det.apply(params, c, r, method=run))(
        img_cur, imgs_ref)
    assert out["cls_logits"].shape == (8, 6)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()

    imgs_ref2 = jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)).astype(
        np.float32))
    out2 = jax.jit(lambda c, r: det.apply(params, c, r, method=run))(
        img_cur, imgs_ref2)
    assert np.abs(np.asarray(out2["cls_logits"])
                  - np.asarray(out["cls_logits"])).max() > 1e-6


@pytest.mark.slow
def test_dff_detector_smoke():
    """DFFDetector: non-key frame detections come from warped key
    features; changing the key features changes the detections."""
    import jax

    from vrdone_tpu.models.flownet import DFFDetector

    det = DFFDetector(num_classes=5, resnet_layers=(1, 1, 1))
    rng = np.random.default_rng(11)
    img_cur = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(
        np.float32))
    img_key = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(
        np.float32))
    hw = jnp.asarray([64, 96])

    def init_run(m, cur, key):
        feats_key = m.features(key)
        return m.detect_frame(cur, key, feats_key, hw, post_nms_top_n=8)

    params = jax.jit(lambda k: det.init(k, img_cur, img_key,
                                        method=init_run))(jax.random.key(0))

    @jax.jit
    def detect(cur, key):
        return det.apply(params, cur, key, method=init_run)

    out = detect(img_cur, img_key)
    assert out["cls_logits"].shape == (8, 6)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()
    img_key2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(
        np.float32))
    out2 = detect(img_cur, img_key2)
    assert np.abs(np.asarray(out2["cls_logits"])
                  - np.asarray(out["cls_logits"])).max() > 1e-6


@pytest.mark.slow
def test_fgfa_detect_video_driver():
    """Whole-video FGFA driver: batched precompute + per-frame window
    aggregation; window frames influence detections."""
    import jax

    from vrdone_tpu.models.flownet import FGFADetector, fgfa_detect_video

    det = FGFADetector(num_classes=5, resnet_layers=(1, 1, 1), window=3,
                       key_loc=1)
    rng = np.random.default_rng(12)
    t = 3
    images = rng.uniform(0, 255, (t, 64, 96, 3)).astype(np.float32)
    hw = np.asarray([64, 96], np.float32)

    def init_run(m, cur, refs):
        return m.detect_frame(cur, refs, jnp.asarray(hw),
                              post_nms_top_n=8)

    params = jax.jit(lambda k: det.init(
        k, jnp.asarray(images[:1]), jnp.asarray(images[1:]),
        method=init_run))(jax.random.key(0))

    out = fgfa_detect_video(det, params, images, hw, post_nms_top_n=8)
    assert out["cls_logits"].shape == (t, 8, 6)
    assert np.isfinite(out["cls_logits"]).all()

    images2 = images.copy()
    images2[2] = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    out2 = fgfa_detect_video(det, params, images2, hw, post_nms_top_n=8)
    # frame 1's window is [0,1,2] -> its logits move; frame 0's window is
    # [0,0,1] (prefill clamps, generalized_rcnn_fgfa.py:163-185) -> fixed
    assert np.abs(out2["cls_logits"][1] - out["cls_logits"][1]).max() > 1e-6
    np.testing.assert_allclose(out2["cls_logits"][0], out["cls_logits"][0],
                               atol=1e-6)


@pytest.mark.slow
def test_dff_detect_video_driver():
    """DFF driver: key frames run the backbone, others warp key features;
    a non-key frame's detections depend on its key frame."""
    import jax

    from vrdone_tpu.models.flownet import DFFDetector, dff_detect_video

    det = DFFDetector(num_classes=5, resnet_layers=(1, 1, 1))
    rng = np.random.default_rng(13)
    t = 4
    images = rng.uniform(0, 255, (t, 64, 96, 3)).astype(np.float32)
    hw = np.asarray([64, 96], np.float32)

    def init_run(m, cur, key):
        feats_key = m.features(key)
        return m.detect_frame(cur, key, feats_key, jnp.asarray(hw),
                              post_nms_top_n=8)

    params = jax.jit(lambda k: det.init(
        k, jnp.asarray(images[:1]), jnp.asarray(images[1:2]),
        method=init_run))(jax.random.key(0))

    out = dff_detect_video(det, params, images, hw, key_interval=2,
                           post_nms_top_n=8)
    assert out["cls_logits"].shape == (t, 8, 6)
    assert np.isfinite(out["cls_logits"]).all()

    images2 = images.copy()
    images2[2] = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    out2 = dff_detect_video(det, params, images2, hw, key_interval=2,
                            post_nms_top_n=8)
    # frame 3 is non-key; its key is frame 2 -> logits move
    assert np.abs(out2["cls_logits"][3] - out["cls_logits"][3]).max() > 1e-6
    # frame 1 (key=frame 0) unaffected
    np.testing.assert_allclose(out2["cls_logits"][1], out["cls_logits"][1],
                               atol=1e-6)
