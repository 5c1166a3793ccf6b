"""bf16 serving fast path for the non-MEGA detector methods.

The flagship MEGA driver's compute_dtype toggle (tests/test_detector.py::
test_bf16_precompute_parity) now extends to every detection method the
reference ships (base / RDN / FGFA / DFF / RetinaNet — reference
datasets/mega/mega_core/modeling/detector/detectors.py). Same contract
everywhere: backbone/flow/RoI compute in bf16, box decode + NMS and the
returned logits/deltas fp32.

NMS keep decisions can flip on near-tied random-init scores, so parity
is pinned on the deterministic tensors (feature maps, aggregated maps,
head logits of a fixed input) and the drivers are smoke-checked end to
end in bf16.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.models.detector import _cast_f32_leaves


def _rel_close(a32, a16, max_tol=0.05, mean_tol=0.005):
    a16 = np.asarray(a16, np.float32)
    a32 = np.asarray(a32, np.float32)
    scale = np.abs(a32).max() + 1e-12
    assert np.abs(a16 - a32).max() < max_tol * scale
    assert np.abs(a16 - a32).mean() < mean_tol * scale


def test_base_bf16_parity_and_driver():
    from vrdone_tpu.models.base_rcnn import BaseDetector, base_detect_video

    det = BaseDetector(num_classes=5, resnet_layers=(1, 1, 1))
    rng = np.random.default_rng(21)
    images = rng.uniform(0, 255, (2, 64, 96, 3)).astype(np.float32)
    hw = np.asarray([64, 96], np.float32)

    params = jax.jit(lambda k: det.init(
        k, jnp.asarray(images[0]), jnp.asarray(hw),
        method=lambda m, i, h: m.detect_frame(i, h, post_nms_top_n=8)))(
            jax.random.key(0))
    bf16_params = _cast_f32_leaves(params, jnp.bfloat16)

    feats = lambda p, dt: det.apply(
        p, jnp.asarray(images), method=lambda m, im: m.features(
            im, compute_dtype=dt))
    c4_32 = feats(params, jnp.float32)
    c4_16 = feats(bf16_params, jnp.bfloat16)
    assert c4_16.dtype == jnp.bfloat16
    _rel_close(c4_32, c4_16)

    out = base_detect_video(det, params, images, hw, post_nms_top_n=8,
                            compute_dtype="bfloat16")
    assert out["cls_logits"].dtype == np.float32
    assert out["proposals"].dtype == np.float32
    assert np.isfinite(out["cls_logits"]).all()
    assert np.isfinite(out["proposals"]).all()


def test_rdn_bf16_driver():
    from vrdone_tpu.models.rdn import RDNDetector, rdn_detect_video

    det = RDNDetector(num_classes=5, resnet_layers=(1, 1, 1),
                      base_stage=1, advanced_stage=0, groups=4,
                      base_num=8, window=3, key_loc=1)
    rng = np.random.default_rng(22)
    t = 3
    images = rng.uniform(0, 255, (t, 64, 96, 3)).astype(np.float32)
    hw = np.asarray([64, 96], np.float32)

    def init_run(m, img):
        c4 = m.features(img[None])[0]
        kb, _, kv = m.propose(c4, jnp.asarray(hw), post_nms_top_n=8)
        pooled = m.box_head.pooled_features(c4, kb)
        fc0 = m.rdn.pre_calculate(pooled)
        from vrdone_tpu.models.rdn import BoxSet
        win = BoxSet(jnp.stack([fc0] * 3), jnp.stack([kb] * 3),
                     jnp.stack([kv] * 3))
        enh = m.enhance(pooled, kb, kv, win)
        return m.predictions(enh)

    params = jax.jit(lambda k: det.init(
        k, jnp.asarray(images[0]), method=init_run))(jax.random.key(0))

    out32 = rdn_detect_video(det, params, images, hw, key_post_nms=8)
    out16 = rdn_detect_video(det, params, images, hw, key_post_nms=8,
                             compute_dtype="bfloat16")
    assert out16["cls_logits"].shape == out32["cls_logits"].shape
    assert out16["visual"].dtype == np.float32
    assert np.isfinite(out16["cls_logits"]).all()


@pytest.mark.slow
def test_fgfa_bf16_parity_and_driver():
    from vrdone_tpu.models.flownet import FGFADetector, fgfa_detect_video

    det = FGFADetector(num_classes=5, resnet_layers=(1, 1, 1), window=3,
                       key_loc=1)
    rng = np.random.default_rng(23)
    t = 3
    images = rng.uniform(0, 255, (t, 64, 96, 3)).astype(np.float32)
    hw = np.asarray([64, 96], np.float32)

    def init_run(m, cur, refs):
        return m.detect_frame(cur, refs, jnp.asarray(hw),
                              post_nms_top_n=8)

    params = jax.jit(lambda k: det.init(
        k, jnp.asarray(images[:1]), jnp.asarray(images[1:]),
        method=init_run))(jax.random.key(0))
    bf16_params = _cast_f32_leaves(params, jnp.bfloat16)

    # deterministic-tensor parity: the aggregated key-frame map
    def agg(p, dt):
        def fwd(m):
            fe = m.fgfa.precompute_frame(
                m.features(jnp.asarray(images), compute_dtype=dt))
            return m.fgfa.aggregate_test(
                jnp.asarray(images[1:2]).astype(dt),
                jnp.asarray(images).astype(dt), fe, 1)
        return det.apply(p, method=fwd)

    a32 = agg(params, jnp.float32)
    a16 = agg(bf16_params, jnp.bfloat16)
    assert a16.dtype == jnp.bfloat16
    # flow-warped aggregation compounds bf16 rounding through the warp
    # coordinates' bilinear fractions -> slightly looser bound than the
    # pure-conv paths
    _rel_close(a32, a16, max_tol=0.10, mean_tol=0.01)

    out = fgfa_detect_video(det, params, images, hw, post_nms_top_n=8,
                            compute_dtype="bfloat16")
    assert out["cls_logits"].dtype == np.float32
    assert np.isfinite(out["cls_logits"]).all()


@pytest.mark.slow
def test_dff_bf16_parity_and_driver():
    from vrdone_tpu.models.flownet import DFFDetector, dff_detect_video

    det = DFFDetector(num_classes=5, resnet_layers=(1, 1, 1))
    rng = np.random.default_rng(24)
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
    bf16_params = _cast_f32_leaves(params, jnp.bfloat16)

    def propagated(p, dt):
        def fwd(m):
            fk = m.features(jnp.asarray(images[:1]), compute_dtype=dt)
            return m.dff.propagate(jnp.asarray(images[1:2]).astype(dt),
                                   jnp.asarray(images[:1]).astype(dt), fk)
        return det.apply(p, method=fwd)

    p32 = propagated(params, jnp.float32)
    p16 = propagated(bf16_params, jnp.bfloat16)
    assert p16.dtype == jnp.bfloat16
    _rel_close(p32, p16, max_tol=0.10, mean_tol=0.01)

    out = dff_detect_video(det, params, images, hw, key_interval=2,
                           post_nms_top_n=8, compute_dtype="bfloat16")
    assert out["cls_logits"].dtype == np.float32
    assert np.isfinite(out["cls_logits"]).all()


def test_retinanet_bf16_parity_and_detect():
    from vrdone_tpu.models import retinanet as RN

    model = RN.RetinaNet(num_classes=5, resnet_layers=(1, 1, 1, 1))
    rng = np.random.default_rng(25)
    img = rng.uniform(0, 255, (64, 128, 3)).astype(np.float32)
    hw = np.asarray([60, 120], np.float32)

    params = jax.jit(lambda k: model.init(k, jnp.asarray(img)[None]))(
        jax.random.key(0))
    bf16_params = _cast_f32_leaves(params, jnp.bfloat16)

    l32, b32 = model.apply(params, jnp.asarray(img)[None])
    l16, b16 = model.apply(bf16_params, jnp.asarray(img)[None],
                           jnp.bfloat16)
    assert l16[0].dtype == jnp.bfloat16
    for a32, a16 in list(zip(l32, l16)) + list(zip(b32, b16)):
        _rel_close(a32, a16)

    out = jax.jit(lambda p, im: RN.detect_image(
        model, p, im, jnp.asarray(hw), pre_nms_top_n=50, dets_per_img=10,
        compute_dtype="bfloat16"))(params, jnp.asarray(img))
    assert out["boxes"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["scores"])).all()
