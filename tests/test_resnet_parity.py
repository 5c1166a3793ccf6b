"""Golden parity: detector backbone pieces vs the reference mega_core
modules (ResNet C4 body with STRIDE_IN_1X1=True Caffe2 convention, the
C5 RoI head stage, and the RPN head) with transplanted random weights —
the detector-side counterpart of tests/test_layers_parity.py."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tests import oracle
from vrdone_tpu.models import rpn as rpn_lib
from vrdone_tpu.models.resnet import ResNetC4, ResNetC5Head, ResStage

torch = pytest.importorskip("torch")


def test_resnet_c4_parity():
    M, _ = oracle.make_reference_resnet_c4(layers=(3, 4, 6), seed=0)
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = M(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0]

    ours = ResNetC4(layers=(3, 4, 6), stride_in_1x1=True)
    params = {"params": oracle.resnet_c4_params(M)}
    got = ours.apply(params, jnp.asarray(x))
    assert got.shape == (1, 4, 6, 1024)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=1e-3, atol=1e-3)


def test_resnet_c5_head_parity():
    """ResNetHead stage-5 (the RoI head the C4 extractor runs on pooled
    crops, reference roi_box_feature_extractors.py:18-51) vs our
    ResStage(512, ..., stride=2) — compared pre-pool."""
    _, ref_resnet = oracle.make_reference_resnet_c4(layers=(3, 4, 6),
                                                    seed=1)
    stage = ref_resnet.StageSpec(index=4, block_count=3,
                                 return_features=False)
    torch.manual_seed(2)
    H = ref_resnet.ResNetHead(
        block_module="BottleneckWithFixedBatchNorm", stages=(stage,),
        num_groups=1, width_per_group=64, stride_in_1x1=True,
        stride_init=None, res2_out_channels=256, dilation=1)
    g = torch.Generator().manual_seed(3)
    for mod in H.modules():
        if mod.__class__.__name__ == "FrozenBatchNorm2d":
            mod.weight.copy_(torch.rand(mod.weight.shape, generator=g)
                             + 0.5)
            mod.bias.copy_(torch.randn(mod.bias.shape, generator=g) * 0.1)
            mod.running_mean.copy_(
                torch.randn(mod.running_mean.shape, generator=g) * 0.1)
            mod.running_var.copy_(
                torch.rand(mod.running_var.shape, generator=g) + 0.5)
    H.eval()

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 14, 14, 1024)).astype(np.float32)
    with torch.no_grad():
        want = H(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    ours = ResStage(512, 3, stride=2, stride_in_1x1=True)
    params = {"params": oracle.resnet_head_params(H)["layer4"]}
    got = ours.apply(params, jnp.asarray(x))
    assert got.shape == (2, 7, 7, 2048)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               oracle.t2n(want), rtol=1e-3, atol=1e-3)

    # and the full C5 head (stage + global average pool) agrees with
    # torch mean pooling
    head = ResNetC5Head(3, stride_in_1x1=True)
    hp = {"params": {"layer4": params["params"]}}
    pooled = head.apply(hp, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(pooled), oracle.t2n(want.mean(dim=(2, 3))),
        rtol=1e-3, atol=1e-3)


def test_rpn_head_parity():
    M = oracle.make_reference_rpn_head(in_channels=64, num_anchors=15,
                                       seed=5)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 6, 8, 64)).astype(np.float32)
    with torch.no_grad():
        logits, bbox = M([torch.from_numpy(x.transpose(0, 3, 1, 2))])

    ours = rpn_lib.RPNHead()
    got_l, got_b = ours.apply({"params": oracle.rpn_head_params(M)},
                              jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_l).transpose(0, 3, 1, 2),
                               oracle.t2n(logits[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b).transpose(0, 3, 1, 2),
                               oracle.t2n(bbox[0]), rtol=1e-4, atol=1e-5)


def test_stride_conventions_differ():
    """Sanity: the two stride conventions are NOT numerically equivalent
    (so the stride_in_1x1 flag is load-bearing)."""
    import jax

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
    a = ResStage(4, 1, stride=2, stride_in_1x1=True)
    b = ResStage(4, 1, stride=2, stride_in_1x1=False)
    pa = a.init(jax.random.key(0), x)
    oa = a.apply(pa, x)
    ob = b.apply(pa, x)
    assert oa.shape == ob.shape
    assert np.abs(np.asarray(oa) - np.asarray(ob)).max() > 1e-4
