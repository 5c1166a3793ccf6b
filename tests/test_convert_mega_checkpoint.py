"""mega_core (maskrcnn-benchmark) checkpoint converter golden test:
the state-dict-keyed conversion in tools/convert_mega_checkpoint.py must
equal the live-module oracle transplant (tests/oracle.py) leaf-exactly.

The reference's released MEGA checkpoints are torch.save'd
``{"model": state_dict}`` files in the layout written by its Checkpointer
(reference datasets/mega/mega_core/utils/checkpoint.py:69-166); this test
assembles that exact layout from the same reference modules the other
parity tests transplant from (ResNet C4 body + C5 RoI head + RPNHead +
MEGAFeatureExtractor attention lists + box predictor Linears), converts
it, and compares against the oracle param builders that every forward
parity test in this repo is built on."""

from __future__ import annotations

import numpy as np
import pytest

import jax

from tests import oracle
from tools.convert_mega_checkpoint import convert, fold_fc0, load_state_dict

torch = pytest.importorskip("torch")


def _randomize_frozen_bn(module, seed):
    g = torch.Generator().manual_seed(seed)
    for mod in module.modules():
        if mod.__class__.__name__ == "FrozenBatchNorm2d":
            mod.weight.copy_(torch.rand(mod.weight.shape, generator=g)
                             + 0.5)
            mod.bias.copy_(torch.randn(mod.bias.shape, generator=g) * 0.1)
            mod.running_mean.copy_(
                torch.randn(mod.running_mean.shape, generator=g) * 0.1)
            mod.running_var.copy_(
                torch.rand(mod.running_var.shape, generator=g) + 0.5)


def _prefixed(module, prefix):
    return {prefix + k: v for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def reference_sd_and_modules():
    """A full maskrcnn-benchmark-layout MEGA state dict (with DDP
    ``module.`` prefixes) plus the live modules it came from."""
    rbfe = oracle.load_mega_reference()
    body, ref_resnet = oracle.make_reference_resnet_c4(layers=(3, 4, 6),
                                                       seed=3)
    stage = ref_resnet.StageSpec(index=4, block_count=3,
                                 return_features=False)
    torch.manual_seed(4)
    c5 = ref_resnet.ResNetHead(
        block_module="BottleneckWithFixedBatchNorm", stages=(stage,),
        num_groups=1, width_per_group=64, stride_in_1x1=True,
        stride_init=None, res2_out_channels=256, dilation=1)
    _randomize_frozen_bn(c5, seed=5)
    rpn = oracle.make_reference_rpn_head(in_channels=1024, num_anchors=15,
                                         seed=6)
    # small MEGA attention stack; in_dim == 2048 means fc0 converts
    # exactly (the pooled-vector contract, no spatial fold)
    mega = oracle.make_reference_mega(
        rbfe, in_dim=2048, feat_dim=64, groups=4, stage=2,
        global_res_stage=1, advanced_num=4, base_num=16, seed=7)
    torch.manual_seed(8)
    cls_score = torch.nn.Linear(64, 31)
    bbox_pred = torch.nn.Linear(64, 4 * 31)

    fx = "module.roi_heads.box.feature_extractor."
    sd = {}
    sd.update(_prefixed(body, "module.backbone.body."))
    sd.update(_prefixed(rpn, "module.rpn.head."))
    sd.update(_prefixed(c5, fx + "head."))
    sd.update(_prefixed(mega, fx))
    sd.update(_prefixed(cls_score, "module.roi_heads.box.predictor.cls_score."))
    sd.update(_prefixed(bbox_pred, "module.roi_heads.box.predictor.bbox_pred."))
    return sd, dict(body=body, c5=c5, rpn=rpn, mega=mega,
                    cls_score=cls_score, bbox_pred=bbox_pred)


def _assert_tree_equal(got, want, where):
    ref = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(want)[0]}
    out = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(got)[0]}
    assert set(ref) == set(out), (where, sorted(set(ref) ^ set(out))[:8])
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k],
                                      err_msg=f"{where}{k}")


def test_converter_matches_oracle_transplant(reference_sd_and_modules):
    sd, mods = reference_sd_and_modules
    got = convert(sd, groups=4)

    _assert_tree_equal(got["backbone"],
                       oracle.resnet_c4_params(mods["body"]), "backbone")
    _assert_tree_equal(got["box_head"]["c5"],
                       oracle.resnet_head_params(mods["c5"]),
                       "box_head.c5")
    _assert_tree_equal(got["rpn"],
                       oracle.rpn_head_params(mods["rpn"]), "rpn")
    _assert_tree_equal(got["mega"],
                       oracle.mega_head_params(mods["mega"]), "mega")
    for name in ("cls_score", "bbox_pred"):
        lin = mods[name]
        np.testing.assert_array_equal(
            got["box_head"][name]["kernel"], oracle.t2n(lin.weight).T)
        np.testing.assert_array_equal(
            got["box_head"][name]["bias"], oracle.t2n(lin.bias))


def _paths_and_shapes(tree):
    return {jax.tree_util.keystr(p): np.shape(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_converted_tree_is_dropin_for_our_modules(reference_sd_and_modules):
    """The converted subtrees must have exactly the treedef + leaf
    shapes of a fresh flax init of the matching modules — the
    --init_ckpt consumption contract (detector_train.py
    load_finetune_params tree.map's checkpoint leaves onto init leaves,
    so any path or shape mismatch crashes the restore)."""
    import jax.numpy as jnp
    from vrdone_tpu.models.mega import MEGAHead
    from vrdone_tpu.models.resnet import ResNetC4
    from vrdone_tpu.models import rpn as rpn_lib

    sd, _ = reference_sd_and_modules
    got = convert(sd, groups=4)

    bb_init = ResNetC4((3, 4, 6), stride_in_1x1=True).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    assert _paths_and_shapes(got["backbone"]) == _paths_and_shapes(bb_init)

    rpn_init = rpn_lib.RPNHead().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 1024)))["params"]
    assert _paths_and_shapes(got["rpn"]) == _paths_and_shapes(rpn_init)

    # the MEGA attention stack: run the full local+global enhance flow
    # with the converted params — flax raises on any missing/misnamed
    # param, so a clean forward is the drop-in proof (leaf values are
    # pinned against the oracle in
    # test_converter_matches_oracle_transplant)
    from vrdone_tpu.models.mega import BoxSet
    head = MEGAHead(feat_dim=64, groups=4, stage=2, global_res_stage=1,
                    advanced_num=4)
    rng = np.random.default_rng(0)

    def rois(n):
        xy = rng.uniform(0, 100, size=(n, 2))
        wh = rng.uniform(8, 40, size=(n, 2))
        return jnp.asarray(np.concatenate([xy, xy + wh], 1),
                           jnp.float32)

    f, nb = 3, 6
    window = BoxSet(jnp.asarray(rng.standard_normal((f, nb, 64)),
                                jnp.float32),
                    jnp.stack([rois(nb) for _ in range(f)]),
                    jnp.ones((f, nb), bool))
    glob = BoxSet(jnp.asarray(rng.standard_normal((8, 64)), jnp.float32),
                  rois(8), jnp.ones((8,), bool))
    out = head.apply({"params": got["mega"]},
                     jnp.asarray(rng.standard_normal((5, 2048)),
                                 jnp.float32),
                     rois(5), jnp.ones((5,), bool), window, None, glob,
                     method=MEGAHead.enhance)
    assert np.asarray(out).shape == (5, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_fold_fc0_exact_on_constant_crops():
    """fc0 spatial folding is exact when the RoI crop is spatially
    constant: sum_s W[o, c, s] * x[c] == fold(W)[o, c] * x[c]."""
    rng = np.random.default_rng(0)
    out_dim, c, s = 5, 7, 4
    w = rng.standard_normal((out_dim, c * s)).astype(np.float32)
    xbar = rng.standard_normal(c).astype(np.float32)
    x_flat = np.repeat(xbar, s)            # C-major flatten order
    want = w @ x_flat
    got = fold_fc0(w, c) @ xbar
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_load_state_dict_roundtrip(tmp_path, reference_sd_and_modules):
    """torch.save'd {"model": sd} files (the reference Checkpointer
    format) load and convert identically to the in-memory dict."""
    sd, _ = reference_sd_and_modules
    path = tmp_path / "mega_ckpt.pth"
    torch.save({"model": sd, "optimizer": None, "iteration": 120000},
               str(path))
    loaded = load_state_dict(str(path))
    got = convert(loaded, groups=4)
    want = convert(sd, groups=4)
    _assert_tree_equal(got, want, "roundtrip:")
