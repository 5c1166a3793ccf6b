"""End-to-end model parity: full MaskVRD forward + training losses vs the
reference implementation with transplanted weights (fp32, eval/no-dropout)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.config import ModelConfig, PredictorConfig
from vrdone_tpu.models.maskvrd import MaskVRD, compute_losses
from tests import oracle


def small_cfg(**over):
    base = dict(
        visual_dim=24,
        bbox_entity_dim=8,
        bbox_so_dim=5,
        embd_dim=32,
        num_classes=20,
        backbone_arch=(2, 2, 3),
        scale_factor=2,
        fpn_start_level=0,
        max_seq_len=48,
        n_mha_win_size=7,
        use_abs_pe=False,
        use_rel_pe=False,
        use_local=False,
        max_so_pair=16,
        fuse_ks=1,
        fuse_head=4,
        fuse_qx_stride=1,
        fuse_kv_stride=1,
        fuse_path_drop=0.1,
        n_head=4,
        embd_kernel_size=3,
        embd_with_ln=True,
        dropattn=0.0,
        dropout=0.0,
        droppath=0.1,
        fpn_dim=16,
        fpn_with_ln=True,
        fpn_norm_first=True,
        loss_types=("labels", "masks"),
        with_fuzzy=False,
        scale_range=None,
        with_clip_feature=False,
        predictor=PredictorConfig(
            n_input=32, n_embd=16, n_head=4, n_hidden=64, num_queries=5,
            num_classes=20, path_pdrop=0.1, num_layers=3,
            deep_supervision=True),
    )
    base.update(over)
    return ModelConfig(**base)


def torch_model_config(cfg: ModelConfig):
    d = {
        "visual_dim": cfg.visual_dim,
        "bbox_entity_dim": cfg.bbox_entity_dim,
        "bbox_so_dim": cfg.bbox_so_dim,
        "embd_dim": cfg.embd_dim,
        "num_classes": cfg.num_classes,
        "backbone_arch": list(cfg.backbone_arch),
        "scale_factor": cfg.scale_factor,
        "fpn_start_level": cfg.fpn_start_level,
        "max_seq_len": cfg.max_seq_len,
        "n_mha_win_size": cfg.n_mha_win_size,
        "use_abs_pe": cfg.use_abs_pe,
        "use_rel_pe": cfg.use_rel_pe,
        "use_local": cfg.use_local,
        "max_so_pair": cfg.max_so_pair,
        "fuse_ks": cfg.fuse_ks,
        "fuse_head": cfg.fuse_head,
        "fuse_qx_stride": cfg.fuse_qx_stride,
        "fuse_kv_stride": cfg.fuse_kv_stride,
        "fuse_path_drop": cfg.fuse_path_drop,
        "n_head": cfg.n_head,
        "embd_kernel_size": cfg.embd_kernel_size,
        "embd_with_ln": cfg.embd_with_ln,
        "dropattn": cfg.dropattn,
        "dropout": cfg.dropout,
        "droppath": cfg.droppath,
        "fpn_dim": cfg.fpn_dim,
        "fpn_with_ln": cfg.fpn_with_ln,
        "fpn_norm_first": cfg.fpn_norm_first,
        "loss_types": list(cfg.loss_types),
        "with_fuzzy": cfg.with_fuzzy,
        "scale_range": cfg.scale_range,
        "with_clip_feature": cfg.with_clip_feature,
        "predictor": {k: getattr(cfg.predictor, k)
                      for k in cfg.predictor.__dataclass_fields__},
        "cost_coeff_dict": {"cost_class": cfg.cost_class,
                            "cost_mask": cfg.cost_mask,
                            "cost_dice": cfg.cost_dice},
        "loss_coeff_dict": {"eos_coef": cfg.eos_coef,
                            "loss_class": cfg.loss_class,
                            "loss_mask": cfg.loss_mask,
                            "loss_dice": cfg.loss_dice},
    }
    if cfg.with_clip_feature:
        d["clip_dim"] = cfg.clip_dim
    return d


def packed_channels(cfg):
    c = 2 * cfg.visual_dim + cfg.bbox_so_dim + 2 * cfg.bbox_entity_dim
    if cfg.with_clip_feature:
        c += 2 * cfg.clip_dim
    return c


def make_models(cfg, seed=0):
    import torch
    from models.maskvrd import MaskVRD as TorchMaskVRD
    torch.manual_seed(seed)
    tm = TorchMaskVRD(torch_model_config(cfg), device="cpu").eval()
    params = {"params": oracle.maskvrd_params(tm)}
    jm = MaskVRD(cfg)
    return tm, jm, params


@pytest.mark.parametrize("with_clip", [False, True])
def test_forward_parity(with_clip):
    cfg = small_cfg(with_clip_feature=with_clip,
                    clip_dim=12 if with_clip else None)
    tm, jm, params = make_models(cfg)
    rng = np.random.default_rng(0)
    b, t = 3, cfg.max_seq_len
    c = packed_channels(cfg)
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    lens = np.array([t, t // 2, 11])
    mask = np.arange(t)[None] < lens[:, None]
    x = x * mask[..., None]

    preds_t = tm._mask_vrd(oracle.to_torch_btc(x), oracle.to_torch_mask(mask))
    preds_j = jm.apply(params, jnp.asarray(x), jnp.asarray(mask))

    np.testing.assert_allclose(
        np.asarray(preds_j["pred_logits"]), oracle.t2n(preds_t["pred_logits"]),
        atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(preds_j["pred_masks"]), oracle.t2n(preds_t["pred_masks"]),
        atol=5e-4, rtol=5e-4)
    assert len(preds_j["aux_outputs"]) == len(preds_t["aux_outputs"])
    for aj, at in zip(preds_j["aux_outputs"], preds_t["aux_outputs"]):
        np.testing.assert_allclose(np.asarray(aj["pred_masks"]),
                                   oracle.t2n(at["pred_masks"]),
                                   atol=5e-4, rtol=5e-4)


def _patch_reference_num_masks():
    """torch>=2.13 scripted losses require num_masks as a Tensor, but the
    reference passes a python float (maskvrd.py:572 .item()). Wrap the
    scripted functions so the reference runs under modern torch."""
    import torch
    import models.maskvrd as rmv
    for name in ["masked_sigmoid_focal_loss", "masked_dice_loss",
                 "masked_sigmoid_focal_fuzzy_loss", "masked_dice_fuzzy_loss"]:
        fn = getattr(rmv, name)
        if getattr(fn, "_num_masks_patched", False):
            continue

        def wrap(f):
            def g(inputs, targets, num_masks, *args, **kwargs):
                return f(inputs, targets, torch.as_tensor(num_masks),
                         *args, **kwargs)
            g._num_masks_patched = True
            return g
        setattr(rmv, name, wrap(fn))


@pytest.mark.parametrize("with_fuzzy", [False, True])
def test_training_loss_parity(with_fuzzy):
    import torch
    _patch_reference_num_masks()
    cfg = small_cfg(with_fuzzy=with_fuzzy,
                    scale_range=0.85 if with_fuzzy else None,
                    droppath=0.0, fuse_path_drop=0.0)
    cfg = ModelConfig(**{**{k: getattr(cfg, k)
                            for k in cfg.__dataclass_fields__},
                         "predictor": PredictorConfig(
                             n_input=32, n_embd=16, n_head=4, n_hidden=64,
                             num_queries=5, num_classes=20, path_pdrop=0.0,
                             num_layers=3, deep_supervision=True)})
    tm, jm, params = make_models(cfg, seed=1)
    tm.train()

    rng = np.random.default_rng(1)
    b, t = 3, cfg.max_seq_len
    c = packed_channels(cfg)
    g = 5  # == num_queries
    lens = np.array([t, 30, 17])
    feats_list, preds_list, masks_list, segs_list = [], [], [], []
    gt_labels = np.zeros((b, g), np.int64)
    gt_masks = np.zeros((b, g, t), np.float32)
    gt_segs = np.zeros((b, g, 2), np.int64)
    gt_valid = np.zeros((b, g), bool)
    x = np.zeros((b, t, c), np.float32)
    for i, ln in enumerate(lens):
        xi = rng.standard_normal((ln, c)).astype(np.float32)
        x[i, :ln] = xi
        feats_list.append(torch.from_numpy(xi.T.copy()))
        ngt = int(rng.integers(1, 4))
        labels, segs, masks = [], [], []
        for k in range(ngt):
            s = int(rng.integers(0, ln - 2))
            e = int(rng.integers(s + 2, min(ln, s + 20) + 1))
            lab = int(rng.integers(1, cfg.num_classes + 1))
            m = np.zeros(t, np.float32)
            m[s:e] = 1
            labels.append(lab)
            segs.append([s, e])
            masks.append(m)
            gt_labels[i, k] = lab
            gt_masks[i, k] = m
            gt_segs[i, k] = [s, e]
            gt_valid[i, k] = True
        preds_list.append(torch.tensor(labels, dtype=torch.int64))
        segs_list.append(torch.tensor(segs, dtype=torch.int64))
        masks_list.append(torch.from_numpy(np.stack(masks)))

    input_data = {
        "so_features_list": feats_list,
        "preds_list": preds_list,
        "masks_list": masks_list,
        "segs_list": segs_list,
    }
    with torch.no_grad():
        loss_t = tm.forward_training(input_data)

    mask = np.arange(t)[None] < lens[:, None]
    preds_j = jm.apply(params, jnp.asarray(x), jnp.asarray(mask),
                       deterministic=True)
    gt = {
        "seq_mask": jnp.asarray(mask),
        "item_valid": jnp.ones((b,), bool),
        "gt_labels": jnp.asarray(gt_labels.astype(np.int32)),
        "gt_masks": jnp.asarray(gt_masks),
        "gt_segs": jnp.asarray(gt_segs.astype(np.int32)),
        "gt_valid": jnp.asarray(gt_valid),
    }
    loss_j = compute_losses(cfg, preds_j, gt)

    for key in ["loss_class", "loss_mask", "loss_dice", "total_loss"]:
        ours = float(loss_j[key])
        theirs = float(loss_t[key])
        assert abs(ours - theirs) < 2e-3 * max(1.0, abs(theirs)), (
            key, ours, theirs)
    # aux losses too
    for i in range(cfg.predictor.num_layers - 1):
        for key in ["loss_class", "loss_mask", "loss_dice"]:
            ours = float(loss_j[f"{key}_{i}"])
            theirs = float(loss_t[f"{key}_{i}"])
            assert abs(ours - theirs) < 2e-3 * max(1.0, abs(theirs)), (
                f"{key}_{i}", ours, theirs)
