"""stem_stream_batch equivalence: the stream-batched backbone flow
(subject/object rows stacked to (2B, T, C) through every shared-weight
op) must reproduce the reference two-call flow exactly — same params,
same outputs — in deterministic mode, for both the base and CLIP
variants, and through the full model + losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.config import ModelConfig, PredictorConfig
from vrdone_tpu.models.maskvrd import MaskVRD, compute_losses
from tests.test_model_parity import packed_channels, small_cfg


def _variant(cfg: ModelConfig, stream_batch: bool) -> ModelConfig:
    return ModelConfig(**{**{k: getattr(cfg, k)
                             for k in cfg.__dataclass_fields__},
                          "stem_stream_batch": stream_batch})


@pytest.mark.parametrize("with_clip", [False, True])
def test_stream_batched_forward_equivalent(with_clip):
    cfg = small_cfg(with_clip_feature=with_clip,
                    clip_dim=12 if with_clip else None,
                    use_abs_pe=True)
    rng = np.random.default_rng(0)
    b, t = 3, cfg.max_seq_len
    c = packed_channels(cfg)
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    lens = np.array([t, t // 2, 11])
    mask = np.arange(t)[None] < lens[:, None]
    x = x * mask[..., None]

    m_ref = MaskVRD(_variant(cfg, False))
    m_sb = MaskVRD(_variant(cfg, True))
    params = m_ref.init({"params": jax.random.key(0)}, jnp.asarray(x),
                        jnp.asarray(mask), deterministic=True)

    out_ref = m_ref.apply(params, jnp.asarray(x), jnp.asarray(mask),
                          deterministic=True)
    out_sb = m_sb.apply(params, jnp.asarray(x), jnp.asarray(mask),
                        deterministic=True)

    np.testing.assert_allclose(np.asarray(out_sb["pred_logits"]),
                               np.asarray(out_ref["pred_logits"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sb["pred_masks"]),
                               np.asarray(out_ref["pred_masks"]),
                               atol=1e-5, rtol=1e-5)
    for a_sb, a_ref in zip(out_sb["aux_outputs"], out_ref["aux_outputs"]):
        np.testing.assert_allclose(np.asarray(a_sb["pred_masks"]),
                                   np.asarray(a_ref["pred_masks"]),
                                   atol=1e-5, rtol=1e-5)


def test_stream_batched_losses_and_grads_equivalent():
    cfg = small_cfg(with_fuzzy=True, scale_range=0.85, droppath=0.0,
                    fuse_path_drop=0.0,
                    predictor=PredictorConfig(
                        n_input=32, n_embd=16, n_head=4, n_hidden=64,
                        num_queries=5, num_classes=20, path_pdrop=0.0,
                        num_layers=3, deep_supervision=True))
    rng = np.random.default_rng(1)
    b, t = 2, cfg.max_seq_len
    c = packed_channels(cfg)
    g = cfg.predictor.num_queries
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    mask = np.ones((b, t), bool)
    gt = {
        "seq_mask": jnp.asarray(mask),
        "item_valid": jnp.ones((b,), bool),
        "gt_labels": jnp.asarray(
            rng.integers(1, cfg.num_classes + 1, size=(b, g)).astype(
                np.int32)),
        "gt_masks": jnp.zeros((b, g, t), jnp.float32).at[:, :2, 4:20].set(1.0),
        "gt_segs": jnp.asarray(np.tile([4, 20], (b, g, 1)).astype(np.int32)),
        "gt_valid": jnp.asarray(np.arange(g)[None] < 2).repeat(b, axis=0),
    }

    m_ref = MaskVRD(_variant(cfg, False))
    m_sb = MaskVRD(_variant(cfg, True))
    params = m_ref.init({"params": jax.random.key(1)}, jnp.asarray(x),
                        jnp.asarray(mask), deterministic=True)["params"]

    def loss_fn(model):
        def f(p):
            preds = model.apply({"params": p}, jnp.asarray(x),
                                jnp.asarray(mask), deterministic=True)
            cfg_m = model.config
            return compute_losses(cfg_m, preds, gt)["total_loss"]
        return f

    l_ref, g_ref = jax.value_and_grad(loss_fn(m_ref))(params)
    l_sb, g_sb = jax.value_and_grad(loss_fn(m_sb))(params)
    np.testing.assert_allclose(float(l_sb), float(l_ref), rtol=1e-5)
    for (p1, a), (_, b_) in zip(
            jax.tree_util.tree_flatten_with_path(g_sb)[0],
            jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(p1))
