"""MaskFormer-style query predictor head.

N learned queries decode against the coarsest pyramid level; per query a
class logit vector and a temporal mask-embedding are emitted, and the mask
logits come from an einsum against the full-resolution FPN mask features.
Mirrors reference MaskedTransformerPredictor (models/predictor.py:15-125).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ChannelLayerNorm, ConvMLP, Dense, DecoderOnly

Array = jax.Array

NON_ATTN_CONST = -10.0  # fill for invalid temporal positions (reference :85)


class MaskedTransformerPredictor(nn.Module):
    n_input: int
    n_embd: int
    n_head: int
    n_hidden: int
    num_queries: int
    num_classes: int
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.1
    cls_prior_prob: float = 0.01
    n_qx_stride: int = 0
    n_kv_stride: int = 1
    num_layers: int = 4
    deep_supervision: bool = False
    enforce_input_project: bool = False

    @nn.compact
    def __call__(self, x: Array, mask_features: Array, mask: Array,
                 output_mask: Array, *, deterministic: bool = True) -> dict:
        """x: (B, Tc, C) coarsest level; mask_features: (B, T0, Cm);
        mask: (B, Tc); output_mask: (B, T0). Returns dict with
        pred_logits (B, Q, K+1), pred_masks (B, Q, T0), aux_outputs,
        output_mask."""
        src = ChannelLayerNorm(self.n_input, name="input_norm")(x)
        if self.n_input != self.n_embd or self.enforce_input_project:
            src = Dense(self.n_embd, name="input_proj")(src)
            src = src * mask[..., None].astype(src.dtype)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.n_embd))

        hs, _ = DecoderOnly(
            self.n_embd, self.n_head, self.n_hidden,
            attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
            path_pdrop=self.path_pdrop, n_qx_stride=self.n_qx_stride,
            n_kv_stride=self.n_kv_stride, num_layers=self.num_layers,
            return_intermediate=self.deep_supervision,
            name="transformer")(
            src, mask, query_embed, deterministic=deterministic)
        # hs: (L, B, Q, C)

        # classification head with focal prior bias on the background-free
        # init (reference :79-81)
        bias_value = -math.log((1 - self.cls_prior_prob) / self.cls_prior_prob)
        class_embed = nn.Dense(
            self.num_classes + 1,
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"),
            bias_init=nn.initializers.constant(bias_value),
            name="class_embed")
        outputs_class = class_embed(hs)             # (L, B, Q, K+1)
        out = {"pred_logits": outputs_class[-1]}

        invalid = jnp.logical_not(output_mask)      # (B, T0)

        if self.deep_supervision:
            mask_embed = ConvMLP(self.n_embd, self.n_embd, num_layers=3,
                                 name="mask_embed")(
                hs, deterministic=deterministic)    # (L, B, Q, C)
            seg = jnp.einsum("lbqc,btc->lbqt", mask_embed, mask_features,
                             preferred_element_type=jnp.float32)
            seg = jnp.where(invalid[None, :, None, :], NON_ATTN_CONST, seg)
            out["pred_masks"] = seg[-1]
            out["aux_outputs"] = [
                {"pred_logits": outputs_class[i], "pred_masks": seg[i]}
                for i in range(seg.shape[0] - 1)]
        else:
            mask_embed = ConvMLP(self.n_embd, self.n_embd, num_layers=3,
                                 name="mask_embed")(
                hs[-1], deterministic=deterministic)  # (B, Q, C)
            seg = jnp.einsum("bqc,btc->bqt", mask_embed, mask_features,
                             preferred_element_type=jnp.float32)
            seg = jnp.where(invalid[:, None, :], NON_ATTN_CONST, seg)
            out["pred_masks"] = seg

        out["output_mask"] = output_mask
        return out
