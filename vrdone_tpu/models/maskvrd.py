"""MaskVRD: one-stage video relation detection as 1-D instance segmentation.

Top-level model (backbone -> FPN neck -> query predictor) plus the fully
jittable training objective (Hungarian matching + focal/dice mask losses +
weighted CE), mirroring reference models/maskvrd.py but with:

  * static shapes end-to-end — ground truth arrives padded to
    (B, G, ...) with validity masks instead of ragged python lists,
  * on-device Hungarian matching (vrdone_tpu.ops.hungarian) instead of the
    reference's per-step GPU->CPU scipy round-trip (maskvrd.py:489-492),
  * per-item (Q, G) block-diagonal cost computation instead of the global
    (B*Q, N_total) dense matrix.

Training batch contract (see vrdone_tpu/data/batching.py):
    feats:      (B, T, C)   packed SO-pair features
    seq_mask:   (B, T) bool temporal validity
    item_valid: (B,)   bool padded batch slots
    gt_labels:  (B, G) int32 predicate ids (0 where invalid)
    gt_masks:   (B, G, T) float32 binary temporal masks
    gt_segs:    (B, G, 2) int32 [start, end) in feature grid
    gt_valid:   (B, G) bool
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops.hungarian import batched_match
from . import losses as LO
from .backbone import SOSBackbone
from .fpn import FPN1DFuse
from .predictor import MaskedTransformerPredictor

Array = jax.Array


class MaskVRD(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.backbone = SOSBackbone(
            n_visual=cfg.visual_dim,
            n_bbox_entity=cfg.bbox_entity_dim,
            n_bbox_so=cfg.bbox_so_dim,
            n_embd=cfg.embd_dim,
            n_head=cfg.n_head,
            n_embd_ks=cfg.embd_kernel_size,
            fuse_ks=cfg.fuse_ks,
            n_fuse_head=cfg.fuse_head,
            fuse_path_drop=cfg.fuse_path_drop,
            fuse_qx_stride=cfg.fuse_qx_stride,
            fuse_kv_stride=cfg.fuse_kv_stride,
            max_len=cfg.max_seq_len,
            arch=cfg.backbone_arch,
            mha_win_size=cfg.mha_win_size,
            scale_factor=cfg.scale_factor,
            with_ln=cfg.embd_with_ln,
            attn_pdrop=cfg.dropattn,
            proj_pdrop=cfg.dropout,
            path_pdrop=cfg.droppath,
            use_abs_pe=cfg.use_abs_pe,
            use_rel_pe=cfg.use_rel_pe,
            use_local=cfg.use_local,
            n_clip=cfg.clip_dim if cfg.with_clip_feature else None,
            stream_batch=cfg.stem_stream_batch,
            name="backbone")
        self.neck = FPN1DFuse(
            in_channels=(cfg.embd_dim,) * (cfg.backbone_arch[-1] + 1),
            out_channel=cfg.fpn_dim,
            scale_factor=cfg.scale_factor,
            start_level=cfg.fpn_start_level,
            with_ln=cfg.fpn_with_ln,
            norm_first=cfg.fpn_norm_first,
            name="neck")
        self.predictor = MaskedTransformerPredictor(
            **{k: getattr(cfg.predictor, k)
               for k in cfg.predictor.__dataclass_fields__},
            name="predictor")

    def __call__(self, feats: Array, mask: Array, *,
                 deterministic: bool = True) -> dict:
        """feats: (B, T, C_packed), mask: (B, T) bool -> predictions dict.

        Precision policy: the network computes in whatever float dtype the
        inputs AND params carry (cast both with utils.precision.cast_floating
        for bf16 serving). LayerNorm statistics and attention softmax always
        run in f32 internally; prediction heads are cast back to f32 at the
        end so decoding/losses are precision-stable.
        """
        pyramid, masks = self.backbone(feats, mask, deterministic=deterministic)
        fpn_feat, _ = self.neck(pyramid, masks)
        preds = self.predictor(pyramid[-1], fpn_feat, masks[-1],
                               output_mask=masks[0],
                               deterministic=deterministic)
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if isinstance(x, jax.Array)
            and jnp.issubdtype(x.dtype, jnp.floating) else x, preds)


# ---------------------------------------------------------------------------
# training objective (pure functions of predictions + padded gt)
# ---------------------------------------------------------------------------

def _match(cfg: ModelConfig, pred_logits: Array, pred_masks: Array,
           gt: dict) -> tuple[Array, Array]:
    """Hungarian matching. Returns (row_for_col (B, G), matched (B, G))."""
    scale_range = cfg.scale_range if cfg.with_fuzzy else None
    cost_fn = jax.vmap(
        lambda pl, pm, lbl, gm, gs, gv, sm: LO.matching_cost(
            pl, pm, lbl, gm, gs, gv, sm,
            cost_class=cfg.cost_class, cost_mask=cfg.cost_mask,
            cost_dice=cfg.cost_dice, scale_range=scale_range))
    cost = cost_fn(pred_logits, pred_masks, gt["gt_labels"], gt["gt_masks"],
                   gt["gt_segs"], gt["gt_valid"], gt["seq_mask"])
    cost = jax.lax.stop_gradient(cost)
    row_for_col, _ = batched_match(cost, gt["gt_valid"])
    return row_for_col, gt["gt_valid"]


def _single_level_losses(cfg: ModelConfig, pred_logits: Array,
                         pred_masks: Array, gt: dict,
                         num_masks: Array) -> dict:
    b, q, _ = pred_logits.shape
    g = gt["gt_labels"].shape[1]
    row_for_col, matched = _match(cfg, pred_logits, pred_masks, gt)
    bidx = jnp.arange(b)[:, None]

    out = {}
    if "labels" in cfg.loss_types:
        # scatter matched labels into (B, Q); rows are a permutation per item
        target = jnp.zeros((b, q), jnp.int32)
        target = target.at[bidx, row_for_col].set(
            jnp.where(matched, gt["gt_labels"], 0))
        # items that are pure padding contribute zero weight (the reference
        # never sees them — its batches are ragged)
        logp = jax.nn.log_softmax(pred_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        w = jnp.where(target == 0, cfg.eos_coef, 1.0)
        w = w * gt["item_valid"][:, None].astype(w.dtype)
        loss_ce = jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-6)
        out["loss_class"] = cfg.loss_class * loss_ce

    if "masks" in cfg.loss_types:
        pred_sel = pred_masks[bidx, row_for_col]          # (B, G, T)
        tgt = gt["gt_masks"]
        loss_mask = jnp.broadcast_to(gt["seq_mask"][:, None, :], tgt.shape)
        pv = matched & gt["item_valid"][:, None]
        t = tgt.shape[-1]
        flat = lambda x: x.reshape(-1, t)
        if cfg.with_fuzzy:
            segs = gt["gt_segs"].reshape(-1, 2)
            out["loss_mask"] = cfg.loss_mask * LO.matched_focal_fuzzy_loss(
                flat(pred_sel), flat(tgt), segs, flat(loss_mask),
                pv.reshape(-1), num_masks, cfg.scale_range)
            out["loss_dice"] = cfg.loss_dice * LO.matched_dice_fuzzy_loss(
                flat(pred_sel), flat(tgt), segs, flat(loss_mask),
                pv.reshape(-1), num_masks, cfg.scale_range)
        else:
            out["loss_mask"] = cfg.loss_mask * LO.matched_focal_loss(
                flat(pred_sel), flat(tgt), flat(loss_mask),
                pv.reshape(-1), num_masks)
            out["loss_dice"] = cfg.loss_dice * LO.matched_dice_loss(
                flat(pred_sel), flat(tgt), flat(loss_mask),
                pv.reshape(-1), num_masks)
    return out


def compute_losses(cfg: ModelConfig, predictions: dict, gt: dict) -> dict:
    """Full training objective incl. deep supervision
    (reference maskvrd.py:569-588).

    num_masks is the *global* valid-gt count (the reference normalises
    per-rank under DDP; with a single global batch under pjit the global
    count is the natural equivalent).
    """
    num_masks = jnp.maximum(
        jnp.sum(gt["gt_valid"] & gt["item_valid"][:, None]), 1
    ).astype(jnp.float32)

    aux = predictions.get("aux_outputs", []) or []
    if not aux:
        loss_dict = _single_level_losses(
            cfg, predictions["pred_logits"], predictions["pred_masks"],
            gt, num_masks)
    else:
        # deep supervision: vmap the match + losses over the level axis —
        # one batched Hungarian over (levels x batch) problems instead of
        # L sequential while-loop chains (the matcher is latency-bound on
        # TPU, so merging the levels cuts step latency; values are
        # unchanged — each level still reduces independently)
        pl = jnp.stack([predictions["pred_logits"],
                        *[a["pred_logits"] for a in aux]])
        pm = jnp.stack([predictions["pred_masks"],
                        *[a["pred_masks"] for a in aux]])
        per = jax.vmap(lambda l, m: _single_level_losses(
            cfg, l, m, gt, num_masks))(pl, pm)
        loss_dict = {k: v[0] for k, v in per.items()}
        for i in range(len(aux)):
            loss_dict.update({f"{k}_{i}": per[k][i + 1] for k in per})

    loss_dict["total_loss"] = sum(loss_dict.values())
    return loss_dict
