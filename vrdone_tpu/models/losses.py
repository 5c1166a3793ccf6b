"""Matching costs and training losses (focal / dice, plus fuzzy-boundary
variants) as pure jnp functions over *padded* ground truth.

The reference computes these over ragged per-video GT lists with a global
(B*Q, N_total) cost matrix (reference models/losses.py, models/maskvrd.py:417-496).
Here raggedness is gone: each batch item carries up to G ground-truth
relations with a validity column mask, costs are per-item (Q, G) blocks
(vmapped), and every reduction is mask-weighted. Semantics match the
reference exactly for valid entries; invalid entries never contribute.

Shapes:
    pred_logits: (B, Q, K+1)      pred_masks: (B, Q, T) logits
    gt_labels:   (B, G) int32     gt_masks:   (B, G, T) {0,1}
    gt_segs:     (B, G, 2)        gt_valid:   (B, G) bool
    seq_mask:    (B, T) bool      -- the per-item temporal validity
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

FOCAL_ALPHA = 0.25
FOCAL_GAMMA = 2.0


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    """Numerically-stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def fuzzy_targets(gt_masks: Array, gt_segs: Array, seq_mask: Array,
                  scale_range: float) -> Array:
    """Cosine-tapered soft targets around segment boundaries.

    reference models/losses.py:215-225 (and the three other copies): inside
    the inner band (|t-c| < L/2*sr) targets stay binary; in the fuzzy ring
    (inner < |t-c| < L/2/sr) they decay as sqrt(relu(cos(pi*sr/L*(t-c)))).

    gt_masks: (..., G, T), gt_segs: (..., G, 2), seq_mask: (..., T) bool.
    """
    s = gt_segs[..., 0].astype(jnp.float32)
    e = gt_segs[..., 1].astype(jnp.float32)
    center = (e - 1 + s) / 2.0                       # (..., G)
    length = e - s
    # padded gt slots have length 0; keep the math finite (they are gated
    # out by validity masks downstream, but 0 * nan would still be nan)
    safe_len = jnp.where(length > 0, length, 1.0)
    t_idx = jnp.arange(gt_masks.shape[-1], dtype=jnp.float32)
    dist = jnp.abs(t_idx - center[..., None])        # (..., G, T)
    smask = seq_mask[..., None, :]
    abs_pos = dist < (length[..., None] / 2.0 * scale_range)
    all_rng = (dist < (length[..., None] / 2.0 / scale_range)) & smask
    fuzzy = jnp.logical_xor(all_rng, abs_pos) & smask
    w = jnp.cos(jnp.pi * scale_range / safe_len[..., None]
                * (t_idx - center[..., None]))
    w = jnp.sqrt(w * (w > 0))
    return w * fuzzy + gt_masks * abs_pos


# ---------------------------------------------------------------------------
# pairwise matching costs (per batch item, vmapped by the caller)
# ---------------------------------------------------------------------------

def pairwise_class_cost(pred_logits: Array, gt_labels: Array) -> Array:
    """(Q, K+1) x (G,) -> (Q, G) cross-entropy cost
    (reference maskvrd.py:450-452)."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)   # (Q, K+1)
    return -logp[:, gt_labels]                        # (Q, G)


def pairwise_focal_cost(pred_masks: Array, gt_tgt: Array,
                        seq_mask: Array) -> Array:
    """(Q, T) logits x (G, T) targets -> (Q, G) focal cost.

    reference batch_masked_sigmoid_focal_loss (models/losses.py:4-42), with
    out/tgt masks both equal to the item's temporal mask. gt_tgt may already
    be soft (fuzzy) targets.
    """
    prob = jax.nn.sigmoid(pred_masks)
    fp = (1 - prob) ** FOCAL_GAMMA * _bce_with_logits(
        pred_masks, jnp.ones_like(pred_masks)) * FOCAL_ALPHA
    fn = prob ** FOCAL_GAMMA * _bce_with_logits(
        pred_masks, jnp.zeros_like(pred_masks)) * (1 - FOCAL_ALPHA)
    m = seq_mask.astype(fp.dtype)
    fp = fp * m
    fn = fn * m
    tgt = gt_tgt * m
    cost = fp @ tgt.T + fn @ ((1 - gt_tgt) * m).T     # (Q, G)
    return cost / jnp.sum(m)


def pairwise_dice_cost(pred_masks: Array, gt_tgt: Array,
                       seq_mask: Array) -> Array:
    """(Q, T) x (G, T) -> (Q, G) dice cost
    (reference batch_masked_dice_loss, models/losses.py:75-96)."""
    m = seq_mask.astype(pred_masks.dtype)
    p = jax.nn.sigmoid(pred_masks) * m
    tgt = gt_tgt * m
    num = 2.0 * (p @ tgt.T)
    den = jnp.sum(p, -1)[:, None] + jnp.sum(tgt, -1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


def matching_cost(pred_logits: Array, pred_masks: Array, gt_labels: Array,
                  gt_masks: Array, gt_segs: Array | None, gt_valid: Array,
                  seq_mask: Array, *, cost_class: float, cost_mask: float,
                  cost_dice: float, scale_range: float | None) -> Array:
    """Per-item (Q, G) total matching cost; invalid gt columns get +inf-ish.

    Applied per batch element via jax.vmap.
    """
    if scale_range is not None:
        tgt = fuzzy_targets(gt_masks, gt_segs, seq_mask, scale_range)
    else:
        tgt = gt_masks
    c = (cost_class * pairwise_class_cost(pred_logits, gt_labels)
         + cost_mask * pairwise_focal_cost(pred_masks, tgt, seq_mask)
         + cost_dice * pairwise_dice_cost(pred_masks, tgt, seq_mask))
    # invalid columns are re-masked inside match_padded with a data-derived
    # constant; keep them finite here
    return jnp.nan_to_num(c, nan=0.0, posinf=0.0, neginf=0.0)


# ---------------------------------------------------------------------------
# post-match losses over the padded batch
# ---------------------------------------------------------------------------

def classification_loss(pred_logits: Array, target_classes: Array,
                        eos_coef: float) -> Array:
    """Weighted CE over all queries (reference loss_labels, maskvrd.py:498-512).

    target_classes: (B, Q) int (0 = background). Torch's weighted
    F.cross_entropy reduces as sum(w_i * ce_i) / sum(w_i).
    """
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target_classes[..., None],
                              axis=-1)[..., 0]           # (B, Q)
    w = jnp.where(target_classes == 0, eos_coef, 1.0)
    return jnp.sum(w * ce) / jnp.sum(w)


def matched_focal_loss(pred: Array, tgt: Array, loss_mask: Array,
                       pair_valid: Array, num_masks: Array) -> Array:
    """Focal loss over matched (pred, gt) mask pairs.

    pred/tgt: (N, T); loss_mask: (N, T) temporal validity; pair_valid: (N,)
    marks real (non-padded) matches. Reference masked_sigmoid_focal_loss
    (models/losses.py:98-129): per-pair mean over the FULL padded T then
    summed and divided by num_masks. tgt may be soft (fuzzy).
    """
    prob = jax.nn.sigmoid(pred)
    ce = _bce_with_logits(pred, tgt)
    p_t = prob * tgt + (1 - prob) * (1 - tgt)
    loss = ce * (1 - p_t) ** FOCAL_GAMMA
    alpha_t = FOCAL_ALPHA * tgt + (1 - FOCAL_ALPHA) * (1 - tgt)
    loss = alpha_t * loss * loss_mask.astype(loss.dtype)
    per_pair = jnp.mean(loss, axis=1) * pair_valid.astype(loss.dtype)
    return jnp.sum(per_pair) / num_masks


def matched_focal_fuzzy_loss(pred: Array, tgt: Array, segs: Array,
                             loss_mask: Array, pair_valid: Array,
                             num_masks: Array, scale_range: float) -> Array:
    """Fuzzy-boundary focal loss (reference masked_sigmoid_focal_fuzzy_loss,
    models/losses.py:272-316). Note the reference quirk: the BCE target is
    (targets_pos * loss_mask) while p_t / alpha_t use the unmasked
    targets_pos — reproduced verbatim."""
    tgt_pos = fuzzy_targets(tgt[:, None, :], segs[:, None, :],
                            loss_mask, scale_range)[:, 0, :]
    prob = jax.nn.sigmoid(pred)
    mask_f = loss_mask.astype(pred.dtype)
    ce = _bce_with_logits(pred, tgt_pos * mask_f)
    p_t = prob * tgt_pos + (1 - prob) * (1 - tgt_pos)
    loss = ce * (1 - p_t) ** FOCAL_GAMMA
    alpha_t = FOCAL_ALPHA * tgt_pos + (1 - FOCAL_ALPHA) * (1 - tgt_pos)
    loss = alpha_t * loss * mask_f
    per_pair = jnp.mean(loss, axis=1) * pair_valid.astype(loss.dtype)
    return jnp.sum(per_pair) / num_masks


def matched_dice_loss(pred: Array, tgt: Array, loss_mask: Array,
                      pair_valid: Array, num_masks: Array) -> Array:
    """Dice loss over matched pairs (reference masked_dice_loss,
    models/losses.py:152-172)."""
    m = loss_mask.astype(pred.dtype)
    p = jax.nn.sigmoid(pred) * m
    t = tgt * m
    num = 2.0 * jnp.sum(p * t, axis=-1)
    den = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)
    loss = (1.0 - (num + 1.0) / (den + 1.0)) * pair_valid.astype(pred.dtype)
    return jnp.sum(loss) / num_masks


def matched_dice_fuzzy_loss(pred: Array, tgt: Array, segs: Array,
                            loss_mask: Array, pair_valid: Array,
                            num_masks: Array, scale_range: float) -> Array:
    """Fuzzy dice (reference masked_dice_fuzzy_loss, models/losses.py:320-354)."""
    tgt_pos = fuzzy_targets(tgt[:, None, :], segs[:, None, :],
                            loss_mask, scale_range)[:, 0, :]
    m = loss_mask.astype(pred.dtype)
    p = jax.nn.sigmoid(pred) * m
    t = tgt_pos * m
    num = 2.0 * jnp.sum(p * t, axis=-1)
    den = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)
    loss = (1.0 - (num + 1.0) / (den + 1.0)) * pair_valid.astype(pred.dtype)
    return jnp.sum(loss) / num_masks
