"""Ragged -> static-shape batch packing.

All raggedness (variable pairs per step, variable GT per pair, variable
sequence lengths) dies here, on the host, before XLA sees anything. Train
batches have ONE static shape; eval batches use a small family of bucketed
shapes (short = max_seq_len; long = max_seq_len * 2**k rounded to the
model's max_div_factor), mirroring the reference's short/long bucketing
(reference models/maskvrd.py:363-414) while keeping recompilation bounded.
"""

from __future__ import annotations

import numpy as np


def pack_train_batch(pairs: list[dict], pack_size: int, max_seq_len: int,
                     num_gt: int, feat_dim: int) -> dict:
    """Pack per-pair dicts (from datasets.train_pairs) into the static
    training batch contract of models/maskvrd.py.

    pairs beyond pack_size are dropped (the loader sizes pack_size =
    batch_size * num_pairs, the reference's nominal batch; overflow can only
    happen when a policy group unexpectedly yields extra pairs).
    """
    p = pack_size
    item_valid = np.zeros((p,), bool)
    gt_labels = np.zeros((p, num_gt), np.int32)
    gt_masks = np.zeros((p, num_gt, max_seq_len), np.float32)
    gt_segs = np.zeros((p, num_gt, 2), np.int32)
    gt_valid = np.zeros((p, num_gt), bool)

    # feature packing is the bulk of the copy work; use the native packer
    # (native/tracklet_ops.cpp) when built
    from . import native
    if native.have_native() and pairs:
        feats, seq_mask = native.pack_pairs(
            [pair["so_feat"] for pair in pairs[:p]], p, max_seq_len,
            feat_dim)
    else:
        feats = np.zeros((p, max_seq_len, feat_dim), np.float32)
        seq_mask = np.zeros((p, max_seq_len), bool)
        for i, pair in enumerate(pairs[:p]):
            t = pair["so_feat"].shape[0]
            feats[i, :t] = pair["so_feat"]
            seq_mask[i, :t] = True
        # keep one valid frame on padded rows (finite masked reductions)
        seq_mask[len(pairs[:p]):, 0] = True

    for i, pair in enumerate(pairs[:p]):
        item_valid[i] = True
        n = min(len(pair["preds"]), num_gt)
        gt_labels[i, :n] = pair["preds"][:n]
        gt_masks[i, :n] = pair["masks"][:n]
        gt_segs[i, :n] = pair["segs"][:n]
        gt_valid[i, :n] = True
    return {
        "feats": feats,
        "seq_mask": seq_mask,
        "item_valid": item_valid,
        "gt_labels": gt_labels,
        "gt_masks": gt_masks,
        "gt_segs": gt_segs,
        "gt_valid": gt_valid,
    }


def eval_bucket_lengths(lengths: np.ndarray, max_seq_len: int,
                        max_div_factor: int) -> np.ndarray:
    """Padded length per sequence: max_seq_len for short ones; for long
    ones, max_seq_len * 2**k rounded up to max_div_factor. A geometric
    ladder keeps the number of distinct XLA programs logarithmic instead of
    one per video (the reference pads each batch to its own max,
    recompiling... which torch does not care about, XLA does)."""
    out = np.full(lengths.shape, max_seq_len, np.int64)
    long = lengths > max_seq_len
    if long.any():
        k = np.ceil(np.log2(lengths[long] / max_seq_len)).astype(np.int64)
        padded = max_seq_len * (2 ** k)
        padded = ((padded + max_div_factor - 1)
                  // max_div_factor) * max_div_factor
        out[long] = padded
    return out


def pack_eval_bucket(seqs: list[np.ndarray], pad_len: int,
                     pack_size: int, feat_dim: int) -> tuple[dict, int]:
    """Pack <=pack_size sequences of length <= pad_len into one batch.

    Returns (batch, n_real). Slots beyond n_real are padding with one valid
    frame (finite softmax) and must be dropped by the caller.
    """
    n = len(seqs)
    assert n <= pack_size
    feats = np.zeros((pack_size, pad_len, feat_dim), np.float32)
    mask = np.zeros((pack_size, pad_len), bool)
    for i, s in enumerate(seqs):
        t = s.shape[0]
        assert t <= pad_len, (t, pad_len)
        feats[i, :t] = s
        mask[i, :t] = True
    mask[n:, 0] = True
    return {"feats": feats, "seq_mask": mask}, n
