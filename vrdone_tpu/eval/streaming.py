"""Streaming long-video relation detection (new capability, beyond the
reference).

The reference handles over-length sequences by padding the WHOLE sequence
to a multiple of max_div_factor and running one giant forward (reference
models/maskvrd.py:363-414) — memory and latency grow linearly with video
length, and XLA would recompile per length. Here an unbounded SO-pair
sequence is processed in fixed-size chunks with an overlap-save halo:

  * every temporal operator in the local-attention configuration
    (use_local=True) has a finite receptive field — band attention (+-w),
    depthwise convs (+-1), strided pyramid (x2 per level) — so features at
    positions >= halo away from a chunk edge are *exactly* equal to the
    full-sequence computation;
  * each chunk therefore runs through ONE compiled fixed-shape program with
    `halo` frames of context on each side, and only the interior is kept;
  * per-chunk query decoding emits triplet spans in global coordinates;
    spans of the same predicate that meet across a chunk boundary are
    stitched (the same temporal-merge rule the datasets apply to GT,
    reference dataloaders/vidvrd.py:234-280).

Memory is O(chunk) regardless of video length and there is exactly one XLA
program for the streaming path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import InferenceConfig, ModelConfig
from ..models.maskvrd import MaskVRD

Array = jax.Array


def receptive_halo(cfg: ModelConfig) -> int:
    """Upper bound on the one-sided temporal receptive field of
    backbone+FPN features, in full-resolution frames.

    Per stem iteration: encoder block (qkv conv +-1, band +-w) plus two
    mutual cross-attention layers (each qkv conv +-1, band +-w). Branch
    level l runs at stride 2^l; its +-(w+2) support costs 2^l full-res
    frames per step, plus the FPN top-down 3-convs. Requires use_local=True
    (dense cross attention would make the field global).
    """
    assert cfg.use_local, "streaming requires the local-attention config"
    w = cfg.n_mha_win_size // 2
    halo = 2 * (cfg.embd_kernel_size // 2) * 2   # embed convs (both streams)
    halo += cfg.backbone_arch[1] * 3 * (w + 2)   # stem + s/o mutual attn
    halo += 4                                     # bbox/fuse convs
    for lvl in range(1, cfg.backbone_arch[2] + 1):
        halo += (w + 3) * (2 ** lvl)              # branch block at stride 2^l
        halo += 2 * (2 ** lvl)                    # FPN lateral/fpn convs
    # round up to the padding quantum so chunk shapes stay aligned
    q = cfg.max_div_factor
    return ((halo + q - 1) // q) * q


def merge_spans(records: list[dict]) -> list[dict]:
    """Stitch spans of the same (query, predicate) that overlap or abut
    across chunk boundaries; score = max of the parts.

    Keyed per (query, pred_cat) so the streaming output has the same
    granularity as the batch decode path (eval/decode.py::decode_video
    emits one span per (query, top-k class)); a sequence that fits in one
    chunk therefore yields bit-identical spans to the batch path (pinned
    by tests/test_streaming.py::test_single_chunk_matches_batch_decode).
    Records missing a "query" field merge query-agnostically (legacy)."""
    by_key: dict[tuple, list[dict]] = {}
    for r in records:
        by_key.setdefault((r.get("query", -1), r["pred_cat"]), []).append(r)
    out = []
    for recs in by_key.values():
        recs.sort(key=lambda r: r["start"])
        cur = dict(recs[0])
        for r in recs[1:]:
            if r["start"] <= cur["end"]:          # overlap or abut
                cur["end"] = max(cur["end"], r["end"])
                cur["score"] = max(cur["score"], r["score"])
            else:
                out.append(cur)
                cur = dict(r)
        out.append(cur)
    return out


class StreamingRunner:
    """Chunked inference over arbitrarily long SO-pair sequences."""

    def __init__(self, cfg: ModelConfig, params, infer: InferenceConfig,
                 feat_dim: int, chunk_len: int | None = None,
                 chunk_batch: int = 8):
        self.cfg = cfg
        self.infer = infer
        self.params = params
        self.feat_dim = feat_dim
        self.halo = receptive_halo(cfg)
        self.chunk_len = chunk_len or max(cfg.max_seq_len, 4 * self.halo)
        q = cfg.max_div_factor
        self.chunk_len = ((self.chunk_len + q - 1) // q) * q
        self.interior = self.chunk_len - 2 * self.halo
        assert self.interior > 0, (self.chunk_len, self.halo)
        # chunks are independent (overlap-save), so they batch freely —
        # fills the chip instead of running (1, chunk) forwards
        self.chunk_batch = chunk_batch
        self.model = MaskVRD(cfg)
        self._fn = None

    def _forward(self):
        if self._fn is None:
            @jax.jit
            def fn(params, feats, mask):
                preds = self.model.apply({"params": params}, feats, mask,
                                         deterministic=True)
                probs = jax.nn.softmax(preds["pred_logits"], axis=-1)
                scores, catids = jax.lax.top_k(probs[..., 1:],
                                               self.infer.topk)
                masks_bin = jax.nn.sigmoid(preds["pred_masks"]) > 0.5
                return scores, catids + 1, masks_bin
            self._fn = fn
        return self._fn

    def chunk_starts(self, t: int) -> list[tuple[int, int, int]]:
        """(chunk_start, keep_lo, keep_hi) triples covering [0, t)."""
        if t <= self.chunk_len:
            return [(0, 0, t)]
        out = []
        pos = 0
        while pos < t:
            start = max(0, min(pos - self.halo, t - self.chunk_len))
            keep_lo = pos - start
            keep_hi = min(keep_lo + self.interior + (self.halo if pos == 0
                                                     else 0), t - start)
            # last chunk keeps through the end
            if start + self.chunk_len >= t:
                keep_hi = t - start
            out.append((start, keep_lo, keep_hi))
            pos = start + keep_hi
        return out

    def run_pair(self, so_feat: np.ndarray) -> list[dict]:
        """Returns span records: dicts with query, pred_cat (1-based),
        score, start, end — in feature-grid coords; one record per
        (query, top-k class), same granularity as the batch decode."""
        t = so_feat.shape[0]
        fn = self._forward()
        records = []
        chunks = self.chunk_starts(t)
        cb = self.chunk_batch
        for group_start in range(0, len(chunks), cb):
            group = chunks[group_start:group_start + cb]
            feats = np.zeros((cb, self.chunk_len, self.feat_dim), np.float32)
            mask = np.zeros((cb, self.chunk_len), bool)
            ends = []
            for gi, (start, _, _) in enumerate(group):
                end = min(start + self.chunk_len, t)
                feats[gi, :end - start] = so_feat[start:end]
                mask[gi, :end - start] = True
                ends.append(end)
            mask[len(group):, 0] = True  # padded chunk slots stay finite
            b_scores, b_catids, b_masks = fn(self.params, jnp.asarray(feats),
                                             jnp.asarray(mask))
            b_scores = np.asarray(b_scores)
            b_catids = np.asarray(b_catids)
            b_masks = np.asarray(b_masks)
            for gi, (start, keep_lo, keep_hi) in enumerate(group):
                end = ends[gi]
                scores, catids = b_scores[gi], b_catids[gi]   # (Q, topk)
                masks_bin = b_masks[gi]                        # (Q, chunk)
                nq, topk = scores.shape
                for qi in range(nq):
                    on = masks_bin[qi, :end - start].copy()
                    # restrict to the interior this chunk owns
                    on[:keep_lo] = False
                    on[keep_hi:] = False
                    idx = np.nonzero(on)[0]
                    if len(idx) == 0:
                        continue
                    # batch-decode semantics (eval/decode.py:127-132): one
                    # span per (query, class) = first..last True index,
                    # gaps included; cross-chunk stitching happens in
                    # merge_spans keyed on the same (query, class).
                    lo = int(idx[0]) + start
                    hi = int(idx[-1]) + start + 1
                    for k in range(topk):
                        records.append({
                            "query": qi,
                            "pred_cat": int(catids[qi, k]),
                            "score": float(scores[qi, k]),
                            "start": lo, "end": hi,
                        })
        return merge_spans(records)
