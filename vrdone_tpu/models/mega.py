"""MEGA-style relation attention over proposal sets (TPU-native redesign).

The reference enhances per-frame RoI features by multi-head attention over
proposals of neighbouring frames, a memory of past frames, and a global
set, maintained as python deques mutated while streaming through a video
(reference datasets/mega/mega_core/modeling/roi_heads/box_head/
roi_box_feature_extractors.py:458-1057 and
generalized_rcnn_mega.py:137-228). Deques + data-dependent set sizes are
anti-XLA; here the same computation is expressed as:

  * RelationAttention: position-embedded multi-head attention between a
    target proposal set and a reference proposal set, both padded to static
    sizes with validity masks (the Relation-Networks geometry bias:
    w = log-geometry -> sinusoid embed -> per-head learned projection,
    ReLU-floored, added in log-space to the content logits),
  * MegaEnhancer.scan_video: a lax.scan over frames with a fixed-size ring
    buffer of (features, boxes, valid) replacing the sliding deque — one
    compiled program per video shape bucket, state threaded functionally.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def geometry_embedding(target_boxes: Array, ref_boxes: Array,
                       dim: int = 64, wave_len: float = 1000.0) -> Array:
    """Pairwise box-geometry sinusoid embedding (Relation Networks for
    Object Detection; the reference's extract_position_matrix /
    extract_position_embedding pair). Returns (N, M, dim)."""
    def cwh(b):
        w = b[:, 2] - b[:, 0] + 1.0
        h = b[:, 3] - b[:, 1] + 1.0
        cx = b[:, 0] + 0.5 * w
        cy = b[:, 1] + 0.5 * h
        return cx, cy, w, h

    txc, tyc, tw, th = cwh(target_boxes)
    rxc, ryc, rw, rh = cwh(ref_boxes)
    dx = jnp.log(jnp.maximum(jnp.abs(txc[:, None] - rxc[None, :]), 1e-3)
                 / tw[:, None])
    dy = jnp.log(jnp.maximum(jnp.abs(tyc[:, None] - ryc[None, :]), 1e-3)
                 / th[:, None])
    dw = jnp.log(rw[None, :] / tw[:, None])
    dh = jnp.log(rh[None, :] / th[:, None])
    pos = jnp.stack([dx, dy, dw, dh], axis=-1)           # (N, M, 4)

    feat_range = jnp.arange(dim // 8)
    dim_mat = wave_len ** (8.0 / dim * feat_range)       # (dim/8,)
    angle = pos[..., None] * 100.0 / dim_mat             # (N, M, 4, dim/8)
    emb = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)
    return emb.reshape(*pos.shape[:2], dim)


class RelationAttention(nn.Module):
    """One attention stage between target and reference proposal sets.

    feat_dim: proposal feature dim (1024 for the C4 pipeline).
    """
    feat_dim: int = 1024
    n_head: int = 16
    geo_dim: int = 64

    @nn.compact
    def __call__(self, tgt_feat: Array, tgt_boxes: Array, ref_feat: Array,
                 ref_boxes: Array, ref_valid: Array) -> Array:
        """tgt: (N, D)+(N, 4); ref: (M, D)+(M, 4)+(M,) bool. Returns the
        attention residual (N, D) (caller adds it)."""
        d = self.feat_dim
        h = self.n_head
        dh = d // h
        q = nn.Dense(d, name="query")(tgt_feat).reshape(-1, h, dh)
        k = nn.Dense(d, name="key")(ref_feat).reshape(-1, h, dh)
        v = nn.Dense(d, name="value")(ref_feat).reshape(-1, h, dh)

        logits = jnp.einsum("nhd,mhd->hnm", q, k) / np.sqrt(dh)

        geo = geometry_embedding(tgt_boxes, ref_boxes, self.geo_dim)
        # per-head scalar geometric weight, ReLU-floored, log-added
        wg = nn.Dense(h, name="geo_proj")(geo)           # (N, M, h)
        wg = jnp.maximum(wg, 1e-6)
        logits = logits + jnp.log(wg).transpose(2, 0, 1)

        logits = jnp.where(ref_valid[None, None, :], logits, -jnp.inf)
        att = jax.nn.softmax(logits, axis=-1)
        # all-invalid reference set -> zero output, not NaN
        att = jnp.where(jnp.any(ref_valid), att, 0.0)
        out = jnp.einsum("hnm,mhd->nhd", att, v).reshape(-1, d)
        return nn.Dense(d, use_bias=False, name="out")(out)


class MegaEnhancer(nn.Module):
    """Stacked relation attention enhancing per-frame proposal features
    with a ring-buffer memory of past frames (+ optional global set)."""
    feat_dim: int = 1024
    n_head: int = 16
    num_stages: int = 2
    mem_frames: int = 25
    props_per_frame: int = 16

    @nn.compact
    def __call__(self, feat: Array, boxes: Array, valid: Array,
                 mem_feat: Array, mem_boxes: Array, mem_valid: Array,
                 global_feat: Array | None = None,
                 global_boxes: Array | None = None,
                 global_valid: Array | None = None) -> Array:
        """Enhance one frame's proposals against flattened memory.

        feat: (N, D), boxes: (N, 4), valid: (N,);
        mem_*: (M, D) / (M, 4) / (M,).
        global_*: optional video-level proposal set (the reference MEGA's
        "global" stage samples shuffled frames across the whole video,
        roi_box_feature_extractors.py:658-700); attended before the
        local/memory stages.
        """
        x = feat
        if global_feat is not None:
            res = RelationAttention(self.feat_dim, self.n_head,
                                    name="global_stage")(
                x, boxes, global_feat, global_boxes, global_valid)
            x = x + res
        # include the current frame in the reference set (self-attention
        # within the frame + cross-attention to memory)
        ref_feat = jnp.concatenate([x, mem_feat], axis=0)
        ref_boxes = jnp.concatenate([boxes, mem_boxes], axis=0)
        ref_valid = jnp.concatenate([valid, mem_valid], axis=0)
        for i in range(self.num_stages):
            res = RelationAttention(self.feat_dim, self.n_head,
                                    name=f"stage_{i}")(
                x, boxes, ref_feat, ref_boxes, ref_valid)
            x = x + res
        return x * valid[:, None].astype(x.dtype)


def init_memory(mem_frames: int, props_per_frame: int, feat_dim: int):
    m = mem_frames * props_per_frame
    return (jnp.zeros((m, feat_dim), jnp.float32),
            jnp.zeros((m, 4), jnp.float32),
            jnp.zeros((m,), bool))


def scan_video(apply_fn, params, feats: Array, boxes: Array, valid: Array,
               *, mem_frames: int = 25) -> Array:
    """Stream a whole video through the enhancer with a ring buffer.

    feats: (T, N, D), boxes: (T, N, 4), valid: (T, N). Returns enhanced
    (T, N, D). apply_fn(params, feat, boxes, valid, mem...) is the bound
    MegaEnhancer. The ring buffer holds the RAW features of the last
    mem_frames frames (the reference's local memory deque,
    generalized_rcnn_mega.py:163-201).
    """
    t, n, d = feats.shape
    mem_feat, mem_boxes, mem_valid = init_memory(mem_frames, n, d)

    def step(carry, inp):
        mem_feat, mem_boxes, mem_valid = carry
        f, b, vl = inp
        out = apply_fn(params, f, b, vl, mem_feat, mem_boxes, mem_valid)
        # ring-buffer update: roll one frame-slot, write the newest
        mem_feat = jnp.roll(mem_feat, -n, axis=0).at[-n:].set(f)
        mem_boxes = jnp.roll(mem_boxes, -n, axis=0).at[-n:].set(b)
        mem_valid = jnp.roll(mem_valid, -n, axis=0).at[-n:].set(vl)
        return (mem_feat, mem_boxes, mem_valid), out

    _, outs = jax.lax.scan(step, (mem_feat, mem_boxes, mem_valid),
                           (feats, boxes, valid))
    return outs
