"""Subject-Object Synergy (SOS) backbone.

Embeds the subject/object visual streams + bbox geometry streams of each
SO-pair sequence, runs mutual (subject<->object) cross-attention in the stem,
fuses, and produces a temporal feature pyramid.

Mirrors reference models/backbones.py:8-248 (base) and :250-436 (CLIP
variant) on a time-major (B, T, C) layout. Channel slicing of the packed
input follows the reference contract (backbones.py:158-166, 327-341):

    base:  [s_visual | o_visual | so_bbox(5) | s_bbox(8) | o_bbox(8)]
    clip:  [s_visual | o_visual | s_clip | o_clip | so_bbox | s_bbox | o_bbox]
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import masked as mops
from .layers import (ChannelLayerNorm, ConvMLP, DecoderLayer, MaskedConv1D,
                     TransformerBlock)

Array = jax.Array


class SOSBackbone(nn.Module):
    """Conv-transformer backbone with subject-object mutual attention."""
    n_visual: int
    n_bbox_entity: int
    n_bbox_so: int
    n_embd: int
    n_head: int
    n_embd_ks: int
    fuse_ks: int
    n_fuse_head: int
    fuse_path_drop: float
    fuse_qx_stride: int
    fuse_kv_stride: int
    max_len: int
    arch: tuple[int, int, int] = (2, 2, 3)
    mha_win_size: Sequence[int] = (-1, -1, -1, -1)
    scale_factor: int = 2
    with_ln: bool = False
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    use_abs_pe: bool = False
    use_rel_pe: bool = False
    use_local: bool = True
    n_clip: Optional[int] = None  # set -> CLIP-fused variant
    # batch the shared-weight subject/object stream ops as ONE 2B-row call
    # instead of two B-row calls: same math per row (convs, LN, attention
    # all reduce within a row), half the kernel dispatches, and XLA tiles
    # the doubled batch onto the MXU/VPU in fewer, fuller fusions. Exact
    # in deterministic mode; under droppath the per-sample draws land on
    # different rows but keep the reference's independent-per-stream
    # semantics.
    stream_batch: bool = False

    def setup(self):
        assert len(self.arch) == 3
        assert len(self.mha_win_size) == 1 + self.arch[-1]

        self.visual_embd = [
            MaskedConv1D(self.n_embd, self.n_embd_ks,
                         use_bias=not self.with_ln,
                         name=f"visual_embd_{i}")
            for i in range(self.arch[0])]
        self.visual_embd_norm = [
            (ChannelLayerNorm(self.n_embd, name=f"visual_embd_norm_{i}")
             if self.with_ln else None)
            for i in range(self.arch[0])]

        if self.n_clip is not None:
            self.clip_embd = [
                MaskedConv1D(self.n_embd, self.n_embd_ks,
                             use_bias=not self.with_ln,
                             name=f"clip_embd_{i}")
                for i in range(self.arch[0])]
            self.clip_embd_norm = [
                (ChannelLayerNorm(self.n_embd, name=f"clip_embd_norm_{i}")
                 if self.with_ln else None)
                for i in range(self.arch[0])]
            self.visual_clip_fuse = ConvMLP(
                self.n_embd, self.n_embd, num_layers=2,
                kernel_size=self.fuse_ks, name="visual_clip_fuse")

        self.bbox_entity_embd = MaskedConv1D(
            self.n_embd, self.n_embd_ks, name="bbox_entity_embd")
        self.bbox_entity_norm = (
            ChannelLayerNorm(self.n_embd, name="bbox_entity_norm")
            if self.with_ln else None)
        self.visual_bbox_fuse = ConvMLP(
            self.n_embd, self.n_embd, num_layers=2, kernel_size=self.fuse_ks,
            name="visual_bbox_fuse")

        self.stem = [
            TransformerBlock(
                self.n_embd, self.n_head, n_ds_strides=(1, 1),
                attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                path_pdrop=self.path_pdrop,
                mha_win_size=self.mha_win_size[0],
                use_rel_pe=self.use_rel_pe, name=f"stem_{i}")
            for i in range(self.arch[1])]
        self.s_attn = [
            DecoderLayer(
                self.n_embd, self.n_fuse_head,
                path_pdrop=self.fuse_path_drop,
                n_qx_stride=self.fuse_qx_stride,
                n_kv_stride=self.fuse_kv_stride, with_ffn=False,
                use_local=self.use_local,
                win_size=self.mha_win_size[0] if self.use_local else None,
                name=f"s_attn_{i}")
            for i in range(self.arch[1])]
        self.o_attn = [
            DecoderLayer(
                self.n_embd, self.n_fuse_head,
                path_pdrop=self.fuse_path_drop,
                n_qx_stride=self.fuse_qx_stride,
                n_kv_stride=self.fuse_kv_stride, with_ffn=False,
                use_local=self.use_local,
                win_size=self.mha_win_size[0] if self.use_local else None,
                name=f"o_attn_{i}")
            for i in range(self.arch[1])]

        self.s_fuse_norm = ChannelLayerNorm(self.n_embd, name="s_fuse_norm")
        self.o_fuse_norm = ChannelLayerNorm(self.n_embd, name="o_fuse_norm")
        self.so_fuse = ConvMLP(self.n_embd, self.n_embd, num_layers=2,
                               kernel_size=self.fuse_ks, name="so_fuse")
        self.bbox_so_embd = MaskedConv1D(
            self.n_embd, self.n_embd_ks, name="bbox_so_embd")
        self.so_visual_bbox_fuse = ConvMLP(
            self.n_embd, self.n_embd, num_layers=2, kernel_size=self.fuse_ks,
            name="so_visual_bbox_fuse")

        self.branch = [
            TransformerBlock(
                self.n_embd, self.n_head,
                n_ds_strides=(self.scale_factor, self.scale_factor),
                attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                path_pdrop=self.path_pdrop,
                mha_win_size=self.mha_win_size[1 + i],
                use_rel_pe=self.use_rel_pe, name=f"branch_{i}")
            for i in range(self.arch[2])]

        if self.use_abs_pe:
            # fixed sinusoid table, not a parameter (reference registers it
            # as a non-persistent buffer, backbones.py:70-72)
            self.pos_embd = (
                mops.sinusoid_encoding(self.max_len, self.n_embd)
                / (self.n_embd ** 0.5))

    def _split_channels(self, x: Array):
        nv, nc = self.n_visual, self.n_clip
        nso, ne = self.n_bbox_so, self.n_bbox_entity
        if nc is None:
            expect = 2 * nv + nso + 2 * ne
            assert x.shape[-1] == expect, (x.shape, expect)
            s_feat = x[..., :nv]
            o_feat = x[..., nv:2 * nv]
            so_bbox = x[..., 2 * nv:2 * nv + nso]
            s_bbox = x[..., 2 * nv + nso:2 * nv + nso + ne]
            o_bbox = x[..., 2 * nv + nso + ne:]
            return s_feat, o_feat, None, None, so_bbox, s_bbox, o_bbox
        expect = 2 * nv + 2 * nc + nso + 2 * ne
        assert x.shape[-1] == expect, (x.shape, expect)
        s_feat = x[..., :nv]
        o_feat = x[..., nv:2 * nv]
        s_clip = x[..., 2 * nv:2 * nv + nc]
        o_clip = x[..., 2 * nv + nc:2 * nv + 2 * nc]
        base = 2 * nv + 2 * nc
        so_bbox = x[..., base:base + nso]
        s_bbox = x[..., base + nso:base + nso + ne]
        o_bbox = x[..., base + nso + ne:]
        return s_feat, o_feat, s_clip, o_clip, so_bbox, s_bbox, o_bbox

    def _pe(self, t: int, training: bool) -> Array:
        pe = jnp.asarray(self.pos_embd)
        if training:
            assert t <= self.max_len, "Reached max length."
            return pe[:t]
        if t >= self.max_len:
            return mops.resize_pe_linear(pe, t)
        return pe[:t]

    def __call__(self, x: Array, mask: Array, *, deterministic: bool = True
                 ) -> tuple[tuple[Array, ...], tuple[Array, ...]]:
        """x: (B, T, C_packed), mask: (B, T) bool.

        Returns (feats, masks): pyramid tuples, level 0 at full resolution.
        """
        if self.stream_batch:
            return self._call_stream_batched(x, mask,
                                             deterministic=deterministic)
        (s_feat, o_feat, s_clip, o_clip,
         so_bbox, s_bbox, o_bbox) = self._split_channels(x)
        mask_f = mask[..., None].astype(s_feat.dtype)
        t = s_feat.shape[1]

        # shared-weight conv embedding of both visual streams
        for conv, norm in zip(self.visual_embd, self.visual_embd_norm):
            s_feat, _ = conv(s_feat, mask)
            s_feat = jax.nn.relu(norm(s_feat) if norm is not None else s_feat)
            o_feat, _ = conv(o_feat, mask)
            o_feat = jax.nn.relu(norm(o_feat) if norm is not None else o_feat)

        if self.n_clip is not None:
            for conv, norm in zip(self.clip_embd, self.clip_embd_norm):
                s_clip, _ = conv(s_clip, mask)
                s_clip = jax.nn.relu(norm(s_clip) if norm is not None else s_clip)
                o_clip, _ = conv(o_clip, mask)
                o_clip = jax.nn.relu(norm(o_clip) if norm is not None else o_clip)
            s_feat = self.visual_clip_fuse(
                jnp.concatenate([s_feat, s_clip], axis=-1),
                deterministic=deterministic)
            o_feat = self.visual_clip_fuse(
                jnp.concatenate([o_feat, o_clip], axis=-1),
                deterministic=deterministic)
            s_feat = s_feat * mask_f
            o_feat = o_feat * mask_f

        if self.use_abs_pe:
            pe = self._pe(t, training=not deterministic)[None]
            s_feat = s_feat + pe * mask_f
            o_feat = o_feat + pe * mask_f

        # bbox geometry streams (shared entity embed)
        s_bbox, _ = self.bbox_entity_embd(s_bbox, mask)
        s_bbox = jax.nn.relu(self.bbox_entity_norm(s_bbox)
                             if self.bbox_entity_norm is not None else s_bbox)
        o_bbox, _ = self.bbox_entity_embd(o_bbox, mask)
        o_bbox = jax.nn.relu(self.bbox_entity_norm(o_bbox)
                             if self.bbox_entity_norm is not None else o_bbox)

        s_feat = self.visual_bbox_fuse(
            jnp.concatenate([s_feat, s_bbox], axis=-1),
            deterministic=deterministic) * mask_f
        o_feat = self.visual_bbox_fuse(
            jnp.concatenate([o_feat, o_bbox], axis=-1),
            deterministic=deterministic) * mask_f

        # stem: per-stream encoding + subject-object mutual cross-attention
        for blk, s_attn, o_attn in zip(self.stem, self.s_attn, self.o_attn):
            s_feat, _ = blk(s_feat, mask, deterministic=deterministic)
            o_feat, _ = blk(o_feat, mask, deterministic=deterministic)
            s_mut, _ = s_attn(s_feat, o_feat, mask, mask,
                              deterministic=deterministic)
            o_mut, _ = o_attn(o_feat, s_feat, mask, mask,
                              deterministic=deterministic)
            s_feat = s_feat + s_mut
            o_feat = o_feat + o_mut

        s_feat = self.s_fuse_norm(s_feat)
        o_feat = self.o_fuse_norm(o_feat)

        so_feat = self.so_fuse(jnp.concatenate([s_feat, o_feat], axis=-1),
                               deterministic=deterministic) * mask_f
        so_bbox, _ = self.bbox_so_embd(so_bbox, mask)
        so_embedding = self.so_visual_bbox_fuse(
            jnp.concatenate([so_feat, so_bbox], axis=-1),
            deterministic=deterministic) * mask_f

        feats = (so_embedding,)
        masks = (mask,)
        for blk in self.branch:
            so_embedding, mask = blk(so_embedding, mask,
                                     deterministic=deterministic)
            feats += (so_embedding,)
            masks += (mask,)
        return feats, masks

    def _call_stream_batched(self, x: Array, mask: Array, *,
                             deterministic: bool = True
                             ) -> tuple[tuple[Array, ...], tuple[Array, ...]]:
        """Stream-batched flow: subject/object rows stacked on the batch
        axis ((2B, T, C)) through every shared-weight op; split only where
        the two streams interact (mutual cross-attention, per-stream fuse
        norms). Same per-row math as __call__."""
        (s_feat, o_feat, s_clip, o_clip,
         so_bbox, s_bbox, o_bbox) = self._split_channels(x)
        b = s_feat.shape[0]
        t = s_feat.shape[1]
        mask_f = mask[..., None].astype(s_feat.dtype)
        mask2 = jnp.concatenate([mask, mask], axis=0)
        mask2_f = mask2[..., None].astype(s_feat.dtype)

        feat = jnp.concatenate([s_feat, o_feat], axis=0)       # (2B, T, nv)
        for conv, norm in zip(self.visual_embd, self.visual_embd_norm):
            feat, _ = conv(feat, mask2)
            feat = jax.nn.relu(norm(feat) if norm is not None else feat)

        if self.n_clip is not None:
            clip = jnp.concatenate([s_clip, o_clip], axis=0)
            for conv, norm in zip(self.clip_embd, self.clip_embd_norm):
                clip, _ = conv(clip, mask2)
                clip = jax.nn.relu(norm(clip) if norm is not None else clip)
            feat = self.visual_clip_fuse(
                jnp.concatenate([feat, clip], axis=-1),
                deterministic=deterministic) * mask2_f

        if self.use_abs_pe:
            pe = self._pe(t, training=not deterministic)[None]
            feat = feat + pe * mask2_f

        bbox = jnp.concatenate([s_bbox, o_bbox], axis=0)
        bbox, _ = self.bbox_entity_embd(bbox, mask2)
        bbox = jax.nn.relu(self.bbox_entity_norm(bbox)
                           if self.bbox_entity_norm is not None else bbox)

        feat = self.visual_bbox_fuse(
            jnp.concatenate([feat, bbox], axis=-1),
            deterministic=deterministic) * mask2_f

        # stem: shared encoder on the stacked streams; mutual
        # cross-attention needs the streams apart (distinct weights)
        for blk, s_attn, o_attn in zip(self.stem, self.s_attn, self.o_attn):
            feat, _ = blk(feat, mask2, deterministic=deterministic)
            s_feat, o_feat = feat[:b], feat[b:]
            s_mut, _ = s_attn(s_feat, o_feat, mask, mask,
                              deterministic=deterministic)
            o_mut, _ = o_attn(o_feat, s_feat, mask, mask,
                              deterministic=deterministic)
            feat = jnp.concatenate([s_feat + s_mut, o_feat + o_mut], axis=0)

        s_feat = self.s_fuse_norm(feat[:b])
        o_feat = self.o_fuse_norm(feat[b:])

        so_feat = self.so_fuse(jnp.concatenate([s_feat, o_feat], axis=-1),
                               deterministic=deterministic) * mask_f
        so_bbox, _ = self.bbox_so_embd(so_bbox, mask)
        so_embedding = self.so_visual_bbox_fuse(
            jnp.concatenate([so_feat, so_bbox], axis=-1),
            deterministic=deterministic) * mask_f

        feats = (so_embedding,)
        masks = (mask,)
        for blk in self.branch:
            so_embedding, mask = blk(so_embedding, mask,
                                     deterministic=deterministic)
            feats += (so_embedding,)
            masks += (mask,)
        return feats, masks
