"""RDN relation-attention head (TPU-native, reference-fidelity).

The RDN ("Relation Distillation Networks") detector variant — the second
video-detection method the reference ships (reference datasets/mega/
mega_core/modeling/roi_heads/box_head/roi_box_feature_extractors.py:
253-455, generalized_rcnn_rdn.py). Shares MEGA's grouped position-biased
attention but WITHOUT the content-free query `u`, without long-range
memory and without global stages:

  * base stages: x = relu(fc_i(x)); x += attention(x, refs) over the full
    reference set (:371-376 / :428-433),
  * optional advanced stages (:378-396 / :435-453): a distilled subset
    (first advanced_num per base_num block) is refined by attending over
    the full set, then the key attends over the distilled set.

Reference defaults (config/defaults.py:421-427): base_stage=2
(ATTENTION.STAGE), advanced_stage=0, window=37 (RDN.ALL_FRAME_INTERVAL),
key at 18, advanced_num = 75 * 0.2.

Static-shape redesign as in models/mega.py: padded sets + validity masks,
whole-video inference = batched fc0 precompute + one lax.scan over the
sliding window (no carried state — RDN has no memory).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mega import (NEG_INF, BoxSet, GroupedLinear, _fc_init,
                   cal_position_embedding, flatten_set, window_indices)

Array = jax.Array


class RDNHead(nn.Module):
    feat_dim: int = 1024
    embed_dim: int = 64
    groups: int = 16
    base_stage: int = 2
    advanced_stage: int = 0
    advanced_num: int = 15

    def setup(self):
        fd, g = self.feat_dim, self.groups
        std = nn.initializers.normal(0.01)
        n_att = (self.base_stage if self.advanced_stage == 0
                 else self.base_stage + self.advanced_stage + 1)
        n_fc = (self.base_stage if self.advanced_stage == 0
                else self.base_stage + self.advanced_stage)
        self.fcs = [nn.Dense(fd, kernel_init=_fc_init(), name=f"fc{i}")
                    for i in range(n_fc)]
        self.Wgs = [nn.Dense(g, kernel_init=std, name=f"Wg{i}")
                    for i in range(n_att)]
        self.Wqs = [nn.Dense(fd, kernel_init=_fc_init(), name=f"Wq{i}")
                    for i in range(n_att)]
        self.Wks = [nn.Dense(fd, kernel_init=_fc_init(), name=f"Wk{i}")
                    for i in range(n_att)]
        self.Wvs = [GroupedLinear(fd, g, name=f"Wv{i}")
                    for i in range(n_att)]

    def attention(self, roi_feat: Array, rois: Array, ref: BoxSet,
                  index: int) -> Array:
        """AttentionExtractor.attention_module_multi_head (reference
        :178-238): grouped content attention + log-added Wg position bias
        (no content-free u term)."""
        g = self.groups
        dg = self.feat_dim // g
        q = self.Wqs[index](roi_feat).reshape(-1, g, dg).transpose(1, 0, 2)
        k = self.Wks[index](ref.feat).reshape(-1, g, dg).transpose(1, 0, 2)
        aff = jnp.einsum("gnd,gmd->gnm", q, k) / np.sqrt(dg)

        pe = cal_position_embedding(rois, ref.rois, self.embed_dim)
        wg = jax.nn.relu(self.Wgs[index](pe))              # (N, M, g)
        aff = aff + jnp.log(wg + 1e-6).transpose(2, 0, 1)

        aff = jnp.where(ref.valid[None, None, :], aff, NEG_INF)
        att = jax.nn.softmax(aff, axis=-1)
        att = att * ref.valid[None, None, :].astype(att.dtype)
        out = jnp.einsum("gnm,md->gnd", att, ref.feat)
        return self.Wvs[index](out)

    def pre_calculate(self, pooled: Array) -> Array:
        """fc0 on pooled RoI features (the `pre_calculate=True` path,
        reference :399-410) — the representation stored for window refs."""
        return jax.nn.relu(self.fcs[0](pooled))

    def enhance(self, key_pooled: Array, key_rois: Array, key_valid: Array,
                window: BoxSet) -> Array:
        """The RDN flow (reference _forward_test, :412-454): key_pooled is
        RAW pooled (fc0 applied inside the stage loop); window holds
        fc0-LEVEL reference features (F, B, D) frame-major."""
        a = self.advanced_num
        f = window.feat.shape[0]
        d = self.feat_dim
        ref = flatten_set(window)

        x = key_pooled
        for i in range(self.base_stage):
            x = jax.nn.relu(self.fcs[i](x))
            x = x + self.attention(x, key_rois, ref, i)
            x = x * key_valid[:, None].astype(x.dtype)

        if self.advanced_stage > 0:
            assert a <= window.feat.shape[1]
            adv = BoxSet(
                ref.feat.reshape(f, -1, d)[:, :a].reshape(-1, d),
                window.rois[:, :a].reshape(-1, 4),
                window.valid[:, :a].reshape(-1))
            cur, cur_rois, cur_valid = adv.feat, adv.rois, adv.valid
            for i in range(self.advanced_stage):
                att = self.attention(cur, cur_rois, ref,
                                     i + self.base_stage)
                cur = jax.nn.relu(
                    self.fcs[i + self.base_stage](cur + att))
                cur = cur * cur_valid[:, None].astype(cur.dtype)
            adv = BoxSet(cur, cur_rois, cur_valid)
            x = x + self.attention(
                x, key_rois, adv, self.base_stage + self.advanced_stage)
            x = x * key_valid[:, None].astype(x.dtype)
        return x

    def __call__(self, key_pooled, key_rois, key_valid, window_feat,
                 window_rois, window_valid):
        return self.enhance(key_pooled, key_rois, key_valid,
                            BoxSet(window_feat, window_rois, window_valid))


def stream_video_rdn(head: RDNHead, params, *, key_pooled: Array,
                     key_rois: Array, key_valid: Array, ref_feat: Array,
                     ref_rois: Array, ref_valid: Array, window: int = 37,
                     key_loc: int = 18) -> Array:
    """Enhance every frame with the RDN sliding window (reference
    generalized_rcnn_rdn.py:_forward_test deque prefill/clamp — same
    window machinery as MEGA, no memory/global). key_pooled: (T, Nk,
    in_dim) RAW pooled key sets; ref_feat: (T, B, D) fc0-level."""
    t_total = ref_feat.shape[0]
    seg_len = jnp.int32(t_total)

    def step(_, t):
        widx = window_indices(t, seg_len, window=window, key_loc=key_loc)
        win = BoxSet(ref_feat[widx], ref_rois[widx], ref_valid[widx])
        out = head.apply(params, key_pooled[t], key_rois[t], key_valid[t],
                         win, method=RDNHead.enhance)
        return None, out

    _, outs = jax.lax.scan(step, None, jnp.arange(t_total))
    return outs
