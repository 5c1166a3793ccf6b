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


class RDNDetector(nn.Module):
    """Full RDN video detector (reference GeneralizedRCNNRDN): ResNet-C4
    backbone + RPN + RDN relation head over sliding-window reference
    proposals, predictions on the enhanced 1024-d features. Same
    composition pattern as models/detector.py::MegaDetector (pool on C4
    -> C5 on crops -> head), no memory/global machinery."""
    num_classes: int
    resnet_layers: tuple[int, ...] = (3, 4, 23)
    base_stage: int = 2
    advanced_stage: int = 0
    groups: int = 16
    base_num: int = 75
    ratio: float = 0.2
    window: int = 37          # RDN.ALL_FRAME_INTERVAL (defaults.py:421)
    key_loc: int = 18         # RDN.KEY_FRAME_LOCATION
    stride_in_1x1: bool = False

    @property
    def advanced_num(self) -> int:
        return max(1, int(self.base_num * self.ratio))

    def setup(self):
        from . import rpn as rpn_lib
        from .detector import BoxHead, PIXEL_MEAN
        self._pixel_mean = PIXEL_MEAN
        from .resnet import ResNetC4
        self.backbone = ResNetC4(self.resnet_layers,
                                 stride_in_1x1=self.stride_in_1x1,
                                 name="backbone")
        self.rpn_head = rpn_lib.RPNHead(name="rpn")
        self.box_head = BoxHead(self.num_classes,
                                stride_in_1x1=self.stride_in_1x1,
                                name="box_head")
        self.rdn = RDNHead(base_stage=self.base_stage,
                           advanced_stage=self.advanced_stage,
                           groups=self.groups,
                           advanced_num=self.advanced_num,
                           name="rdn")

    def features(self, images: Array,
                 compute_dtype=jnp.float32) -> Array:
        """compute_dtype=bfloat16 runs the backbone at half the
        activation bandwidth (pass bf16-cast params alongside)."""
        x = (images.astype(jnp.float32)
             - self._pixel_mean).astype(compute_dtype)
        return self.backbone(x)

    def propose(self, c4_feat: Array, image_hw: Array, *,
                pre_nms_top_n: int = 6000, post_nms_top_n: int = 300):
        from . import rpn as rpn_lib
        logits, deltas = self.rpn_head(c4_feat[None])
        hp, wp = logits.shape[1], logits.shape[2]
        anchors = jnp.asarray(rpn_lib.make_anchors(hp, wp))
        # box decode + NMS always run fp32 (bf16 coords quantize to ~4px)
        return rpn_lib.select_proposals(
            anchors, logits[0].reshape(-1).astype(jnp.float32),
            deltas[0].reshape(-1, 4).astype(jnp.float32),
            image_hw, pre_nms_top_n=pre_nms_top_n,
            post_nms_top_n=post_nms_top_n)

    def frame_fc0(self, c4_feat: Array, rois: Array, valid: Array) -> Array:
        """fc0-level reference features for one frame (the reference
        `pre_calculate=True` path, roi_box_feature_extractors.py:399-410).
        """
        pooled = self.box_head.pooled_features(c4_feat, rois)
        x = self.rdn.pre_calculate(pooled)
        return x * valid[:, None].astype(x.dtype)

    def enhance(self, key_pooled, key_rois, key_valid, window: BoxSet):
        return self.rdn.enhance(key_pooled, key_rois, key_valid, window)

    def predictions(self, enhanced: Array):
        return self.box_head.predictions(enhanced)


def rdn_detect_video(det: RDNDetector, params, images, image_hw, *,
                     key_post_nms: int = 300,
                     compute_dtype: str = "float32"):
    """Whole-video RDN detection (reference generalized_rcnn_rdn.py
    _forward_test): batched per-frame precompute (proposals + fc0
    features), then one lax.scan over the deque-equivalent sliding
    window. images: (T, H, W, 3) array or indexable frame sequence.
    compute_dtype="bfloat16" runs the backbone/RoI precompute in bf16
    (box decode/NMS stay fp32; pooled/fc0 features return fp32, so the
    streaming enhancement and predictions are unchanged)."""
    from .detector import _cast_f32_leaves
    t_total = len(images)
    hw = jnp.asarray(image_hw)
    dt = jnp.dtype(compute_dtype)
    cparams = _cast_f32_leaves(params, dt)

    @jax.jit
    def precompute(cparams, image):
        def fwd(m):
            c4 = m.features(image[None], compute_dtype=dt)[0]
            kb, ks, kv = m.propose(c4, hw, post_nms_top_n=key_post_nms)
            key_pooled = m.box_head.pooled_features(c4, kb)
            key_pooled = key_pooled * kv[:, None].astype(key_pooled.dtype)
            key_pooled = key_pooled.astype(jnp.float32)
            if key_post_nms >= det.base_num:
                rb, rv = kb[:det.base_num], kv[:det.base_num]
                ref_fc0 = m.rdn.pre_calculate(key_pooled[:det.base_num])
                ref_fc0 = ref_fc0 * rv[:, None].astype(ref_fc0.dtype)
            else:
                rb, _, rv = m.propose(c4, hw,
                                      post_nms_top_n=det.base_num)
                ref_fc0 = m.frame_fc0(c4, rb, rv)
            return kb, ks, kv, key_pooled, rb, rv, ref_fc0.astype(
                jnp.float32)
        return det.apply(cparams, method=fwd)

    outs = [precompute(cparams,
                       jnp.asarray(np.ascontiguousarray(images[t])))
            for t in range(t_total)]
    kb, ks, kv, kp, rb, rv, rf = (jnp.stack([o[i] for o in outs])
                                  for i in range(7))

    head = RDNHead(base_stage=det.base_stage,
                   advanced_stage=det.advanced_stage, groups=det.groups,
                   advanced_num=det.advanced_num)
    visual = stream_video_rdn(
        head, {"params": params["params"]["rdn"]},
        key_pooled=kp, key_rois=kb, key_valid=kv,
        ref_feat=rf, ref_rois=rb, ref_valid=rv,
        window=det.window, key_loc=det.key_loc)

    @jax.jit
    def predict(params, v):
        return det.apply(params, v,
                         method=lambda m, x: m.predictions(x))

    cls_logits, bbox_deltas = predict(params, visual.reshape(
        -1, visual.shape[-1]))
    nk = kb.shape[1]
    return {"proposals": np.asarray(kb), "proposal_scores": np.asarray(ks),
            "valid": np.asarray(kv),
            "cls_logits": np.asarray(cls_logits).reshape(t_total, nk, -1),
            "bbox_deltas": np.asarray(bbox_deltas).reshape(t_total, nk, -1),
            "visual": np.asarray(visual)}


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
