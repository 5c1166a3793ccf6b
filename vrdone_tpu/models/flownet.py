"""FlowNetS + EmbedNet + the FGFA / DFF detector flows (TPU-native).

Reference: datasets/mega/mega_core/modeling/backbone/flownet.py (the
FlowNetS encoder/decoder with multi-scale flow refinement), backbone/
embednet.py, and detector/generalized_rcnn_{fgfa,dff}.py.

FGFA ("Flow-Guided Feature Aggregation"): reference-frame C4 features are
warped to the key frame along FlowNetS flow, embedded, and aggregated
with per-pixel cosine-similarity softmax weights (fgfa.py:108-133).
DFF ("Deep Feature Flow"): only key frames run the backbone; non-key
frames reuse the key features warped by flow and scaled by the flow
net's scale map (dff.py:92-138).

Everything operates NHWC; whole-video inference reuses the sliding-window
machinery of models/mega.py (window_indices) with batched per-frame
precompute — the deques of the reference collapse into gathers.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.warp import warp_features
from .mega import window_indices

Array = jax.Array


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


def avg_pool_ceil(x: Array, k: int = 2) -> Array:
    """torch AvgPool2d(k, stride=k, ceil_mode=True): partial windows at
    the boundary average over the elements present."""
    n, h, w, c = x.shape
    ph = (-h) % k
    pw = (-w) % k
    xs = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    ones = jnp.pad(jnp.ones((1, h, w, 1), x.dtype),
                   ((0, 0), (0, ph), (0, pw), (0, 0)))
    s = nn.avg_pool(xs, (k, k), strides=(k, k)) * (k * k)
    cnt = nn.avg_pool(ones, (k, k), strides=(k, k)) * (k * k)
    return s / cnt


def crop_like(x: Array, target: Array) -> Array:
    """reference crop_like (flownet.py:7-11): crop rows/cols [1:h+1]."""
    if x.shape[1:3] == target.shape[1:3]:
        return x
    th, tw = target.shape[1], target.shape[2]
    return x[:, 1:th + 1, 1:tw + 1, :]


class FlowNetS(nn.Module):
    """Exact reference FlowNetS (flownet.py:14-118). Input: (N, H, W, 6)
    image pairs scaled to [0, 1]. Returns flow (N, H/16, W/16, 2) scaled
    by 2.5 (+ scale map for DFF)."""
    dff_scale: bool = False

    def setup(self):
        def conv(out, k, s, name):
            return nn.Conv(out, (k, k), strides=(s, s),
                           padding=[(k // 2, k // 2)] * 2, name=name)

        self.flow_conv1 = conv(64, 7, 2, "flow_conv1")
        self.conv2 = conv(128, 5, 2, "conv2")
        self.conv3 = conv(256, 5, 2, "conv3")
        self.conv3_1 = conv(256, 3, 1, "conv3_1")
        self.conv4 = conv(512, 3, 2, "conv4")
        self.conv4_1 = conv(512, 3, 1, "conv4_1")
        self.conv5 = conv(512, 3, 2, "conv5")
        self.conv5_1 = conv(512, 3, 1, "conv5_1")
        self.conv6 = conv(1024, 3, 2, "conv6")
        self.conv6_1 = conv(1024, 3, 1, "conv6_1")

        self.Convolution1 = conv(2, 3, 1, "Convolution1")
        self.Convolution2 = conv(2, 3, 1, "Convolution2")
        self.Convolution3 = conv(2, 3, 1, "Convolution3")
        self.Convolution4 = conv(2, 3, 1, "Convolution4")
        self.Convolution5 = conv(2, 3, 1, "Convolution5")
        if self.dff_scale:
            self.Convolution5_scale = nn.Conv(
                1024, (1, 1), use_bias=False,
                kernel_init=nn.initializers.zeros,
                name="Convolution5_scale")

        def deconv(out, name):
            # torch ConvTranspose2d(k=4, s=2, padding=0):
            # out = (in-1)*2 + 4
            return nn.ConvTranspose(out, (4, 4), strides=(2, 2),
                                    padding="VALID", transpose_kernel=True,
                                    name=name)

        self.deconv5 = deconv(512, "deconv5")
        self.deconv4 = deconv(256, "deconv4")
        self.deconv3 = deconv(128, "deconv3")
        self.deconv2 = deconv(64, "deconv2")
        self.upsample_flow6to5 = deconv(2, "upsample_flow6to5")
        self.upsample_flow5to4 = deconv(2, "upsample_flow5to4")
        self.upsample_flow4to3 = deconv(2, "upsample_flow4to3")
        self.upsample_flow3to2 = deconv(2, "upsample_flow3to2")

    def __call__(self, x: Array):
        x = avg_pool_ceil(x)
        relu1 = _lrelu(self.flow_conv1(x))
        relu2 = _lrelu(self.conv2(relu1))
        relu3 = _lrelu(self.conv3(relu2))
        relu4 = _lrelu(self.conv3_1(relu3))
        relu5 = _lrelu(self.conv4(relu4))
        relu6 = _lrelu(self.conv4_1(relu5))
        relu7 = _lrelu(self.conv5(relu6))
        relu8 = _lrelu(self.conv5_1(relu7))
        relu9 = _lrelu(self.conv6(relu8))
        relu10 = _lrelu(self.conv6_1(relu9))

        flow6 = self.Convolution1(relu10)
        up65 = crop_like(self.upsample_flow6to5(flow6), relu8)
        d5 = _lrelu(crop_like(self.deconv5(relu10), relu8))
        concat2 = jnp.concatenate([relu8, d5, up65], axis=-1)

        flow5 = self.Convolution2(concat2)
        up54 = crop_like(self.upsample_flow5to4(flow5), relu6)
        d4 = _lrelu(crop_like(self.deconv4(concat2), relu6))
        concat3 = jnp.concatenate([relu6, d4, up54], axis=-1)

        flow4 = self.Convolution3(concat3)
        up43 = crop_like(self.upsample_flow4to3(flow4), relu4)
        d3 = _lrelu(crop_like(self.deconv3(concat3), relu4))
        concat4 = jnp.concatenate([relu4, d3, up43], axis=-1)

        flow3 = self.Convolution4(concat4)
        up32 = crop_like(self.upsample_flow3to2(flow3), relu2)
        d2 = _lrelu(crop_like(self.deconv2(concat4), relu2))
        concat5 = jnp.concatenate([relu2, d2, up32], axis=-1)

        concat5 = avg_pool_ceil(concat5)
        flow = self.Convolution5(concat5) * 2.5
        if self.dff_scale:
            scale = self.Convolution5_scale(concat5) + 1.0
            return flow, scale
        return flow


class EmbedNet(nn.Module):
    """reference embednet.py: 1x1 -> 3x3 -> 1x1 (1024 -> 512 -> 512 ->
    2048), kaiming-uniform(a=1) init."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        x = jax.nn.relu(nn.Conv(512, (1, 1), kernel_init=init,
                                name="embed_conv1")(x))
        x = jax.nn.relu(nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)],
                                kernel_init=init, name="embed_conv2")(x))
        return nn.Conv(2048, (1, 1), kernel_init=init,
                       name="embed_conv3")(x)


def cosine_weights(embed_refs: Array, embed_cur: Array) -> Array:
    """Per-pixel cosine similarity -> softmax over the reference axis
    (reference compute_weight + softmax, fgfa.py:64-75, 128-129).
    embed_refs: (R, H, W, C); embed_cur: (1, H, W, C). Returns
    (R, H, W, 1)."""
    dt = embed_refs.dtype
    embed_refs = embed_refs.astype(jnp.float32)
    embed_cur = embed_cur.astype(jnp.float32)

    def norm(e):
        return jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-10

    # cosine + softmax run fp32 (norms of 2048-d bf16 vectors drift);
    # the weights come back in the embedding dtype so a bf16 weighted
    # sum stays bf16
    w = jnp.sum((embed_refs / norm(embed_refs))
                * (embed_cur / norm(embed_cur)), axis=-1, keepdims=True)
    return jax.nn.softmax(w, axis=0).astype(dt)


class FGFA(nn.Module):
    """FGFA aggregation as one module: flownet + embednet + cosine
    softmax. Call with the key image, reference images, and the
    (precomputed) reference C4 features; key_index marks the key frame's
    row inside the reference stack."""
    dff_scale: bool = False

    def setup(self):
        self.flownet = FlowNetS(name="flownet")
        self.embednet = EmbedNet(name="embednet")

    def aggregate_train(self, img_cur: Array, imgs_ref: Array,
                        feats_cur: Array, feats_refs: Array) -> Array:
        """Train composition (fgfa.py:108-132): flow from key to each
        ref, warp ref feats, embed [cur; warped refs], cosine softmax
        over refs, weighted sum. NOTE the reference aggregates over the
        WARPED REFS ONLY (:132) — the key frame participates through its
        copy inside imgs_ref when sampled, not additively."""
        r = imgs_ref.shape[0]
        pair = jnp.concatenate([jnp.repeat(img_cur, r, axis=0) / 255.0,
                                imgs_ref / 255.0], axis=-1)
        flow = self.flownet(pair.astype(feats_cur.dtype))
        warped = warp_features(feats_refs, flow)

        embeds = self.embednet(jnp.concatenate([feats_cur, warped],
                                               axis=0))
        embed_cur, embed_refs = embeds[:1], embeds[1:]
        w = cosine_weights(embed_refs, embed_cur)
        return jnp.sum(w * warped, axis=0, keepdims=True)

    def precompute_frame(self, feats: Array) -> Array:
        """Per-frame embedding for the streaming path (update_feature,
        fgfa.py:152-158): cat([feats, embednet(feats)])."""
        return jnp.concatenate([feats, self.embednet(feats)], axis=-1)

    def aggregate_test(self, img_cur: Array, imgs_win: Array,
                       featembeds_win: Array, key_loc: int) -> Array:
        """Test composition (fgfa.py:193-214): flow from the key image to
        every window frame, features+embeddings warped together, cosine
        weights against the key row, weighted feature sum."""
        r = imgs_win.shape[0]
        pair = jnp.concatenate([jnp.repeat(img_cur, r, axis=0) / 255.0,
                                imgs_win / 255.0], axis=-1)
        flow = self.flownet(pair.astype(featembeds_win.dtype))
        warped = warp_features(featembeds_win, flow)
        feats, embeds = warped[..., :1024], warped[..., 1024:]
        embed_cur = jax.lax.dynamic_slice_in_dim(embeds, key_loc, 1, 0)
        w = cosine_weights(embeds, embed_cur)
        return jnp.sum(w * feats, axis=0, keepdims=True)

    def __call__(self, img_cur, imgs_ref, feats_cur, feats_refs):
        return self.aggregate_train(img_cur, imgs_ref, feats_cur,
                                    feats_refs)


class DFF(nn.Module):
    """Deep Feature Flow (generalized_rcnn_dff.py): non-key frames reuse
    the key frame's C4 features warped by flow and multiplied by the
    flow net's scale map (:92-109 train, :123-138 test)."""

    def setup(self):
        self.flownet = FlowNetS(dff_scale=True, name="flownet")

    def propagate(self, img_cur: Array, img_key: Array,
                  feats_key: Array) -> Array:
        """feats(cur) = scale * warp(feats(key), flow(cur -> key))."""
        pair = jnp.concatenate([img_cur / 255.0, img_key / 255.0],
                               axis=-1)
        flow, scale = self.flownet(pair.astype(feats_key.dtype))
        return warp_features(feats_key, flow) * scale.astype(
            feats_key.dtype)

    def __call__(self, img_cur, img_key, feats_key):
        return self.propagate(img_cur, img_key, feats_key)


def fgfa_stream_indices(t: int, seg_len, *, window: int = 19,
                        key_loc: int = 9):
    """FGFA's 19-frame window (FGFA.ALL_FRAME_INTERVAL/KEY_FRAME_LOCATION,
    defaults.py:455-461) — same prefill/clamp deque semantics as MEGA."""
    return window_indices(t, seg_len, window=window, key_loc=key_loc)


class TwoFCHead(nn.Module):
    """ResNetConv52MLPFeatureExtractor's MLP tail + FPNPredictor — the
    standard Faster-RCNN head the FGFA/DFF configs use (reference
    roi_box_feature_extractors.py:54-118): pooled C5 features -> fc6 ->
    fc7 -> cls/bbox."""
    num_classes: int

    @nn.compact
    def __call__(self, pooled: Array):
        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        x = jax.nn.relu(nn.Dense(1024, kernel_init=init, name="fc6")(
            pooled))
        x = jax.nn.relu(nn.Dense(1024, kernel_init=init, name="fc7")(x))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name="cls_score")(x)
        reg = nn.Dense(4 * (self.num_classes + 1),
                       kernel_init=nn.initializers.normal(0.001),
                       name="bbox_pred")(x)
        return cls, reg


class FGFADetector(nn.Module):
    """GeneralizedRCNNFGFA equivalent: backbone -> flow-guided feature
    aggregation -> RPN + Faster-RCNN head on the aggregated map."""
    num_classes: int
    resnet_layers: tuple[int, ...] = (3, 4, 23)
    window: int = 19
    key_loc: int = 9

    def setup(self):
        from .resnet import ResNetC4, ResNetC5Head
        from . import rpn as rpn_lib
        from .detector import PIXEL_MEAN
        self._pixel_mean = PIXEL_MEAN
        self.backbone = ResNetC4(self.resnet_layers, name="backbone")
        self.fgfa = FGFA(name="fgfa")
        self.rpn_head = rpn_lib.RPNHead(name="rpn")
        self.c5 = ResNetC5Head(3, name="c5")
        self.head = TwoFCHead(self.num_classes, name="head")

    def features(self, images: Array,
                 compute_dtype=jnp.float32) -> Array:
        """compute_dtype=bfloat16 runs the backbone at half the
        activation bandwidth (pass bf16-cast params alongside)."""
        x = (images.astype(jnp.float32)
             - self._pixel_mean).astype(compute_dtype)
        return self.backbone(x)

    def detect_on(self, agg_feat: Array, image_hw, *,
                  post_nms_top_n: int = 300):
        """RPN + head on an aggregated (1, h, w, 1024) feature map.
        Box decode + NMS always run fp32 (bf16 coords quantize to ~4px);
        returned logits/deltas are fp32 regardless of compute dtype."""
        from . import rpn as rpn_lib
        from ..ops import boxes as box_ops

        logits, deltas = self.rpn_head(agg_feat)
        hp, wp, a = logits.shape[1], logits.shape[2], logits.shape[3]
        anchors = jnp.asarray(rpn_lib.make_anchors(hp, wp))
        boxes, scores, valid = rpn_lib.select_proposals(
            anchors, logits[0].reshape(-1).astype(jnp.float32),
            deltas[0].reshape(-1, 4).astype(jnp.float32),
            image_hw, pre_nms_top_n=6000, post_nms_top_n=post_nms_top_n)
        chw = agg_feat[0].transpose(2, 0, 1)
        crops = box_ops.roi_align(chw, boxes, spatial_scale=1.0 / 16,
                                  output_size=(14, 14), sampling_ratio=2)
        pooled = self.c5(crops.transpose(0, 2, 3, 1))
        cls_logits, bbox_deltas = self.head(pooled)
        return {"proposals": boxes, "proposal_scores": scores,
                "valid": valid,
                "cls_logits": cls_logits.astype(jnp.float32),
                "bbox_deltas": bbox_deltas.astype(jnp.float32)}

    def detect_frame(self, img_cur: Array, imgs_ref: Array, image_hw, *,
                     post_nms_top_n: int = 300):
        """Single key frame with reference frames (train-style
        aggregation; the streaming test path precomputes per-frame
        feats+embeds and calls aggregate_test + detect_on)."""
        feats = self.features(jnp.concatenate([img_cur, imgs_ref], axis=0))
        agg = self.fgfa.aggregate_train(img_cur, imgs_ref, feats[:1],
                                        feats[1:])
        return self.detect_on(agg, image_hw,
                              post_nms_top_n=post_nms_top_n)


def fgfa_detect_video(det: "FGFADetector", params, images, image_hw, *,
                      post_nms_top_n: int = 300,
                      compute_dtype: str = "float32"):
    """Whole-video FGFA detection (reference fgfa.py:_forward_test,
    :144-216): per-frame C4 features + embeddings are precomputed in one
    batched pass; each key frame then warps its 19-frame window's
    feats+embeds along FlowNetS flow and detects on the cosine-weighted
    aggregate. images: (T, H, W, 3) array or indexable frame sequence.
    compute_dtype="bfloat16" runs backbone/embed/flow/aggregation at
    half the activation bandwidth — including the (T, h, w, 3072)
    feat+embed buffer — with box decode/NMS and cosine softmax fp32.
    """
    from .detector import _cast_f32_leaves
    t_total = len(images)
    hw = jnp.asarray(image_hw)
    dt = jnp.dtype(compute_dtype)
    cparams = _cast_f32_leaves(params, dt)

    @jax.jit
    def precompute(cparams, img):
        def fwd(m):
            feats = m.features(img[None], compute_dtype=dt)
            return m.fgfa.precompute_frame(feats)
        return det.apply(cparams, method=fwd)

    imgs_host = [np.asarray(images[t]) for t in range(t_total)]
    fe = jnp.concatenate([precompute(cparams, jnp.asarray(im))
                          for im in imgs_host], axis=0)   # (T, h, w, 3072)
    imgs = jnp.asarray(np.stack(imgs_host))

    @jax.jit
    def step(cparams, t):
        widx = fgfa_stream_indices(t, jnp.int32(t_total),
                                   window=det.window, key_loc=det.key_loc)
        in_win = jnp.argmax((widx == t).astype(jnp.int32))
        def fwd(m):
            agg = m.fgfa.aggregate_test(imgs[t][None], imgs[widx],
                                        fe[widx], in_win)
            return m.detect_on(agg, hw, post_nms_top_n=post_nms_top_n)
        return det.apply(cparams, method=fwd)

    outs = [step(cparams, jnp.int32(t)) for t in range(t_total)]
    return {k: np.stack([np.asarray(o[k]) for o in outs])
            for k in outs[0]}


def dff_detect_video(det: "DFFDetector", params, images, image_hw, *,
                     key_interval: int = 10, post_nms_top_n: int = 300,
                     compute_dtype: str = "float32"):
    """Whole-video DFF detection (reference dff.py:_forward_test,
    :123-138 + vid_dff key-frame schedule): frames at multiples of
    key_interval run the backbone; the rest warp the latest key frame's
    features by flow * scale. compute_dtype="bfloat16" runs the
    backbone/flow/RoI pass in bf16 (box decode/NMS stay fp32)."""
    from .detector import _cast_f32_leaves
    t_total = len(images)
    hw = jnp.asarray(image_hw)
    dt = jnp.dtype(compute_dtype)
    cparams = _cast_f32_leaves(params, dt)

    @jax.jit
    def key_feats_of(cparams, img):
        return det.apply(cparams, img[None],
                         method=lambda m, im: m.features(
                             im, compute_dtype=dt))

    @jax.jit
    def detect(cparams, img_cur, img_key, feats_key):
        def fwd(m):
            return m.detect_frame(img_cur[None], img_key[None], feats_key,
                                  hw, post_nms_top_n=post_nms_top_n)
        return det.apply(cparams, method=fwd)

    outs = []
    img_key = feats_key = None
    for t in range(t_total):
        img = jnp.asarray(np.asarray(images[t]))
        if t % key_interval == 0:
            img_key = img
            feats_key = key_feats_of(cparams, img)
        outs.append(detect(cparams, img, img_key, feats_key))
    return {k: np.stack([np.asarray(o[k]) for o in outs])
            for k in outs[0]}


class DFFDetector(nn.Module):
    """GeneralizedRCNNDFF equivalent: key frames run the backbone;
    other frames propagate the key features by flow + scale map."""
    num_classes: int
    resnet_layers: tuple[int, ...] = (3, 4, 23)

    def setup(self):
        from .resnet import ResNetC4, ResNetC5Head
        from . import rpn as rpn_lib
        from .detector import PIXEL_MEAN
        self._pixel_mean = PIXEL_MEAN
        self.backbone = ResNetC4(self.resnet_layers, name="backbone")
        self.dff = DFF(name="dff")
        self.rpn_head = rpn_lib.RPNHead(name="rpn")
        self.c5 = ResNetC5Head(3, name="c5")
        self.head = TwoFCHead(self.num_classes, name="head")

    def features(self, images: Array,
                 compute_dtype=jnp.float32) -> Array:
        x = (images.astype(jnp.float32)
             - self._pixel_mean).astype(compute_dtype)
        return self.backbone(x)

    def detect_frame(self, img_cur: Array, img_key: Array,
                     feats_key: Array, image_hw, *,
                     post_nms_top_n: int = 300):
        agg = self.dff.propagate(img_cur, img_key, feats_key)
        return FGFADetector.detect_on(self, agg, image_hw,
                                      post_nms_top_n=post_nms_top_n)
