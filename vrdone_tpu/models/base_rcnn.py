"""Plain single-frame Faster-RCNN ("base" VID method).

The no-relation-head baseline every video method in the reference is
measured against (reference datasets/mega/mega_core/modeling/detector/
generalized_rcnn.py:40-70, selected by MODEL.VID.METHOD: base /
META_ARCHITECTURE GeneralizedRCNN, configs/vid_R_101_C4_1x.yaml):
ResNet-C4 backbone -> RPN -> RoI pooling -> C5 -> two-FC head
(ResNetConv52MLPFeatureExtractor + FPNPredictor lineage, the same head
the FGFA/DFF configs use).

Fully static shapes: fixed proposal counts with validity flags, one XLA
program per frame at inference.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import boxes as box_ops
from . import rpn as rpn_lib

Array = jax.Array


class BaseDetector(nn.Module):
    """GeneralizedRCNN equivalent: backbone -> RPN -> Faster-RCNN head
    on the key frame alone."""
    num_classes: int
    resnet_layers: tuple[int, ...] = (3, 4, 23)
    stride_in_1x1: bool = False

    def setup(self):
        from .detector import PIXEL_MEAN
        from .flownet import TwoFCHead
        from .resnet import ResNetC4, ResNetC5Head
        self._pixel_mean = PIXEL_MEAN
        self.backbone = ResNetC4(self.resnet_layers,
                                 stride_in_1x1=self.stride_in_1x1,
                                 name="backbone")
        self.rpn_head = rpn_lib.RPNHead(name="rpn")
        self.c5 = ResNetC5Head(3, stride_in_1x1=self.stride_in_1x1,
                               name="c5")
        self.head = TwoFCHead(self.num_classes, name="head")

    def features(self, images: Array,
                 compute_dtype=jnp.float32) -> Array:
        """compute_dtype=bfloat16 runs the backbone at half the
        activation bandwidth (pass bf16-cast params alongside)."""
        x = (images.astype(jnp.float32)
             - self._pixel_mean).astype(compute_dtype)
        return self.backbone(x)

    def pooled(self, feat_map: Array, boxes: Array) -> Array:
        """RoIAlign(14x14) on a (h, w, C) map -> C5 -> (R, 2048)."""
        chw = feat_map.transpose(2, 0, 1)
        crops = box_ops.roi_align(chw, boxes, spatial_scale=1.0 / 16,
                                  output_size=(14, 14), sampling_ratio=2)
        return self.c5(crops.transpose(0, 2, 3, 1))

    def detect_on(self, feat_map: Array, image_hw, *,
                  post_nms_top_n: int = 300):
        """RPN + head on a (1, h, w, C) feature map (shared with the
        FGFA/DFF drivers' shape of result). Box decode + NMS always run
        fp32 (bf16 coords on a ~1000px canvas quantize to ~4px); the
        returned logits/deltas are fp32 regardless of compute dtype."""
        logits, deltas = self.rpn_head(feat_map)
        hp, wp = logits.shape[1], logits.shape[2]
        anchors = jnp.asarray(rpn_lib.make_anchors(hp, wp))
        boxes, scores, valid = rpn_lib.select_proposals(
            anchors, logits[0].reshape(-1).astype(jnp.float32),
            deltas[0].reshape(-1, 4).astype(jnp.float32),
            image_hw, pre_nms_top_n=6000, post_nms_top_n=post_nms_top_n)
        pooled = self.pooled(feat_map[0], boxes)
        cls_logits, bbox_deltas = self.head(pooled)
        return {"proposals": boxes, "proposal_scores": scores,
                "valid": valid,
                "cls_logits": cls_logits.astype(jnp.float32),
                "bbox_deltas": bbox_deltas.astype(jnp.float32)}

    def detect_frame(self, image: Array, image_hw, *,
                     post_nms_top_n: int = 300,
                     compute_dtype=jnp.float32):
        """image: (H, W, 3) raw BGR pixels (uint8 fine; cast on device)."""
        return self.detect_on(
            self.features(image[None], compute_dtype=compute_dtype),
            image_hw, post_nms_top_n=post_nms_top_n)


def base_detect_video(det: BaseDetector, params, images, image_hw, *,
                      post_nms_top_n: int = 300,
                      compute_dtype: str = "float32"):
    """Frame-independent detection over a video (the base method has no
    temporal state — reference generalized_rcnn.py processes each frame
    alone). images: (T, H, W, 3) array or indexable frame sequence.
    compute_dtype="bfloat16" runs the backbone/RoI pass at half the
    activation bandwidth (box decode/NMS and outputs stay fp32)."""
    from .detector import _cast_f32_leaves
    t_total = len(images)
    hw = jnp.asarray(image_hw)
    dt = jnp.dtype(compute_dtype)
    cparams = _cast_f32_leaves(params, dt)

    @jax.jit
    def step(cparams, img):
        return det.apply(cparams, img, hw,
                         method=lambda m, i, h: m.detect_frame(
                             i, h, post_nms_top_n=post_nms_top_n,
                             compute_dtype=dt))

    outs = [step(cparams, jnp.asarray(np.ascontiguousarray(images[t])))
            for t in range(t_total)]
    return {k: np.stack([np.asarray(o[k]) for o in outs])
            for k in outs[0]}
