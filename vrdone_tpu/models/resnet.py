"""ResNet-C4/C5 backbone for the detection stage (flax, NHWC).

The reference detector is maskrcnn-benchmark's ResNet-101-C4
(reference datasets/mega/mega_core/modeling/backbone/resnet.py): conv1 +
stages C2..C4 as the feature extractor (stride 16) and C5 as the RoI head.
BatchNorm is frozen (affine constants, reference
mega_core/layers/batch_norm.py) — here folded into a scale/bias op.

Weight layout is torch-compatible modulo transposition so published R-101
checkpoints can be transplanted (tools/convert_resnet.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics frozen into scale/bias constants."""
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros,
                          (self.features,))
        var = self.param("running_var", nn.initializers.ones,
                         (self.features,))
        # fold in fp32 regardless of compute dtype: rsqrt of bf16 running
        # stats would add ~1% scale error on top of the activation rounding
        f32 = jnp.float32
        scale = weight.astype(f32) * jax.lax.rsqrt(var.astype(f32) + 1e-5)
        offset = bias.astype(f32) - mean.astype(f32) * scale
        return x * scale.astype(x.dtype) + offset.astype(x.dtype)


class Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.kernel // 2
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(pad, pad), (pad, pad)],
                       use_bias=self.use_bias,
                       kernel_init=nn.initializers.he_normal(),
                       name="conv")(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with frozen BN. stride_in_1x1 selects
    where the stride lands: False = on the 3x3 (torchvision v1.5+),
    True = on the first 1x1 (the Caffe2 lineage the reference detector
    uses, mega_core RESNETS.STRIDE_IN_1X1 default True)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.planes * self.expansion
        identity = x
        s1, s3 = ((self.stride, 1) if self.stride_in_1x1
                  else (1, self.stride))
        h = Conv(self.planes, 1, stride=s1, name="conv1")(x)
        h = FrozenBatchNorm(self.planes, name="bn1")(h)
        h = jax.nn.relu(h)
        h = Conv(self.planes, 3, stride=s3, name="conv2")(h)
        h = FrozenBatchNorm(self.planes, name="bn2")(h)
        h = jax.nn.relu(h)
        h = Conv(out_ch, 1, name="conv3")(h)
        h = FrozenBatchNorm(out_ch, name="bn3")(h)
        if self.downsample:
            identity = Conv(out_ch, 1, stride=self.stride,
                            name="downsample_conv")(x)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(identity)
        return jax.nn.relu(h + identity)


class ResStage(nn.Module):
    planes: int
    blocks: int
    stride: int
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Bottleneck(self.planes, stride=self.stride, downsample=True,
                       stride_in_1x1=self.stride_in_1x1, name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, stride_in_1x1=self.stride_in_1x1,
                           name=f"block{i}")(x)
        return x


class ResNetC4(nn.Module):
    """Stem + C2..C4. Input NHWC image tensor; output stride-16 features
    (N, H/16, W/16, 1024). layers=(3, 4, 23) => ResNet-101."""
    layers: Sequence[int] = (3, 4, 23)
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = Conv(64, 7, stride=2, name="stem")(x)
        h = FrozenBatchNorm(64, name="stem_bn")(h)
        h = jax.nn.relu(h)
        # 3x3 max pool stride 2, torch padding 1
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        h = ResStage(64, self.layers[0], stride=1,
                     stride_in_1x1=self.stride_in_1x1, name="layer1")(h)
        h = ResStage(128, self.layers[1], stride=2,
                     stride_in_1x1=self.stride_in_1x1, name="layer2")(h)
        h = ResStage(256, self.layers[2], stride=2,
                     stride_in_1x1=self.stride_in_1x1, name="layer3")(h)
        return h


class ResNetC5Head(nn.Module):
    """C5 stage applied to RoI-aligned crops, then global average pool.
    The C4 detector's box feature extractor
    (reference roi_box_feature_extractors.py ResNet50Conv5ROIFeatureExtractor
    lineage): (R, 14, 14, 1024) -> (R, 2048)."""
    blocks: int = 3
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = ResStage(512, self.blocks, stride=2,
                     stride_in_1x1=self.stride_in_1x1, name="layer4")(x)
        # accumulate the 7x7 pool in fp32 (XLA fuses the convert into the
        # reduce); a bf16 49-element mean costs ~1% relative error
        return jnp.mean(h.astype(jnp.float32), axis=(1, 2)).astype(h.dtype)
