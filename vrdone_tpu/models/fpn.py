"""1-D FPN fuse neck.

Top-down pathway over the backbone temporal pyramid producing ONE
full-resolution mask-feature map (reference FPN1D_Fuse,
models/fpns.py:141-257). The reference's FPN1D / FPNIdentity variants are
dead code and intentionally not rebuilt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ChannelLayerNorm, MaskedConv1D

Array = jax.Array


def upsample_nearest_2x(x: Array, scale: int) -> Array:
    """Nearest ×scale temporal upsample of (B, T, C)."""
    return jnp.repeat(x, scale, axis=1)


class FPN1DFuse(nn.Module):
    in_channels: tuple[int, ...]
    out_channel: int
    scale_factor: int = 2
    start_level: int = 0
    end_level: int = -1
    with_ln: bool = True
    norm_first: bool = False

    @nn.compact
    def __call__(self, inputs, fpn_masks):
        assert len(inputs) == len(self.in_channels)
        end_level = (len(self.in_channels) if self.end_level == -1
                     else self.end_level)
        levels = list(range(self.start_level, end_level))

        y = None
        for pos in range(len(levels) - 1, -1, -1):
            i = levels[pos]
            x, mask = inputs[i], fpn_masks[i]
            if self.with_ln and self.norm_first:
                x = ChannelLayerNorm(self.in_channels[i],
                                     name=f"input_norm_{pos}")(x)
            is_top = pos == len(levels) - 1
            if is_top:
                # top level: depthwise 3-conv straight to out_channel
                y, _ = MaskedConv1D(self.out_channel, 3,
                                    groups=self.out_channel,
                                    use_bias=not self.with_ln,
                                    name=f"fpn_conv_{pos}")(x, mask)
                if self.with_ln:
                    y = ChannelLayerNorm(self.out_channel,
                                         name=f"fpn_norm_{pos}")(y)
            else:
                lat, _ = MaskedConv1D(self.out_channel, 1,
                                      use_bias=not self.with_ln,
                                      name=f"lateral_conv_{pos}")(x, mask)
                if self.with_ln:
                    lat = ChannelLayerNorm(self.out_channel,
                                           name=f"lateral_norm_{pos}")(lat)
                y = lat + upsample_nearest_2x(y, self.scale_factor)
                y, _ = MaskedConv1D(self.out_channel, 3,
                                    groups=self.out_channel,
                                    use_bias=not self.with_ln,
                                    name=f"fpn_conv_{pos}")(y, mask)
                if self.with_ln:
                    y = ChannelLayerNorm(self.out_channel,
                                         name=f"fpn_norm_{pos}")(y)

        out, out_mask = MaskedConv1D(self.out_channel, 3,
                                     groups=self.out_channel,
                                     name="mask_features")(y, fpn_masks[0])
        return out, out_mask
