"""Flax building blocks for the VrdONE-TPU model stack.

Every module operates on time-major ``(B, T, C)`` activations with boolean
``(B, T)`` validity masks (see vrdone_tpu/ops/masked.py for the layout and
masking conventions). The modules mirror the behaviour of the reference
blocks (reference models/blocks.py, models/local_transformer.py) but are
organised TPU-first:

  * 1x1 convs are plain Dense matmuls (MXU),
  * sliding-window attention uses the dense band-masked formulation
    (ops.masked.band_attention) instead of strided chunk gathering,
  * self- and cross-attention share one implementation that takes explicit
    (q, k, v) streams — the reference's *_QKV variants collapse into it.

Weight-init conventions follow the reference so that training dynamics and
checkpoint transplants match: conv/linear biases are zeroed, conv weights
use torch's kaiming-uniform(a=sqrt(5)) fan-in bound, AffineDropPath scales
start at 1e-4, rel-PE uses trunc-normal std sqrt(2/C).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import masked as mops

Array = jax.Array


# ---------------------------------------------------------------------------
# initialisers
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Conv1d/Linear default: kaiming_uniform(a=sqrt(5)).

    For kernel shape (K, C_in/groups, C_out) fan_in = K * C_in/groups and the
    bound reduces to 1/sqrt(fan_in).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def trunc_normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


def get_activation(name: str):
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        # torch nn.GELU default is the exact erf formulation
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "glu":
        return jax.nn.glu
    raise ValueError(f"unknown activation: {name}")


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels of (B, T, C) (reference models/blocks.py:116)."""
    features: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = b = None
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (self.features,))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
        return mops.channel_layernorm(x, w, b, self.eps)


class MaskedConv1D(nn.Module):
    """Mask-preserving conv1d (reference models/blocks.py:63-113)."""
    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> tuple[Array, Array]:
        assert self.kernel_size % 2 == 1
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init,
            (self.kernel_size, c_in // self.groups, self.features))
        bias = None
        if self.use_bias:
            # reference zero-inits conv bias (models/blocks.py:88-89)
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return mops.masked_conv1d(x, mask, kernel, bias,
                                  stride=self.stride, groups=self.groups)


class Dense(nn.Dense):
    """nn.Dense with torch-style default init and zero bias."""

    def __init__(self, features, use_bias=True, name=None):
        super().__init__(features=features, use_bias=use_bias,
                         kernel_init=torch_conv_kernel_init,
                         bias_init=nn.initializers.zeros, name=name)


class ConvMLP(nn.Module):
    """Stacked conv1d MLP (reference models/blocks.py:37-61).

    kernel_size==1 (all current configs) lowers to pure Dense matmuls.
    """
    hidden_dim: int
    output_dim: int
    num_layers: int
    kernel_size: int = 1
    act: str = "gelu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        act = get_activation(self.act)
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.output_dim]
        for i, d in enumerate(dims):
            if self.kernel_size == 1:
                x = Dense(d, name=f"layers_{i}")(x)
            else:
                c_in = x.shape[-1]
                kernel = self.param(
                    f"layers_{i}_kernel", torch_conv_kernel_init,
                    (self.kernel_size, c_in, d))
                bias = self.param(f"layers_{i}_bias", nn.initializers.zeros, (d,))
                x = mops.conv1d(x, kernel, bias)
            if i < self.num_layers - 1:
                x = act(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class AffineDropPath(nn.Module):
    """Per-channel-scaled stochastic depth (reference models/blocks.py:1134)."""
    features: int
    drop_prob: float = 0.0
    init_scale: float = 1e-4

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init_scale, jnp.float32),
            (self.features,))
        x = x * scale
        if self.drop_prob > 0.0 and not deterministic:
            rng = self.make_rng("droppath")
            x = mops.drop_path(x, rng, self.drop_prob, deterministic=False)
        return x


class MaybeDropPath(nn.Module):
    """AffineDropPath when drop_prob > 0 else identity, mirroring the
    reference's conditional module wiring (models/blocks.py:1063-1068)."""
    features: int
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        if self.drop_prob > 0.0:
            return AffineDropPath(self.features, self.drop_prob)(
                x, deterministic=deterministic)
        return x


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

class MHA(nn.Module):
    """Dense masked multi-head attention over explicit (q, k, v) streams.

    Covers reference MaskedMHA (self, models/blocks.py:177) and
    MaskedMHA_QKV (cross, models/local_transformer.py:13) — both share the
    same math; self-attention simply passes q=k=v=x.
    """
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array, qx_mask: Array,
                 kv_mask: Array, attn_mask: Optional[Array] = None,
                 *, deterministic: bool = True) -> tuple[Array, Array]:
        qp = Dense(self.n_embd, name="query")(q)
        kp = Dense(self.n_embd, name="key")(k)
        vp = Dense(self.n_embd, name="value")(v)

        if attn_mask is not None:
            # explicit (B, Tq, Tk) mask path (kept for API parity; unused by
            # current configs)
            d = self.n_embd // self.n_head
            scale = 1.0 / math.sqrt(d)
            qh = mops._split_heads(qp, self.n_head)
            kh = mops._split_heads(kp, self.n_head)
            vh = mops._split_heads(vp, self.n_head)
            att = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh,
                             preferred_element_type=jnp.float32)
            att = jnp.where(attn_mask[:, None], att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1).astype(vh.dtype)
            vh = vh * kv_mask[:, None, :, None].astype(vh.dtype)
            out = mops._merge_heads(jnp.einsum("bhqk,bhkd->bhqd", att, vh))
        else:
            out = mops.full_attention_auto(qp, kp, vp, kv_mask,
                                           n_head=self.n_head,
                                           allow_flash=deterministic)

        out = Dense(self.n_embd, name="proj")(out)
        if self.proj_pdrop > 0.0:
            out = nn.Dropout(self.proj_pdrop)(out, deterministic=deterministic)
        out = out * qx_mask[..., None].astype(out.dtype)
        return out, qx_mask


class _QKVPreproc(nn.Module):
    """Depthwise-conv + LayerNorm preprocessing of q/k/v streams.

    This is the "Conv" in the reference's MHCA variants
    (models/blocks.py:245-332, models/local_transformer.py:69-156): each
    stream gets a depthwise conv (optionally strided for downsampling)
    followed by a channel LayerNorm.
    """
    n_embd: int
    qx_kernel: int
    qx_stride: int
    kv_kernel: int
    kv_stride: int

    @nn.compact
    def __call__(self, q, k, v, qx_mask, kv_mask):
        q, qm = MaskedConv1D(self.n_embd, self.qx_kernel, stride=self.qx_stride,
                             groups=self.n_embd, use_bias=False,
                             name="query_conv")(q, qx_mask)
        q = ChannelLayerNorm(self.n_embd, name="query_norm")(q)
        k, km = MaskedConv1D(self.n_embd, self.kv_kernel, stride=self.kv_stride,
                             groups=self.n_embd, use_bias=False,
                             name="key_conv")(k, kv_mask)
        k = ChannelLayerNorm(self.n_embd, name="key_norm")(k)
        v, _ = MaskedConv1D(self.n_embd, self.kv_kernel, stride=self.kv_stride,
                            groups=self.n_embd, use_bias=False,
                            name="value_conv")(v, kv_mask)
        v = ChannelLayerNorm(self.n_embd, name="value_norm")(v)
        return q, k, v, qm, km


def _mhca_kernels(n_qx_stride: int, n_kv_stride: int, *, qkv_api: bool):
    """Reproduce the reference's kernel/stride quirks.

    Self-attn flavour (models/blocks.py:284-305): the query conv uses kernel
    n_qx_stride+1 (or 3 when stride 1) but its *stride comes from n_kv_stride*.
    QKV flavour (models/local_transformer.py:108-128): n_qx_stride==0 means a
    pointwise (kernel-1) query conv; strides clamp to 1 when 0.
    """
    if qkv_api:
        qx_kernel = n_qx_stride + 1 if (n_qx_stride > 1 or n_qx_stride == 0) else 3
        qx_stride = n_kv_stride if n_kv_stride > 0 else 1
        kv_kernel = n_kv_stride + 1 if (n_kv_stride > 1 or n_kv_stride == 0) else 3
        kv_stride = n_kv_stride if n_kv_stride > 0 else 1
    else:
        qx_kernel = n_qx_stride + 1 if n_qx_stride > 1 else 3
        qx_stride = n_kv_stride
        kv_kernel = n_kv_stride + 1 if n_kv_stride > 1 else 3
        kv_stride = n_kv_stride
    return qx_kernel, qx_stride, kv_kernel, kv_stride


class ConvMHA(nn.Module):
    """Multi-head conv attention (reference MaskedMHCA / MaskedMHCA_QKV)."""
    n_embd: int
    n_head: int
    n_qx_stride: int = 1
    n_kv_stride: int = 1
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    qkv_api: bool = False

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array, qx_mask: Array,
                 kv_mask: Array, attn_mask: Optional[Array] = None,
                 *, deterministic: bool = True) -> tuple[Array, Array]:
        qk, qs, kk, ks = _mhca_kernels(self.n_qx_stride, self.n_kv_stride,
                                       qkv_api=self.qkv_api)
        q, k, v, qm, km = _QKVPreproc(self.n_embd, qk, qs, kk, ks,
                                      name="preproc")(
            q, k, v, qx_mask, kv_mask)
        qp = Dense(self.n_embd, name="query")(q)
        kp = Dense(self.n_embd, name="key")(k)
        vp = Dense(self.n_embd, name="value")(v)
        if attn_mask is not None:
            d = self.n_embd // self.n_head
            scale = 1.0 / math.sqrt(d)
            qh = mops._split_heads(qp, self.n_head)
            kh = mops._split_heads(kp, self.n_head)
            vh = mops._split_heads(vp, self.n_head)
            att = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh,
                             preferred_element_type=jnp.float32)
            att = jnp.where(attn_mask[:, None], att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1).astype(vh.dtype)
            vh = vh * km[:, None, :, None].astype(vh.dtype)
            out = mops._merge_heads(jnp.einsum("bhqk,bhkd->bhqd", att, vh))
        else:
            out = mops.full_attention_auto(qp, kp, vp, km,
                                           n_head=self.n_head,
                                           allow_flash=deterministic)
        out = Dense(self.n_embd, name="proj")(out)
        if self.proj_pdrop > 0.0:
            out = nn.Dropout(self.proj_pdrop)(out, deterministic=deterministic)
        out = out * qm[..., None].astype(out.dtype)
        return out, qm


class LocalMHA(nn.Module):
    """Sliding-window attention without conv preproc
    (reference LocalMaskedMHA / LocalMaskedMHA_QKV)."""
    n_embd: int
    n_head: int
    window_size: int
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    use_rel_pe: bool = False

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array, qx_mask: Array,
                 kv_mask: Array, attn_mask: Optional[Array] = None,
                 *, deterministic: bool = True) -> tuple[Array, Array]:
        del attn_mask  # band pattern is the attention mask
        qp = Dense(self.n_embd, name="query")(q)
        kp = Dense(self.n_embd, name="key")(k)
        vp = Dense(self.n_embd, name="value")(v)
        rel_pe = None
        if self.use_rel_pe:
            rel_pe = self.param(
                "rel_pe", trunc_normal_init(math.sqrt(2.0 / self.n_embd)),
                (self.n_head, self.window_size))
        out = mops.band_attention_auto(qp, kp, vp, kv_mask,
                                       n_head=self.n_head,
                                       window_size=self.window_size,
                                       rel_pe=rel_pe)
        out = Dense(self.n_embd, name="proj")(out)
        if self.proj_pdrop > 0.0:
            out = nn.Dropout(self.proj_pdrop)(out, deterministic=deterministic)
        out = out * qx_mask[..., None].astype(out.dtype)
        return out, qx_mask


class LocalConvMHA(nn.Module):
    """Sliding-window conv attention (reference LocalMaskedMHCA family)."""
    n_embd: int
    n_head: int
    window_size: int
    n_qx_stride: int = 1
    n_kv_stride: int = 1
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    use_rel_pe: bool = False
    qkv_api: bool = False

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array, qx_mask: Array,
                 kv_mask: Array, attn_mask: Optional[Array] = None,
                 *, deterministic: bool = True) -> tuple[Array, Array]:
        del attn_mask
        qk, qs, kk, ks = _mhca_kernels(self.n_qx_stride, self.n_kv_stride,
                                       qkv_api=self.qkv_api)
        q, k, v, qm, km = _QKVPreproc(self.n_embd, qk, qs, kk, ks,
                                      name="preproc")(
            q, k, v, qx_mask, kv_mask)
        qp = Dense(self.n_embd, name="query")(q)
        kp = Dense(self.n_embd, name="key")(k)
        vp = Dense(self.n_embd, name="value")(v)
        rel_pe = None
        if self.use_rel_pe:
            rel_pe = self.param(
                "rel_pe", trunc_normal_init(math.sqrt(2.0 / self.n_embd)),
                (self.n_head, self.window_size))
        out = mops.band_attention_auto(qp, kp, vp, km, n_head=self.n_head,
                                       window_size=self.window_size,
                                       rel_pe=rel_pe)
        out = Dense(self.n_embd, name="proj")(out)
        if self.proj_pdrop > 0.0:
            out = nn.Dropout(self.proj_pdrop)(out, deterministic=deterministic)
        out = out * qm[..., None].astype(out.dtype)
        return out, qm


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------

class TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block with optional temporal downsampling
    (reference models/blocks.py:992-1080)."""
    n_embd: int
    n_head: int
    n_ds_strides: tuple[int, int] = (1, 1)
    n_hidden: Optional[int] = None
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    mha_win_size: int = -1
    use_rel_pe: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Array, pos_embd: Optional[Array] = None,
                 *, deterministic: bool = True) -> tuple[Array, Array]:
        xn = ChannelLayerNorm(self.n_embd, name="ln1")(x)
        if self.mha_win_size > 1:
            attn = LocalConvMHA(
                self.n_embd, self.n_head, window_size=self.mha_win_size,
                n_qx_stride=self.n_ds_strides[0], n_kv_stride=self.n_ds_strides[1],
                attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                use_rel_pe=self.use_rel_pe, name="attn")
        else:
            attn = ConvMHA(
                self.n_embd, self.n_head,
                n_qx_stride=self.n_ds_strides[0], n_kv_stride=self.n_ds_strides[1],
                attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                name="attn")
        out, out_mask = attn(xn, xn, xn, mask, mask, deterministic=deterministic)
        out_mask_f = out_mask[..., None].astype(out.dtype)

        if self.n_ds_strides[0] > 1:
            kernel = self.n_ds_strides[0] + 1
            stride = self.n_ds_strides[0]
            padding = (self.n_ds_strides[0] + 1) // 2
            skip = mops.max_pool1d(x, kernel=kernel, stride=stride,
                                   padding=padding)
            skip = skip[:, :out.shape[1]]
        else:
            skip = x
        out = skip * out_mask_f + MaybeDropPath(
            self.n_embd, self.path_pdrop, name="drop_path_attn")(
            out, deterministic=deterministic)

        n_hidden = self.n_hidden if self.n_hidden is not None else 4 * self.n_embd
        h = ChannelLayerNorm(self.n_embd, name="ln2")(out)
        h = Dense(n_hidden, name="mlp_0")(h)
        h = jax.nn.gelu(h, approximate=False)
        if self.proj_pdrop > 0.0:
            h = nn.Dropout(self.proj_pdrop)(h, deterministic=deterministic)
        h = Dense(self.n_embd, name="mlp_1")(h)
        if self.proj_pdrop > 0.0:
            h = nn.Dropout(self.proj_pdrop)(h, deterministic=deterministic)
        out = out + MaybeDropPath(self.n_embd, self.path_pdrop,
                                  name="drop_path_mlp")(
            h * out_mask_f, deterministic=deterministic)

        if pos_embd is not None:
            out = out + pos_embd * out_mask_f
        return out, out_mask


def _make_attn(n_embd, n_head, *, use_local, win_size, n_qx_stride, n_kv_stride,
               attn_pdrop, proj_pdrop, use_rel_pe, name):
    """Attention-flavour dispatch used by decoder layers
    (reference models/local_transformer.py:653-739)."""
    if use_local:
        if (name == "self_attn" and n_qx_stride == 0) or \
           (name == "multihead_attn" and n_kv_stride == 0):
            return LocalMHA(n_embd, n_head, window_size=win_size,
                            attn_pdrop=attn_pdrop, proj_pdrop=proj_pdrop,
                            use_rel_pe=use_rel_pe, name=name)
        return LocalConvMHA(n_embd, n_head, window_size=win_size,
                            n_qx_stride=n_qx_stride, n_kv_stride=n_kv_stride,
                            attn_pdrop=attn_pdrop, proj_pdrop=proj_pdrop,
                            use_rel_pe=use_rel_pe, qkv_api=True, name=name)
    if (name == "self_attn" and n_qx_stride == 0) or \
       (name == "multihead_attn" and n_kv_stride == 0):
        return MHA(n_embd, n_head, attn_pdrop=attn_pdrop,
                   proj_pdrop=proj_pdrop, name=name)
    if name == "self_attn":
        # reference passes n_kv_stride=n_qx_stride for decoder self-attn
        # (models/local_transformer.py:711-718)
        return ConvMHA(n_embd, n_head, n_qx_stride=n_qx_stride,
                       n_kv_stride=n_qx_stride, attn_pdrop=attn_pdrop,
                       proj_pdrop=proj_pdrop, qkv_api=True, name=name)
    return ConvMHA(n_embd, n_head, n_qx_stride=n_qx_stride,
                   n_kv_stride=n_kv_stride, attn_pdrop=attn_pdrop,
                   proj_pdrop=proj_pdrop, qkv_api=True, name=name)


class DecoderLayer(nn.Module):
    """Self-attn + cross-attn (+ optional FFN) decoder layer
    (reference MaskedConvTransformerDecoderLayer,
    models/local_transformer.py:625-835)."""
    n_embd: int
    n_head: int
    n_hidden: Optional[int] = None
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    n_qx_stride: int = 0
    n_kv_stride: int = 1
    with_ffn: bool = True
    use_local: bool = False
    win_size: Optional[int] = None
    use_rel_pe: bool = False

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, tgt_mask: Array,
                 memory_mask: Array, pos: Optional[Array] = None,
                 query_pos: Optional[Array] = None, cross_first: bool = False,
                 attn_mask: Optional[Array] = None,
                 *, deterministic: bool = True) -> tuple[Array, Array]:
        self_attn = _make_attn(
            self.n_embd, self.n_head, use_local=self.use_local,
            win_size=self.win_size, n_qx_stride=self.n_qx_stride,
            n_kv_stride=self.n_kv_stride, attn_pdrop=self.attn_pdrop,
            proj_pdrop=self.proj_pdrop, use_rel_pe=self.use_rel_pe,
            name="self_attn")
        cross_attn = _make_attn(
            self.n_embd, self.n_head, use_local=self.use_local,
            win_size=self.win_size, n_qx_stride=self.n_qx_stride,
            n_kv_stride=self.n_kv_stride, attn_pdrop=self.attn_pdrop,
            proj_pdrop=self.proj_pdrop, use_rel_pe=self.use_rel_pe,
            name="multihead_attn")

        def wpe(t, p):
            return t if p is None else t + p

        ln1 = ChannelLayerNorm(self.n_embd, name="ln1")
        ln2 = ChannelLayerNorm(self.n_embd, name="ln2")
        dp1 = MaybeDropPath(self.n_embd, self.path_pdrop, name="drop_path_attn1")
        dp2 = MaybeDropPath(self.n_embd, self.path_pdrop, name="drop_path_attn2")

        def do_self(t):
            t2 = ln1(t)
            qk = wpe(t2, query_pos)
            t2, m2 = self_attn(qk, qk, t, tgt_mask, tgt_mask,
                               deterministic=deterministic)
            t = t * m2[..., None].astype(t2.dtype) + dp1(
                t2, deterministic=deterministic)
            return t, m2

        def do_cross(t):
            t2 = ln2(t)
            t2, m2 = cross_attn(wpe(t2, query_pos), wpe(memory, pos), memory,
                                tgt_mask, memory_mask, attn_mask=attn_mask,
                                deterministic=deterministic)
            t = t * m2[..., None].astype(t2.dtype) + dp2(
                t2, deterministic=deterministic)
            return t, m2

        if cross_first:
            tgt, m = do_cross(tgt)
            tgt, m = do_self(tgt)
        else:
            tgt, m = do_self(tgt)
            tgt, m = do_cross(tgt)

        if self.with_ffn:
            n_hidden = self.n_hidden if self.n_hidden is not None else 4 * self.n_embd
            h = ChannelLayerNorm(self.n_embd, name="ln3")(tgt)
            h = Dense(n_hidden, name="mlp_0")(h)
            h = jax.nn.gelu(h, approximate=False)
            if self.proj_pdrop > 0.0:
                h = nn.Dropout(self.proj_pdrop)(h, deterministic=deterministic)
            h = Dense(self.n_embd, name="mlp_1")(h)
            if self.proj_pdrop > 0.0:
                h = nn.Dropout(self.proj_pdrop)(h, deterministic=deterministic)
            tgt = tgt + MaybeDropPath(self.n_embd, self.path_pdrop,
                                      name="drop_path_mlp")(
                h * m[..., None].astype(h.dtype), deterministic=deterministic)
        return tgt, m


class Decoder(nn.Module):
    """Stack of decoder layers with optional intermediate outputs
    (reference MaskedConvTransformerDecoder,
    models/local_transformer.py:838-905)."""
    n_embd: int
    n_head: int
    n_hidden: Optional[int] = None
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.1
    n_qx_stride: int = 0
    n_kv_stride: int = 1
    num_layers: int = 4
    with_norm: bool = True
    return_intermediate: bool = False
    use_local: bool = False
    win_size: Optional[int] = None
    use_rel_pe: bool = False

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, tgt_mask: Array,
                 memory_mask: Array, pos: Optional[Array] = None,
                 query_pos: Optional[Array] = None, cross_first: bool = False,
                 *, deterministic: bool = True) -> tuple[Array, Array]:
        norm = (ChannelLayerNorm(self.n_embd, name="norm")
                if self.with_norm else None)
        out, out_mask = tgt, tgt_mask
        inter = []
        for i in range(self.num_layers):
            out, out_mask = DecoderLayer(
                self.n_embd, self.n_head, self.n_hidden,
                attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                path_pdrop=self.path_pdrop, n_qx_stride=self.n_qx_stride,
                n_kv_stride=self.n_kv_stride, use_local=self.use_local,
                win_size=self.win_size, use_rel_pe=self.use_rel_pe,
                name=f"layers_{i}")(
                out, memory, out_mask, memory_mask, pos=pos,
                query_pos=query_pos, cross_first=cross_first,
                deterministic=deterministic)
            if self.return_intermediate:
                inter.append(norm(out) if norm is not None else out)
        if norm is not None:
            out = norm(out)
            if self.return_intermediate:
                inter[-1] = out
        if self.return_intermediate:
            return jnp.stack(inter), out_mask
        return out[None], out_mask


class DecoderOnly(nn.Module):
    """Query decoder with zero-init targets and learned query positions
    (reference MaskedConvTransformerDecoderOnly,
    models/local_transformer.py:908-976). query_embed: (Q, C)."""
    n_embd: int
    n_head: int
    n_hidden: Optional[int] = None
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.1
    n_qx_stride: int = 0
    n_kv_stride: int = 1
    num_layers: int = 4
    return_intermediate: bool = False
    use_local: bool = False
    win_size: Optional[int] = None
    use_rel_pe: bool = False

    @nn.compact
    def __call__(self, src: Array, mask: Array, query_embed: Array,
                 pos_embed: Optional[Array] = None, cross_first: bool = False,
                 *, deterministic: bool = True) -> tuple[Array, Array]:
        bs = src.shape[0]
        nq = query_embed.shape[0]
        q = jnp.broadcast_to(query_embed[None], (bs, nq, query_embed.shape[1]))
        tgt = jnp.zeros_like(q)
        tgt_mask = jnp.ones((bs, nq), dtype=bool)
        pos = None
        if pos_embed is not None:
            pos = jnp.broadcast_to(pos_embed[None],
                                   (bs,) + pos_embed.shape)
        return Decoder(
            self.n_embd, self.n_head, self.n_hidden,
            attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
            path_pdrop=self.path_pdrop, n_qx_stride=self.n_qx_stride,
            n_kv_stride=self.n_kv_stride, num_layers=self.num_layers,
            return_intermediate=self.return_intermediate,
            use_local=self.use_local, win_size=self.win_size,
            use_rel_pe=self.use_rel_pe, name="decoder")(
            tgt, src, tgt_mask, mask, pos=pos, query_pos=q,
            cross_first=cross_first, deterministic=deterministic)
