"""Masked 1-D sequence ops (functional core).

TPU-native building blocks for variable-length temporal sequences that were
padded to a static length. Everything here is shape-static and jit/pjit
friendly; raggedness is expressed as a boolean validity mask ``(B, T)``.

Layout convention: activations are time-major ``(B, T, C)`` — channels last
so that the C dimension lands on TPU lanes and all projections are plain
``(B*T, C) @ (C, C')`` matmuls on the MXU. (The reference stack uses
``(B, C, T)`` torch conv layout; see e.g. reference models/blocks.py:63-158.)

Semantics parity notes (kept deliberately identical to the reference):
  * convolutions do NOT pre-mask their input; they convolve the padded
    input and mask the *output* (reference models/blocks.py:91-113). Invalid
    frames can therefore leak into the k//2 neighbouring valid frames —
    this is reference behaviour and checkpoint-parity requires it.
  * mask downsampling is "nearest": ``mask[:, ::stride]``
    (reference models/blocks.py:101-105 uses F.interpolate(mode='nearest')).
  * channel LayerNorm uses a biased variance estimate with eps *inside*
    the sqrt (reference models/blocks.py:143-158).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


# ---------------------------------------------------------------------------
# convolution
# ---------------------------------------------------------------------------

def conv1d(x: Array, weight: Array, bias: Array | None = None, *,
           stride: int = 1, groups: int = 1) -> Array:
    """1-D convolution over (B, T, C) with 'same'-style odd-kernel padding.

    weight: (K, C_in // groups, C_out)   bias: (C_out,) or None
    Padding is fixed to K // 2 per side (the only mode the reference uses,
    models/blocks.py:82).
    """
    k = weight.shape[0]
    pad = k // 2
    out = lax.conv_general_dilated(
        x, weight,
        window_strides=(stride,),
        padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def downsample_mask(mask: Array, stride: int, out_len: int) -> Array:
    """Nearest-neighbour mask downsample: out[i] = mask[i * stride]."""
    if stride == 1:
        return mask[:, :out_len]
    return mask[:, ::stride][:, :out_len]


def masked_conv1d(x: Array, mask: Array, weight: Array,
                  bias: Array | None = None, *, stride: int = 1,
                  groups: int = 1) -> tuple[Array, Array]:
    """Mask-preserving conv1d (reference MaskedConv1D, models/blocks.py:63).

    x: (B, T, C_in), mask: (B, T) bool. Returns (out, out_mask) where the
    output is zeroed at invalid positions and the mask was nearest-downsampled
    when stride > 1.
    """
    out = conv1d(x, weight, bias, stride=stride, groups=groups)
    out_mask = downsample_mask(mask, stride, out.shape[1])
    out = out * out_mask[..., None].astype(out.dtype)
    return out, out_mask


def max_pool1d(x: Array, *, kernel: int, stride: int, padding: int) -> Array:
    """Max pool over time matching torch.nn.MaxPool1d (pads with -inf)."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kernel, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )


# ---------------------------------------------------------------------------
# normalisation
# ---------------------------------------------------------------------------

def channel_layernorm(x: Array, weight: Array | None, bias: Array | None,
                      eps: float = 1e-5) -> Array:
    """LayerNorm over the channel axis of (B, T, C).

    Matches reference models/blocks.py:116-158: biased variance, eps inside
    sqrt, affine params broadcast over (B, T).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)  # stats in f32 even under bf16 compute
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    res = x32 - mu
    sigma = jnp.mean(res * res, axis=-1, keepdims=True)
    out = res * lax.rsqrt(sigma + eps)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# attention cores
# ---------------------------------------------------------------------------

def _split_heads(x: Array, n_head: int) -> Array:
    """(B, T, C) -> (B, H, T, C/H)."""
    b, t, c = x.shape
    # reference reshapes (B, nh*hs, T) as view(B, nh, hs, T): head-major
    # channel split, so channels [h*hs:(h+1)*hs] belong to head h.
    return x.reshape(b, t, n_head, c // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: Array) -> Array:
    """(B, H, T, D) -> (B, T, H*D)."""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def full_attention(q: Array, k: Array, v: Array, kv_mask: Array,
                   *, n_head: int) -> Array:
    """Dense masked attention over (B, T, C) streams.

    kv_mask: (B, Tk) bool. Invalid keys get -inf scores; values are zeroed at
    invalid positions before the PV product (reference models/blocks.py:229-236).
    Output is NOT masked by the query mask here — callers multiply by the
    query mask after the output projection, as the reference does.
    """
    d = q.shape[-1] // n_head
    scale = 1.0 / np.sqrt(d)
    qh = _split_heads(q, n_head)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)
    att = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh,
                     preferred_element_type=jnp.float32)
    neg_inf = jnp.asarray(-jnp.inf, att.dtype)
    att = jnp.where(kv_mask[:, None, None, :], att, neg_inf)
    att = jax.nn.softmax(att, axis=-1)
    att = att.astype(vh.dtype)
    vh = vh * kv_mask[:, None, :, None].astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
    return _merge_heads(out)


# Minimum sequence length at which the tuned flash (streaming-softmax)
# kernel beats the dense formulation for the FORWARD pass on TPU.
# Chip-measured at the VidOR stem shape (B=24, H=8, T=512, d=64, bf16):
# dense fwd 4.09 ms vs flash(block=512) 1.44 ms (2.84x). fwd+bwd is only
# ~parity (1.02x), so training keeps the dense form; the flash path is
# engaged for deterministic (eval/serving) forwards only. See DEVNOTES
# "Flash attention block-size tuning".
FLASH_FULL_MIN_T = 256

# Train-time flash opt-in (VRDONE_FLASH_TRAIN=1). Hypothesis was that
# dropping the dense form's (B, H, T, T) softmax backward residual would
# unlock VidOR batch scaling. Chip verdict (DEVNOTES "Flash in training",
# 2026-08-19): parity at b24/b48, +7% at b96, but per-pair throughput
# still peaks at b48 either way — the step is HBM-bandwidth-bound on
# other traffic, not residual-capacity-bound. Default stays dense
# (identical numerics to the golden tests, 3.6x faster compiles); the
# flag remains for long-T experiments. No semantic gate needed:
# attention dropout is 0 in every shipped config (and not implemented in
# either path).
import os as _os
FLASH_TRAIN = _os.environ.get("VRDONE_FLASH_TRAIN", "0") == "1"


def _runs_on_tpu(x: Array) -> bool:
    """Whether `x`'s computation lands on TPU. Concrete arrays answer from
    their actual placement (so explicitly CPU-placed work on a TPU host
    stays dense); tracers (inside jit) can't name a device, so fall back
    to the backend the trace will compile for (jax.default_backend)."""
    try:
        return all(d.platform == "tpu" for d in x.devices())
    except Exception:  # tracer under jit, or abstract array
        return jax.default_backend() == "tpu"


def _flash_block(t: int) -> int | None:
    """Largest legal flash block size dividing t (None: no legal block)."""
    for b in (512, 256, 128):
        if t % b == 0:
            return b
    return None


def _full_attention_flash(q: Array, k: Array, v: Array, kv_mask: Array, *,
                          n_head: int, bq: int, bk: int) -> Array:
    """full_attention via the Pallas TPU flash kernel with tuned (fat)
    block sizes. Valid-query-row outputs match the dense form (invalid
    keys get zero probability either way); invalid query rows differ but
    every caller multiplies the output by the query mask afterwards."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    b, tq, c = q.shape
    tk = k.shape[1]
    d = c // n_head
    qh = q.reshape(b, tq, n_head, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, tk, n_head, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, tk, n_head, d).transpose(0, 2, 1, 3)
    # q rows all "valid" (dense computes every row against the valid keys);
    # kv segment ids mask the invalid keys out
    q_seg = jnp.ones((b, tq), jnp.int32)
    kv_seg = kv_mask.astype(jnp.int32)
    blocks = fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
    out = fa.flash_attention(
        qh, kh, vh, segment_ids=fa.SegmentIds(q_seg, kv_seg),
        sm_scale=1.0 / np.sqrt(d), block_sizes=blocks)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, c)


def full_attention_auto(q: Array, k: Array, v: Array, kv_mask: Array, *,
                        n_head: int, allow_flash: bool = True) -> Array:
    """full_attention with automatic kernel selection: the tuned flash
    kernel on TPU for long deterministic forwards, dense otherwise.
    Callers pass allow_flash=deterministic — the flash fwd+bwd is only
    parity with dense (DEVNOTES), so gradients ride the dense form unless
    FLASH_TRAIN opts training in (kills the (B,H,T,T) backward residual)."""
    tq, tk = q.shape[1], k.shape[1]
    if ((allow_flash or FLASH_TRAIN)
            and tq >= FLASH_FULL_MIN_T and tk >= FLASH_FULL_MIN_T
            and _runs_on_tpu(q)):
        bq, bk = _flash_block(tq), _flash_block(tk)
        if bq is not None and bk is not None:
            return _full_attention_flash(q, k, v, kv_mask, n_head=n_head,
                                         bq=bq, bk=bk)
    return full_attention(q, k, v, kv_mask, n_head=n_head)


def band_attention(q: Array, k: Array, v: Array, kv_mask: Array, *,
                   n_head: int, window_size: int,
                   rel_pe: Array | None = None) -> Array:
    """Sliding-window (Longformer-band) attention, dense formulation.

    Each query position i attends to key positions j with |i - j| <= w where
    w = window_size // 2. Semantics mirror the reference chunked Longformer
    implementation (models/blocks.py:362-654):

      * out-of-band or out-of-sequence positions: score = -inf
      * in-band but mask-invalid keys: score += -1e4   (NOT -inf)
      * rows whose *query* position is mask-invalid are zeroed post-softmax
      * values are not pre-masked (the -1e4 already suppresses them)

    For the sequence lengths this model runs at (T <= a few thousand) the
    dense band-masked form is faster on TPU than chunk gathering: the full
    T x T score matrix tiles straight onto the MXU and XLA fuses the mask.
    The Pallas kernel in vrdone_tpu/ops/pallas is used for long sequences.

    q is expected unscaled; scaling by 1/sqrt(d) happens here.
    kv_mask: (B, T) bool validity of the (already stride-aligned) kv stream.
    rel_pe: optional (H, window_size) == (H, 2w+1) relative position bias.
    """
    b, t, c = q.shape
    w = window_size // 2
    d = c // n_head
    scale = 1.0 / np.sqrt(d)

    qh = _split_heads(q, n_head)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)

    att = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh,
                     preferred_element_type=jnp.float32)

    idx = jnp.arange(t)
    relpos = idx[None, :] - idx[:, None]           # (Tq, Tk): j - i
    in_band = jnp.abs(relpos) <= w                 # (T, T)

    if rel_pe is not None:
        # rel_pe[h, j - i + w] added inside the band
        pe_idx = jnp.clip(relpos + w, 0, window_size - 1)
        att = att + rel_pe[:, pe_idx][None]        # (1,H,T,T) broadcast

    kv_invalid = jnp.logical_not(kv_mask)          # (B, Tk)
    att = att + (-1e4) * kv_invalid[:, None, None, :].astype(att.dtype)
    neg_inf = jnp.asarray(-jnp.inf, att.dtype)
    att = jnp.where(in_band[None, None], att, neg_inf)

    att = jax.nn.softmax(att, axis=-1)
    # zero rows whose query position is invalid (reference blocks.py:641-643,
    # 976-978 — note it uses the *kv* mask indexed at the query position,
    # which matches because q and kv are downsampled by the same stride)
    att = att * kv_mask[:, None, :, None].astype(att.dtype)
    att = att.astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
    return _merge_heads(out)


# Minimum sequence length at which the blocked Pallas kernel beats the
# dense band-masked formulation on TPU. Benchmark-derived on the real
# chip at the streaming runner's batch shape (B=32, C=128, win=19):
# T=512 dense 2.57 ms / pallas 2.86 ms; T=768 3.83 / 3.79 (cross-over);
# T=1024 5.74 / 4.75. The kernel also avoids the dense form's O(B*H*T^2)
# score materialisation, which dominates HBM past a few thousand frames.
# Env-overridable for experiments (VRDONE_PALLAS_BAND_MIN_T).
PALLAS_BAND_MIN_T = int(_os.environ.get("VRDONE_PALLAS_BAND_MIN_T", "768"))


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _band_pallas_pe(q, k, v, kv_mask, rel_pe, n_head, window_size):
    """Pallas forward with rel-PE; backward falls back to autodiff
    through the dense formulation (the kernel's custom VJP covers only
    the no-PE path). Same values either way, so the pairing is exact up
    to float noise; training with rel-PE at long T pays the dense
    backward cost instead of crashing on a non-differentiable
    pallas_call."""
    from .pallas.band_attention import band_attention_pallas
    return band_attention_pallas(q, k, v, kv_mask, n_head=n_head,
                                 window_size=window_size, rel_pe=rel_pe)


def _band_pallas_pe_fwd(q, k, v, kv_mask, rel_pe, n_head, window_size):
    out = _band_pallas_pe(q, k, v, kv_mask, rel_pe, n_head, window_size)
    return out, (q, k, v, kv_mask, rel_pe)


def _band_pallas_pe_bwd(n_head, window_size, res, g):
    q, k, v, kv_mask, rel_pe = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, pe_: band_attention(
            q_, k_, v_, kv_mask, n_head=n_head, window_size=window_size,
            rel_pe=pe_), q, k, v, rel_pe)
    dq, dk, dv, dpe = vjp(g)
    dmask = np.zeros(kv_mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask, dpe


_band_pallas_pe.defvjp(_band_pallas_pe_fwd, _band_pallas_pe_bwd)


def band_attention_auto(q: Array, k: Array, v: Array, kv_mask: Array, *,
                        n_head: int, window_size: int,
                        rel_pe: Array | None = None) -> Array:
    """band_attention with automatic kernel selection: the O(T * 3B) Pallas
    kernel on TPU for long sequences (with or without rel-PE), the dense
    formulation otherwise. Both long-T paths are differentiable: the
    no-PE kernel has a flash custom VJP; the rel-PE kernel pairs its
    forward with the dense backward."""
    t = q.shape[1]
    if t >= PALLAS_BAND_MIN_T and _runs_on_tpu(q):
        if rel_pe is not None:
            return _band_pallas_pe(q, k, v, kv_mask, rel_pe, n_head,
                                   window_size)
        from .pallas.band_attention import band_attention_pallas
        return band_attention_pallas(q, k, v, kv_mask, n_head=n_head,
                                     window_size=window_size)
    return band_attention(q, k, v, kv_mask, n_head=n_head,
                          window_size=window_size, rel_pe=rel_pe)


# ---------------------------------------------------------------------------
# position encodings
# ---------------------------------------------------------------------------

def sinusoid_encoding(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid PE table, (n_position, d_hid) float32.

    Same table as reference models/blocks.py:162-173 (interleaved sin/cos,
    10000^(2*(j//2)/d) frequencies). Returned as numpy so it can be baked
    into params/constants at trace time.
    """
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    j = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def resize_pe_linear(pe: Array, new_len: int) -> Array:
    """Linear re-interpolation of a (T, C) PE table to (new_len, C).

    Matches torch F.interpolate(mode='linear', align_corners=False) used at
    inference for over-length sequences (reference models/backbones.py:188-196):
    src = (dst + 0.5) * T/new_len - 0.5, clamped, linear blend.
    """
    t = pe.shape[0]
    scale = t / new_len
    dst = jnp.arange(new_len, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, t - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (src - lo.astype(jnp.float32))[:, None]
    return pe[lo] * (1.0 - frac) + pe[hi] * frac


# ---------------------------------------------------------------------------
# stochastic depth
# ---------------------------------------------------------------------------

def drop_path(x: Array, rng: jax.Array | None, drop_prob: float,
              deterministic: bool) -> Array:
    """Per-sample stochastic depth (reference models/blocks.py:1107-1120)."""
    if deterministic or drop_prob == 0.0:
        return x
    keep = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=x.dtype))
    return x / keep * mask
