"""Pallas TPU kernel: banded (sliding-window) attention.

Semantics identical to vrdone_tpu.ops.masked.band_attention (the Longformer
band of reference models/blocks.py:362-989): query i attends keys j with
|i - j| <= w; in-band invalid keys contribute an additive -1e4; out-of-band
is hard-masked.

The dense formulation materialises the full (T, T) score matrix — the right
call for T <= ~512 where the whole band fits one MXU pass, but O(T^2) in
memory/FLOPs. This kernel is O(T * 3B): the grid walks (batch*heads,
query-block, 3 key-neighbour-blocks) with a flash-style online softmax kept
in VMEM scratch, touching only the three key blocks that can intersect the
band of each query block. Used for long sequences (streaming video
inference), where it is both the memory and FLOP win.

Requirements: T % block == 0 (callers pad), block >= w.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e4   # in-band invalid-key additive mask (parity with reference)
NEG_INF = float(np.finfo(np.float32).min)


def _band_kernel(q_ref, k_ref, v_ref, kvm_ref, *refs, w: int, block: int,
                 nb: int, scale: float, with_pe: bool):
    if with_pe:
        pe_ref, o_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, acc_ref, m_ref, l_ref = refs
        pe_ref = None
    bi = pl.program_id(1)   # query block index
    j = pl.program_id(2)    # neighbour index 0..2 -> key block bi-1+j

    kb = bi - 1 + j
    valid_block = jnp.logical_and(kb >= 0, kb < nb)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(valid_block)
    def _accumulate():
        q = q_ref[0]                      # (block, d)
        k = k_ref[0]                      # (block, d)
        v = v_ref[0]                      # (block, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (block, block)

        q_pos = bi * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, block), 0)
        k_pos = kb * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, block), 1)
        in_band = jnp.abs(q_pos - k_pos) <= w
        if pe_ref is not None:
            # precomputed per-(head, neighbour) relative-position bias
            s = s + pe_ref[0, 0]
        # additive -1e4 for invalid keys (kvm holds 0 / -1e4)
        s = s + kvm_ref[0][:, 0][None, :]
        s = jnp.where(in_band, s, NEG_INF)

        m_prev = m_ref[...]               # (block, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)            # (block, block)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_new
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == 2)
    def _finalize():
        # every query position always has in-band keys (its own position),
        # so l > 0
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "window_size",
                                             "block", "interpret"))
def band_attention_pallas(q, k, v, kv_mask, *, n_head: int,
                          window_size: int, block: int = 128,
                          rel_pe=None, interpret: bool = False):
    """Drop-in for ops.masked.band_attention.

    q, k, v: (B, T, C); kv_mask: (B, T) bool. Returns (B, T, C).
    q is unscaled; 1/sqrt(d) is applied inside. rel_pe: optional
    (n_head, window_size) relative-position bias added inside the band
    (reference blocks.py rel-PE) — expanded host-side to per-neighbour
    (H, 3, block, block) bias tiles so the kernel adds one VMEM block.
    """
    b, t, c = q.shape
    d = c // n_head
    w = window_size // 2
    assert block >= w, (block, w)
    pad = (-t) % block
    if pad:
        padcfg = ((0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padcfg)
        k = jnp.pad(k, padcfg)
        v = jnp.pad(v, padcfg)
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad)))
    tp = t + pad
    nb = tp // block

    def split(x):
        return (x.reshape(b, tp, n_head, d).transpose(0, 2, 1, 3)
                .reshape(b * n_head, tp, d))

    qh, kh, vh = split(q), split(k), split(v)
    kvm = jnp.where(kv_mask, 0.0, NEG_BIG).astype(jnp.float32)
    kvm = jnp.repeat(kvm, n_head, axis=0)[..., None]   # (B*H, Tp, 1)
    # trailing singleton keeps the mask block TPU-tileable: (1, block, 1)
    # satisfies the (8, 128)-divisible-or-full rule via full trailing dims

    grid = (b * n_head, nb, 3)

    def clamp_kb(h, i, j):
        return (h, jnp.clip(i - 1 + j, 0, nb - 1), 0)

    in_specs = [
        pl.BlockSpec((1, block, d), lambda h, i, j: (h, i, 0)),
        pl.BlockSpec((1, block, d), clamp_kb),
        pl.BlockSpec((1, block, d), clamp_kb),
        pl.BlockSpec((1, block, 1), lambda h, i, j:
                     (h, jnp.clip(i - 1 + j, 0, nb - 1), 0)),
    ]
    inputs = [qh, kh, vh, kvm]
    if rel_pe is not None:
        # bias[h, n, qi, ki] = rel_pe[h, ((n-1)*block + ki - qi) + w]
        # inside the band, 0 elsewhere (out-of-band is hard-masked anyway)
        qi = jnp.arange(block)[:, None]
        ki = jnp.arange(block)[None, :]
        off = (jnp.arange(3)[:, None, None] - 1) * block + ki - qi  # (3,b,b)
        idx = jnp.clip(off + w, 0, window_size - 1)
        bias = rel_pe.astype(jnp.float32)[:, idx]      # (H, 3, blk, blk)
        bias = bias * (jnp.abs(off) <= w)[None]
        in_specs.append(pl.BlockSpec(
            (1, 1, block, block),
            lambda h, i, j: (jax.lax.rem(h, n_head), j, 0, 0)))
        inputs.append(bias)

    out = pl.pallas_call(
        functools.partial(_band_kernel, w=w, block=block, nb=nb,
                          scale=1.0 / np.sqrt(d),
                          with_pe=rel_pe is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block, d), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n_head, tp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)

    out = (out.reshape(b, n_head, tp, d).transpose(0, 2, 1, 3)
           .reshape(b, tp, c))
    if pad:
        out = out[:, :t]
    # parity with the reference: rows whose query position is invalid are
    # zeroed post-softmax (models/blocks.py:976-978)
    out = out * kv_mask[:, :t, None].astype(out.dtype)
    return out
