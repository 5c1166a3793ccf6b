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

The no-rel-PE path is DIFFERENTIABLE: a custom VJP implements the
flash-attention backward restricted to the band — the forward also emits
the per-row log-sum-exp, and two backward kernels recompute the band
tiles to produce dQ (per query block) and dK/dV (per key block).
Gradient parity vs autodiff through the dense form is pinned in
tests/test_pallas_band.py and was verified on hardware (rel err ~6e-5
under f32 matmul precision; grad pass 2.67 ms vs dense 2.97 ms at
B=8, T=1024, C=128, win=9).

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
        pe_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
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
        lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])


def _band_mask_scores(s, bi, kb, kvm_col, *, w, block):
    """Apply the band mask and additive key-validity mask to a raw
    (block, block) score tile."""
    q_pos = bi * block + jax.lax.broadcasted_iota(
        jnp.int32, (block, block), 0)
    k_pos = kb * block + jax.lax.broadcasted_iota(
        jnp.int32, (block, block), 1)
    s = s + kvm_col[:, 0][None, :]
    return jnp.where(jnp.abs(q_pos - k_pos) <= w, s, NEG_INF)


def _dq_kernel(q_ref, k_ref, v_ref, kvm_ref, lse_ref, do_ref, dd_ref,
               dq_ref, acc_ref, *, w: int, block: int, nb: int,
               scale: float):
    bi = pl.program_id(1)
    j = pl.program_id(2)
    kb = bi - 1 + j
    valid = jnp.logical_and(kb >= 0, kb < nb)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(valid)
    def _acc():
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = _band_mask_scores(s, bi, kb, kvm_ref[0], w=w, block=block)
        p = jnp.exp(s - lse_ref[0])
        do = do_ref[0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dd_ref[0])
        acc_ref[...] += jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(j == 2)
    def _fin():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, kvm_ref, q_ref, lse_ref, do_ref, dd_ref,
                dk_ref, dv_ref, kacc_ref, vacc_ref, *, w: int, block: int,
                nb: int, scale: float):
    kb = pl.program_id(1)
    j = pl.program_id(2)
    qi = kb - 1 + j
    valid = jnp.logical_and(qi >= 0, qi < nb)

    @pl.when(j == 0)
    def _init():
        kacc_ref[...] = jnp.zeros_like(kacc_ref)
        vacc_ref[...] = jnp.zeros_like(vacc_ref)

    @pl.when(valid)
    def _acc():
        k, v = k_ref[0], v_ref[0]
        q = q_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = _band_mask_scores(s, qi, kb, kvm_ref[0], w=w, block=block)
        p = jnp.exp(s - lse_ref[0])
        do = do_ref[0].astype(jnp.float32)
        vacc_ref[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dd_ref[0])
        kacc_ref[...] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(j == 2)
    def _fin():
        dk_ref[0] = kacc_ref[...].astype(dk_ref.dtype)
        dv_ref[0] = vacc_ref[...].astype(dv_ref.dtype)


def _head_forward(qh, kh, vh, kvm, *, w: int, block: int, nb: int,
                  bias=None, interpret: bool = False):
    """(B*H, Tp, d) head-space forward -> (out, lse)."""
    bh, tp, d = qh.shape
    grid = (bh, nb, 3)

    def clamp_kb(h, i, j):
        return (h, jnp.clip(i - 1 + j, 0, nb - 1), 0)

    in_specs = [
        pl.BlockSpec((1, block, d), lambda h, i, j: (h, i, 0)),
        pl.BlockSpec((1, block, d), clamp_kb),
        pl.BlockSpec((1, block, d), clamp_kb),
        pl.BlockSpec((1, block, 1), clamp_kb),
    ]
    inputs = [qh, kh, vh, kvm]
    if bias is not None:
        n_head = bias.shape[0]
        in_specs.append(pl.BlockSpec(
            (1, 1, block, block),
            lambda h, i, j: (jax.lax.rem(h, n_head), j, 0, 0)))
        inputs.append(bias)

    out, lse = pl.pallas_call(
        functools.partial(_band_kernel, w=w, block=block, nb=nb,
                          scale=1.0 / np.sqrt(d),
                          with_pe=bias is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, block, d), lambda h, i, j: (h, i, 0)),
                   pl.BlockSpec((1, block, 1), lambda h, i, j: (h, i, 0))],
        out_shape=[jax.ShapeDtypeStruct((bh, tp, d), qh.dtype),
                   jax.ShapeDtypeStruct((bh, tp, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _band_core(qh, kh, vh, kvm, w, block, nb, interpret):
    """Differentiable head-space band attention (no rel-PE): flash-style
    forward; backward recomputes the band tiles from the saved
    log-sum-exp — the standard flash-attention backward, restricted to
    the 3-block neighbourhood."""
    return _head_forward(qh, kh, vh, kvm, w=w, block=block, nb=nb,
                         interpret=interpret)[0]


def _band_core_fwd(qh, kh, vh, kvm, w, block, nb, interpret):
    o, lse = _head_forward(qh, kh, vh, kvm, w=w, block=block, nb=nb,
                           interpret=interpret)
    return o, (qh, kh, vh, kvm, o, lse)


def _band_core_bwd(w, block, nb, interpret, res, do):
    qh, kh, vh, kvm, o, lse = res
    bh, tp, d = qh.shape
    scale = 1.0 / np.sqrt(d)
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)          # (BH, Tp, 1)
    grid = (bh, nb, 3)

    def own(h, i, j):
        return (h, i, 0)

    def clamp_kb(h, i, j):
        return (h, jnp.clip(i - 1 + j, 0, nb - 1), 0)

    blk_d = pl.BlockSpec((1, block, d), own)
    blk_d_n = pl.BlockSpec((1, block, d), clamp_kb)
    blk_1 = pl.BlockSpec((1, block, 1), own)
    blk_1_n = pl.BlockSpec((1, block, 1), clamp_kb)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, w=w, block=block, nb=nb,
                          scale=scale),
        grid=grid,
        in_specs=[blk_d, blk_d_n, blk_d_n, blk_1_n, blk_1, blk_d, blk_1],
        out_specs=pl.BlockSpec((1, block, d), own),
        out_shape=jax.ShapeDtypeStruct((bh, tp, d), qh.dtype),
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qh, kh, vh, kvm, lse, do, dd)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, w=w, block=block, nb=nb,
                          scale=scale),
        grid=grid,
        in_specs=[blk_d, blk_d, blk_1, blk_d_n, blk_1_n, blk_d_n,
                  blk_1_n],
        out_specs=[pl.BlockSpec((1, block, d), own),
                   pl.BlockSpec((1, block, d), own)],
        out_shape=[jax.ShapeDtypeStruct((bh, tp, d), kh.dtype),
                   jax.ShapeDtypeStruct((bh, tp, d), vh.dtype)],
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32),
                        pltpu.VMEM((block, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(kh, vh, kvm, qh, lse, do, dd)

    return dq, dk, dv, jnp.zeros_like(kvm)


_band_core.defvjp(_band_core_fwd, _band_core_bwd)


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

    if rel_pe is None:
        # differentiable path (flash backward via custom_vjp)
        out = _band_core(qh, kh, vh, kvm, w, block, nb, interpret)
    else:
        # bias[h, n, qi, ki] = rel_pe[h, ((n-1)*block + ki - qi) + w]
        # inside the band, 0 elsewhere (out-of-band is hard-masked anyway)
        qi = jnp.arange(block)[:, None]
        ki = jnp.arange(block)[None, :]
        off = (jnp.arange(3)[:, None, None] - 1) * block + ki - qi  # (3,b,b)
        idx = jnp.clip(off + w, 0, window_size - 1)
        bias = rel_pe.astype(jnp.float32)[:, idx]      # (H, 3, blk, blk)
        bias = bias * (jnp.abs(off) <= w)[None]
        out, _ = _head_forward(qh, kh, vh, kvm, w=w, block=block, nb=nb,
                               bias=bias, interpret=interpret)

    out = (out.reshape(b, n_head, tp, d).transpose(0, 2, 1, 3)
           .reshape(b, tp, c))
    if pad:
        out = out[:, :t]
    # parity with the reference: rows whose query position is invalid are
    # zeroed post-softmax (models/blocks.py:976-978)
    out = out * kv_mask[:, :t, None].astype(out.dtype)
    return out
