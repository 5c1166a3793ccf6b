"""Pallas TPU kernel: fused MEGA set-attention (serving fast path).

One kernel computes the whole grouped attention of MEGAHead.attention
(models/mega.py; reference attention_module_multi_head,
mega_core roi_box_feature_extractors.py:567-646):

    aff  = (q @ k^T + u @ k^T) / sqrt(dg)            per group
    aff += log(relu(Wg(PE(q_rois, k_rois))) + 1e-6)  (local ver only)
    att  = softmax(mask(aff)) * valid
    out  = att @ (V @ Wv_g)                          per group, concat

with a flash-style online softmax over key tiles, so neither the
(g, N, M) score matrix, nor the (g, N, M) position bias, nor the
(N, M, 64) position embedding ever touches HBM. The geometric bias is
computed tile-by-tile in VMEM with the same separable dw/dh
factorization as ops/pallas/position_bias.py (whose helpers this kernel
shares). The value projection rides the reassociated order
(att @ (V @ Wv_g), see GroupedLinear in models/mega.py) — its (M, D) @
(D, dg) precompute happens outside the kernel as one MXU pass.

At the serving stage-0 shape (N=675, M=3750, g=16) the dense
composition moves ~400 MB of bias/score traffic per attention call;
this kernel's HBM footprint is just q/k/vproj in and (N, D) out.

Forward-only (no custom VJP): training keeps the dense composition.
Padding rows/cols are hard-masked: invalid keys contribute exp(-inf)=0,
and an all-invalid reference set produces a zero output row (parity
with the dense path's post-softmax `att * valid`).

Numerics (chip-measured 2026-08-21, f32 operands, serving shapes): the
kernel lands 3.0e-3 max-rel from a float64 oracle vs the dense
composition's 4.0e-3 — both are TPU f32 rounding-class (XLA's default
f32 matmul runs bf16 passes), the kernel slightly closer. Whole-video
outputs of the two paths still diverge under RANDOM-init weights
because the untrained MEGA softmax saturates (near-argmax), so any
rounding difference flips near-ties; the reference's own bf16 variants
show the same and their video-level tests check finiteness only
(tests/test_method_bf16.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrdone_tpu.ops.pallas.position_bias import bias_tile, pe_setup

NEG_INF = float(np.finfo(np.float32).min)


def _attn_kernel(q_ref, k_ref, vp_ref, ub_ref, valid_ref, *refs,
                 freqs, groups, scale, nmb, with_bias):
    if with_bias:
        (qroi_ref, kroit_ref, a_ref, bt_ref, wt_ref, wb_ref,
         o_ref) = refs[:7]
        acc_ref, m_ref, l_ref = refs[7:]
    else:
        o_ref = refs[0]
        acc_ref, m_ref, l_ref = refs[1:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[...]                                   # (g, bn, dg)
    k = k_ref[...]                                   # (g, bm, dg)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (g, bn, bm)
    s = s + ub_ref[...]                              # (g, 1, bm) broadcast

    if with_bias:
        s = s + bias_tile(qroi_ref[...], kroit_ref[...], a_ref[...],
                          bt_ref[...], wt_ref[...], wb_ref[...],
                          freqs=freqs, groups=groups)

    valid = valid_ref[...]                           # (1, bm) float 0/1
    s = jnp.where(valid[None] > 0.0, s, NEG_INF)

    m_prev = m_ref[...]                              # (g, bn, 1)
    m_cur = jnp.max(s, axis=2, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # all keys so far invalid -> m_new = -inf; exp against 0 instead to
    # keep alpha/p finite (their contributions are exactly 0)
    m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
    alpha = jnp.exp(m_prev - m_safe)
    p = jnp.exp(s - m_safe) * valid[None]            # (g, bn, bm)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=2, keepdims=True)
    m_ref[...] = m_new
    vp = vp_ref[...]                                 # (g, bm, dgo)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(vp.dtype), vp, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    @pl.when(j == nmb - 1)
    def _finalize():
        l = l_ref[...]
        o_ref[...] = jnp.where(
            l > 0.0, acc_ref[...] / jnp.maximum(l, 1e-30), 0.0
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("embed_dim", "wave_length",
                                             "block_n", "block_m",
                                             "interpret"))
def fused_mega_attention(q, k, vproj, ub, valid, q_rois=None, k_rois=None,
                         wg_kernel=None, wg_bias=None, *,
                         embed_dim: int = 64, wave_length: float = 1000.0,
                         block_n: int | None = None, block_m: int = 128,
                         interpret: bool = False):
    """q (g, N, dg), k (g, M, dg), vproj (g, M, dgo) = V @ Wv_g,
    ub (g, M) = (u @ k^T)/sqrt(dg), valid (M,) bool.

    With q_rois/k_rois/wg_* set, adds the fused geometric position bias
    (the "local"/"memory" attention flavours); without them it is the
    bias-free "global" flavour. Returns (N, g*dgo) in GroupedLinear
    concat order — add Wv's output bias outside.
    """
    g, n, dg = q.shape
    m = k.shape[1]
    dgo = vproj.shape[-1]
    with_bias = q_rois is not None
    if block_n is None:
        # f32 operands double every VMEM tile; (128, 128) fits only in
        # bf16 (f32 at the serving shape measured 16.64M vs the 16M
        # scoped-vmem limit). n is the parallel grid dim, so shrinking
        # block_n costs no extra sequential passes.
        block_n = 128 if q.dtype == jnp.bfloat16 else 64
    n_pad = -n % block_n
    m_pad = -m % block_m
    npad, mpad = n + n_pad, m + m_pad

    q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, m_pad), (0, 0)))
    vproj = jnp.pad(vproj, ((0, 0), (0, m_pad), (0, 0)))
    ub = jnp.pad(ub, ((0, 0), (0, m_pad)))[:, None, :]   # (g, 1, Mp)
    validf = jnp.pad(valid.astype(jnp.float32), (0, m_pad))[None]  # (1, Mp)

    grid = (npad // block_n, mpad // block_m)
    nmb = grid[1]
    in_specs = [
        pl.BlockSpec((g, block_n, dg), lambda i, j: (0, i, 0)),
        pl.BlockSpec((g, block_m, dg), lambda i, j: (0, j, 0)),
        pl.BlockSpec((g, block_m, dgo), lambda i, j: (0, j, 0)),
        pl.BlockSpec((g, 1, block_m), lambda i, j: (0, 0, j)),
        pl.BlockSpec((1, block_m), lambda i, j: (0, j)),
    ]
    inputs = [q, k, vproj, ub, validf]

    if with_bias:
        qr = jnp.pad(q_rois.astype(jnp.float32), ((0, n_pad), (0, 0)))
        kr = jnp.pad(k_rois.astype(jnp.float32), ((0, m_pad), (0, 0)))
        freqs, A, B_t, wt = pe_setup(qr, kr, wg_kernel, embed_dim,
                                     wave_length)
        sep_dim = A.shape[-1]
        in_specs += [
            pl.BlockSpec((block_n, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((4, block_m), lambda i, j: (0, j)),
            pl.BlockSpec((g, block_n, sep_dim), lambda i, j: (0, i, 0)),
            pl.BlockSpec((sep_dim, block_m), lambda i, j: (0, j)),
            pl.BlockSpec((g, embed_dim // 2), lambda i, j: (0, 0)),
            pl.BlockSpec((1, g), lambda i, j: (0, 0)),
        ]
        inputs += [qr, kr.T, A, B_t, wt,
                   wg_bias.astype(jnp.float32).reshape(1, g)]
    else:
        freqs = ()

    out = pl.pallas_call(
        functools.partial(_attn_kernel, freqs=freqs, groups=g,
                          scale=1.0 / np.sqrt(dg), nmb=nmb,
                          with_bias=with_bias),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, block_n, dgo), lambda i, j: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((g, npad, dgo), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, block_n, dgo), jnp.float32),
            pltpu.VMEM((g, block_n, 1), jnp.float32),
            pltpu.VMEM((g, block_n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    # (g, N, dgo) -> (N, g*dgo): GroupedLinear's "ngo" concat order
    return out[:, :n].transpose(1, 0, 2).reshape(n, g * dgo)
