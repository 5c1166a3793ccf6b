"""Pallas TPU kernel: fused MEGA geometric position bias.

Computes log(relu(Dense_Wg(PE(q_rois, k_rois))) + 1e-6) as one kernel,
emitting the (groups, N, M) additive attention bias directly.

Semantics identical to the composition used by MEGAHead.attention
(models/mega.py): position_matrix -> sinusoid position_embedding ->
l_Wg Dense -> relu -> log -> transpose — which mirrors the reference
attention_module_multi_head (mega_core roi_box_feature_extractors.py
:125-176, :592-597, :630).

Why a kernel: the dense form materialises the (N, M, 64) embedding and
the (N, M, g) gate in HBM. At the serving stage-0 shape (N=675 queries,
M=3750 window+memory refs) that is ~650 MB + ~160 MB of intermediate
traffic per attention call — the measured bandwidth bottleneck of
streaming video detection (DEVNOTES serving analysis).

Structure exploited (v2): of the four geometry features, dw=log(qw/kw)
and dh=log(qh/kh) are exactly *separable* (a q-roi term minus a k-roi
term, no epsilon inside), so their 32 sinusoid features factor through
the angle-addition identities

    sin(c(a-b)) = sin(ca)cos(cb) - cos(ca)sin(cb)
    cos(c(a-b)) = cos(ca)cos(cb) + sin(ca)sin(cb)

into per-roi transcendentals (O(N+M) instead of O(N*M)) plus one MXU
matmul: folding the Wg columns into the q-side factors gives
Wg_dwdh . pe_dwdh == A @ B^T with A:(g, N, 32), B:(M, 32). Only dx/dy
(non-separable: |qc-kc|/qw with a +1e-3 inside the log) keep per-pair
transcendentals in-kernel — half the transcendental work and half the
VMEM stack of v1. Inside the kernel the embedding tile lives only in
VMEM, feature-major (32, bn*bm), so the 32->g contraction is one MXU
dot per tile; only the (g, N, M) bias ever touches HBM.

Kernel-only forward (no custom VJP): serving/eval path. The training
path keeps the dense composition, whose autodiff handles the Wg grads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def bias_tile(q, kt, a, bt, wt, b, *, freqs, groups):
    """Compute one (groups, bn, bm) fused-position-bias tile from VMEM
    operands: q (bn, 4) rois, kt (4, bm) transposed rois, a (groups, bn,
    sep_dim) / bt (sep_dim, bm) separable dw/dh factors, wt (groups, 32)
    transposed dx/dy Wg columns, b (1, groups) Wg bias. Shared by the
    standalone bias kernel below and the fused attention kernel
    (ops/pallas/mega_attention.py)."""
    qx1, qy1, qx2, qy2 = (q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4])
    kx1, ky1, kx2, ky2 = (kt[0:1, :], kt[1:2, :], kt[2:3, :], kt[3:4, :])
    qw = qx2 - qx1 + 1.0
    qh = qy2 - qy1 + 1.0
    qcx = 0.5 * (qx1 + qx2)
    qcy = 0.5 * (qy1 + qy2)
    kcx = 0.5 * (kx1 + kx2)
    kcy = 0.5 * (ky1 + ky2)

    # (bn, 1) x (1, bm) -> (bn, bm) log-space geometry (position_matrix),
    # pairwise features only — dw/dh arrive pre-factored via a/bt.
    dx = jnp.log(jnp.abs((qcx - kcx) / qw) + 1e-3)
    dy = jnp.log(jnp.abs((qcy - kcy) / qh) + 1e-3)

    bn, bm = dx.shape
    # transposed embedding tile, feature-major: rows j*16+k are
    # sin(pos_j * c_k), rows j*16+8+k are cos — matching the
    # position_embedding concat([sin, cos], -1).reshape layout.
    # freqs are python floats (baked into the program, not operands).
    # (A direct per-(group, feature) FMA accumulation — skipping this
    # stack in favour of (g,1,1)-broadcast multiplies — fails to lower:
    # Mosaic rejects the 1x16 -> 16x1x1 shape cast; chip-tested 2026-08-21.)
    parts = []
    for pos in (dx, dy):
        angs = [pos * c for c in freqs]
        parts.extend(jnp.sin(ang) for ang in angs)
        parts.extend(jnp.cos(ang) for ang in angs)
    pe_t = jnp.stack(parts, axis=0).reshape(-1, bn * bm)

    wg = jnp.dot(wt, pe_t,
                 preferred_element_type=jnp.float32)        # (g, bn*bm)
    wg = wg + b.reshape(groups, 1)                          # bias in 2-D
    # separable dw/dh half: (g*bn, 32) @ (32, bm) on the MXU
    sep = jnp.dot(a.reshape(groups * bn, -1), bt,
                  preferred_element_type=jnp.float32)       # (g*bn, bm)
    wg = wg.reshape(groups, bn, bm) + sep.reshape(groups, bn, bm)
    return jnp.log(jnp.maximum(wg, 0.0) + 1e-6)


def _bias_kernel(q_ref, kt_ref, a_ref, bt_ref, wt_ref, b_ref, o_ref, *,
                 freqs, groups):
    o_ref[...] = bias_tile(q_ref[...], kt_ref[...], a_ref[...], bt_ref[...],
                           wt_ref[...], b_ref[...], freqs=freqs,
                           groups=groups)


def _log_wh(rois):
    w = rois[:, 2] - rois[:, 0] + 1.0
    h = rois[:, 3] - rois[:, 1] + 1.0
    return jnp.log(w), jnp.log(h)


def pe_setup(q, k, wg_kernel, embed_dim: int, wave_length: float):
    """Padded fp32 rois q (Np, 4) / k (Mp, 4) + l_Wg kernel -> the
    tile-invariant kernel operands: (freqs tuple, A (g, Np, 32),
    B_t (32, Mp), wt (g, 32)).

    Separable dw/dh factors (per-roi transcendentals, O(N+M)):
    pe feature layout: [dx 0:16 | dy 16:32 | dw 32:48 | dh 48:64] with
    sin first then cos inside each 16. For frequency j:
      pe[32+j] = sin(c_j dw), pe[40+j] = cos(c_j dw)   (dw = lqw - lkw)
    Wg-fold through the angle-addition identities:
      sum_j ws_j sin(c_j dw) + wc_j cos(c_j dw)
        = sum_j [ws_j sq_j + wc_j cq_j] ck_j + [wc_j sq_j - ws_j cq_j] sk_j
    """
    n_freq = embed_dim // 8
    dim_mat = wave_length ** (8.0 / embed_dim * np.arange(n_freq))
    freqs_np = (100.0 / dim_mat).astype(np.float32)
    freqs = tuple(freqs_np.tolist())

    W = wg_kernel.astype(jnp.float32)                        # (64, g)
    lqw, lqh = _log_wh(q)                                    # (Np,)
    lkw, lkh = _log_wh(k)                                    # (Mp,)
    fr = jnp.asarray(freqs_np)

    def tables(lv):
        ang = lv[:, None] * fr[None, :]                      # (P, 8)
        return jnp.sin(ang), jnp.cos(ang)

    sqw, cqw = tables(lqw)
    sqh, cqh = tables(lqh)
    skw, ckw = tables(lkw)
    skh, ckh = tables(lkh)

    def fold(ws, wc, s, c):
        # ws, wc: (8, g); s, c: (P, 8) -> two (g, P, 8) factor blocks
        a1 = s[None] * ws.T[:, None, :] + c[None] * wc.T[:, None, :]
        a2 = s[None] * wc.T[:, None, :] - c[None] * ws.T[:, None, :]
        return a1, a2

    a1w, a2w = fold(W[32:40], W[40:48], sqw, cqw)
    a1h, a2h = fold(W[48:56], W[56:64], sqh, cqh)
    A = jnp.concatenate([a1w, a2w, a1h, a2h], axis=-1)       # (g, Np, 32)
    B_t = jnp.concatenate([ckw, skw, ckh, skh], axis=-1).T   # (32, Mp)
    return freqs, A, B_t, W[:32].T


@functools.partial(jax.jit, static_argnames=("embed_dim", "wave_length",
                                             "block_n", "block_m",
                                             "interpret"))
def fused_position_bias(q_rois, k_rois, wg_kernel, wg_bias, *,
                        embed_dim: int = 64, wave_length: float = 1000.0,
                        block_n: int = 128, block_m: int = 256,
                        interpret: bool = False):
    """(N, 4) x (M, 4) rois + Dense l_Wg params -> (groups, N, M) bias.

    == log(relu(pe @ wg_kernel + wg_bias) + 1e-6).transpose(2, 0, 1)
    with pe = cal_position_embedding(q_rois, k_rois, embed_dim).
    """
    n, m = q_rois.shape[0], k_rois.shape[0]
    groups = wg_kernel.shape[1]
    n_pad = -n % block_n
    m_pad = -m % block_m
    q = jnp.pad(q_rois.astype(jnp.float32), ((0, n_pad), (0, 0)))
    k = jnp.pad(k_rois.astype(jnp.float32), ((0, m_pad), (0, 0)))
    k_t = k.T
    npad, mpad = n + n_pad, m + m_pad

    freqs, A, B_t, wt = pe_setup(q, k, wg_kernel, embed_dim, wave_length)
    sep_dim = A.shape[-1]

    out = pl.pallas_call(
        functools.partial(_bias_kernel, freqs=freqs, groups=groups),
        grid=(npad // block_n, mpad // block_m),
        in_specs=[
            pl.BlockSpec((block_n, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((4, block_m), lambda i, j: (0, j)),
            pl.BlockSpec((groups, block_n, sep_dim), lambda i, j: (0, i, 0)),
            pl.BlockSpec((sep_dim, block_m), lambda i, j: (0, j)),
            pl.BlockSpec((groups, embed_dim // 2), lambda i, j: (0, 0)),
            pl.BlockSpec((1, groups), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((groups, block_n, block_m),
                               lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((groups, npad, mpad), jnp.float32),
        interpret=interpret,
    )(q, k_t, A, B_t, wt, wg_bias.astype(jnp.float32).reshape(1, groups))
    return out[:, :n, :m]
