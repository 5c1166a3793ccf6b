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
streaming video detection (DEVNOTES serving analysis). Here the
embedding tile lives only in VMEM, laid out transposed (64, bn, bm) so
the 64->g contraction runs as one MXU dot per tile with no transposes,
and only the (g, N, M) bias ever touches HBM.

Kernel-only forward (no custom VJP): serving/eval path. The training
path keeps the dense composition, whose autodiff handles the Wg grads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _bias_kernel(q_ref, kt_ref, wt_ref, b_ref, o_ref, *, freqs, groups):
    q = q_ref[...]                                   # (bn, 4)
    qx1, qy1, qx2, qy2 = (q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4])
    kx1, ky1, kx2, ky2 = (kt_ref[0:1, :], kt_ref[1:2, :],
                          kt_ref[2:3, :], kt_ref[3:4, :])
    qw = qx2 - qx1 + 1.0
    qh = qy2 - qy1 + 1.0
    qcx = 0.5 * (qx1 + qx2)
    qcy = 0.5 * (qy1 + qy2)
    kw = kx2 - kx1 + 1.0
    kh = ky2 - ky1 + 1.0
    kcx = 0.5 * (kx1 + kx2)
    kcy = 0.5 * (ky1 + ky2)

    # (bn, 1) x (1, bm) -> (bn, bm) log-space geometry (position_matrix)
    dx = jnp.log(jnp.abs((qcx - kcx) / qw) + 1e-3)
    dy = jnp.log(jnp.abs((qcy - kcy) / qh) + 1e-3)
    dw = jnp.log(qw / kw)
    dh = jnp.log(qh / kh)

    bn, bm = dx.shape
    # transposed embedding tile, feature-major: rows j*16+k are
    # sin(pos_j * c_k), rows j*16+8+k are cos — matching the
    # position_embedding concat([sin, cos], -1).reshape layout.
    # freqs are python floats (baked into the program, not operands).
    parts = []
    for pos in (dx, dy, dw, dh):
        angs = [pos * c for c in freqs]
        parts.extend(jnp.sin(a) for a in angs)
        parts.extend(jnp.cos(a) for a in angs)
    pe_t = jnp.stack(parts, axis=0).reshape(-1, bn * bm)

    wg = jnp.dot(wt_ref[...], pe_t,
                 preferred_element_type=jnp.float32)        # (g, bn*bm)
    wg = wg + b_ref[...].reshape(groups, 1)
    o_ref[...] = jnp.log(jnp.maximum(wg, 0.0) + 1e-6).reshape(
        groups, bn, bm)


@functools.partial(jax.jit, static_argnames=("embed_dim", "block_n",
                                             "block_m", "interpret"))
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
    k_t = jnp.pad(k_rois.astype(jnp.float32), ((0, m_pad), (0, 0))).T
    npad, mpad = n + n_pad, m + m_pad

    n_freq = embed_dim // 8
    dim_mat = wave_length ** (8.0 / embed_dim * np.arange(n_freq))
    freqs = tuple((100.0 / dim_mat).tolist())

    out = pl.pallas_call(
        functools.partial(_bias_kernel, freqs=freqs, groups=groups),
        grid=(npad // block_n, mpad // block_m),
        in_specs=[
            pl.BlockSpec((block_n, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((4, block_m), lambda i, j: (0, j)),
            pl.BlockSpec((groups, embed_dim), lambda i, j: (0, 0)),
            pl.BlockSpec((1, groups), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((groups, block_n, block_m),
                               lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((groups, npad, mpad), jnp.float32),
        interpret=interpret,
    )(q, k_t, wg_kernel.astype(jnp.float32).T,
      wg_bias.astype(jnp.float32).reshape(1, groups))
    return out[:, :n, :m]
