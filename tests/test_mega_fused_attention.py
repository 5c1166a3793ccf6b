"""Fused MEGA set-attention kernel vs the dense composition.

The kernel (ops/pallas/mega_attention.py) must reproduce
MEGAHead.attention's dense path (models/mega.py) bit-for-bit up to
matmul/softmax re-association noise, for both the biased local flavour
and the bias-free global flavour, including padding and the
all-invalid-reference zero-output rule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.models.mega import NEG_INF, BoxSet, MEGAHead
from vrdone_tpu.ops.pallas.mega_attention import fused_mega_attention


def _rand_rois(rng, n, hw=(480.0, 854.0)):
    cx = rng.uniform(0, hw[1], (n,))
    cy = rng.uniform(0, hw[0], (n,))
    w = rng.uniform(4, 300, (n,))
    h = rng.uniform(4, 300, (n,))
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                    axis=1).astype(np.float32)


def _dense_reference(q, k, vproj, ub, valid, bias=None):
    """The dense composition in the kernel's own operand space."""
    g, n, dg = q.shape
    aff = jnp.einsum("gnd,gmd->gnm", q, k) / np.sqrt(dg) + ub[:, None, :]
    if bias is not None:
        aff = aff + bias
    aff = jnp.where(valid[None, None, :], aff, NEG_INF)
    att = jax.nn.softmax(aff, axis=-1)
    att = att * valid[None, None, :].astype(att.dtype)
    out = jnp.einsum("gnm,gmo->gno", att, vproj)
    return out.transpose(1, 0, 2).reshape(n, -1)


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("n,m", [(24, 40), (128, 256), (37, 130)])
def test_kernel_vs_dense(with_bias, n, m):
    rng = np.random.default_rng(0)
    g, dg = 4, 16
    q = jnp.asarray(rng.standard_normal((g, n, dg)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((g, m, dg)), jnp.float32)
    vproj = jnp.asarray(rng.standard_normal((g, m, dg)), jnp.float32)
    ub = jnp.asarray(rng.standard_normal((g, m)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=m) > 0.3)

    kwargs = dict(block_n=16, block_m=32, interpret=True)
    if with_bias:
        qr = _rand_rois(rng, n)
        kr = _rand_rois(rng, m)
        wg_k = rng.standard_normal((64, g)).astype(np.float32) * 0.1
        wg_b = rng.standard_normal((g,)).astype(np.float32) * 0.1
        from vrdone_tpu.ops.pallas.position_bias import fused_position_bias
        bias = fused_position_bias(jnp.asarray(qr), jnp.asarray(kr),
                                   jnp.asarray(wg_k), jnp.asarray(wg_b),
                                   interpret=True)
        got = fused_mega_attention(q, k, vproj, ub, valid,
                                   jnp.asarray(qr), jnp.asarray(kr),
                                   jnp.asarray(wg_k), jnp.asarray(wg_b),
                                   **kwargs)
        want = _dense_reference(q, k, vproj, ub, valid, bias=bias)
    else:
        got = fused_mega_attention(q, k, vproj, ub, valid, **kwargs)
        want = _dense_reference(q, k, vproj, ub, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_kernel_bf16_operands():
    """The production serving dtype: bf16 q/k/vproj, fp32 softmax inside."""
    rng = np.random.default_rng(3)
    g, n, m, dg = 4, 32, 64, 16
    q = jnp.asarray(rng.standard_normal((g, n, dg)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((g, m, dg)), jnp.bfloat16)
    vproj = jnp.asarray(rng.standard_normal((g, m, dg)), jnp.bfloat16)
    ub = jnp.asarray(rng.standard_normal((g, m)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=m) > 0.3)
    got = fused_mega_attention(q, k, vproj, ub, valid,
                               block_n=16, block_m=32, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _dense_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                            vproj.astype(jnp.float32), ub, valid)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=3e-2, atol=3e-2)


def test_all_invalid_rows_are_zero():
    rng = np.random.default_rng(1)
    g, n, m, dg = 2, 8, 24, 8
    q = jnp.asarray(rng.standard_normal((g, n, dg)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((g, m, dg)), jnp.float32)
    vproj = jnp.asarray(rng.standard_normal((g, m, dg)), jnp.float32)
    ub = jnp.zeros((g, m), jnp.float32)
    valid = jnp.zeros((m,), bool)
    got = fused_mega_attention(q, k, vproj, ub, valid,
                               block_n=8, block_m=8, interpret=True)
    assert np.all(np.asarray(got) == 0.0)
    assert np.all(np.isfinite(np.asarray(got)))


def _make_head(fused: bool, rng):
    head = MEGAHead(feat_dim=64, groups=4, stage=2, global_res_stage=1,
                    advanced_num=3, fused_attention=fused)
    nk, f, b = 6, 4, 5
    key_pooled = jnp.asarray(rng.standard_normal((nk, 64)), jnp.float32)
    key_rois = jnp.asarray(_rand_rois(rng, nk))
    key_valid = jnp.ones((nk,), bool).at[-1].set(False)
    win = BoxSet(
        jnp.asarray(rng.standard_normal((f, b, 64)), jnp.float32),
        jnp.asarray(_rand_rois(rng, f * b).reshape(f, b, 4)),
        jnp.asarray(rng.uniform(size=(f, b)) > 0.2))
    glob = BoxSet(
        jnp.asarray(rng.standard_normal((7, 64)), jnp.float32),
        jnp.asarray(_rand_rois(rng, 7)),
        jnp.ones((7,), bool))
    args = (key_pooled, key_rois, key_valid, win, None, glob)
    return head, args


def test_head_enhance_fused_matches_dense():
    """MEGAHead.enhance end-to-end (local + middle + final + global
    stages) with fused_attention on vs off, same params."""
    rng = np.random.default_rng(2)
    head_d, args = _make_head(False, rng)
    rng2 = np.random.default_rng(2)
    head_f, args_f = _make_head(True, rng2)
    params = head_d.init(jax.random.key(0), *args, key_is_fc0=True,
                         method=MEGAHead.enhance)
    dense = head_d.apply(params, *args, key_is_fc0=True,
                         method=MEGAHead.enhance)
    fused = head_f.apply(params, *args_f, key_is_fc0=True,
                         method=MEGAHead.enhance)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=5e-4, atol=5e-4)
