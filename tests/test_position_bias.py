"""Fused position-bias kernel vs the dense composition it replaces
(interpret mode on CPU; the TPU path shares the same kernel)."""

import numpy as np

import jax
import jax.numpy as jnp

from vrdone_tpu.models.mega import cal_position_embedding
from vrdone_tpu.ops.pallas.position_bias import fused_position_bias


def _dense_bias(q_rois, k_rois, kernel, bias, embed_dim=64):
    pe = cal_position_embedding(q_rois, k_rois, embed_dim)
    wg = jax.nn.relu(pe @ kernel + bias)
    return jnp.log(wg + 1e-6).transpose(2, 0, 1)


def _rand_rois(rng, n, hw=(600, 1000)):
    x1 = rng.uniform(0, hw[1] * 0.8, (n, 1))
    y1 = rng.uniform(0, hw[0] * 0.8, (n, 1))
    w = rng.uniform(4, hw[1] * 0.4, (n, 1))
    h = rng.uniform(4, hw[0] * 0.4, (n, 1))
    return np.concatenate([x1, y1, x1 + w, y1 + h],
                          axis=1).astype(np.float32)


def test_fused_bias_matches_dense():
    rng = np.random.default_rng(0)
    n, m, g = 37, 101, 16
    q = jnp.asarray(_rand_rois(rng, n))
    k = jnp.asarray(_rand_rois(rng, m))
    kernel = jnp.asarray(rng.normal(0, 0.01, (64, g)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.01, (g,)).astype(np.float32))

    want = np.asarray(_dense_bias(q, k, kernel, bias))
    got = np.asarray(fused_position_bias(q, k, kernel, bias,
                                         block_n=16, block_m=32,
                                         interpret=True))
    assert got.shape == (g, n, m)
    # log amplifies error near relu zero-crossings; compare in gate space
    # (atol covers the angle-identity reassociation of the separable
    # dw/dh factors — exact in R, ~1e-6 absolute in fp32)
    np.testing.assert_allclose(np.exp(got), np.exp(want),
                               rtol=2e-5, atol=1e-5)
    # and the bias itself away from the -13.8 floor (fp-ordering noise:
    # kernel computes pos*(100/dim) vs dense (pos*100)/dim; softmax-level
    # impact is < the framework's 2e-3 golden tolerance)
    # log-space atol: a gate-space error of ~1e-6 maps to ~0.02 in log
    # space at the sel boundary (gate = e^-10 ~ 4.5e-5)
    sel = want > -10
    np.testing.assert_allclose(got[sel], want[sel], rtol=1e-3, atol=3e-2)


def test_fused_bias_block_aligned_and_degenerate_pad():
    """Exact-tile shapes and zero (padding) rois both stay finite."""
    rng = np.random.default_rng(1)
    n, m, g = 32, 64, 16
    q = _rand_rois(rng, n)
    k = _rand_rois(rng, m)
    q[-5:] = 0.0   # degenerate padded rois
    k[-7:] = 0.0
    kernel = jnp.asarray(rng.normal(0, 0.01, (64, g)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.01, (g,)).astype(np.float32))
    want = np.asarray(_dense_bias(jnp.asarray(q), jnp.asarray(k),
                                  kernel, bias))
    got = np.asarray(fused_position_bias(jnp.asarray(q), jnp.asarray(k),
                                         kernel, bias, block_n=32,
                                         block_m=32, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(np.exp(got), np.exp(want),
                               rtol=2e-5, atol=1e-5)
