"""Pallas band-attention kernel vs the dense reference formulation
(interpret mode on CPU; the real TPU path shares the same kernel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.ops import masked as mops
from vrdone_tpu.ops.pallas.band_attention import band_attention_pallas


@pytest.mark.parametrize("t,win,block", [(128, 7, 64), (256, 9, 128),
                                         (96, 7, 128), (300, 19, 128)])
def test_pallas_matches_dense(t, win, block):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 32
    c = h * d
    q = rng.standard_normal((b, t, c)).astype(np.float32)
    k = rng.standard_normal((b, t, c)).astype(np.float32)
    v = rng.standard_normal((b, t, c)).astype(np.float32)
    lens = np.array([t, max(4, t // 3)])
    mask = np.arange(t)[None] < lens[:, None]

    dense = mops.band_attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), jnp.asarray(mask),
                                n_head=h, window_size=win)
    # dense version does not zero invalid-query rows itself inside the op;
    # it does (post-softmax multiply). Compare on valid rows only.
    ours = band_attention_pallas(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), jnp.asarray(mask),
                                 n_head=h, window_size=win, block=block,
                                 interpret=True)
    dense = np.asarray(dense) * mask[..., None]
    ours = np.asarray(ours) * mask[..., None]
    np.testing.assert_allclose(ours, dense, atol=2e-5, rtol=2e-5)


def test_pallas_band_locality():
    """Changing a key outside the band must not change the output."""
    rng = np.random.default_rng(1)
    b, h, d, t, win = 1, 2, 16, 256, 9
    c = h * d
    q = rng.standard_normal((b, t, c)).astype(np.float32)
    k = rng.standard_normal((b, t, c)).astype(np.float32)
    v = rng.standard_normal((b, t, c)).astype(np.float32)
    mask = np.ones((b, t), bool)
    out1 = np.asarray(band_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        n_head=h, window_size=win, block=64, interpret=True))
    k2, v2 = k.copy(), v.copy()
    k2[0, 200] += 100.0
    v2[0, 200] += 100.0
    out2 = np.asarray(band_attention_pallas(
        jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(mask),
        n_head=h, window_size=win, block=64, interpret=True))
    w = win // 2
    np.testing.assert_allclose(out1[0, :200 - w], out2[0, :200 - w],
                               atol=1e-6)
    np.testing.assert_allclose(out1[0, 200 + w + 1:], out2[0, 200 + w + 1:],
                               atol=1e-6)
    assert np.abs(out1[0, 200] - out2[0, 200]).max() > 1e-3


@pytest.mark.parametrize("t,win,block", [(128, 7, 64), (300, 19, 128)])
def test_pallas_rel_pe_matches_dense(t, win, block):
    """rel-PE path: per-head relative-position bias added inside the band
    must match the dense formulation (closes the r1 coverage hole where
    use_rel_pe configs silently fell back to dense)."""
    rng = np.random.default_rng(2)
    b, h, d = 2, 4, 32
    c = h * d
    q = rng.standard_normal((b, t, c)).astype(np.float32)
    k = rng.standard_normal((b, t, c)).astype(np.float32)
    v = rng.standard_normal((b, t, c)).astype(np.float32)
    rel_pe = rng.standard_normal((h, win)).astype(np.float32)
    lens = np.array([t, max(4, t // 3)])
    mask = np.arange(t)[None] < lens[:, None]

    dense = mops.band_attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), jnp.asarray(mask),
                                n_head=h, window_size=win,
                                rel_pe=jnp.asarray(rel_pe))
    ours = band_attention_pallas(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), jnp.asarray(mask),
                                 n_head=h, window_size=win, block=block,
                                 rel_pe=jnp.asarray(rel_pe),
                                 interpret=True)
    dense = np.asarray(dense) * mask[..., None]
    ours = np.asarray(ours) * mask[..., None]
    np.testing.assert_allclose(ours, dense, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t,win,block", [(128, 7, 64), (200, 9, 128)])
def test_pallas_grad_matches_dense(t, win, block):
    """The custom-VJP flash backward matches autodiff through the dense
    band formulation for dq, dk, dv (incl. padded/masked positions)."""
    rng = np.random.default_rng(4)
    b, h, d = 2, 2, 16
    c = h * d
    q = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    mask = jnp.asarray(np.arange(t)[None] < np.array([t, t - t // 3])[:, None])
    cot = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))

    def loss_pallas(q, k, v):
        out = band_attention_pallas(q, k, v, mask, n_head=h,
                                    window_size=win, block=block,
                                    interpret=True)
        return jnp.sum(out * cot)

    def loss_dense(q, k, v):
        out = mops.band_attention(q, k, v, mask, n_head=h, window_size=win)
        return jnp.sum(out * cot)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=3e-5)
