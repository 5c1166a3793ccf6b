"""Numerical parity of flax layers vs the reference torch modules.

Each test builds the reference module with torch default init, transplants
the weights into our flax module, and compares forward outputs on random
masked inputs (eval mode, fp32, tolerance ~1e-4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrdone_tpu.models import layers as L
from tests import oracle


def rand_inputs(rng, b, t, c, min_len=4):
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    lens = rng.integers(min_len, t + 1, size=b)
    lens[0] = t  # keep one full-length row
    mask = np.arange(t)[None, :] < lens[:, None]
    x = x * mask[..., None]
    return x, mask


def assert_close(ours, theirs, mask=None, atol=2e-4, rtol=2e-4):
    ours = np.asarray(ours)
    if mask is not None:
        ours = ours * mask[..., None]
        theirs = theirs * mask[..., None]
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=rtol)


def test_channel_layernorm():
    import torch
    from models.blocks import LayerNorm as TorchLN
    rng = np.random.default_rng(0)
    x, _ = rand_inputs(rng, 3, 16, 32)
    tm = TorchLN(32).eval()
    out_t = oracle.from_torch_bct(tm(oracle.to_torch_btc(x)))
    params = {"params": oracle.ln_params(tm)}
    out_j = L.ChannelLayerNorm(32).apply(params, jnp.asarray(x))
    assert_close(out_j, out_t)


@pytest.mark.parametrize("stride,groups,k", [(1, 1, 3), (2, 1, 3), (1, 32, 3),
                                             (2, 32, 3), (1, 1, 1)])
def test_masked_conv1d(stride, groups, k):
    from models.blocks import MaskedConv1D as TorchMC
    rng = np.random.default_rng(1)
    x, mask = rand_inputs(rng, 3, 16, 32)
    tm = TorchMC(32, 32, k, stride=stride, padding=k // 2, groups=groups).eval()
    import torch
    with torch.no_grad():
        tm.conv.weight.normal_()
        tm.conv.bias.normal_()
    out_t, mask_t = tm(oracle.to_torch_btc(x), oracle.to_torch_mask(mask))
    params = {"params": oracle.masked_conv_params(tm)}
    out_j, mask_j = L.MaskedConv1D(32, k, stride=stride, groups=groups).apply(
        params, jnp.asarray(x), jnp.asarray(mask))
    assert_close(out_j, oracle.from_torch_bct(out_t))
    np.testing.assert_array_equal(np.asarray(mask_j),
                                  oracle.t2n(mask_t)[:, 0, :])


def test_conv_mlp():
    from models.blocks import ConvMLP as TorchConvMLP
    rng = np.random.default_rng(2)
    x, _ = rand_inputs(rng, 2, 12, 24)
    tm = TorchConvMLP(24, 48, 24, num_layers=2, kernel_size=1).eval()
    out_t = oracle.from_torch_bct(tm(oracle.to_torch_btc(x)))
    params = {"params": oracle.conv_mlp_params(tm)}
    out_j = L.ConvMLP(48, 24, num_layers=2, kernel_size=1).apply(
        params, jnp.asarray(x))
    assert_close(out_j, out_t)


def test_masked_mha():
    from models.blocks import MaskedMHA as TorchMHA
    rng = np.random.default_rng(3)
    x, mask = rand_inputs(rng, 3, 16, 32)
    tm = TorchMHA(32, 4).eval()
    out_t, _ = tm(oracle.to_torch_btc(x), oracle.to_torch_mask(mask))
    params = {"params": oracle.mha_params(tm)}
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    out_j, _ = L.MHA(32, 4).apply(params, xj, xj, xj, mj, mj)
    assert_close(out_j, oracle.from_torch_bct(out_t), mask)


@pytest.mark.parametrize("qx,kv", [(1, 1), (2, 2)])
def test_masked_mhca(qx, kv):
    from models.blocks import MaskedMHCA as TorchMHCA
    rng = np.random.default_rng(4)
    x, mask = rand_inputs(rng, 3, 16, 32)
    tm = TorchMHCA(32, 4, n_qx_stride=qx, n_kv_stride=kv).eval()
    out_t, mask_t = tm(oracle.to_torch_btc(x), oracle.to_torch_mask(mask))
    params = {"params": oracle.conv_mha_params(tm)}
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    out_j, mask_j = L.ConvMHA(32, 4, n_qx_stride=qx, n_kv_stride=kv).apply(
        params, xj, xj, xj, mj, mj)
    out_mask = oracle.t2n(mask_t)[:, 0, :]
    np.testing.assert_array_equal(np.asarray(mask_j), out_mask)
    assert_close(out_j, oracle.from_torch_bct(out_t), out_mask)


@pytest.mark.parametrize("win,rel_pe", [(7, False), (9, False), (7, True)])
def test_local_masked_mha(win, rel_pe):
    from models.blocks import LocalMaskedMHA as TorchLocal
    rng = np.random.default_rng(5)
    # T must be divisible by 2 * (win // 2) for the reference chunked impl
    t = 2 * (win // 2) * 6
    x, mask = rand_inputs(rng, 3, t, 32)
    tm = TorchLocal(32, 4, window_size=win, use_rel_pe=rel_pe).eval()
    out_t, _ = tm(oracle.to_torch_btc(x), oracle.to_torch_mask(mask))
    params = {"params": oracle.local_mha_params(tm)}
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    out_j, _ = L.LocalMHA(32, 4, window_size=win, use_rel_pe=rel_pe).apply(
        params, xj, xj, xj, mj, mj)
    assert_close(out_j, oracle.from_torch_bct(out_t), mask)


@pytest.mark.parametrize("win,qx,kv", [(7, 1, 1), (7, 2, 2), (9, 1, 1)])
def test_local_masked_mhca(win, qx, kv):
    from models.blocks import LocalMaskedMHCA as TorchLocalC
    rng = np.random.default_rng(6)
    t = 2 * (win // 2) * 8
    x, mask = rand_inputs(rng, 2, t, 32)
    tm = TorchLocalC(32, 4, window_size=win, n_qx_stride=qx,
                     n_kv_stride=kv).eval()
    out_t, mask_t = tm(oracle.to_torch_btc(x), oracle.to_torch_mask(mask))
    params = {"params": oracle.conv_mha_params(tm)}
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    out_j, mask_j = L.LocalConvMHA(32, 4, window_size=win, n_qx_stride=qx,
                                   n_kv_stride=kv).apply(
        params, xj, xj, xj, mj, mj)
    out_mask = oracle.t2n(mask_t)[:, 0, :]
    np.testing.assert_array_equal(np.asarray(mask_j), out_mask)
    assert_close(out_j, oracle.from_torch_bct(out_t), out_mask)


@pytest.mark.parametrize("ds,win", [(1, -1), (2, -1), (1, 7), (2, 7)])
def test_transformer_block(ds, win):
    from models.blocks import TransformerBlock as TorchTB
    rng = np.random.default_rng(7)
    t = 48
    x, mask = rand_inputs(rng, 2, t, 32)
    tm = TorchTB(32, 4, n_ds_strides=(ds, ds), path_pdrop=0.1,
                 mha_win_size=win).eval()
    out_t, mask_t = tm(oracle.to_torch_btc(x), oracle.to_torch_mask(mask))
    params = {"params": oracle.transformer_block_params(tm)}
    out_j, mask_j = L.TransformerBlock(
        32, 4, n_ds_strides=(ds, ds), path_pdrop=0.1, mha_win_size=win).apply(
        params, jnp.asarray(x), jnp.asarray(mask))
    out_mask = oracle.t2n(mask_t)[:, 0, :]
    np.testing.assert_array_equal(np.asarray(mask_j), out_mask)
    assert_close(out_j, oracle.from_torch_bct(out_t), out_mask)


@pytest.mark.parametrize("use_local,with_ffn,cross_first",
                         [(False, False, False), (False, True, False),
                          (False, True, True), (True, False, False)])
def test_decoder_layer_cross(use_local, with_ffn, cross_first):
    """s_attn/o_attn mutual-attention configuration (qx=kv=1)."""
    from models.local_transformer import \
        MaskedConvTransformerDecoderLayer as TorchDL
    rng = np.random.default_rng(8)
    t = 24
    x, mask = rand_inputs(rng, 2, t, 32)
    mem, mem_mask = rand_inputs(rng, 2, t, 32)
    tm = TorchDL(32, 4, path_pdrop=0.1, n_qx_stride=1, n_kv_stride=1,
                 with_ffn=with_ffn, use_local=use_local,
                 win_size=7 if use_local else None).eval()
    out_t, mask_t = tm(oracle.to_torch_btc(x), oracle.to_torch_btc(mem),
                       oracle.to_torch_mask(mask), oracle.to_torch_mask(mem_mask),
                       cross_first=cross_first)
    params = {"params": oracle.decoder_layer_params(tm)}
    out_j, mask_j = L.DecoderLayer(
        32, 4, path_pdrop=0.1, n_qx_stride=1, n_kv_stride=1,
        with_ffn=with_ffn, use_local=use_local,
        win_size=7 if use_local else None).apply(
        params, jnp.asarray(x), jnp.asarray(mem), jnp.asarray(mask),
        jnp.asarray(mem_mask), cross_first=cross_first)
    out_mask = oracle.t2n(mask_t)[:, 0, :]
    assert_close(out_j, oracle.from_torch_bct(out_t), out_mask)


def test_decoder_only_predictor_config():
    """Query-decoder configuration used by the predictor (qx=0, kv=1)."""
    import torch
    from models.local_transformer import \
        MaskedConvTransformerDecoderOnly as TorchDO
    rng = np.random.default_rng(9)
    t, nq, c = 24, 9, 32
    mem, mem_mask = rand_inputs(rng, 2, t, c)
    tm = TorchDO(c, 4, 64, path_pdrop=0.1, n_qx_stride=0, n_kv_stride=1,
                 num_layers=3, return_intermediate=True).eval()
    qe = torch.randn(nq, c)
    hs_t, _ = tm(oracle.to_torch_btc(mem), oracle.to_torch_mask(mem_mask),
                 query_embed=qe.permute(1, 0))
    params = {"params": {"decoder": oracle.decoder_params(tm.decoder)}}
    hs_j, _ = L.DecoderOnly(c, 4, 64, path_pdrop=0.1, n_qx_stride=0,
                            n_kv_stride=1, num_layers=3,
                            return_intermediate=True).apply(
        params, jnp.asarray(mem), jnp.asarray(mem_mask),
        jnp.asarray(oracle.t2n(qe)))
    # torch hs: (L, B, C, Q) -> ours (L, B, Q, C)
    hs_t = oracle.t2n(hs_t).transpose(0, 1, 3, 2)
    np.testing.assert_allclose(np.asarray(hs_j), hs_t, atol=3e-4, rtol=3e-4)


def test_sinusoid_pe_and_resize():
    import torch
    import torch.nn.functional as F
    from models.blocks import get_sinusoid_encoding
    pe_t = oracle.t2n(get_sinusoid_encoding(96, 32))  # (1, C, T)
    from vrdone_tpu.ops import masked as mops
    pe_j = mops.sinusoid_encoding(96, 32)  # (T, C)
    np.testing.assert_allclose(pe_j, pe_t[0].T, atol=1e-5, rtol=1e-5)
    # linear resize parity with F.interpolate(align_corners=False)
    res_t = F.interpolate(torch.from_numpy(pe_t), 160, mode="linear",
                          align_corners=False)
    res_j = mops.resize_pe_linear(jnp.asarray(pe_j), 160)
    np.testing.assert_allclose(np.asarray(res_j), oracle.t2n(res_t)[0].T,
                               atol=1e-5, rtol=1e-5)


def test_max_pool1d():
    import torch
    from vrdone_tpu.ops import masked as mops
    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 48, 8)).astype(np.float32)
    tp = torch.nn.MaxPool1d(3, stride=2, padding=1)
    out_t = oracle.from_torch_bct(tp(oracle.to_torch_btc(x)))
    out_j = mops.max_pool1d(jnp.asarray(x), kernel=3, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=1e-6)
