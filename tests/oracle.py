"""Golden-test oracle: run the reference PyTorch modules with the same
weights as our flax modules and compare outputs.

The reference repo (read-only, /root/reference) is imported as-is; none of
its code lives in this repository. Weight *transplant* helpers below map
torch state into our flax param pytrees (layout changes only).

Torch layout: activations (B, C, T); conv weight (C_out, C_in/groups, K).
Ours:         activations (B, T, C); conv kernel (K, C_in/groups, C_out).
"""

from __future__ import annotations

import sys

import numpy as np

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)


def t2n(t):
    return t.detach().cpu().numpy()


def to_torch_btc(x_btc):
    """(B, T, C) numpy -> torch (B, C, T)."""
    import torch
    return torch.from_numpy(np.ascontiguousarray(x_btc.transpose(0, 2, 1)))


def from_torch_bct(t):
    """torch (B, C, T) -> (B, T, C) numpy."""
    return t2n(t).transpose(0, 2, 1)


def to_torch_mask(mask_bt):
    """(B, T) bool numpy -> torch (B, 1, T) bool."""
    import torch
    return torch.from_numpy(mask_bt[:, None, :].copy())


# ---------------------------------------------------------------------------
# per-module weight transplants (torch module -> flax params dict)
# ---------------------------------------------------------------------------

def conv_params(conv):
    """torch nn.Conv1d -> MaskedConv1D/conv kernel params."""
    p = {"kernel": t2n(conv.weight).transpose(2, 1, 0)}
    if conv.bias is not None:
        p["bias"] = t2n(conv.bias)
    return p


def dense_params(conv1x1):
    """torch nn.Conv1d(k=1) or nn.Linear -> Dense params."""
    w = t2n(conv1x1.weight)
    if w.ndim == 3:
        w = w[:, :, 0]
    p = {"kernel": w.T}
    if conv1x1.bias is not None:
        p["bias"] = t2n(conv1x1.bias)
    return p


def ln_params(ln):
    """reference LayerNorm (B,C,T) -> ChannelLayerNorm params."""
    return {"weight": t2n(ln.weight).reshape(-1),
            "bias": t2n(ln.bias).reshape(-1)}


def masked_conv_params(mc):
    return conv_params(mc.conv)


def conv_mlp_params(m):
    """reference ConvMLP -> our ConvMLP params."""
    out = {}
    for i, layer in enumerate(m.layers):
        w = t2n(layer.weight)  # (C_out, C_in, K)
        if w.shape[-1] == 1:
            out[f"layers_{i}"] = {"kernel": w[:, :, 0].T,
                                  "bias": t2n(layer.bias)}
        else:
            out[f"layers_{i}_kernel"] = w.transpose(2, 1, 0)
            out[f"layers_{i}_bias"] = t2n(layer.bias)
    return out


def mha_params(m):
    """MaskedMHA / MaskedMHA_QKV -> MHA params."""
    return {"query": dense_params(m.query), "key": dense_params(m.key),
            "value": dense_params(m.value), "proj": dense_params(m.proj)}


def conv_mha_params(m):
    """MaskedMHCA / LocalMaskedMHCA (and _QKV flavours) -> ConvMHA/LocalConvMHA."""
    p = {
        "preproc": {
            "query_conv": masked_conv_params(m.query_conv),
            "query_norm": ln_params(m.query_norm),
            "key_conv": masked_conv_params(m.key_conv),
            "key_norm": ln_params(m.key_norm),
            "value_conv": masked_conv_params(m.value_conv),
            "value_norm": ln_params(m.value_norm),
        },
        "query": dense_params(m.query),
        "key": dense_params(m.key),
        "value": dense_params(m.value),
        "proj": dense_params(m.proj),
    }
    if getattr(m, "use_rel_pe", False):
        # torch rel_pe (1, 1, H, W) -> (H, W)
        p["rel_pe"] = t2n(m.rel_pe)[0, 0]
    return p


def local_mha_params(m):
    p = mha_params(m)
    if getattr(m, "use_rel_pe", False):
        p["rel_pe"] = t2n(m.rel_pe)[0, 0]
    return p


def drop_path_params(m):
    """AffineDropPath -> MaybeDropPath({AffineDropPath_0: scale})."""
    return {"AffineDropPath_0": {"scale": t2n(m.scale).reshape(-1)}}


def transformer_block_params(m):
    """reference TransformerBlock -> our TransformerBlock params."""
    from models.blocks import LocalMaskedMHCA  # reference import
    attn = (conv_mha_params(m.attn) if isinstance(m.attn, LocalMaskedMHCA)
            or hasattr(m.attn, "query_conv") else mha_params(m.attn))
    p = {
        "ln1": ln_params(m.ln1),
        "ln2": ln_params(m.ln2),
        "attn": attn,
        "mlp_0": dense_params(m.mlp[0]),
        "mlp_1": dense_params(m.mlp[3]),
    }
    import torch.nn as tnn
    if not isinstance(m.drop_path_attn, tnn.Identity):
        p["drop_path_attn"] = drop_path_params(m.drop_path_attn)
        p["drop_path_mlp"] = drop_path_params(m.drop_path_mlp)
    return p


def _attn_params_any(m):
    if hasattr(m, "query_conv"):
        return conv_mha_params(m)
    return local_mha_params(m)


def decoder_layer_params(m):
    """reference MaskedConvTransformerDecoderLayer -> DecoderLayer params."""
    import torch.nn as tnn
    p = {
        "ln1": ln_params(m.ln1),
        "ln2": ln_params(m.ln2),
        "self_attn": _attn_params_any(m.self_attn),
        "multihead_attn": _attn_params_any(m.multihead_attn),
    }
    if not isinstance(m.drop_path_attn1, tnn.Identity):
        p["drop_path_attn1"] = drop_path_params(m.drop_path_attn1)
        p["drop_path_attn2"] = drop_path_params(m.drop_path_attn2)
    if m.with_ffn:
        p["ln3"] = ln_params(m.ln3)
        p["mlp_0"] = dense_params(m.mlp[0])
        p["mlp_1"] = dense_params(m.mlp[3])
        if not isinstance(m.drop_path_mlp, tnn.Identity):
            p["drop_path_mlp"] = drop_path_params(m.drop_path_mlp)
    return p


def decoder_params(m, with_norm=True):
    """reference MaskedConvTransformerDecoder -> Decoder params."""
    p = {f"layers_{i}": decoder_layer_params(layer)
         for i, layer in enumerate(m.layers)}
    if with_norm and m.norm is not None:
        p["norm"] = ln_params(m.norm)
    return p


# ---------------------------------------------------------------------------
# full-model transplants
# ---------------------------------------------------------------------------

def backbone_params(m):
    """reference MaskConvTransformerBackbone(+WithCLIP) -> SOSBackbone params."""
    p = {}
    for i, (conv, norm) in enumerate(zip(m.visual_embd, m.visual_embd_norm)):
        p[f"visual_embd_{i}"] = masked_conv_params(conv)
        if hasattr(norm, "weight"):
            p[f"visual_embd_norm_{i}"] = ln_params(norm)
    if hasattr(m, "clip_embd"):
        for i, (conv, norm) in enumerate(zip(m.clip_embd, m.clip_embd_norm)):
            p[f"clip_embd_{i}"] = masked_conv_params(conv)
            if hasattr(norm, "weight"):
                p[f"clip_embd_norm_{i}"] = ln_params(norm)
        p["visual_clip_fuse"] = conv_mlp_params(m.visual_clip_fuse)
    p["bbox_entity_embd"] = masked_conv_params(m.bbox_entity_embd)
    if hasattr(m.bbox_entity_norm, "weight"):
        p["bbox_entity_norm"] = ln_params(m.bbox_entity_norm)
    p["visual_bbox_fuse"] = conv_mlp_params(m.visual_bbox_fuse)
    for i, blk in enumerate(m.stem):
        p[f"stem_{i}"] = transformer_block_params(blk)
    for i, blk in enumerate(m.s_attn):
        p[f"s_attn_{i}"] = decoder_layer_params(blk)
    for i, blk in enumerate(m.o_attn):
        p[f"o_attn_{i}"] = decoder_layer_params(blk)
    p["s_fuse_norm"] = ln_params(m.s_fuse_norm)
    p["o_fuse_norm"] = ln_params(m.o_fuse_norm)
    p["so_fuse"] = conv_mlp_params(m.so_fuse)
    p["bbox_so_embd"] = masked_conv_params(m.bbox_so_embd)
    p["so_visual_bbox_fuse"] = conv_mlp_params(m.so_visual_bbox_fuse)
    for i, blk in enumerate(m.branch):
        p[f"branch_{i}"] = transformer_block_params(blk)
    return p


def fpn_params(m):
    """reference FPN1D_Fuse -> FPN1DFuse params."""
    import torch.nn as tnn
    p = {}
    n = len(m.fpn_convs)
    for pos in range(n):
        if not isinstance(m.input_norms[pos], tnn.Identity):
            p[f"input_norm_{pos}"] = ln_params(m.input_norms[pos])
        if m.lateral_convs[pos] is not None:
            p[f"lateral_conv_{pos}"] = masked_conv_params(m.lateral_convs[pos])
            if not isinstance(m.lateral_norms[pos], tnn.Identity):
                p[f"lateral_norm_{pos}"] = ln_params(m.lateral_norms[pos])
        p[f"fpn_conv_{pos}"] = masked_conv_params(m.fpn_convs[pos])
        if not isinstance(m.fpn_norms[pos], tnn.Identity):
            p[f"fpn_norm_{pos}"] = ln_params(m.fpn_norms[pos])
    p["mask_features"] = masked_conv_params(m.mask_features)
    return p


def predictor_params(m):
    """reference MaskedTransformerPredictor -> MaskedTransformerPredictor."""
    p = {
        "input_norm": ln_params(m.input_norm),
        "query_embed": t2n(m.query_embed.weight),
        "class_embed": dense_params(m.class_embed),
        "mask_embed": conv_mlp_params(m.mask_embed),
        "transformer": {"decoder": decoder_params(m.transformer.decoder)},
    }
    if m.input_proj is not None:
        p["input_proj"] = dense_params(m.input_proj)
    return p


def maskvrd_params(m):
    """reference MaskVRD -> our MaskVRD params pytree."""
    return {
        "backbone": backbone_params(m.backbone),
        "neck": fpn_params(m.neck),
        "predictor": predictor_params(m.predictor),
    }


# ---------------------------------------------------------------------------
# MEGA detector-head oracle (reference datasets/mega/mega_core)
# ---------------------------------------------------------------------------

MEGA_PATH = "/root/reference/datasets/mega"


def load_mega_reference():
    """Import the reference MEGA roi_box_feature_extractors module.

    mega_core transitively imports yacs and torchvision (absent here) and
    probes nvidia-smi at import; none of those surfaces are used by the
    attention code paths we test, so minimal inert stand-ins are
    installed before import. The math under test is 100% reference code.
    """
    import types

    class _CN(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

        def clone(self):
            import copy
            return copy.deepcopy(self)

        def merge_from_file(self, f):
            pass

        def merge_from_list(self, lst):
            pass

        def freeze(self):
            pass

    if "yacs" not in sys.modules:
        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = _CN
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    if "torchvision" not in sys.modules:
        def _unavail(*a, **k):
            raise RuntimeError("torchvision op unavailable in oracle")

        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.nms = _unavail
        tv_ops.roi_align = _unavail
        tv_ops.roi_pool = _unavail
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    if "mega_core.utils.distributed" not in sys.modules:
        # its import shells out to nvidia-smi
        dist_stub = types.ModuleType("mega_core.utils.distributed")
        dist_stub.gpu_indices = lambda divisible=True: []
        dist_stub.ompi_size = lambda: 1
        dist_stub.ompi_rank = lambda: 0
        sys.modules["mega_core.utils.distributed"] = dist_stub

    if MEGA_PATH not in sys.path:
        sys.path.insert(0, MEGA_PATH)
    from mega_core.modeling.roi_heads.box_head import (
        roi_box_feature_extractors as rbfe)
    return rbfe


def make_reference_mega(rbfe, *, in_dim, feat_dim, groups, stage,
                        global_res_stage, advanced_num, base_num,
                        memory_size=25, global_size=10,
                        all_frame_interval=25, seed=0):
    """Instantiate MEGAFeatureExtractor with hand-built parameter lists
    (bypassing the cfg/ResNet-head __init__, which needs torchvision);
    every method under test (attention_module_multi_head,
    cal_position_embedding, _forward_{train,test}_single, update_lm,
    update_memory, init_memory/init_global/update_global) runs unmodified
    reference code."""
    import torch
    from torch import nn

    torch.manual_seed(seed)
    M = rbfe.MEGAFeatureExtractor.__new__(rbfe.MEGAFeatureExtractor)
    nn.Module.__init__(M)
    M.embed_dim = 64
    M.groups = groups
    M.feat_dim = feat_dim
    M.stage = stage
    M.base_num = base_num
    M.advanced_num = advanced_num
    M.all_frame_interval = all_frame_interval
    M.memory_enable = True
    M.memory_size = memory_size
    M.global_enable = True
    M.global_size = global_size
    M.global_res_stage = global_res_stage

    def mk_fc(i):
        return nn.Linear(in_dim if i == 0 else feat_dim, feat_dim)

    fcs, Wgs, Wqs, Wks, Wvs, us = [], [], [], [], [], []
    for i in range(stage):
        fcs.append(mk_fc(i))
        Wgs.append(nn.Conv2d(M.embed_dim, groups, 1))
        Wqs.append(nn.Linear(feat_dim, feat_dim))
        Wks.append(nn.Linear(feat_dim, feat_dim))
        Wvs.append(nn.Conv2d(feat_dim * groups, feat_dim, 1, groups=groups))
        us.append(nn.Parameter(torch.randn(groups, 1, feat_dim // groups)))
    M.l_fcs = nn.ModuleList(fcs)
    M.l_Wgs = nn.ModuleList(Wgs)
    M.l_Wqs = nn.ModuleList(Wqs)
    M.l_Wks = nn.ModuleList(Wks)
    M.l_Wvs = nn.ModuleList(Wvs)
    M.l_us = nn.ParameterList(us)

    Wqs, Wks, Wvs, us = [], [], [], []
    for i in range(global_res_stage + 1):
        Wqs.append(nn.Linear(feat_dim, feat_dim))
        Wks.append(nn.Linear(feat_dim, feat_dim))
        Wvs.append(nn.Conv2d(feat_dim * groups, feat_dim, 1, groups=groups))
        us.append(nn.Parameter(torch.randn(groups, 1, feat_dim // groups)))
    M.g_Wqs = nn.ModuleList(Wqs)
    M.g_Wks = nn.ModuleList(Wks)
    M.g_Wvs = nn.ModuleList(Wvs)
    M.g_us = nn.ParameterList(us)
    M.eval()
    return M


def mega_head_params(M):
    """Reference MEGAFeatureExtractor module lists -> our MEGAHead params."""
    g = M.groups
    fd = M.feat_dim
    dg = fd // g

    def lin(l):
        return {"kernel": t2n(l.weight).T, "bias": t2n(l.bias)}

    def conv1x1(l, out_first=True):
        w = t2n(l.weight)[:, :, 0, 0]          # (out, in)
        return {"kernel": w.T, "bias": t2n(l.bias)}

    def grouped(l):
        w = t2n(l.weight)[:, :, 0, 0]          # (fd, fd) grouped
        kern = np.stack([w[i * dg:(i + 1) * dg, :].T for i in range(g)])
        return {"kernel": kern, "bias": t2n(l.bias)}

    p = {}
    for i in range(M.stage):
        p[f"l_fc{i}"] = lin(M.l_fcs[i])
        p[f"l_Wg{i}"] = conv1x1(M.l_Wgs[i])
        p[f"l_Wq{i}"] = lin(M.l_Wqs[i])
        p[f"l_Wk{i}"] = lin(M.l_Wks[i])
        p[f"l_Wv{i}"] = grouped(M.l_Wvs[i])
        p[f"l_u{i}"] = t2n(M.l_us[i])[:, 0, :]
    for i in range(M.global_res_stage + 1):
        p[f"g_Wq{i}"] = lin(M.g_Wqs[i])
        p[f"g_Wk{i}"] = lin(M.g_Wks[i])
        p[f"g_Wv{i}"] = grouped(M.g_Wvs[i])
        p[f"g_u{i}"] = t2n(M.g_us[i])[:, 0, :]
    return p


def make_reference_rdn(rbfe, *, in_dim, feat_dim, groups, base_stage,
                       advanced_stage, advanced_num, base_num, seed=0):
    """Instantiate RDNFeatureExtractor with hand-built parameter lists
    (bypassing the cfg/ResNet __init__); attention_module_multi_head and
    cal_position_embedding run unmodified reference code."""
    import torch
    from torch import nn

    torch.manual_seed(seed)
    M = rbfe.RDNFeatureExtractor.__new__(rbfe.RDNFeatureExtractor)
    nn.Module.__init__(M)
    M.embed_dim = 64
    M.groups = groups
    M.feat_dim = feat_dim
    M.base_stage = base_stage
    M.advanced_stage = advanced_stage
    M.base_num = base_num
    M.advanced_num = advanced_num

    fcs, Wgs, Wqs, Wks, Wvs = [], [], [], [], []
    for i in range(base_stage + advanced_stage + 1):
        r_size = in_dim if i == 0 else feat_dim
        if i == base_stage and advanced_stage == 0:
            break
        if i != base_stage + advanced_stage:
            fcs.append(nn.Linear(r_size, feat_dim))
        Wgs.append(nn.Conv2d(M.embed_dim, groups, 1))
        Wqs.append(nn.Linear(feat_dim, feat_dim))
        Wks.append(nn.Linear(feat_dim, feat_dim))
        Wvs.append(nn.Conv2d(feat_dim * groups, feat_dim, 1, groups=groups))
    M.fcs = nn.ModuleList(fcs)
    M.Wgs = nn.ModuleList(Wgs)
    M.Wqs = nn.ModuleList(Wqs)
    M.Wks = nn.ModuleList(Wks)
    M.Wvs = nn.ModuleList(Wvs)
    M.eval()
    return M


def rdn_head_params(M):
    """Reference RDNFeatureExtractor module lists -> our RDNHead params."""
    g = M.groups
    fd = M.feat_dim
    dg = fd // g

    def lin(layer):
        return {"kernel": t2n(layer.weight).T, "bias": t2n(layer.bias)}

    def conv1x1(layer):
        w = t2n(layer.weight)[:, :, 0, 0]
        return {"kernel": w.T, "bias": t2n(layer.bias)}

    def grouped(layer):
        w = t2n(layer.weight)[:, :, 0, 0]
        kern = np.stack([w[i * dg:(i + 1) * dg, :].T for i in range(g)])
        return {"kernel": kern, "bias": t2n(layer.bias)}

    p = {}
    for i, layer in enumerate(M.fcs):
        p[f"fc{i}"] = lin(layer)
    for i in range(len(M.Wgs)):
        p[f"Wg{i}"] = conv1x1(M.Wgs[i])
        p[f"Wq{i}"] = lin(M.Wqs[i])
        p[f"Wk{i}"] = lin(M.Wks[i])
        p[f"Wv{i}"] = grouped(M.Wvs[i])
    return p


def load_flownet_reference():
    """Import the reference FlowNetS / EmbedNet / GeneralizedRCNNFGFA /
    GeneralizedRCNNDFF modules (after stub installation)."""
    load_mega_reference()
    from mega_core.modeling.backbone import embednet as ref_embednet
    from mega_core.modeling.backbone import flownet as ref_flownet
    from mega_core.modeling.detector import (generalized_rcnn_dff,
                                             generalized_rcnn_fgfa)
    return ref_flownet, ref_embednet, generalized_rcnn_fgfa, \
        generalized_rcnn_dff


def make_reference_flownet(ref_flownet, method="fgfa", seed=0):
    import types

    import torch

    torch.manual_seed(seed)
    cfg = types.SimpleNamespace(MODEL=types.SimpleNamespace(
        VID=types.SimpleNamespace(METHOD=method)))
    M = ref_flownet.FlowNetS(cfg)
    M.eval()
    return M


def flownet_params(M):
    """torch FlowNetS -> our FlowNetS params."""
    def conv(layer):
        return {"kernel": t2n(layer.weight).transpose(2, 3, 1, 0),
                "bias": t2n(layer.bias)}

    def convT(layer):
        # torch ConvTranspose2d weight (I, O, kh, kw) -> flax
        # transpose_kernel=True kernel (kh, kw, O, I)
        return {"kernel": t2n(layer.weight).transpose(2, 3, 1, 0),
                "bias": t2n(layer.bias)}

    p = {}
    for name in ("flow_conv1", "conv2", "conv3", "conv3_1", "conv4",
                 "conv4_1", "conv5", "conv5_1", "conv6", "conv6_1",
                 "Convolution1", "Convolution2", "Convolution3",
                 "Convolution4", "Convolution5"):
        p[name] = conv(getattr(M, name))
    for name in ("deconv5", "deconv4", "deconv3", "deconv2",
                 "upsample_flow6to5", "upsample_flow5to4",
                 "upsample_flow4to3", "upsample_flow3to2"):
        p[name] = convT(getattr(M, name))
    if hasattr(M, "Convolution5_scale"):
        w = t2n(M.Convolution5_scale.weight).transpose(2, 3, 1, 0)
        p["Convolution5_scale"] = {"kernel": w}
    return p


def embednet_params(M):
    def conv(layer):
        return {"kernel": t2n(layer.weight).transpose(2, 3, 1, 0),
                "bias": t2n(layer.bias)}
    return {"embed_conv1": conv(M.embed_conv1),
            "embed_conv2": conv(M.embed_conv2),
            "embed_conv3": conv(M.embed_conv3)}


def make_reference_resnet_c4(layers=(3, 4, 23), seed=0):
    """Build the reference mega_core ResNet C4 body (StemWithFixedBatchNorm
    + BottleneckWithFixedBatchNorm, STRIDE_IN_1X1=True). layers selects
    the R-50 (3,4,6) or R-101 (3,4,23) stage spec by name."""
    import torch

    load_mega_reference()
    from mega_core.modeling.backbone import resnet as ref_resnet

    class _CN(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

    cfg = _CN()
    cfg.MODEL = _CN()
    cfg.MODEL.RESNETS = _CN()
    R = cfg.MODEL.RESNETS
    R.STEM_FUNC = "StemWithFixedBatchNorm"
    R.TRANS_FUNC = "BottleneckWithFixedBatchNorm"
    R.NUM_GROUPS = 1
    R.WIDTH_PER_GROUP = 64
    R.STRIDE_IN_1X1 = True
    R.RES2_OUT_CHANNELS = 256
    R.RES5_DILATION = 1
    R.STEM_OUT_CHANNELS = 64
    R.DEFORMABLE_GROUPS = 1
    R.STAGE_WITH_DCN = (False, False, False, False)
    R.WITH_MODULATED_DCN = False
    cfg.MODEL.BACKBONE = _CN()
    cfg.MODEL.BACKBONE.CONV_BODY = ("R-50-C4" if layers == (3, 4, 6)
                                    else "R-101-C4")
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2

    torch.manual_seed(seed)
    M = ref_resnet.ResNet(cfg)
    # randomize the frozen-BN buffers too (they init to identity)
    g = torch.Generator().manual_seed(seed + 1)
    for mod in M.modules():
        if mod.__class__.__name__ == "FrozenBatchNorm2d":
            mod.weight.copy_(torch.rand(mod.weight.shape, generator=g)
                             + 0.5)
            mod.bias.copy_(torch.randn(mod.bias.shape, generator=g) * 0.1)
            mod.running_mean.copy_(
                torch.randn(mod.running_mean.shape, generator=g) * 0.1)
            mod.running_var.copy_(
                torch.rand(mod.running_var.shape, generator=g) + 0.5)
    M.eval()
    return M, ref_resnet


def _frozen_bn_params(bn):
    """mega_core FrozenBatchNorm2d -> our FrozenBatchNorm params. The
    reference applies NO epsilon (batch_norm.py:27); ours adds 1e-5, so
    the transplant subtracts it for exact parity."""
    return {"weight": t2n(bn.weight), "bias": t2n(bn.bias),
            "running_mean": t2n(bn.running_mean),
            "running_var": t2n(bn.running_var) - 1e-5}


def _bottleneck_params(b):
    def conv(l):
        return {"conv": {"kernel": t2n(l.weight).transpose(2, 3, 1, 0)}}

    p = {"conv1": conv(b.conv1), "bn1": _frozen_bn_params(b.bn1),
         "conv2": conv(b.conv2), "bn2": _frozen_bn_params(b.bn2),
         "conv3": conv(b.conv3), "bn3": _frozen_bn_params(b.bn3)}
    if b.downsample is not None:
        p["downsample_conv"] = conv(b.downsample[0])
        p["downsample_bn"] = _frozen_bn_params(b.downsample[1])
    return p


def resnet_c4_params(M):
    """Reference mega_core ResNet (C4 body) -> our ResNetC4 params."""
    p = {"stem": {"conv": {"kernel":
                           t2n(M.stem.conv1.weight).transpose(2, 3, 1, 0)}},
         "stem_bn": _frozen_bn_params(M.stem.bn1)}
    for li in (1, 2, 3):
        stage = getattr(M, f"layer{li}")
        sp = {}
        for bi, block in enumerate(stage):
            sp[f"block{bi}"] = _bottleneck_params(block)
        p[f"layer{li}"] = sp
    return p


def resnet_head_params(H):
    """Reference ResNetHead (C5 stage) -> our ResNetC5Head params."""
    sp = {}
    for bi, block in enumerate(H.layer4):
        sp[f"block{bi}"] = _bottleneck_params(block)
    return {"layer4": sp}


def make_reference_rpn_head(in_channels=1024, num_anchors=15, seed=0):
    import torch

    load_mega_reference()
    from mega_core.modeling.rpn import rpn as ref_rpn
    torch.manual_seed(seed)
    M = ref_rpn.RPNHead(None, in_channels, num_anchors)
    M.eval()
    return M


def rpn_head_params(M):
    def conv(l):
        return {"kernel": t2n(l.weight).transpose(2, 3, 1, 0),
                "bias": t2n(l.bias)}
    return {"conv": conv(M.conv), "cls_logits": conv(M.cls_logits),
            "bbox_pred": conv(M.bbox_pred)}


# ---------------------------------------------------------------------------
# Mask / keypoint RoI heads (reference roi_heads/{mask,keypoint}_head)
# ---------------------------------------------------------------------------

class _DuckCfg(dict):
    """Attribute-access dict standing in for a yacs node."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


def make_reference_mask_modules(num_classes=5, conv_layers=(8, 8),
                                in_channels=6, dilation=1, seed=0):
    """Reference MaskRCNNFPNFeatureExtractor + MaskRCNNC4Predictor
    (roi_mask_feature_extractors.py:17-66, roi_mask_predictors.py:10-31).
    The extractor's pooler is bypassed in tests (our static-shape pooling
    is covered by the roi_align golden tests)."""
    import torch

    load_mega_reference()
    from mega_core.modeling.roi_heads.mask_head import (
        roi_mask_feature_extractors as rmfe)
    from mega_core.modeling.roi_heads.mask_head import (
        roi_mask_predictors as rmp)

    cfg = _DuckCfg()
    cfg.MODEL = _DuckCfg()
    cfg.MODEL.ROI_BOX_HEAD = _DuckCfg(NUM_CLASSES=num_classes)
    cfg.MODEL.ROI_MASK_HEAD = _DuckCfg(
        POOLER_RESOLUTION=14, POOLER_SCALES=(0.0625,),
        POOLER_SAMPLING_RATIO=2, USE_GN=False,
        CONV_LAYERS=tuple(conv_layers), DILATION=dilation)
    torch.manual_seed(seed)
    ext = rmfe.MaskRCNNFPNFeatureExtractor(cfg, in_channels)
    pred = rmp.MaskRCNNC4Predictor(cfg, ext.out_channels)
    ext.eval()
    pred.eval()
    return ext, pred


def make_reference_keypoint_modules(num_keypoints=3, conv_layers=(8, 8),
                                    in_channels=4, seed=0):
    """Reference KeypointRCNNFeatureExtractor + KeypointRCNNPredictor
    (roi_keypoint_feature_extractors.py:10-44,
    roi_keypoint_predictors.py:7-33)."""
    import torch

    load_mega_reference()
    from mega_core.modeling.roi_heads.keypoint_head import (
        roi_keypoint_feature_extractors as rkfe)
    from mega_core.modeling.roi_heads.keypoint_head import (
        roi_keypoint_predictors as rkp)

    cfg = _DuckCfg()
    cfg.MODEL = _DuckCfg()
    cfg.MODEL.ROI_KEYPOINT_HEAD = _DuckCfg(
        POOLER_RESOLUTION=14, POOLER_SCALES=(0.0625,),
        POOLER_SAMPLING_RATIO=2, CONV_LAYERS=tuple(conv_layers),
        NUM_CLASSES=num_keypoints)
    torch.manual_seed(seed)
    ext = rkfe.KeypointRCNNFeatureExtractor(cfg, in_channels)
    pred = rkp.KeypointRCNNPredictor(cfg, ext.out_channels)
    ext.eval()
    pred.eval()
    return ext, pred


def _conv2d_params(l):
    return {"kernel": t2n(l.weight).transpose(2, 3, 1, 0),
            "bias": t2n(l.bias)}


def _deconv_params(l):
    """torch ConvTranspose2d (in, out, kh, kw) -> our Deconv kernel
    (kh, kw, in, out), spatially flipped (zero-insertion formulation)."""
    w = t2n(l.weight).transpose(2, 3, 0, 1)[::-1, ::-1]
    return {"kernel": np.ascontiguousarray(w), "bias": t2n(l.bias)}


def mask_head_params(ext, pred):
    """Reference extractor+predictor -> our MaskHead params."""
    p = {}
    for i, name in enumerate(ext.blocks, 1):
        p[f"mask_fcn{i}"] = _conv2d_params(getattr(ext, name))
    p["conv5_mask"] = _deconv_params(pred.conv5_mask)
    p["mask_fcn_logits"] = _conv2d_params(pred.mask_fcn_logits)
    return p


def keypoint_head_params(ext, pred):
    """Reference extractor+predictor -> our KeypointHead params."""
    p = {}
    for i, name in enumerate(ext.blocks, 1):
        p[f"conv_fcn{i}"] = _conv2d_params(getattr(ext, name))
    p["kps_score_lowres"] = _deconv_params(pred.kps_score_lowres)
    return p
