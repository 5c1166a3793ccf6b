"""Convert a reference mega_core (maskrcnn-benchmark) MEGA detector
checkpoint into our MegaDetector param tree.

The reference's released MEGA checkpoints are torch.save'd
``{"model": state_dict, ...}`` files in the maskrcnn-benchmark module
layout (its Checkpointer, reference
datasets/mega/mega_core/utils/checkpoint.py:69-166; Caffe2 ``catalog://``
weights pass through c2_model_loading.py's renamer first and come out in
the SAME layout, so this converter covers both lineages).  Key families
(reference modeling/detector/generalized_rcnn_mega.py:31-46,
backbone/resnet.py:239-397, rpn/rpn.py,
roi_heads/box_head/roi_box_feature_extractors.py:459-563):

    backbone.body.stem.conv1 / stem.bn1            (FrozenBatchNorm2d)
    backbone.body.layer{1..3}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}
    rpn.head.{conv,cls_logits,bbox_pred}
    roi_heads.box.feature_extractor.head.layer4.{i}.*   (C5 stage)
    roi_heads.box.feature_extractor.{l_fcs,l_Wgs,l_Wqs,l_Wks,l_Wvs,l_us}.{i}
    roi_heads.box.feature_extractor.{g_Wqs,g_Wks,g_Wvs,g_us}.{i}
    roi_heads.box.predictor.{cls_score,bbox_pred}

Optional ``module.`` DDP prefixes are stripped.  Reference MEGA ckpts use
the Caffe2 ResNet stride placement — pass ``stride_in_1x1: true`` to the
consuming MegaDetector (models/detector.py MegaDetector.stride_in_1x1).

One lossy leaf: the reference MEGA fc0 consumes FLATTENED 14x14 RoI crops
of the C5 map (kernel (C*14*14, 1024),
roi_box_feature_extractors.py:496-530), while our TPU head consumes the
standard C4 pipeline's average-pooled C5 vector (2048-d,
models/detector.py BoxHead).  When shapes differ, fc0 is folded by
summing the kernel over its spatial taps — exact for spatially-constant
crops, a good finetune seed otherwise — and a loud warning is printed.
Every other tensor converts exactly (golden:
tests/test_convert_mega_checkpoint.py pins converter output leaf-exact
against the live-module transplant in tests/oracle.py).

Output: an orbax checkpoint directory holding {"params": tree}, directly
consumable by tools/train_detector.py --init_ckpt
(models/detector_train.py load_finetune_params) and the detect_video /
extract_video_features entry points.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import re

import numpy as np

FX = "roi_heads.box.feature_extractor"


def _np(v):
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def conv_kernel(w) -> np.ndarray:
    """torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return _np(w).transpose(2, 3, 1, 0)


def dense(sd, prefix) -> dict:
    """torch nn.Linear -> flax nn.Dense."""
    return {"kernel": _np(sd[prefix + ".weight"]).T,
            "bias": _np(sd[prefix + ".bias"])}


def conv_as_dense(sd, prefix) -> dict:
    """torch 1x1 Conv2d -> flax nn.Dense (the MEGA head's Wg lives as a
    1x1 conv in the reference; ours is a Dense over the embed dim)."""
    w = _np(sd[prefix + ".weight"])[:, :, 0, 0]        # (out, in)
    return {"kernel": w.T, "bias": _np(sd[prefix + ".bias"])}


def grouped_linear(sd, prefix, groups: int) -> dict:
    """torch grouped 1x1 Conv2d(fd*g -> fd, groups=g) -> our GroupedLinear
    kernel (g, d_in, d_out) (models/mega.py GroupedLinear; same math as
    tests/oracle.py mega_head_params.grouped)."""
    w = _np(sd[prefix + ".weight"])[:, :, 0, 0]        # (fd, fd)
    fd = w.shape[0]
    dg = fd // groups
    kern = np.stack([w[i * dg:(i + 1) * dg, :].T for i in range(groups)])
    return {"kernel": kern, "bias": _np(sd[prefix + ".bias"])}


def frozen_bn(sd, prefix) -> dict:
    """The reference FrozenBatchNorm2d applies NO epsilon
    (mega_core/layers/batch_norm.py:27); ours adds 1e-5, so subtract it
    here for an exact-match transplant (same trick as tests/oracle.py
    _frozen_bn_params)."""
    return {"weight": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
            "running_mean": _np(sd[f"{prefix}.running_mean"]),
            "running_var": _np(sd[f"{prefix}.running_var"]) - 1e-5}


def res_stage(sd, prefix: str, blocks: int) -> dict:
    """mega_core ResNet stage -> our ResStage block{i} tree."""
    out = {}
    for i in range(blocks):
        b = f"{prefix}.{i}"
        p = {}
        for j in (1, 2, 3):
            p[f"conv{j}"] = {"conv": {
                "kernel": conv_kernel(sd[f"{b}.conv{j}.weight"])}}
            p[f"bn{j}"] = frozen_bn(sd, f"{b}.bn{j}")
        if f"{b}.downsample.0.weight" in sd:
            p["downsample_conv"] = {"conv": {
                "kernel": conv_kernel(sd[f"{b}.downsample.0.weight"])}}
            p["downsample_bn"] = frozen_bn(sd, f"{b}.downsample.1")
        out[f"block{i}"] = p
    return out


def _stage_blocks(sd, prefix: str) -> int:
    idx = set()
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            idx.add(int(m.group(1)))
    return max(idx) + 1 if idx else 0


def _list_len(sd, prefix: str) -> int:
    idx = set()
    pat = re.compile(re.escape(prefix) + r"\.(\d+)(\.|$)")
    for k in sd:
        m = pat.match(k)
        if m:
            idx.add(int(m.group(1)))
    return max(idx) + 1 if idx else 0


def fold_fc0(weight: np.ndarray, in_dim: int) -> np.ndarray:
    """Reference fc0 kernel (out, C*R*R) -> (out, C) by summing the
    spatial taps: exact iff the 14x14 crop is spatially constant (then
    sum_ij W[o,c,i,j] * xbar[c] == sum W*x); a finetune seed otherwise."""
    out_dim, flat = weight.shape
    assert flat % in_dim == 0, (flat, in_dim)
    spatial = flat // in_dim
    # maskrcnn flatten order is (C, H, W) -> C-major
    return weight.reshape(out_dim, in_dim, spatial).sum(axis=2)


def convert(sd: dict, *, groups: int = 16) -> dict:
    """mega_core state dict -> our MegaDetector "params" tree."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    backbone = {
        "stem": {"conv": {
            "kernel": conv_kernel(sd["backbone.body.stem.conv1.weight"])}},
        "stem_bn": frozen_bn(sd, "backbone.body.stem.bn1"),
    }
    for n in (1, 2, 3):
        pref = f"backbone.body.layer{n}"
        backbone[f"layer{n}"] = res_stage(sd, pref, _stage_blocks(sd, pref))

    rpn = {
        "conv": {"kernel": conv_kernel(sd["rpn.head.conv.weight"]),
                 "bias": _np(sd["rpn.head.conv.bias"])},
        "cls_logits": {
            "kernel": conv_kernel(sd["rpn.head.cls_logits.weight"]),
            "bias": _np(sd["rpn.head.cls_logits.bias"])},
        "bbox_pred": {
            "kernel": conv_kernel(sd["rpn.head.bbox_pred.weight"]),
            "bias": _np(sd["rpn.head.bbox_pred.bias"])},
    }

    c5_pref = f"{FX}.head.layer4"
    box_head = {
        "c5": {"layer4": res_stage(sd, c5_pref, _stage_blocks(sd, c5_pref))},
        "cls_score": dense(sd, "roi_heads.box.predictor.cls_score"),
        "bbox_pred": dense(sd, "roi_heads.box.predictor.bbox_pred"),
    }

    return {"backbone": backbone, "rpn": rpn, "box_head": box_head,
            "mega": convert_mega_head(sd, groups=groups)}


def convert_mega_head(sd: dict, *, groups: int = 16,
                      ours_in: int = 2048) -> dict:
    """The MEGA attention-stack subtree (l_*/g_* families) alone —
    prefix-keyed on FX; same math as tests/oracle.py mega_head_params
    but sourced from a state dict instead of a live module."""
    mega = {}
    for i in range(_list_len(sd, f"{FX}.l_fcs")):
        fc = dense(sd, f"{FX}.l_fcs.{i}")
        if i == 0:
            w = _np(sd[f"{FX}.l_fcs.0.weight"])        # (1024, in_size)
            if w.shape[1] != ours_in and w.shape[1] % ours_in == 0:
                print(f"WARNING: fc0 kernel {w.shape} folded over "
                      f"{w.shape[1] // ours_in} spatial taps (flattened-"
                      f"crop fc0 -> pooled-vector fc0; finetune-grade "
                      f"seed, see module docstring)", file=_sys.stderr)
                fc = {"kernel": fold_fc0(w, ours_in).T, "bias": fc["bias"]}
        mega[f"l_fc{i}"] = fc
        mega[f"l_Wg{i}"] = conv_as_dense(sd, f"{FX}.l_Wgs.{i}")
        mega[f"l_Wq{i}"] = dense(sd, f"{FX}.l_Wqs.{i}")
        mega[f"l_Wk{i}"] = dense(sd, f"{FX}.l_Wks.{i}")
        mega[f"l_Wv{i}"] = grouped_linear(sd, f"{FX}.l_Wvs.{i}", groups)
        mega[f"l_u{i}"] = _np(sd[f"{FX}.l_us.{i}"])[:, 0, :]
    for i in range(_list_len(sd, f"{FX}.g_Wqs")):
        mega[f"g_Wq{i}"] = dense(sd, f"{FX}.g_Wqs.{i}")
        mega[f"g_Wk{i}"] = dense(sd, f"{FX}.g_Wks.{i}")
        mega[f"g_Wv{i}"] = grouped_linear(sd, f"{FX}.g_Wvs.{i}", groups)
        mega[f"g_u{i}"] = _np(sd[f"{FX}.g_us.{i}"])[:, 0, :]
    return mega


def load_state_dict(path: str) -> dict:
    """torch.save'd {"model": sd} / raw state dict / legacy pickle."""
    import pickle
    try:
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        with open(path, "rb") as f:
            obj = pickle.load(f)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mega_ckpt", required=True,
                   help="mega_core checkpoint (.pth, {'model': sd} or raw)")
    p.add_argument("--out", required=True,
                   help="output orbax checkpoint directory")
    p.add_argument("--groups", type=int, default=16,
                   help="MEGA attention groups (reference "
                        "ATTENTION.GROUP default 16)")
    args = p.parse_args()

    import orbax.checkpoint as ocp

    sd = load_state_dict(args.mega_ckpt)
    params = convert(sd, groups=args.groups)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_os.path.abspath(args.out), {"params": params})
    ckptr.wait_until_finished()   # async save: block until committed
    n = len([None for _ in _flatten(params)])
    print(f"wrote {args.out} ({n} tensors)")


def _flatten(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _flatten(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
