"""Convert a reference VrdONE torch checkpoint (.pth) into our params.

Lets a user of the reference stack bring trained weights along: the
reference's `model_state_dict` / `model_state_dict_ema` (layout described
at reference utils/train_utils.py:167-179) maps key-by-key onto our flax
pytree (pure layout transposition — torch (C_out, C_in, K) convs to
(K, C_in, C_out) kernels, 1x1 convs to Dense kernels, (1, C, 1) norm
affines to (C,)).

Usage:
    python tools/convert_reference_checkpoint.py \
        --torch_ckpt model_epoch_15_vidvrd.pth --out vidvrd_params.ckpt
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import re

import numpy as np


def _conv_kernel(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def _dense_kernel(w):
    w = np.asarray(w)
    if w.ndim == 3:
        w = w[:, :, 0]
    return np.ascontiguousarray(w.T)


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convmlp_path(rest: str):
    """'layers.0.weight' -> dense layers_0 kernel (k=1) or conv kernel."""
    m = re.fullmatch(r"layers\.(\d+)\.(weight|bias)", rest)
    i, kind = m.group(1), m.group(2)
    return f"layers_{i}", kind


def _attn_entries(rest: str, value):
    """Map one attention-submodule state entry to (path, converted)."""
    conv_m = re.fullmatch(r"(query|key|value)_conv\.conv\.(weight|bias)",
                          rest)
    if conv_m:
        name, kind = conv_m.groups()
        out = (_conv_kernel(value) if kind == "weight"
               else np.asarray(value))
        return (["preproc", f"{name}_conv",
                 "kernel" if kind == "weight" else "bias"], out)
    norm_m = re.fullmatch(r"(query|key|value)_norm\.(weight|bias)", rest)
    if norm_m:
        name, kind = norm_m.groups()
        return (["preproc", f"{name}_norm", kind],
                np.asarray(value).reshape(-1))
    proj_m = re.fullmatch(r"(query|key|value|proj)\.(weight|bias)", rest)
    if proj_m:
        name, kind = proj_m.groups()
        out = (_dense_kernel(value) if kind == "weight"
               else np.asarray(value))
        return ([name, "kernel" if kind == "weight" else "bias"], out)
    if rest == "rel_pe":
        return (["rel_pe"], np.asarray(value)[0, 0])
    raise KeyError(rest)


def _block_entries(rest: str, value):
    """TransformerBlock / DecoderLayer internals shared mapping."""
    ln_m = re.fullmatch(r"(ln\d)\.(weight|bias)", rest)
    if ln_m:
        return ([ln_m.group(1), ln_m.group(2)],
                np.asarray(value).reshape(-1))
    mlp_m = re.fullmatch(r"mlp\.([03])\.(weight|bias)", rest)
    if mlp_m:
        idx = "mlp_0" if mlp_m.group(1) == "0" else "mlp_1"
        kind = mlp_m.group(2)
        out = (_dense_kernel(value) if kind == "weight"
               else np.asarray(value))
        return ([idx, "kernel" if kind == "weight" else "bias"], out)
    dp_m = re.fullmatch(r"(drop_path_\w+)\.scale", rest)
    if dp_m:
        return ([dp_m.group(1), "AffineDropPath_0", "scale"],
                np.asarray(value).reshape(-1))
    attn_m = re.fullmatch(r"(attn|self_attn|multihead_attn)\.(.+)", rest)
    if attn_m:
        sub, tail = attn_m.groups()
        path, out = _attn_entries(tail, value)
        return ([sub] + path, out)
    raise KeyError(rest)


def convert_state_dict(sd: dict) -> dict:
    """torch MaskVRD state dict -> our flax params tree."""
    params: dict = {}
    fpn_counts = {}
    for key, val in sd.items():
        if key.startswith("module."):
            key = key[7:]
        if key == "empty_weight":  # loss buffer, not a parameter
            continue

        # ---------------- backbone ----------------
        m = re.fullmatch(
            r"backbone\.(visual_embd|clip_embd)\.(\d+)\.conv\.(weight|bias)",
            key)
        if m:
            base, i, kind = m.groups()
            out = _conv_kernel(val) if kind == "weight" else np.asarray(val)
            _set(params, ["backbone", f"{base}_{i}",
                          "kernel" if kind == "weight" else "bias"], out)
            continue
        m = re.fullmatch(
            r"backbone\.(visual_embd_norm|clip_embd_norm)\.(\d+)\."
            r"(weight|bias)", key)
        if m:
            base, i, kind = m.groups()
            _set(params, ["backbone", f"{base}_{i}", kind],
                 np.asarray(val).reshape(-1))
            continue
        m = re.fullmatch(
            r"backbone\.(bbox_entity_embd|bbox_so_embd)\.conv\."
            r"(weight|bias)", key)
        if m:
            base, kind = m.groups()
            out = _conv_kernel(val) if kind == "weight" else np.asarray(val)
            _set(params, ["backbone", base,
                          "kernel" if kind == "weight" else "bias"], out)
            continue
        m = re.fullmatch(
            r"backbone\.(bbox_entity_norm|s_fuse_norm|o_fuse_norm)\."
            r"(weight|bias)", key)
        if m:
            base, kind = m.groups()
            _set(params, ["backbone", base, kind],
                 np.asarray(val).reshape(-1))
            continue
        m = re.fullmatch(
            r"backbone\.(visual_bbox_fuse|visual_clip_fuse|so_fuse|"
            r"so_visual_bbox_fuse)\.(layers\.\d+\.(?:weight|bias))", key)
        if m:
            base, rest = m.groups()
            layer, kind = _convmlp_path(rest)
            out = _dense_kernel(val) if kind == "weight" else np.asarray(val)
            _set(params, ["backbone", base, layer,
                          "kernel" if kind == "weight" else "bias"], out)
            continue
        m = re.fullmatch(
            r"backbone\.(stem|branch|s_attn|o_attn)\.(\d+)\.(.+)", key)
        if m:
            base, i, rest = m.groups()
            path, out = _block_entries(rest, val)
            _set(params, ["backbone", f"{base}_{i}"] + path, out)
            continue

        # ---------------- neck ----------------
        m = re.fullmatch(
            r"neck\.(input_norms|lateral_norms|fpn_norms)\.(\d+)\."
            r"(weight|bias)", key)
        if m:
            base, i, kind = m.groups()
            name = {"input_norms": "input_norm", "lateral_norms":
                    "lateral_norm", "fpn_norms": "fpn_norm"}[base]
            _set(params, ["neck", f"{name}_{i}", kind],
                 np.asarray(val).reshape(-1))
            continue
        m = re.fullmatch(
            r"neck\.(lateral_convs|fpn_convs)\.(\d+)\.conv\.(weight|bias)",
            key)
        if m:
            base, i, kind = m.groups()
            name = {"lateral_convs": "lateral_conv",
                    "fpn_convs": "fpn_conv"}[base]
            out = _conv_kernel(val) if kind == "weight" else np.asarray(val)
            _set(params, ["neck", f"{name}_{i}",
                          "kernel" if kind == "weight" else "bias"], out)
            continue
        m = re.fullmatch(r"neck\.mask_features\.conv\.(weight|bias)", key)
        if m:
            kind = m.group(1)
            out = _conv_kernel(val) if kind == "weight" else np.asarray(val)
            _set(params, ["neck", "mask_features",
                          "kernel" if kind == "weight" else "bias"], out)
            continue

        # ---------------- predictor ----------------
        if key == "predictor.query_embed.weight":
            _set(params, ["predictor", "query_embed"], np.asarray(val))
            continue
        m = re.fullmatch(r"predictor\.input_norm\.(weight|bias)", key)
        if m:
            _set(params, ["predictor", "input_norm", m.group(1)],
                 np.asarray(val).reshape(-1))
            continue
        m = re.fullmatch(
            r"predictor\.(input_proj|class_embed)\.(weight|bias)", key)
        if m:
            base, kind = m.groups()
            out = _dense_kernel(val) if kind == "weight" else np.asarray(val)
            _set(params, ["predictor", base,
                          "kernel" if kind == "weight" else "bias"], out)
            continue
        m = re.fullmatch(
            r"predictor\.mask_embed\.(layers\.\d+\.(?:weight|bias))", key)
        if m:
            layer, kind = _convmlp_path(m.group(1))
            out = _dense_kernel(val) if kind == "weight" else np.asarray(val)
            _set(params, ["predictor", "mask_embed", layer,
                          "kernel" if kind == "weight" else "bias"], out)
            continue
        m = re.fullmatch(
            r"predictor\.transformer\.decoder\.(layers\.(\d+)\.(.+)|"
            r"norm\.(weight|bias))", key)
        if m:
            if m.group(1).startswith("norm."):
                _set(params, ["predictor", "transformer", "decoder", "norm",
                              m.group(4)], np.asarray(val).reshape(-1))
            else:
                i, rest = m.group(2), m.group(3)
                path, out = _block_entries(rest, val)
                _set(params, ["predictor", "transformer", "decoder",
                              f"layers_{i}"] + path, out)
            continue

        raise KeyError(f"unmapped reference parameter: {key}")
    return params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", required=True, help="orbax checkpoint dir")
    p.add_argument("--use_ema", action="store_true", default=True)
    args = p.parse_args()

    import torch
    blob = torch.load(args.torch_ckpt, map_location="cpu")
    key = ("model_state_dict_ema"
           if args.use_ema and "model_state_dict_ema" in blob
           else "model_state_dict")
    sd = {k: v.numpy() for k, v in blob[key].items()}
    params = convert_state_dict(sd)

    import orbax.checkpoint as ocp
    import os
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out),
               {"params": params, "ema_params": params}, force=True)
    ckptr.wait_until_finished()
    print(f"wrote {args.out} (from {key})")


if __name__ == "__main__":
    main()
