"""Transplant a torchvision-format ResNet state dict into our flax
ResNet-C4/C5 params (for seeding the detector from published R-101
weights, replacing the reference's catalog:// Caffe2 download path,
reference mega_core/utils/checkpoint.py:128-166).

Torch layout: conv weight (C_out, C_in, K, K); ours: (K, K, C_in, C_out).
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import pickle

import numpy as np


def conv_w(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


def bn_params(sd, prefix):
    return {
        "weight": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
        "running_mean": np.asarray(sd[prefix + ".running_mean"]),
        "running_var": np.asarray(sd[prefix + ".running_var"]),
    }


def bottleneck_params(sd, prefix):
    p = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = {"conv": {"kernel": conv_w(sd[f"{prefix}.conv{i}.weight"])}}
        p[f"bn{i}"] = bn_params(sd, f"{prefix}.bn{i}")
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample_conv"] = {"conv": {
            "kernel": conv_w(sd[f"{prefix}.downsample.0.weight"])}}
        p["downsample_bn"] = bn_params(sd, f"{prefix}.downsample.1")
    return p


def stage_params(sd, prefix, blocks):
    return {f"block{i}": bottleneck_params(sd, f"{prefix}.{i}")
            for i in range(blocks)}


def convert(sd, layers=(3, 4, 23, 3)):
    """torch state dict -> {"c4": ResNetC4 params, "c5": ResNetC5Head}."""
    c4 = {
        "stem": {"conv": {"kernel": conv_w(sd["conv1.weight"])}},
        "stem_bn": bn_params(sd, "bn1"),
        "layer1": stage_params(sd, "layer1", layers[0]),
        "layer2": stage_params(sd, "layer2", layers[1]),
        "layer3": stage_params(sd, "layer3", layers[2]),
    }
    c5 = {"layer4": stage_params(sd, "layer4", layers[3])}
    return {"c4": c4, "c5": c5}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True,
                   help=".pth state dict (torchvision resnet naming)")
    p.add_argument("--out", required=True, help="output pickle")
    p.add_argument("--layers", default="3,4,23,3")
    args = p.parse_args()

    import torch
    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    layers = tuple(int(x) for x in args.layers.split(","))
    out = convert(sd, layers)
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
