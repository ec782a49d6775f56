#!/usr/bin/env python
"""Export a torchvision ResNet state_dict to .npz for the JAX backbone.

The reference downloads ImageNet weights at runtime (data/
openneuro_features.py:153-164); in air-gapped TPU environments, run this
once wherever torchvision + weights are available, ship the .npz, and
point ``weights_path:`` at it in resnet2d_config / mil_attention_ft
params. Conversion fidelity is covered by tests/test_resnet.py.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))


def main():
    parser = argparse.ArgumentParser(description="Export torch resnet weights to npz")
    parser.add_argument("--arch", default="resnet18", choices=["resnet18", "resnet50"])
    parser.add_argument("--src", default=None,
                        help="Optional .pth state_dict; default: torchvision pretrained")
    parser.add_argument("--out", required=True, help="Output .npz path")
    args = parser.parse_args()

    if args.src:
        import torch

        sd = torch.load(args.src, map_location="cpu", weights_only=True)
    else:
        from torchvision.models import (  # noqa: needs torchvision
            ResNet18_Weights, ResNet50_Weights, resnet18, resnet50,
        )

        model = (
            resnet50(weights=ResNet50_Weights.DEFAULT)
            if args.arch == "resnet50"
            else resnet18(weights=ResNet18_Weights.DEFAULT)
        )
        sd = model.state_dict()

    arrays = {}
    for k, v in sd.items():
        if k.startswith("fc."):
            continue  # classification head is never used (fc=Identity)
        arrays[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    np.savez_compressed(args.out, **arrays)
    print(f"Exported {len(arrays)} tensors -> {args.out}")

    # round-trip sanity: conversion into the JAX pytree must succeed
    from pd_fusion.nn.resnet import convert_torch_state_dict

    data = np.load(args.out)
    convert_torch_state_dict({k: data[k] for k in data.files}, args.arch)
    print("Conversion check OK")


if __name__ == "__main__":
    main()
