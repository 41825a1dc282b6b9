#!/usr/bin/env python
"""Convert torchvision's pretrained VGG-19 weights to st3d's .npz format.

Run on any machine with torchvision + internet access:

    python scripts/convert_vgg_weights.py --out weights/vgg19_imagenet.npz

then ship the .npz (or set $ST3D_VGG_WEIGHTS). Layout conversion: torch
Conv2d weights are OIHW; st3d stores HWIO for NHWC TPU convs
(st3d/models/vgg.py docstring; SURVEY.md §7 hard part 4).

This script intentionally cannot run in the zero-egress build environment
(torchvision absent there) — it exists so deployments can reproduce the
reference's IMAGENET1K_V1 features exactly (utils.py:48-52).
"""

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/vgg19_imagenet.npz")
    args = ap.parse_args()

    try:
        import torchvision
    except ImportError:
        print(
            "torchvision is not installed; run this where it is available.",
            file=sys.stderr,
        )
        return 1
    import numpy as np
    import os
    import torch

    model = torchvision.models.vgg19(
        weights=torchvision.models.VGG19_Weights.IMAGENET1K_V1
    ).features.eval()

    arrays = {}
    conv_i = 0
    for module in model:
        if isinstance(module, torch.nn.Conv2d):
            w = module.weight.detach().numpy()  # OIHW
            arrays[f"conv{conv_i}_kernel"] = np.transpose(w, (2, 3, 1, 0))
            arrays[f"conv{conv_i}_bias"] = module.bias.detach().numpy()
            conv_i += 1
    assert conv_i == 16, f"expected 16 convs, got {conv_i}"

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **arrays)
    print(f"wrote {args.out} ({conv_i} convs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
