#!/usr/bin/env python
"""Convert lpips/torchvision AlexNet checkpoints into the .npz weight
format consumed by rt_octree_tpu.train.lpips.LPIPS.

Run this on a machine that has the `lpips` pip package (and its
downloaded weights); this environment has no network access, so the LPIPS
metric stays gated until a converted file is provided via
RT_OCTREE_LPIPS_WEIGHTS.

Usage: python tools/convert_lpips.py out_weights.npz
"""

import sys

import numpy as np


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz"
    try:
        import lpips
        import torch
    except ImportError:
        print("requires the `lpips` package (pip install lpips) and torch",
              file=sys.stderr)
        return 1

    net = lpips.LPIPS(net="alex")
    arrays = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    convs = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, f"expected 5 convs, got {len(convs)}"
    for i, conv in enumerate(convs):
        # torch OIHW -> HWIO
        arrays[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(
            2, 3, 1, 0).astype(np.float32)
        arrays[f"conv{i}_b"] = conv.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate([net.lin0, net.lin1, net.lin2, net.lin3,
                             net.lin4]):
        w = lin.model[-1].weight.detach().numpy().reshape(-1)
        arrays[f"lin{i}"] = w.astype(np.float32)
    np.savez(out, **arrays)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
