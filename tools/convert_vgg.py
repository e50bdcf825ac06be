#!/usr/bin/env python
"""One-time converter: ``vgg_normalised.pth`` (torch) → ``.npz`` (rpst).

The reference loads torch weights directly (train.py:91); rpst can too
(``rpst.nn.vgg.load_vgg_params`` accepts the .pth), but converting once to
.npz removes the torch dependency from the serving path.

Usage: python tools/convert_vgg.py models/vgg_normalised.pth vgg.npz
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np


def convert(src: str, dst: str) -> None:
    import torch
    from rpst.nn.vgg import _TORCH_CONV_INDICES
    sd = torch.load(src, map_location="cpu")
    arrays = {}
    for i, idx in enumerate(_TORCH_CONV_INDICES):
        w = sd[f"{idx}.weight"].numpy()  # OIHW
        arrays[f"w{i}"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        arrays[f"b{i}"] = sd[f"{idx}.bias"].numpy()
    np.savez(dst, **arrays)
    print(f"wrote {dst}: {len(arrays)//2} conv layers")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
