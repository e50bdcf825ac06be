#!/usr/bin/env python
"""Import reference (torch) checkpoints into rpst parameter trees.

The reference saves heterogeneous formats (SURVEY §2.3):
  * ``{'encoder': sd, 'decoder': sd}``  — AdaINRPNet / WCTRPNet
    (adain_rp.py:103-108, wct_rp.py:150-155)
  * raw ``state_dict``                  — LDMS nets, BaseNet default
  * ``{'decoder': sd, 'transform': sd}``— AdaptiveSAModel (sanet.py:323-328)

This tool maps the enc/dec format for the plain-conv (RPSequence) models —
AdaINRPNet/WCTRPNet — whose torch modules are ``nn.Sequential`` of
Conv2d+ReLU pairs: torch keys ``{2i}.weight/{2i}.bias`` → rpst
``conv_{i}/Conv_0/{kernel,bias}`` with OIHW→HWIO transposition.  Output is
a pickled flax params dict usable via ``--set checkpoint_params=<file>``.

Usage: python tools/import_reference_checkpoint.py ckpt.pth out.npz
"""

import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np


def _seq_to_rpseq(sd) -> dict:
    """torch Sequential(Conv2d, ReLU, ...) state dict → RPSequence params."""
    params = {}
    conv_idxs = sorted({int(k.split(".")[0]) for k in sd
                        if k.endswith(".weight")})
    for i, idx in enumerate(conv_idxs):
        w = np.asarray(sd[f"{idx}.weight"])  # OIHW
        b = np.asarray(sd[f"{idx}.bias"])
        params[f"conv_{i}"] = {"Conv_0": {
            "kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}}
    return params


def convert(src: str, dst: str) -> None:
    import torch
    ckpt = torch.load(src, map_location="cpu")
    if not (isinstance(ckpt, dict) and "encoder" in ckpt and "decoder" in ckpt):
        raise SystemExit(
            "unsupported checkpoint format: expected {'encoder','decoder'} "
            "(AdaINRPNet/WCTRPNet style)")
    enc = {k: v.numpy() for k, v in ckpt["encoder"].items()}
    dec = {k: v.numpy() for k, v in ckpt["decoder"].items()}
    params = {"encoder": _seq_to_rpseq(enc), "decoder": _seq_to_rpseq(dec)}
    with open(dst, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {dst}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
