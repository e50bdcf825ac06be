#!/usr/bin/env python
"""Import reference (torch) checkpoints into rpst parameter trees.

The reference saves heterogeneous formats (SURVEY §2.3):
  * ``{'encoder': sd, 'decoder': sd}``  — AdaINRPNet / WCTRPNet
    (adain_rp.py:103-108, wct_rp.py:150-155): ``nn.Sequential`` of
    Conv2d+ReLU pairs, keys ``{2i}.weight``;
  * ``{'encoder': sd, 'decoder': sd}``  — MultiScaleAdaINRPNet family
    (same save code, but the modules are ``ModuleList`` of Conv2dBlock:
    keys ``{i}.conv.weight`` + optional inception / SE-bottleneck);
  * ``{'decoder': sd, 'transform': sd}``— SAModel (sanet.py:323-328);
  * raw ``state_dict``                  — LDMS nets, BaseNet default.

``convert_tree`` detects the format and returns flax-layout
``{"kind", "params", "batch_stats"}`` trees matching the rpst model param
names (see tests/reference_oracle.py for the forward mappings this
inverts).  CLI writes a pickle consumed by ``tools/golden_parity.py``.

Usage: python tools/import_reference_checkpoint.py ckpt.pth out.pkl
"""

import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(sd, pre):
    """torch Conv2d ``{pre}.weight/bias`` (OIHW) -> flax {'kernel' HWIO}."""
    out = {"kernel": np.transpose(_np(sd[f"{pre}.weight"]), (2, 3, 1, 0))}
    if f"{pre}.bias" in sd:
        out["bias"] = _np(sd[f"{pre}.bias"])
    return out


def _padconv(sd, pre):
    return {"Conv_0": _conv(sd, pre)}


def _dense(sd, pre):
    out = {"kernel": _np(sd[f"{pre}.weight"]).T}
    if f"{pre}.bias" in sd:
        out["bias"] = _np(sd[f"{pre}.bias"])
    return out


def _bn(sd, pre):
    params = {"scale": _np(sd[f"{pre}.weight"]),
              "bias": _np(sd[f"{pre}.bias"])}
    stats = {"mean": _np(sd[f"{pre}.running_mean"]),
             "var": _np(sd[f"{pre}.running_var"])}
    return params, stats


def _sebottleneck(sd, pre):
    """reference SEBottleneck (attention.py:25-66) -> rpst SEBottleneck."""
    params, stats = {}, {}
    for c in ("conv1", "conv2", "conv3"):
        params[c] = _conv(sd, f"{pre}.{c}")
    for b in ("bn1", "bn2", "bn3"):
        params[b], stats[b] = _bn(sd, f"{pre}.{b}")
    params["SELayer_0"] = {"Dense_0": _dense(sd, f"{pre}.se.fc.0"),
                           "Dense_1": _dense(sd, f"{pre}.se.fc.2")}
    return params, stats


def _conv2dblock(sd, pre):
    """reference Conv2dBlock (base.py:114-198) -> rpst Conv2dBlock."""
    params = {"PadConv_0": _padconv(sd, f"{pre}.conv")}
    stats = {}
    j = 0
    while f"{pre}.inception.{j}.0.weight" in sd:
        params[f"inception_{j}"] = _conv(sd, f"{pre}.inception.{j}.0")
        j += 1
    if f"{pre}.attention_block.conv1.weight" in sd:
        params["SEBottleneck_0"], stats["SEBottleneck_0"] = \
            _sebottleneck(sd, f"{pre}.attention_block")
    return params, stats


def _stack_to_rpstack(sd):
    """ModuleList of Conv2dBlock (rp_constant/deeper_conv_blocks) ->
    rpst RPStack (block_0..block_{n-1}) params + batch_stats."""
    params, stats = {}, {}
    idxs = sorted({int(k.split(".")[0]) for k in sd if "." in k})
    for i in idxs:
        p, s = _conv2dblock(sd, str(i))
        params[f"block_{i}"] = p
        if s:
            stats[f"block_{i}"] = s
    return params, stats


def _seq_to_rpseq(sd):
    """torch Sequential(Conv2d, ReLU, ...) state dict -> RPSequence params."""
    params = {}
    conv_idxs = sorted({int(k.split(".")[0]) for k in sd
                        if k.endswith(".weight")})
    for i, idx in enumerate(conv_idxs):
        params[f"conv_{i}"] = {"Conv_0": _conv(sd, str(idx))}
    return params


def _mirror_decoder(sd):
    """reference VGG-mirror decoder Sequential (base.py:25-55) ->
    rpst VGGMirrorDecoder (conv0..conv8)."""
    conv_idxs = sorted({int(k.split(".")[0]) for k in sd
                        if k.endswith(".weight")})
    assert len(conv_idxs) == 9, f"expected 9 decoder convs, got {conv_idxs}"
    return {f"conv{i}": _padconv(sd, str(idx))
            for i, idx in enumerate(conv_idxs)}


def _sanet_attention(sd, pre):
    out = {n: _conv(sd, f"{pre}.{n}") for n in ("f", "g", "h", "out_conv")}
    if f"{pre}.attention_layer.f_psi.0.weight" in sd:  # AdaptiveSANet AEA
        out["aea"] = {"psi0": _dense(sd, f"{pre}.attention_layer.f_psi.0"),
                      "psi1": _dense(sd, f"{pre}.attention_layer.f_psi.2")}
    return out


def _transform(sd):
    """reference Transform/AdaptiveTransform (sanet.py:140-160)."""
    return {"sanet4_1": _sanet_attention(sd, "sanet4_1"),
            "sanet5_1": _sanet_attention(sd, "sanet5_1"),
            "merge_conv": _padconv(sd, "merge_conv")}


def convert_tree(ckpt):
    """Detect a reference checkpoint's format and convert to flax trees.

    Returns {"kind": 'rpseq'|'rpstack'|'sanet', "params": tree,
    "batch_stats": tree-or-{}} where params keys match the rpst model:
    rpseq -> encoder/decoder (adain, wct); rpstack ->
    rp_shared_encoder/rp_decoder (multi_adain family); sanet ->
    transform/decoder (SAModel).  Raises ValueError on raw state dicts
    (LD family — no per-module split to key off)."""
    if isinstance(ckpt, dict) and "encoder" in ckpt and "decoder" in ckpt:
        enc = {k: _np(v) for k, v in ckpt["encoder"].items()}
        dec = {k: _np(v) for k, v in ckpt["decoder"].items()}
        if any(".conv." in k for k in enc):
            ep, es = _stack_to_rpstack(enc)
            dp, ds = _stack_to_rpstack(dec)
            stats = {}
            if es:
                stats["rp_shared_encoder"] = es
            if ds:
                stats["rp_decoder"] = ds
            return {"kind": "rpstack",
                    "params": {"rp_shared_encoder": ep, "rp_decoder": dp},
                    "batch_stats": stats}
        return {"kind": "rpseq",
                "params": {"encoder": _seq_to_rpseq(enc),
                           "decoder": _seq_to_rpseq(dec)},
                "batch_stats": {}}
    if isinstance(ckpt, dict) and "decoder" in ckpt and "transform" in ckpt:
        dec = {k: _np(v) for k, v in ckpt["decoder"].items()}
        tr = {k: _np(v) for k, v in ckpt["transform"].items()}
        return {"kind": "sanet",
                "params": {"decoder": _mirror_decoder(dec),
                           "transform": _transform(tr)},
                "batch_stats": {}}
    raise ValueError(
        "unsupported checkpoint format: expected {'encoder','decoder'} or "
        "{'decoder','transform'}; raw state_dicts (LD family) need the "
        "model class to split modules — load them via torch and pass the "
        "per-module dicts")


def convert(src: str, dst: str) -> None:
    import torch
    tree = convert_tree(torch.load(src, map_location="cpu"))
    with open(dst, "wb") as f:
        pickle.dump(tree, f)
    print(f"wrote {dst} (kind={tree['kind']})")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
