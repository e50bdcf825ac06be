#!/usr/bin/env python
"""Export rpst parameter trees as reference (torch) checkpoints.

The inverse of ``tools/import_reference_checkpoint.py``: takes a trained
rpst checkpoint and writes a ``.pth`` in the exact format the reference
loads, so users can move BACK (or A/B in torch) after training here:

  * rpseq   (adain / wct)        -> ``{'encoder': sd, 'decoder': sd}``
    with ``nn.Sequential(Conv2d, ReLU)`` keys ``{2i}.weight`` (the
    reference's build_increase/decrease_depth_rp_blocks layout,
    base.py:363-396; load path adain_rp.py:103-108 / wct_rp.py:150-155);
  * rpstack (multi_adain family) -> ``{'encoder': sd, 'decoder': sd}``
    with ModuleList-of-Conv2dBlock keys ``{i}.conv.weight`` (+ optional
    ``{i}.inception.{j}.0.*`` and ``{i}.attention_block.*`` SE state,
    base.py:114-198, 231-286);
  * sanet   (SAModel)            -> ``{'decoder': sd, 'transform': sd}``
    with the VGG-mirror decoder's Sequential conv indices
    (1,5,8,...,28 — base.py:25-55) and Transform's
    sanet4_1/sanet5_1/merge_conv modules (sanet.py:140-160, AEA
    ``attention_layer.f_psi.{0,2}`` for the adaptive variant).

Kernels convert flax HWIO -> torch OIHW; dense kernels transpose.
Roundtrip equality vs the import tool is tested in
tests/test_parity_torch.py.

Usage:
  python tools/export_reference_checkpoint.py --config cfg.yaml \
      --checkpoint out/checkpoints/10000 dst.pth
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np

# reference decoder Sequential (base.py:25-55): conv positions among the
# pad/relu/upsample layers
_MIRROR_DECODER_IDXS = (1, 5, 8, 11, 14, 18, 21, 25, 28)


def _np(x):
    return np.asarray(x, np.float32)


def _conv_out(sd, pre, p):
    """flax {'kernel' HWIO, 'bias'} -> torch ``{pre}.weight`` OIHW."""
    sd[f"{pre}.weight"] = np.ascontiguousarray(
        np.transpose(_np(p["kernel"]), (3, 2, 0, 1)))
    if "bias" in p:
        sd[f"{pre}.bias"] = _np(p["bias"])


def _dense_out(sd, pre, p):
    sd[f"{pre}.weight"] = np.ascontiguousarray(_np(p["kernel"]).T)
    if "bias" in p:
        sd[f"{pre}.bias"] = _np(p["bias"])


def _bn_out(sd, pre, p, stats):
    sd[f"{pre}.weight"] = _np(p["scale"])
    sd[f"{pre}.bias"] = _np(p["bias"])
    sd[f"{pre}.running_mean"] = _np(stats["mean"])
    sd[f"{pre}.running_var"] = _np(stats["var"])
    sd[f"{pre}.num_batches_tracked"] = np.asarray(0, np.int64)


def _sebottleneck_out(sd, pre, p, stats):
    if not stats:
        raise ValueError(
            f"batch_stats required to export SE-bottleneck '{pre}' (the "
            "reference checkpoint carries BN running_mean/var) — pass the "
            "checkpoint's batch_stats tree to export_tree")
    for c in ("conv1", "conv2", "conv3"):
        _conv_out(sd, f"{pre}.{c}", p[c])
    for b in ("bn1", "bn2", "bn3"):
        _bn_out(sd, f"{pre}.{b}", p[b], stats[b])
    _dense_out(sd, f"{pre}.se.fc.0", p["SELayer_0"]["Dense_0"])
    _dense_out(sd, f"{pre}.se.fc.2", p["SELayer_0"]["Dense_1"])


def _conv2dblock_out(sd, pre, p, stats):
    _conv_out(sd, f"{pre}.conv", p["PadConv_0"]["Conv_0"])
    j = 0
    while f"inception_{j}" in p:
        _conv_out(sd, f"{pre}.inception.{j}.0", p[f"inception_{j}"])
        j += 1
    if "SEBottleneck_0" in p:
        _sebottleneck_out(sd, f"{pre}.attention_block",
                          p["SEBottleneck_0"],
                          (stats or {}).get("SEBottleneck_0", {}))


def _rpstack_out(p, stats):
    sd: dict = {}
    i = 0
    while f"block_{i}" in p:
        _conv2dblock_out(sd, str(i), p[f"block_{i}"],
                         (stats or {}).get(f"block_{i}"))
        i += 1
    return sd


def _rpseq_out(p):
    """RPSequence conv_0..conv_{n-1} -> Sequential(Conv2d, ReLU) keys
    ``{2i}.weight`` (base.py:363-396 appends a ReLU after every conv)."""
    sd: dict = {}
    i = 0
    while f"conv_{i}" in p:
        _conv_out(sd, str(2 * i), p[f"conv_{i}"]["Conv_0"])
        i += 1
    return sd


def _mirror_decoder_out(p):
    sd: dict = {}
    for i, idx in enumerate(_MIRROR_DECODER_IDXS):
        _conv_out(sd, str(idx), p[f"conv{i}"]["Conv_0"])
    return sd


def _sanet_attention_out(sd, pre, p):
    for n in ("f", "g", "h", "out_conv"):
        _conv_out(sd, f"{pre}.{n}", p[n])
    if "aea" in p:
        _dense_out(sd, f"{pre}.attention_layer.f_psi.0", p["aea"]["psi0"])
        _dense_out(sd, f"{pre}.attention_layer.f_psi.2", p["aea"]["psi1"])


def _transform_out(p):
    sd: dict = {}
    _sanet_attention_out(sd, "sanet4_1", p["sanet4_1"])
    _sanet_attention_out(sd, "sanet5_1", p["sanet5_1"])
    _conv_out(sd, "merge_conv", p["merge_conv"]["Conv_0"])
    return sd


def export_tree(params, batch_stats=None) -> dict:
    """rpst params (+ optional batch_stats) -> reference checkpoint dict
    of numpy arrays (caller torch-ifies).  Format detected from the tree:
    encoder/decoder (rpseq), rp_shared_encoder/rp_decoder (rpstack),
    transform/decoder (sanet)."""
    bs = batch_stats or {}
    if "rp_shared_encoder" in params:
        return {"encoder": _rpstack_out(params["rp_shared_encoder"],
                                        bs.get("rp_shared_encoder")),
                "decoder": _rpstack_out(params["rp_decoder"],
                                        bs.get("rp_decoder"))}
    if "transform" in params:
        return {"decoder": _mirror_decoder_out(params["decoder"]),
                "transform": _transform_out(params["transform"])}
    if "encoder" in params:
        return {"encoder": _rpseq_out(params["encoder"]),
                "decoder": _rpseq_out(params["decoder"])}
    raise ValueError(
        f"unsupported param tree (top keys {sorted(params)}): expected "
        "encoder/decoder, rp_shared_encoder/rp_decoder, or "
        "transform/decoder — LD/mrf/spade save raw state dicts upstream "
        "with no stable per-module split to target")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir written by train.py")
    ap.add_argument("dst", help="output .pth path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.nn.vgg import init_vgg_params
    from rpst.train import create_train_state, restore_checkpoint

    cfg = load_config(args.config)
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    state, _ = create_train_state(bundle, rng, sample, sample, vgg_vars)
    state = restore_checkpoint(args.checkpoint, state)

    params = jax.device_get(state.params)
    stats = jax.device_get(state.extra).get("batch_stats")
    out = export_tree(params, stats)
    torch.save({k: {kk: torch.from_numpy(np.ascontiguousarray(vv))
                    for kk, vv in sd.items()}
                for k, sd in out.items()}, args.dst)
    print(f"wrote {args.dst} ({', '.join(sorted(out))})")


if __name__ == "__main__":
    main()
