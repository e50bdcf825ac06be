"""Load the actual upstream reference (/root/reference, read-only) as a
CPU torch oracle for whole-model parity tests.

The reference assumes a CUDA box with 2021-era deps; to execute it
unmodified on this CPU-only container we shim:
  * ``numpy.lib.arraypad`` — removed in numpy 2.x (base.py:2 imports it);
  * ``torchvision`` — not installed; only touched at import time
    (base.py:11,15; adain_rp.py:12) and in never-called visualizers;
  * ``maxflow.fastmin.aexpansion_grid`` — PyMaxflow is not installed; the
    reference always constructs MST with lam=0 (adain_rp.py:434), where
    alpha-expansion reduces exactly to per-node argmin of the data term
    (zero pairwise cost), which is what the shim computes;
  * ``Tensor.cuda`` / ``Module.cuda`` — identity (the reference hardcodes
    .cuda() in CCAMDec and cal_affinity_map; SURVEY §2.3).

Everything else (model classes, decode loops, losses, the vgg/decoder
architectures) runs as committed upstream.  Weight-injection helpers copy
flax param trees into the torch modules so both frameworks compute with
IDENTICAL weights — the strongest form of the <1e-2 mean-abs-pixel-error
parity target (BASELINE.md).
"""

from __future__ import annotations

import copy
import sys
import types

import numpy as np
import torch
import torch.nn as tnn

_REFERENCE_PATH = "/root/reference"
_network = None


def load_reference():
    """Import (once) and return the reference ``network`` package."""
    global _network
    if _network is not None:
        return _network

    if "numpy.lib.arraypad" not in sys.modules:
        ap = types.ModuleType("numpy.lib.arraypad")
        ap.pad = np.pad
        sys.modules["numpy.lib.arraypad"] = ap
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace(inception=None)
        tv.transforms = types.SimpleNamespace(ToPILImage=None)
        sys.modules["torchvision"] = tv
    if "maxflow" not in sys.modules:
        mf = types.ModuleType("maxflow")
        fastmin = types.ModuleType("maxflow.fastmin")

        def aexpansion_grid(D, V, max_cycles=None):
            assert np.all(V == 0), "shim is exact only for lam=0 (argmin)"
            return np.argmin(D, axis=-1)

        fastmin.aexpansion_grid = aexpansion_grid
        mf.fastmin = fastmin
        sys.modules["maxflow"] = mf
        sys.modules["maxflow.fastmin"] = fastmin

    import matplotlib

    matplotlib.use("Agg")
    torch.Tensor.cuda = lambda self, *a, **k: self
    tnn.Module.cuda = lambda self, *a, **k: self

    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    import network  # noqa: F401  (the reference package)

    _network = network
    return network


def fresh_vgg():
    """A fresh copy of the reference vgg_normalised architecture
    (base.py:57-111); the module-level instance is shared, so copy."""
    return copy.deepcopy(load_reference().base.vgg)


def fresh_mirror_decoder():
    return copy.deepcopy(load_reference().base.decoder)


# ---------------------------------------------------------------------------
# tensor layout converters
# ---------------------------------------------------------------------------

def to_torch(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)).copy())


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# weight injectors: flax param subtree -> torch module (in place)
# ---------------------------------------------------------------------------

def _np(x):
    return np.asarray(x)


def inject_conv(tconv: tnn.Conv2d, p) -> None:
    """flax HWIO conv params -> torch OIHW Conv2d."""
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(
            np.transpose(_np(p["kernel"]), (3, 2, 0, 1)).copy()))
        if tconv.bias is not None:
            tconv.bias.copy_(torch.from_numpy(_np(p["bias"]).copy()))


def inject_padconv(tconv: tnn.Conv2d, p) -> None:
    """rpst PadConv subtree ({'Conv_0': ...}) -> torch Conv2d."""
    inject_conv(tconv, p["Conv_0"])


def inject_convtranspose(tct: tnn.ConvTranspose2d, p) -> None:
    """flax ConvTranspose (HWIO, un-flipped taps) -> torch ConvTranspose2d
    (IOHW, flipped taps): flip both spatial dims, permute to (in,out,kh,kw)."""
    with torch.no_grad():
        k = _np(p["kernel"])[::-1, ::-1]  # (kh, kw, in, out) spatially flipped
        tct.weight.copy_(torch.from_numpy(np.transpose(k, (2, 3, 0, 1)).copy()))
        if tct.bias is not None:
            tct.bias.copy_(torch.from_numpy(_np(p["bias"]).copy()))


def inject_dense(tlin: tnn.Linear, p) -> None:
    with torch.no_grad():
        tlin.weight.copy_(torch.from_numpy(_np(p["kernel"]).T.copy()))
        if tlin.bias is not None and "bias" in p:
            tlin.bias.copy_(torch.from_numpy(_np(p["bias"]).copy()))


def inject_bn(tbn: tnn.BatchNorm2d, p, stats) -> None:
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(_np(p["scale"]).copy()))
        tbn.bias.copy_(torch.from_numpy(_np(p["bias"]).copy()))
        tbn.running_mean.copy_(torch.from_numpy(_np(stats["mean"]).copy()))
        tbn.running_var.copy_(torch.from_numpy(_np(stats["var"]).copy()))


def inject_rpseq(tseq, p) -> None:
    """rpst RPSequence (conv_0..conv_{n-1}) -> torch Sequential of
    [Conv2d, ReLU] pairs (build_increase/decrease_depth_rp_blocks)."""
    convs = [m for m in tseq if isinstance(m, tnn.Conv2d)]
    for i, conv in enumerate(convs):
        inject_padconv(conv, p[f"conv_{i}"])


def inject_selayer(tse, p) -> None:
    """rpst SELayer (Dense_0/Dense_1, no bias) -> torch SELayer.fc[0/2]."""
    inject_dense(tse.fc[0], p["Dense_0"])
    inject_dense(tse.fc[2], p["Dense_1"])


def inject_sebottleneck(tsb, p, stats) -> None:
    inject_conv(tsb.conv1, p["conv1"])
    inject_conv(tsb.conv2, p["conv2"])
    inject_conv(tsb.conv3, p["conv3"])
    inject_bn(tsb.bn1, p["bn1"], stats["bn1"])
    inject_bn(tsb.bn2, p["bn2"], stats["bn2"])
    inject_bn(tsb.bn3, p["bn3"], stats["bn3"])
    inject_selayer(tsb.se, p["SELayer_0"])


def inject_conv2dblock(tblock, p, stats=None) -> None:
    """rpst Conv2dBlock subtree -> reference Conv2dBlock (base.py:114-198)."""
    inject_padconv(tblock.conv, p["PadConv_0"])
    if tblock.inception is not None:
        for i, seq in enumerate(tblock.inception):
            inject_conv(seq[0], p[f"inception_{i}"])
    if tblock.attention_block is not None:
        inject_sebottleneck(tblock.attention_block, p["SEBottleneck_0"],
                            (stats or {}).get("SEBottleneck_0"))


def inject_rpstack(tblocks, p, stats=None) -> None:
    """rpst RPStack (block_0..block_{n-1}) -> reference ModuleList of
    Conv2dBlocks (rp_constant/deeper/shallower_conv_blocks)."""
    for i, tb in enumerate(tblocks):
        inject_conv2dblock(tb, p[f"block_{i}"],
                           (stats or {}).get(f"block_{i}"))


def inject_vgg(tvgg, vgg_params, num_stages: int = 4) -> None:
    """rpst VGG19Encoder params -> reference vgg Sequential."""
    from rpst.nn.vgg import _STAGES, _TORCH_CONV_INDICES
    n_convs = 2 + sum(len(_STAGES[s]) for s in range(1, num_stages))
    for i in range(n_convs):
        inject_padconv(tvgg[_TORCH_CONV_INDICES[i]], vgg_params[f"conv_{i}"])


def inject_mirror_decoder(tdec, p) -> None:
    """rpst VGGMirrorDecoder (conv0..conv8) -> reference decoder Sequential
    (base.py:25-55 / sanet.py:162-192)."""
    convs = [m for m in tdec if isinstance(m, tnn.Conv2d)]
    assert len(convs) == 9
    for i, conv in enumerate(convs):
        inject_padconv(conv, p[f"conv{i}"])


def inject_sanet_attention(tsa, p) -> None:
    """rpst SANetAttention / AdaptiveSANetAttention convs -> reference
    SANet/AdaptiveSANet 1x1 convs (sanet.py:73-138)."""
    inject_conv(tsa.f, p["f"])
    inject_conv(tsa.g, p["g"])
    inject_conv(tsa.h, p["h"])
    inject_conv(tsa.out_conv, p["out_conv"])
    if hasattr(tsa, "attention_layer"):
        aea = p["aea"]
        inject_dense(tsa.attention_layer.f_psi[0], aea["psi0"])
        inject_dense(tsa.attention_layer.f_psi[2], aea["psi1"])


def inject_transform(ttr, p) -> None:
    inject_sanet_attention(ttr.sanet4_1, p["sanet4_1"])
    inject_sanet_attention(ttr.sanet5_1, p["sanet5_1"])
    inject_padconv(ttr.merge_conv, p["merge_conv"])


def inject_spade(tsp, p) -> None:
    inject_conv(tsp.mlp_shared[0], p["mlp_shared"])
    inject_conv(tsp.mlp_gamma, p["mlp_gamma"])
    inject_conv(tsp.mlp_beta, p["mlp_beta"])


def inject_spade_resblock(trb, p) -> None:
    inject_conv(trb.conv_0, p["conv_0"])
    inject_conv(trb.conv_1, p["conv_1"])
    inject_spade(trb.norm_0, p["norm_0"])
    inject_spade(trb.norm_1, p["norm_1"])
    if trb.learned_shortcut:
        inject_conv(trb.conv_s, p["conv_s"])
        inject_spade(trb.norm_s, p["norm_s"])


def inject_spade_decoder(tdec, p) -> None:
    for name in ("head", "rp_middle_0", "rp_middle_1", "d1", "d2", "d3", "d4"):
        inject_spade_resblock(getattr(tdec, name), p[name])
    inject_conv(tdec.conv_img, p["conv_img"])


def inject_ld_encoders(tnet, params, stats, variant: int, layer_num: int) -> None:
    """rpst LDAdaINRP branch params -> reference LDMSAdaINRPNet{,2..5}."""
    for i in range(layer_num):
        small = getattr(tnet, f"rp_enc{i}_small_revf")
        big = getattr(tnet, f"rp_enc{i}_big_revf")
        inject_conv2dblock(small, params[f"rp_enc{i}_small_revf"],
                           stats.get(f"rp_enc{i}_small_revf"))
        bp = params[f"rp_enc{i}_big_revf"]
        if variant == 1:
            inject_conv2dblock(big, bp, stats.get(f"rp_enc{i}_big_revf"))
        else:
            # Sequential: [Conv1x1, Pad, Conv3x3, ReLU, Pad, Conv3x3, ReLU,
            # MaxPool (, Pad)] — convs at 0, 2, 5
            inject_conv(big[0], bp["conv1x1"])
            inject_padconv(big[2], bp["conv_a"])
            inject_padconv(big[5], bp["conv_b"])
    for i in range(layer_num):
        inject_conv2dblock(getattr(tnet, f"rp_dec{i}"), params[f"rp_dec{i}"],
                           stats.get(f"rp_dec{i}"))
    if variant == 5:
        for i in range(layer_num):
            inject_convtranspose(tnet.ups[i], params[f"up_{i}"])
