"""Folded (space-to-depth) inference fast path for the flagship model.

``stylize_multi_adain_folded`` runs MultiScaleAdaINRP (constant stack, no
attention/inception — the benchmark flagship) entirely in the folded
(H/2, W/2, 4C) domain using the exact transformations in
``rpst.ops.folded``: fold once at the input, every conv/pad/AdaIN/lrelu in
folded space, unfold once at the output.  Consumes the SAME parameter
pytree as the standard model — it is an execution strategy, not a
different model — and is validated equal to the standard path in
``tests/test_folded.py``.

Motivation (measured, see BASELINE.md): at hidden_dim=32 the standard
NHWC path is HBM-bound with 4x lane padding; folding fills the 128-wide
lanes and roughly quarters the memory traffic at the cost of 4x MACs —
a large net win for a bandwidth-bound model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.folded import (fold, fold_bias, fold_conv1x1_kernel,
                          fold_conv_kernel, folded_adain,
                          folded_channel_affine, folded_channel_pool,
                          folded_conv, folded_zero_conv, unfold)
from ..ops.pallas.folded_conv import folded_conv_lrelu


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _conv_lrelu(x, k, b, use_pallas):
    """One folded conv + bias + lrelu layer.

    The fused Pallas kernel (pad ring built in VMEM, one HBM read + one
    write per layer) requires the folded channel count to fill whole
    128-wide lane tiles; other widths fall back to the XLA ring path.
    The Pallas branch is differentiable — ``folded_conv_lrelu`` carries a
    custom VJP running the backward Pallas kernel pair (input-grad via
    rotated-kernel conv + ring transpose; weight-grad via folded
    correlation), hardware-verified in tools/hw_kernel_check.py.
    ``use_pallas='auto'`` picks the measured winner: the fused kernel at
    batch <= 4 (512px b1: 243 vs 203 img/s; b4 — hw_b4_pallas_ab.py
    2026-08-19 — multi_adain 312 vs 248, sel 291 vs 118, ccam 263 vs
    101: the XLA arm has a deep N=4 layout pathology) and at high
    resolution (1024px b4: 87.5 vs 25.8 img/s — the XLA ring pad copies
    degrade with width); XLA's pipelined conv on the ring-padded copy
    only wins for large batches of ≤512px images (b8: multi_adain 478
    vs 369, sel 400 vs 324, ccam 299 vs 291)."""
    if use_pallas == "auto":
        from ..ops.engine import gspmd_devices
        from ..policy import (FOLDED_PALLAS_MAX_BATCH,
                              FOLDED_PALLAS_MIN_HIRES_H)
        # x is folded: width x.shape[2] == original H/2.  Never auto-pick
        # Mosaic inside a >1-device GSPMD trace (no SPMD partitioning
        # rule); explicit use_pallas=True callers run inside shard_map
        # where per-shard Pallas is deliberate.
        use_pallas = (gspmd_devices() <= 1
                      and (x.shape[0] <= FOLDED_PALLAS_MAX_BATCH
                           or x.shape[2] >= FOLDED_PALLAS_MIN_HIRES_H // 2))
    if (use_pallas and k.shape[2] % 128 == 0 and k.shape[3] % 128 == 0
            and jax.default_backend() != "cpu"):
        return folded_conv_lrelu(x, k, b)
    return _lrelu(folded_conv(x, k, b))


def _folded_blocks(tree):
    """[(folded_kernel, folded_bias)] from an RPStack param subtree."""
    out = []
    i = 0
    while f"block_{i}" in tree:
        conv = tree[f"block_{i}"]["PadConv_0"]["Conv_0"]
        out.append((fold_conv_kernel(conv["kernel"]),
                    fold_bias(conv["bias"])))
        i += 1
    return out


def stylize_multi_adain_folded(params, content, style,
                               dtype=jnp.bfloat16,
                               use_pallas="auto",
                               batch_encode="auto") -> jnp.ndarray:
    """Folded-domain equivalent of MultiScaleAdaINRP.__call__ (constant
    stack): encode both images keeping all intermediates, AdaIN at the
    deepest scale, then per-scale residual re-fusion through the decoder
    (semantics of reference adain_rp.py:187-191, 286-302).

    ``use_pallas=True`` runs every lane-filling layer through the fused
    reflect-pad+conv+lrelu Pallas kernel (one HBM read + one write per
    layer); boundary layers (3↔hidden channels) use the XLA ring path.

    ``batch_encode`` concatenates content+style into ONE 2N encoder pass
    (exact — shared encoder). Measured: on the differentiable XLA path at
    small batch, XLA compiles the 2N-shaped convs much better (512px
    training b4: 25.7 → 36.2 img/s); the Pallas inference path is faster
    unbatched (b1 233 vs 220 img/s), so 'auto' batches only for
    use_pallas=False and N <= 4."""
    enc = _folded_blocks(params["rp_shared_encoder"])
    dec = _folded_blocks(params["rp_decoder"])

    def encode(img):
        x = fold(img.astype(dtype))
        feats = []
        for k, b in enc:
            x = _conv_lrelu(x, k.astype(dtype), b.astype(dtype), use_pallas)
            feats.append(x)
        return feats

    if batch_encode == "auto":
        batch_encode = use_pallas is False and content.shape[0] <= 4
    if batch_encode:
        n = content.shape[0]
        feats = encode(jnp.concatenate([content, style], axis=0))
        c_feats = [f[:n] for f in feats]
        s_feats = [f[n:] for f in feats]
    else:
        c_feats = encode(content)
        s_feats = encode(style)

    stylized = folded_adain(c_feats[-1], s_feats[-1])
    k, b = dec[0]
    stylized = _conv_lrelu(stylized, k.astype(dtype), b.astype(dtype),
                           use_pallas)
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (cf, sf) in enumerate(pairs):
        fusion = folded_adain(cf, sf)
        k, b = dec[i + 1]
        stylized = _conv_lrelu(stylized + fusion, k.astype(dtype),
                               b.astype(dtype), use_pallas)
    return unfold(stylized).astype(content.dtype)


# ---------------------------------------------------------------------------
# sel_multi_adain / ccam folded inference
# ---------------------------------------------------------------------------

def _folded_bn_affine(params, stats, eps=1e-5):
    """Eval-mode BatchNorm (running stats) as a per-channel affine."""
    inv = 1.0 / jnp.sqrt(stats["var"] + eps)
    scale = params["scale"] * inv
    shift = params["bias"] - stats["mean"] * scale
    return scale, shift


def _folded_bn_train(x_f, params, stats, momentum=0.9, eps=1e-5):
    """Train-mode BatchNorm on a folded tensor: batch statistics reduce
    exactly over (N, Hf, Wf, sub-position) per original channel (flax's
    fast-variance form: E[x²] − E[x]²), running stats updated with the
    same momentum. Returns (y_f, new_stats)."""
    n, hh, ww, c4 = x_f.shape
    c = c4 // 4
    v = x_f.astype(jnp.float32).reshape(n, hh * ww, 4, c)
    mean = jnp.mean(v, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(v), axis=(0, 1, 2)) - jnp.square(mean)
    scale = params["scale"].astype(jnp.float32) / jnp.sqrt(var + eps)
    shift = params["bias"].astype(jnp.float32) - mean * scale
    y = folded_channel_affine(x_f, scale.astype(x_f.dtype),
                              shift.astype(x_f.dtype))
    new_stats = {
        "mean": momentum * stats["mean"] + (1 - momentum) * mean,
        "var": momentum * stats["var"] + (1 - momentum) * var,
    }
    return y, new_stats


def _folded_se_bottleneck(x_f, params, stats, dtype):
    """SEBottleneck (nn/attention.py:53-82) in the folded domain, eval
    mode: conv1x1/conv3x3-zero-pad fold exactly (block-diagonal / folded
    kernels), BatchNorm running stats apply as tiled channel affines, and
    the SE global pool is the exact mean over (Hf, Wf, sub-position)."""
    f32 = jnp.float32
    residual = x_f
    k1 = fold_conv1x1_kernel(params["conv1"]["kernel"]).astype(dtype)
    s, b = _folded_bn_affine(params["bn1"], stats["bn1"])
    out = jax.nn.relu(folded_channel_affine(
        folded_zero_conv(x_f, k1), s.astype(dtype), b.astype(dtype)))
    k2 = fold_conv_kernel(params["conv2"]["kernel"]).astype(dtype)
    s, b = _folded_bn_affine(params["bn2"], stats["bn2"])
    out = jax.nn.relu(folded_channel_affine(
        folded_zero_conv(out, k2), s.astype(dtype), b.astype(dtype)))
    k3 = fold_conv1x1_kernel(params["conv3"]["kernel"]).astype(dtype)
    s, b = _folded_bn_affine(params["bn3"], stats["bn3"])
    out = folded_channel_affine(folded_zero_conv(out, k3),
                                s.astype(dtype), b.astype(dtype))
    # SELayer: global pool -> fc -> relu -> fc -> sigmoid -> channel scale
    se = params["SELayer_0"]
    y = folded_channel_pool(out).astype(f32)
    y = jax.nn.relu(y @ se["Dense_0"]["kernel"].astype(f32))
    y = jax.nn.sigmoid(y @ se["Dense_1"]["kernel"].astype(f32))
    out = folded_channel_affine(out, y.astype(dtype))
    return jax.nn.relu(out + residual)


def _folded_se_bottleneck_train(x_f, params, stats, dtype):
    """Train-mode SEBottleneck (batch-stat BatchNorm) in the folded
    domain; returns (y_f, new_batch_stats) mirroring flax's mutable
    ``batch_stats`` collection layout."""
    f32 = jnp.float32
    residual = x_f
    new_stats = {}
    k1 = fold_conv1x1_kernel(params["conv1"]["kernel"]).astype(dtype)
    out, new_stats["bn1"] = _folded_bn_train(
        folded_zero_conv(x_f, k1), params["bn1"], stats["bn1"])
    out = jax.nn.relu(out)
    k2 = fold_conv_kernel(params["conv2"]["kernel"]).astype(dtype)
    out, new_stats["bn2"] = _folded_bn_train(
        folded_zero_conv(out, k2), params["bn2"], stats["bn2"])
    out = jax.nn.relu(out)
    k3 = fold_conv1x1_kernel(params["conv3"]["kernel"]).astype(dtype)
    out, new_stats["bn3"] = _folded_bn_train(
        folded_zero_conv(out, k3), params["bn3"], stats["bn3"])
    se = params["SELayer_0"]
    y = folded_channel_pool(out).astype(f32)
    y = jax.nn.relu(y @ se["Dense_0"]["kernel"].astype(f32))
    y = jax.nn.sigmoid(y @ se["Dense_1"]["kernel"].astype(f32))
    out = folded_channel_affine(out, y.astype(out.dtype))
    return jax.nn.relu(out + residual), new_stats


def stylize_sel_multi_adain_folded_train(variables, content, style,
                                         dtype=jnp.bfloat16,
                                         use_pallas=False):
    """Differentiable train-mode SELastRP forward in the folded domain
    (``use_pallas`` routes the convs through the fused kernels' custom
    VJP — the same backward Pallas pair as the flagship's folded
    training). Returns (stylized, muts) where muts is the updated
    ``batch_stats`` collection."""
    params = variables["params"]
    stats = variables["batch_stats"]["attention_block"]
    c_feats, s_feats, dec = _encode_folded(params["ms"], content, style,
                                           dtype, use_pallas=use_pallas)
    stylized = folded_adain(c_feats[-1], s_feats[-1])
    k, b = dec[0]
    stylized = _conv_lrelu(stylized, k.astype(dtype), b.astype(dtype),
                           use_pallas)
    new_stats = None
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (_, sf) in enumerate(pairs):
        stylized = folded_adain(stylized, sf)
        if i == len(pairs) - 1:
            stylized, new_stats = _folded_se_bottleneck_train(
                stylized, params["attention_block"], stats, dtype)
        k, b = dec[i + 1]
        stylized = _conv_lrelu(stylized, k.astype(dtype), b.astype(dtype),
                               use_pallas)
    muts = {"batch_stats": {"attention_block": new_stats}}
    return unfold(stylized).astype(content.dtype), muts


def stylize_mst_folded(variables, content, style, stylized_layers: int = 1,
                       n_clusters: int = 3, mst_lambda: float = 0.0,
                       dtype=jnp.bfloat16, use_pallas="auto") -> jnp.ndarray:
    """Folded-domain MSTRP (adain_rp.py:425-448 semantics).

    The k-means/graph-cut transform is chain-order-sensitive, so the
    fused features are unfolded to raster order just for the transform
    (one deepest-scale tensor round trip) and refolded; everything else
    — the 2x encode and the decoder stack — runs folded. Differentiable
    (the transform detaches its inputs like the reference, so gradients
    reach only the decoder)."""
    from ..ops.mst import mst_transfer_batch

    params = variables["params"]
    c_feats, s_feats, dec = _encode_folded(params["ms"], content, style,
                                           dtype, use_pallas)

    def mst(cf_f, sf_f):
        out = mst_transfer_batch(
            jax.lax.stop_gradient(unfold(cf_f)),
            jax.lax.stop_gradient(unfold(sf_f)),
            n_clusters, mst_lambda)
        return fold(out.astype(dtype))

    stylized = mst(c_feats[-1], s_feats[-1])
    k, b = dec[0]
    stylized = _conv_lrelu(stylized, k.astype(dtype), b.astype(dtype),
                           use_pallas)
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (_, sf) in enumerate(pairs):
        if i + 1 < stylized_layers:
            stylized = mst(stylized, sf)
        k, b = dec[i + 1]
        stylized = _conv_lrelu(stylized, k.astype(dtype), b.astype(dtype),
                               use_pallas)
    return unfold(stylized).astype(content.dtype)


def _folded_ccam(x_f, y_f, scale):
    """CCAMDec (models/adain_rp.py:167-189) on folded tensors.

    The position sums split exactly over the 4 sub-position blocks, so
    ``energy[c, k] = Σ_s E4C[s·C+c, s·C+k]`` where ``E4C = x_fᵀ·y_f`` is
    the full folded-lane cross-product — ONE (4C, HW)·(HW, 4C) MXU
    matmul at full 128-lane width instead of the (C, P)·(P, C) einsum
    whose C=32-wide output runs the MXU at 1/4 lane utilization (the
    extra off-diagonal FLOPs are free: the stage is bandwidth-bound).
    The recombination is the same trick transposed: scattering
    ``attention`` onto a block-diagonal ``kron(I4, att)`` turns the
    per-sub-block (P, C)·(C, C) products into one full-width
    (HW, 4C)·(4C, 4C) matmul.  Inputs are detached exactly as the
    reference does — only ``scale`` receives gradient through the
    attention residual."""
    x_f = jax.lax.stop_gradient(x_f)
    y_f = jax.lax.stop_gradient(y_f)
    n, hh, ww, c4 = x_f.shape
    c = c4 // 4
    xr = x_f.reshape(n, hh * ww, c4)
    yr = y_f.reshape(n, hh * ww, c4)
    e4 = jnp.einsum("npa,npb->nab", xr, yr,
                    preferred_element_type=jnp.float32)  # (N, 4C, 4C)
    blocks = e4.reshape(n, 4, c, 4, c)
    energy = (blocks[:, 0, :, 0] + blocks[:, 1, :, 1]
              + blocks[:, 2, :, 2] + blocks[:, 3, :, 3])  # (N, C, C)
    energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
    attention = jax.nn.softmax(energy_new, axis=-1)
    att4 = jnp.einsum("st,nck->nsctk", jnp.eye(4, dtype=attention.dtype),
                      attention).reshape(n, c4, c4)  # kron(I4, att)
    out = jnp.einsum("npk,nck->npc", yr, att4.astype(yr.dtype))
    out = out.reshape(n, hh, ww, c4)
    return x_f + scale * out


def _encode_folded(params_ms, content, style, dtype, use_pallas):
    enc = _folded_blocks(params_ms["rp_shared_encoder"])
    dec = _folded_blocks(params_ms["rp_decoder"])

    def encode(img):
        x = fold(img.astype(dtype))
        feats = []
        for k, b in enc:
            x = _conv_lrelu(x, k.astype(dtype), b.astype(dtype), use_pallas)
            feats.append(x)
        return feats

    return encode(content), encode(style), dec


def stylize_sel_multi_adain_folded(variables, content, style,
                                   dtype=jnp.bfloat16,
                                   use_pallas="auto") -> jnp.ndarray:
    """Folded-domain SELastRP inference (adain_rp.py:451-481 semantics:
    running AdaIN re-fusion, SE bottleneck on the final fusion, no
    residual add). Eval mode only — BatchNorm uses running stats."""
    params = variables["params"]
    stats = variables.get("batch_stats", {}).get("attention_block", None)
    c_feats, s_feats, dec = _encode_folded(params["ms"], content, style,
                                           dtype, use_pallas)
    stylized = folded_adain(c_feats[-1], s_feats[-1])
    k, b = dec[0]
    stylized = _conv_lrelu(stylized, k.astype(dtype), b.astype(dtype),
                           use_pallas)
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (_, sf) in enumerate(pairs):
        stylized = folded_adain(stylized, sf)
        if i == len(pairs) - 1:
            stylized = _folded_se_bottleneck(
                stylized, params["attention_block"], stats, dtype)
        k, b = dec[i + 1]
        stylized = _conv_lrelu(stylized, k.astype(dtype), b.astype(dtype),
                               use_pallas)
    return unfold(stylized).astype(content.dtype)


def stylize_ccam_folded(variables, content, style, stylized_layers: int = 5,
                        dtype=jnp.bfloat16,
                        use_pallas="auto") -> jnp.ndarray:
    """Folded-domain CCAMRP inference (adain_rp.py:348-422 semantics:
    AdaIN fusion + cross-channel-attention residual before each decoder
    block, limited to ``stylized_layers`` scales)."""
    params = variables["params"]
    c_feats, s_feats, dec = _encode_folded(params["ms"], content, style,
                                           dtype, use_pallas)
    scale = lambda i: params[f"ccam_{i}"]["scale"].astype(dtype)
    stylized = folded_adain(c_feats[-1], s_feats[-1])
    att_res = _folded_ccam(c_feats[-1], s_feats[-1], scale(0))
    k, b = dec[0]
    stylized = _conv_lrelu(stylized + att_res, k.astype(dtype),
                           b.astype(dtype), use_pallas)
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (_, sf) in enumerate(pairs):
        k, b = dec[i + 1]
        if i + 1 < stylized_layers:
            stylized = folded_adain(stylized, sf)
            att_res = _folded_ccam(stylized, sf, scale(i + 1))
            stylized = _conv_lrelu(stylized + att_res, k.astype(dtype),
                                   b.astype(dtype), use_pallas)
        else:
            stylized = _conv_lrelu(stylized, k.astype(dtype),
                                   b.astype(dtype), use_pallas)
    return unfold(stylized).astype(content.dtype)
