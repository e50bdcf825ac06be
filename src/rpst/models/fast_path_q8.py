"""Int8 quantized folded serving path for the flagship model.

Post-training quantization (PTQ) of ``stylize_multi_adain_folded``:
weights int8 per output channel, activations int8 per tensor with static
scales from a calibration pass.  The 13 lane-filling convs run through the
int8 fused Pallas kernel (2x MXU rate on v5e, half the inter-layer HBM
bytes); AdaIN statistics, the boundary convs (3<->hidden channels), and
the residual fusions stay in bf16/f32 — statistics matching is the style
signal and must not be quantized.

Usage:
    scales = calibrate_multi_adain_q8(params, content_batch, style_batch)
    img = stylize_multi_adain_folded_q8(params, scales, content, style)

Quality: symmetric 8-bit conv I/O; tests gate PSNR vs the bf16 folded
path (>30 dB on random inputs).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.folded import fold, folded_adain, folded_conv, unfold
from ..ops.pallas.folded_conv_q8 import (fused_folded_conv_q8,
                                         quantize_activations,
                                         quantize_weights)
from .fast_path import _folded_blocks, _lrelu


def _q8_eligible(k) -> bool:
    return k.shape[2] % 128 == 0 and k.shape[3] % 128 == 0


def _forward_collect(params, content, style, dtype=jnp.bfloat16):
    """bf16 folded forward that also records the calibration observables,
    in exactly the order ``stylize_multi_adain_folded_q8`` consumes them:
    per encode — each encoder layer's output absmax (the chained int8
    out/in scales); then the absmax of every quantized decoder input."""
    enc = _folded_blocks(params["rp_shared_encoder"])
    dec = _folded_blocks(params["rp_decoder"])
    absmax: List[jnp.ndarray] = []

    def conv(x, k, b):
        y = folded_conv(x, k.astype(dtype), b.astype(dtype))
        return _lrelu(y)

    def encode(img):
        x = fold(img.astype(dtype))
        feats = []
        for li, (k, b) in enumerate(enc):
            x = conv(x, k, b)
            nxt_eligible = (li + 1 < len(enc)
                            and _q8_eligible(enc[li + 1][0]))
            if nxt_eligible or (li == len(enc) - 1 and _q8_eligible(k)):
                absmax.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
            feats.append(x)
        return feats

    c_feats = encode(content)
    s_feats = encode(style)
    stylized = folded_adain(c_feats[-1], s_feats[-1])
    k, b = dec[0]
    if _q8_eligible(k):
        absmax.append(jnp.max(jnp.abs(stylized.astype(jnp.float32))))
    stylized = conv(stylized, k, b)
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (cf, sf) in enumerate(pairs):
        fusion = folded_adain(cf, sf)
        k, b = dec[i + 1]
        x_in = stylized + fusion
        if _q8_eligible(k):
            absmax.append(jnp.max(jnp.abs(x_in.astype(jnp.float32))))
        stylized = conv(x_in, k, b)
    return unfold(stylized).astype(content.dtype), absmax


def calibrate_multi_adain_q8(params, content, style) -> Dict[str, np.ndarray]:
    """One calibration pass -> per-eligible-layer input scales (f32).

    Returns {'act_scales': (L,) array}. Feed representative 512px batches;
    scales are per-tensor symmetric (absmax / 127)."""
    absmax = jax.jit(
        lambda p, c, s: _forward_collect(p, c, s)[1])(params, content, style)
    scales = np.asarray([max(float(a), 1e-6) / 127.0 for a in absmax],
                        np.float32)
    return {"act_scales": scales}


def _folded_stats_q8(q, scale, eps: float = 1e-5):
    """folded_calc_mean_std on an int8 tensor with a per-tensor scale:
    mean/std are linear in the scale, so stats reduce over int8 directly
    (half the read bytes) and rescale once."""
    n, hh, ww, c4 = q.shape
    c = c4 // 4
    m = hh * ww * 4
    v = q.astype(jnp.float32).reshape(n, hh * ww, 4, c)
    s1 = jnp.sum(v, axis=(1, 2))
    s2 = jnp.sum(v * v, axis=(1, 2))
    mean = s1 / float(m) * scale
    var = (s2 / float(max(m - 1, 1))
           - s1 * s1 / (float(m) * float(max(m - 1, 1)))) * scale * scale
    std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
    mean4 = jnp.tile(mean, (1, 4))[:, None, None, :]
    std4 = jnp.tile(std, (1, 4))[:, None, None, :]
    return mean4, std4


def _stats_from_sums(s1, s2, m: int, eps: float = 1e-5):
    """(mean4, std4) from the conv kernel's fused per-image channel sums
    (s1/s2: (N, 4C) f32 over the folded lanes — combine the 4
    sub-position blocks per channel, unbiased variance)."""
    n, c4 = s1.shape
    c = c4 // 4
    s1c = jnp.sum(s1.reshape(n, 4, c), axis=1)
    s2c = jnp.sum(s2.reshape(n, 4, c), axis=1)
    mean = s1c / float(m)
    var = (s2c - s1c * s1c / float(m)) / float(max(m - 1, 1))
    std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
    mean4 = jnp.tile(mean, (1, 4))[:, None, None, :]
    std4 = jnp.tile(std, (1, 4))[:, None, None, :]
    return mean4, std4


def _adain_affine_q8(c_feat, s_feat, c_stats=None, s_stats=None):
    """AdaIN between (int8, scale) feature pairs -> float fusion tensor.
    The dequantize + affine chain is elementwise, so XLA fuses it into the
    consumer (the add + requantize before the next conv) — no extra HBM
    pass.  ``c_stats``/``s_stats`` take (mean4, std4) precomputed by the
    conv kernel's fused statistics (exact f32 sums harvested in the
    epilogue) and skip the int8 re-read reduction entirely."""
    (cq, cs), (sq, ss) = c_feat, s_feat
    cm, cstd = c_stats if c_stats is not None else _folded_stats_q8(cq, cs)
    sm, sstd = s_stats if s_stats is not None else _folded_stats_q8(sq, ss)
    return (cq.astype(jnp.float32) * cs - cm) / cstd * sstd + sm


def _make_conv_q(dtype, block_rows: int, interpret: bool):
    """Shared int8 conv closure: eligible conv on a pre-quantized input;
    int8 out when out_scale is given, dequantized ``dtype`` otherwise."""

    def conv_q(x_q, x_scale, k, b, out_scale=None, want_stats=False):
        w_q, w_scale = quantize_weights(k.astype(jnp.float32))
        srow0 = x_scale * w_scale
        srow1 = b.astype(jnp.float32)
        if out_scale is None:
            sc = jnp.stack([srow0, srow1, jnp.zeros_like(srow0)])
            out = fused_folded_conv_q8(x_q, w_q, sc, out_int8=False,
                                       block_rows=block_rows,
                                       with_stats=want_stats,
                                       interpret=interpret)
            if want_stats:
                return out[0].astype(dtype), out[1], out[2]
            return out.astype(dtype)
        srow2 = jnp.broadcast_to(jnp.float32(1.0 / out_scale), srow0.shape)
        sc = jnp.stack([srow0, srow1, srow2])
        return fused_folded_conv_q8(x_q, w_q, sc, out_int8=True,
                                    block_rows=block_rows,
                                    with_stats=want_stats,
                                    interpret=interpret)

    return conv_q


def _make_conv2_q(block_rows: int, interpret: bool):
    """Two-layer fused conv closure (ops/pallas/folded_conv2_q8): one
    Pallas program per eligible layer PAIR — the intermediate's HBM read
    disappears (round-4 VERDICT item 4).  Both outputs int8 (+ both
    layers' fused AdaIN stat sums when requested)."""
    from ..ops.pallas.folded_conv2_q8 import fused_folded_conv2_q8

    def conv2_q(x_q, x_scale, k1, b1, out1, k2, b2, out2,
                want_stats=False):
        w1_q, w1_s = quantize_weights(k1.astype(jnp.float32))
        w2_q, w2_s = quantize_weights(k2.astype(jnp.float32))
        sc1 = jnp.stack([x_scale * w1_s, b1.astype(jnp.float32),
                         jnp.broadcast_to(jnp.float32(1.0 / out1),
                                          w1_s.shape)])
        sc2 = jnp.stack([out1 * w2_s, b2.astype(jnp.float32),
                         jnp.broadcast_to(jnp.float32(1.0 / out2),
                                          w2_s.shape)])
        return fused_folded_conv2_q8(x_q, w1_q, sc1, w2_q, sc2,
                                     out_int8=True,
                                     block_rows=block_rows,
                                     with_stats=want_stats,
                                     interpret=interpret)

    return conv2_q


def _encode_q8(enc, act_scales, it, img, dtype, conv_q,
               fuse_stats: bool = False, conv2_q=None):
    """Chained int8 constant-stack encoder: feats are (int8, scale) pairs
    (shared by every family whose encoder is the plain RP stack).

    With ``fuse_stats`` also returns a per-layer list of (mean4, std4)
    AdaIN statistics harvested from the conv kernel epilogues (None for
    layers run through XLA) — callers fuse without re-reading features.

    With ``conv2_q`` consecutive eligible layers run as ONE fused pair
    program (same scale consumption order, bit-exact vs the unfused
    chain — tests/test_folded_conv2.py)."""
    x = fold(img.astype(dtype))
    feats = []
    stats = []
    li = 0
    while li < len(enc):
        k, b = enc[li]
        if (conv2_q is not None and _q8_eligible(k)
                and li + 1 < len(enc) and _q8_eligible(enc[li + 1][0])
                and isinstance(x, tuple) and x[1] is not None):
            x_q, x_scale = x
            k2, b2 = enc[li + 1]
            out1 = float(act_scales[next(it)])
            out2 = float(act_scales[next(it)])
            if fuse_stats:
                y1, y2, s11, s12, s21, s22 = conv2_q(
                    x_q, x_scale, k, b, out1, k2, b2, out2,
                    want_stats=True)
                # kernel stat sums are f32 POST-activation values in real
                # units (pre-requantization) — no rescale needed
                m = y1.shape[1] * y1.shape[2] * 4
                feats.append((y1, out1))
                stats.append(_stats_from_sums(s11, s12, m))
                feats.append((y2, out2))
                stats.append(_stats_from_sums(s21, s22, m))
            else:
                y1, y2 = conv2_q(x_q, x_scale, k, b, out1, k2, b2, out2)
                feats.append((y1, out1))
                stats.append(None)
                feats.append((y2, out2))
                stats.append(None)
            x = (y2, out2)
            li += 2
            continue
        st = None
        if not _q8_eligible(k):
            if isinstance(x, tuple):
                # previous layer left a (tensor, scale-or-None) pair:
                # dequantize (or unwrap) before the bf16 XLA conv
                q, s = x
                x = (q.astype(jnp.float32) * s).astype(dtype) \
                    if s is not None else q
            x = _lrelu(folded_conv(x, k.astype(dtype), b.astype(dtype)))
            nxt = enc[li + 1][0] if li + 1 < len(enc) else None
            if nxt is not None and _q8_eligible(nxt):
                s = float(act_scales[next(it)])
                x = (quantize_activations(x, s), s)
            else:
                x = (x, None)
        else:
            x_q, x_scale = x
            # int8 out with the calibrated scale for this layer's output
            out_s = float(act_scales[next(it)])
            if fuse_stats:
                y, s1, s2 = conv_q(x_q, x_scale, k, b, out_scale=out_s,
                                   want_stats=True)
                m = y.shape[1] * y.shape[2] * 4
                st = _stats_from_sums(s1, s2, m)
                x = (y, out_s)
            else:
                x = (conv_q(x_q, x_scale, k, b, out_scale=out_s), out_s)
        feats.append(x)
        stats.append(st)
        li += 1
    if fuse_stats:
        return feats, stats
    return feats


def stylize_multi_adain_folded_q8(params, scales, content, style,
                                  dtype=jnp.bfloat16,
                                  block_rows: int = 16,
                                  interpret: bool = False,
                                  fuse_pairs: bool | str = "auto"
                                  ) -> jnp.ndarray:
    """Quantized folded stylize; same params as the standard model plus
    calibration ``scales`` from :func:`calibrate_multi_adain_q8`.

    Encoder layers chain int8 -> int8 (requantization fused into the conv
    kernel epilogue; AdaIN statistics reduce over the int8 features and
    rescale). Decoder fusions are float elementwise chains whose
    requantization XLA fuses — no standalone quantize pass anywhere.

    ``fuse_pairs`` runs consecutive eligible encoder layers as one
    two-layer Pallas program (folded_conv2_q8; bit-exact).  'auto' =
    the measured winner (rpst.policy.FUSED2_ENCODE)."""
    enc = _folded_blocks(params["rp_shared_encoder"])
    dec = _folded_blocks(params["rp_decoder"])
    act_scales = np.asarray(scales["act_scales"], np.float32)
    it = iter(range(len(act_scales)))
    conv_q = _make_conv_q(dtype, block_rows, interpret)
    if fuse_pairs == "auto":
        from ..policy import FUSED2_ENCODE
        fuse_pairs = FUSED2_ENCODE
    conv2_q = (_make_conv2_q(block_rows, interpret) if fuse_pairs
               else None)

    c_feats, c_stats = _encode_q8(enc, act_scales, it, content, dtype,
                                  conv_q, fuse_stats=True,
                                  conv2_q=conv2_q)
    s_feats, s_stats = _encode_q8(enc, act_scales, it, style, dtype,
                                  conv_q, fuse_stats=True,
                                  conv2_q=conv2_q)

    stylized = _adain_affine_q8(c_feats[-1], s_feats[-1],
                                c_stats[-1], s_stats[-1]).astype(dtype)
    k, b = dec[0]
    s_in = float(act_scales[next(it)])
    stylized = conv_q(quantize_activations(stylized, s_in), s_in, k, b)
    pairs = list(zip(c_feats[:-1], s_feats[:-1],
                     c_stats[:-1], s_stats[:-1]))[::-1]
    for i, (cf, sf, cst, sst) in enumerate(pairs):
        fusion = _adain_affine_q8(cf, sf, cst, sst).astype(dtype)
        k, b = dec[i + 1]
        if _q8_eligible(k):
            s_in = float(act_scales[next(it)])
            x = stylized.astype(jnp.float32) + fusion.astype(jnp.float32)
            stylized = conv_q(quantize_activations(x, s_in), s_in, k, b)
        else:
            stylized = _lrelu(folded_conv(
                stylized + fusion, k.astype(dtype), b.astype(dtype)))
    return unfold(stylized).astype(content.dtype)


# ---------------------------------------------------------------------------
# sel_multi_adain int8 serving
# ---------------------------------------------------------------------------

def _sel_decode_q8(variables, c_feats, s_feats, dec, act_scales, it,
                   dtype, conv_q, collect=None, c_stats=None,
                   s_stats=None):
    """SELastRP decode (adain_rp.py:451-481 semantics: running AdaIN
    re-fusion, SE bottleneck before the final decoder block, no residual
    add) on (int8, scale) encoder features.

    The running fusion's statistics come from the conv kernel epilogues
    wherever possible: style stats from the encoder's fused sums
    (``s_stats``), the running ``stylized`` stats from the previous
    decoder conv (``want_stats``) — no full-feature re-read passes; the
    SE bottleneck stays bf16 (BatchNorm running stats + sigmoid gate —
    not a quantization win). With ``collect`` the same code path records
    calibration absmax instead of reading scales."""
    from .fast_path import _folded_se_bottleneck

    params = variables["params"]
    stats = variables.get("batch_stats", {}).get("attention_block", None)
    last_conv_stats = [None]  # (mean4, std4) of the previous dec_conv out

    def dec_conv(x, k, b, want_stats=False):
        last_conv_stats[0] = None
        if _q8_eligible(k):
            if collect is not None:
                collect.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
                return _lrelu(folded_conv(x.astype(dtype), k.astype(dtype),
                                          b.astype(dtype)))
            s_in = float(act_scales[next(it)])
            x_q = quantize_activations(x.astype(jnp.float32), s_in)
            if want_stats:
                y, s1, s2 = conv_q(x_q, s_in, k, b, want_stats=True)
                last_conv_stats[0] = _stats_from_sums(
                    s1, s2, y.shape[1] * y.shape[2] * 4)
                return y
            return conv_q(x_q, s_in, k, b)
        return _lrelu(folded_conv(x.astype(dtype), k.astype(dtype),
                                  b.astype(dtype)))

    def enc_stats(stats_list, idx, feat):
        if stats_list is not None and stats_list[idx] is not None:
            return stats_list[idx]
        return _folded_stats_q8(feat[0], feat[1])

    stylized = _adain_affine_q8(
        c_feats[-1], s_feats[-1],
        c_stats[-1] if c_stats is not None else None,
        s_stats[-1] if s_stats is not None else None)
    k, b = dec[0]
    stylized = dec_conv(stylized, k, b, want_stats=True)
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (_, sf) in enumerate(pairs):
        # running fusion: stats of the float stylized (from the previous
        # conv epilogue when available), encoder-fused style stats
        if last_conv_stats[0] is not None:
            cm, cstd = last_conv_stats[0]
        else:
            from ..ops.folded import folded_calc_mean_std
            cm, cstd = folded_calc_mean_std(stylized.astype(jnp.float32))
        sm, sstd = enc_stats(s_stats, len(pairs) - 1 - i, sf)
        stylized = ((stylized.astype(jnp.float32) - cm) / cstd * sstd + sm)
        if i == len(pairs) - 1:
            stylized = _folded_se_bottleneck(
                stylized.astype(dtype), params["attention_block"], stats,
                dtype)
        k, b = dec[i + 1]
        stylized = dec_conv(stylized, k, b,
                            want_stats=(i + 1 < len(pairs)))
    return unfold(stylized.astype(jnp.float32))


def calibrate_sel_multi_adain_q8(variables, content, style):
    """Calibration absmax for :func:`stylize_sel_multi_adain_folded_q8`,
    recorded in exactly the consumption order (content encode, style
    encode, then each quantized decoder input)."""
    params = variables["params"]["ms"]
    enc = _folded_blocks(params["rp_shared_encoder"])
    dec = _folded_blocks(params["rp_decoder"])

    def run(variables, content, style):
        absmax = []
        dtype = jnp.float32

        def encode(img):
            x = fold(img.astype(dtype))
            feats = []
            for li, (k, b) in enumerate(enc):
                x = _lrelu(folded_conv(x, k.astype(dtype), b.astype(dtype)))
                eligible_next = (li + 1 < len(enc)
                                 and _q8_eligible(enc[li + 1][0]))
                if eligible_next or (li == len(enc) - 1
                                     and _q8_eligible(k)):
                    absmax.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
                # exact float features as (q, scale=1) pairs — the decode
                # collect pass must see unquantized observables
                feats.append((x, jnp.float32(1.0)))
            return feats

        c_feats = encode(content)
        s_feats = encode(style)
        _sel_decode_q8(variables, c_feats, s_feats,
                       dec, None, None, dtype, None, collect=absmax)
        return absmax

    absmax = jax.jit(lambda v, c, s: run(v, c, s))(variables, content, style)
    scales = np.asarray([max(float(a), 1e-6) / 127.0 for a in absmax],
                        np.float32)
    return {"act_scales": scales}


def stylize_sel_multi_adain_folded_q8(variables, scales, content, style,
                                      dtype=jnp.bfloat16,
                                      block_rows: int = 16,
                                      interpret: bool = False) -> jnp.ndarray:
    """Int8 PTQ folded serving for SELastRP: chained int8 encoder (shared
    constant stack), running-fusion decode with int8-reduced style stats,
    SE bottleneck in bf16."""
    params = variables["params"]["ms"]
    enc = _folded_blocks(params["rp_shared_encoder"])
    dec = _folded_blocks(params["rp_decoder"])
    act_scales = np.asarray(scales["act_scales"], np.float32)
    it = iter(range(len(act_scales)))
    conv_q = _make_conv_q(dtype, block_rows, interpret)

    c_feats, c_stats = _encode_q8(enc, act_scales, it, content, dtype,
                                  conv_q, fuse_stats=True)
    s_feats, s_stats = _encode_q8(enc, act_scales, it, style, dtype,
                                  conv_q, fuse_stats=True)
    out = _sel_decode_q8(variables, c_feats, s_feats,
                         dec, act_scales, it, dtype, conv_q,
                         c_stats=c_stats, s_stats=s_stats)
    return out.astype(content.dtype)


# ---------------------------------------------------------------------------
# ccam int8 serving
# ---------------------------------------------------------------------------

def _folded_ccam_q8(x_feat, y_feat, scale):
    """CCAMDec on folded (int8, scale) or float features.

    The position-sum energy is bilinear, so it reduces over int8 directly
    (int8 MXU einsum) and rescales once: energy = (Σ x_q y_q)·s_x·s_y.
    The attention recombination dequantizes y per block."""
    def split(f):
        if isinstance(f, tuple):
            q, s = f
            return q, jnp.float32(s if s is not None else 1.0)
        return f, jnp.float32(1.0)

    xq, sx = split(x_feat)
    yq, sy = split(y_feat)
    n, hh, ww, c4 = xq.shape
    c = c4 // 4
    # full folded-lane cross-product + diagonal-block sum, as in
    # fast_path._folded_ccam — one 4C-wide MXU matmul instead of the
    # C=32-wide einsum at 1/4 lane utilization
    xr = xq.reshape(n, hh * ww, c4)
    yr = yq.reshape(n, hh * ww, c4)
    acc_t = jnp.int32 if xr.dtype == jnp.int8 and yr.dtype == jnp.int8 \
        else jnp.float32
    e4 = jnp.einsum("npa,npb->nab", xr, yr, preferred_element_type=acc_t)
    blocks = e4.astype(jnp.float32).reshape(n, 4, c, 4, c)
    energy = (blocks[:, 0, :, 0] + blocks[:, 1, :, 1]
              + blocks[:, 2, :, 2] + blocks[:, 3, :, 3]) * (sx * sy)
    energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
    attention = jax.nn.softmax(energy_new, axis=-1)
    att4 = jnp.einsum("st,nck->nsctk", jnp.eye(4, dtype=attention.dtype),
                      attention).reshape(n, c4, c4)  # kron(I4, att)
    out = jnp.einsum("npk,nck->npc", yr.astype(jnp.float32) * sy, att4)
    out = out.reshape(n, hh, ww, c4)
    x_deq = xq.astype(jnp.float32) * sx
    return x_deq + scale * out


def _ccam_decode_q8(variables, c_feats, s_feats, dec, stylized_layers,
                    act_scales, it, dtype, conv_q, collect=None):
    """CCAMRP decode (adain_rp.py:348-422 semantics) on (int8, scale)
    encoder features; with ``collect`` records calibration absmax."""
    params = variables["params"]

    def dec_conv(x, k, b):
        if _q8_eligible(k):
            if collect is not None:
                collect.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
                return _lrelu(folded_conv(x.astype(dtype), k.astype(dtype),
                                          b.astype(dtype)))
            s_in = float(act_scales[next(it)])
            return conv_q(quantize_activations(x.astype(jnp.float32), s_in),
                          s_in, k, b)
        return _lrelu(folded_conv(x.astype(dtype), k.astype(dtype),
                                  b.astype(dtype)))

    from ..ops.folded import folded_calc_mean_std
    scale = lambda i: params[f"ccam_{i}"]["scale"].astype(jnp.float32)

    stylized = _adain_affine_q8(c_feats[-1], s_feats[-1])
    att_res = _folded_ccam_q8(c_feats[-1], s_feats[-1], scale(0))
    k, b = dec[0]
    stylized = dec_conv(stylized + att_res, k, b)
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (_, sf) in enumerate(pairs):
        k, b = dec[i + 1]
        if i + 1 < stylized_layers:
            cm, cstd = folded_calc_mean_std(stylized.astype(jnp.float32))
            sm, sstd = _folded_stats_q8(sf[0], sf[1])
            stylized = ((stylized.astype(jnp.float32) - cm) / cstd
                        * sstd + sm)
            att_res = _folded_ccam_q8(stylized, sf, scale(i + 1))
            stylized = dec_conv(stylized + att_res, k, b)
        else:
            stylized = dec_conv(stylized, k, b)
    return unfold(stylized.astype(jnp.float32))


def calibrate_ccam_q8(variables, content, style, stylized_layers: int = 5):
    """Calibration absmax for :func:`stylize_ccam_folded_q8`."""
    params = variables["params"]["ms"]
    enc = _folded_blocks(params["rp_shared_encoder"])
    dec = _folded_blocks(params["rp_decoder"])

    def run(variables, content, style):
        absmax = []
        dtype = jnp.float32

        def encode(img):
            x = fold(img.astype(dtype))
            feats = []
            for li, (k, b) in enumerate(enc):
                x = _lrelu(folded_conv(x, k.astype(dtype), b.astype(dtype)))
                eligible_next = (li + 1 < len(enc)
                                 and _q8_eligible(enc[li + 1][0]))
                if eligible_next or (li == len(enc) - 1
                                     and _q8_eligible(k)):
                    absmax.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
                feats.append((x, jnp.float32(1.0)))
            return feats

        c_feats = encode(content)
        s_feats = encode(style)
        _ccam_decode_q8(variables, c_feats, s_feats, dec, stylized_layers,
                        None, None, dtype, None, collect=absmax)
        return absmax

    absmax = jax.jit(lambda v, c, s: run(v, c, s))(variables, content, style)
    scales = np.asarray([max(float(a), 1e-6) / 127.0 for a in absmax],
                        np.float32)
    return {"act_scales": scales}


def stylize_ccam_folded_q8(variables, scales, content, style,
                           stylized_layers: int = 5,
                           dtype=jnp.bfloat16,
                           block_rows: int = 16,
                           interpret: bool = False) -> jnp.ndarray:
    """Int8 PTQ folded serving for CCAMRP: chained int8 encoder, CCAM
    energies reduced over int8, AdaIN fusions with int8-reduced style
    statistics."""
    params = variables["params"]["ms"]
    enc = _folded_blocks(params["rp_shared_encoder"])
    dec = _folded_blocks(params["rp_decoder"])
    act_scales = np.asarray(scales["act_scales"], np.float32)
    it = iter(range(len(act_scales)))
    conv_q = _make_conv_q(dtype, block_rows, interpret)

    c_feats = _encode_q8(enc, act_scales, it, content, dtype, conv_q)
    s_feats = _encode_q8(enc, act_scales, it, style, dtype, conv_q)
    out = _ccam_decode_q8(variables, c_feats, s_feats, dec, stylized_layers,
                          act_scales, it, dtype, conv_q)
    return out.astype(content.dtype)


# ---------------------------------------------------------------------------
# adain (AdaINRP) int8 serving: standard-layout wide-channel Pallas conv
# ---------------------------------------------------------------------------
# The adain family (reference network/adain_rp.py:15-138 with the
# increasing stack, base.py:363-379) runs full-resolution zero-pad convs
# whose widths double up to 512 channels — MXU-compute-bound, so folding
# would quadruple the MACs for nothing.  Instead the lane-aligned layers
# (C and Co multiples of 128 — 93%+ of the stack's FLOPs at hidden 32)
# run through the standard-layout int8 kernel (ops/pallas/conv2d_q8,
# pad_mode="zero", relu), chained int8->int8; the narrow boundary layers
# stay bf16 XLA.  AdaIN statistics reduce over the int8 deepest features
# and rescale (the style signal is computed in f32 — only conv I/O is
# quantized).  Both images encode in one 2N pass (exact: plain convs),
# which also makes the calibrated scales content/style-shared.


def _rp_sequence_convs(params, name):
    sub = params[name]
    return [(sub[f"conv_{i}"]["Conv_0"]["kernel"],
             sub[f"conv_{i}"]["Conv_0"]["bias"])
            for i in range(len(sub))]


def _same_conv_relu(x, k, b, dtype):
    y = jax.lax.conv_general_dilated(
        x, k.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(dtype)
    return jnp.maximum(y, 0)


def _stats_q8(q, scale, eps: float = 1e-5):
    """Standard-layout instance mean/std over an int8 tensor with a
    per-tensor scale (mean/std are linear in the scale — reduce over
    int8 directly, half the read bytes, rescale once)."""
    n, h, w, c = q.shape
    m = h * w
    v = q.astype(jnp.float32)
    s1 = jnp.sum(v, axis=(1, 2))
    s2 = jnp.sum(v * v, axis=(1, 2))
    mean = s1 / float(m) * scale
    var = (s2 / float(max(m - 1, 1))
           - s1 * s1 / (float(m) * float(max(m - 1, 1)))) * scale * scale
    std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
    return mean[:, None, None, :], std[:, None, None, :]


def _make_conv_q_std(dtype, block_rows: int, interpret: bool,
                     pad_mode: str = "zero", alpha: float = 0.0):
    """Standard-layout int8 conv closure: ``pad_mode='zero'`` + relu is
    the RPSequence block (nn/blocks.py:RPSequence); ``'reflect'`` + relu
    is the VGG / VGG-mirror-decoder block (nn/vgg.py, nn/decoder.py);
    ``'reflect'`` + ``alpha=0.2`` is the Conv2dBlock default (lrelu —
    the LD family's stacks, reference adain_rp.py:484-567)."""
    from ..ops.pallas.conv2d_q8 import fused_conv2d_q8

    def conv_q(x_q, x_scale, k, b, out_scale=None):
        w_q, w_scale = quantize_weights(k.astype(jnp.float32))
        srow0 = x_scale * w_scale
        srow1 = b.astype(jnp.float32)
        if out_scale is None:
            sc = jnp.stack([srow0, srow1, jnp.zeros_like(srow0)])
            return fused_conv2d_q8(x_q, w_q, sc, out_int8=False,
                                   alpha=alpha, pad_mode=pad_mode,
                                   block_rows=block_rows,
                                   interpret=interpret).astype(dtype)
        srow2 = jnp.broadcast_to(jnp.float32(1.0 / out_scale), srow0.shape)
        sc = jnp.stack([srow0, srow1, srow2])
        return fused_conv2d_q8(x_q, w_q, sc, out_int8=True,
                               alpha=alpha, pad_mode=pad_mode,
                               block_rows=block_rows, interpret=interpret)

    return conv_q


def _collect_rp_sequence(enc, dec, x, fuse, dtype):
    """bf16 forward recording calibration absmaxes in exactly the order
    ``_encode_std_q8``/``_decode_std_q8`` consume them: encoder (2N pass)
    layer outputs feeding eligible layers / eligible outputs, then each
    quantized decoder input/output.  ``fuse`` maps the 2N deepest feature
    to the decoder input."""
    absmax: List[jnp.ndarray] = []
    for li, (k, b) in enumerate(enc):
        x = _same_conv_relu(x, k, b, dtype)
        nxt_eligible = (li + 1 < len(enc) and _q8_eligible(enc[li + 1][0]))
        if nxt_eligible or (li == len(enc) - 1 and _q8_eligible(k)):
            absmax.append(jnp.max(jnp.abs(x.astype(jnp.float32))))

    x = fuse(x).astype(dtype)
    for li, (k, b) in enumerate(dec):
        if _q8_eligible(k):
            absmax.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
        x = _same_conv_relu(x, k, b, dtype)
    return x, absmax


def _encode_std_q8(enc, act_scales, it, x, dtype, conv_q):
    """Standard-layout chained int8 encoder; returns the deepest feature
    as ``(tensor, scale-or-None)`` (int8 when the last layer is
    lane-aligned)."""
    x_s = None
    for li, (k, b) in enumerate(enc):
        if _q8_eligible(k):
            nxt_eligible = (li + 1 < len(enc)
                            and _q8_eligible(enc[li + 1][0]))
            if nxt_eligible or li == len(enc) - 1:
                out_s = float(act_scales[next(it)])
                x, x_s = conv_q(x, x_s, k, b, out_scale=out_s), out_s
            else:
                # the next layer runs bf16 XLA: emit dequantized float —
                # _collect_rp_sequence records no scale at this point, so
                # an int8 out here would both desync the scale stream and
                # feed raw codes into _same_conv_relu (mirrors the guard
                # in the folded _encode_q8)
                x, x_s = conv_q(x, x_s, k, b), None
        else:
            x = _same_conv_relu(x, k, b, dtype)
            nxt = enc[li + 1][0] if li + 1 < len(enc) else None
            if nxt is not None and _q8_eligible(nxt):
                s = float(act_scales[next(it)])
                x, x_s = quantize_activations(x, s), s
            else:
                x_s = None
    return x, x_s


def _decode_std_q8(dec, act_scales, it, x, dtype, conv_q):
    """Standard-layout decoder on a float input: lane-aligned layers run
    the int8 kernel (chained int8 while consecutive), the rest bf16."""
    x_s = None
    for li, (k, b) in enumerate(dec):
        if _q8_eligible(k):
            if x_s is None:
                s = float(act_scales[next(it)])
                x, x_s = quantize_activations(x, s), s
            nxt_eligible = (li + 1 < len(dec)
                            and _q8_eligible(dec[li + 1][0]))
            if nxt_eligible:
                out_s = float(act_scales[next(it)])
                x, x_s = conv_q(x, x_s, k, b, out_scale=out_s), out_s
            else:
                x, x_s = conv_q(x, x_s, k, b), None
        else:
            x = _same_conv_relu(x, k, b, dtype)
            x_s = None
    return x


def _calib_cap(content, style, cap: int = 2):
    """Cap the calibration batch for the full-resolution wide-channel
    (standard-layout) families: per-tensor absmax scales don't need more
    samples, and an uncapped b4+ bf16 calibration pass holds every
    512-channel 512px activation at once — measured pushing a 16 GB v5e
    to RESOURCE_EXHAUSTED (2026-08-18). Calibration peak memory must not
    exceed serving peak memory."""
    return content[:cap], style[:cap]


def calibrate_adain_q8(params, content, style) -> Dict[str, np.ndarray]:
    """One calibration pass -> per-tensor symmetric input scales for
    :func:`stylize_adain_q8` (absmax / 127 over representative batches)."""
    from ..ops.stats import adaptive_instance_normalization as adain

    content, style = _calib_cap(content, style)
    n = content.shape[0]

    def collect(p, c, s):
        x = jnp.concatenate([c, s], axis=0).astype(jnp.bfloat16)
        return _collect_rp_sequence(
            _rp_sequence_convs(p, "encoder"), _rp_sequence_convs(p, "decoder"),
            x, lambda f: adain(f[:n], f[n:]), jnp.bfloat16)[1]

    absmax = jax.jit(collect)(params, content, style)
    scales = np.asarray([max(float(a), 1e-6) / 127.0 for a in absmax],
                        np.float32)
    return {"act_scales": scales}


def stylize_adain_q8(params, scales, content, style,
                     dtype=jnp.bfloat16, block_rows: int = 16,
                     interpret: bool = False) -> jnp.ndarray:
    """Int8 PTQ AdaINRP serving (reference adain_rp.py:15-138 semantics:
    encode both images, one AdaIN fusion at the deepest feature, decode).

    Wide lane-aligned layers run the standard-layout int8 Pallas kernel
    chained int8->int8; narrow boundary layers run bf16 XLA SAME convs;
    AdaIN statistics reduce over the int8 deepest features."""
    enc = _rp_sequence_convs(params, "encoder")
    dec = _rp_sequence_convs(params, "decoder")
    act_scales = np.asarray(scales["act_scales"], np.float32)
    it = iter(range(len(act_scales)))
    conv_q = _make_conv_q_std(dtype, block_rows, interpret)
    n = content.shape[0]

    x2 = jnp.concatenate([content, style], axis=0).astype(dtype)
    x, x_s = _encode_std_q8(enc, act_scales, it, x2, dtype, conv_q)

    if x_s is not None:
        cq, sq = x[:n], x[n:]
        cm, cstd = _stats_q8(cq, x_s)
        sm, sstd = _stats_q8(sq, x_s)
        fused = ((cq.astype(jnp.float32) * x_s - cm) / cstd * sstd + sm)
    else:
        from ..ops.stats import adaptive_instance_normalization as adain
        fused = adain(x[:n], x[n:]).astype(jnp.float32)

    out = _decode_std_q8(dec, act_scales, it, fused.astype(dtype), dtype,
                         conv_q)
    return out.astype(content.dtype)


def calibrate_wct_q8(params, content, style, method="closed-form",
                     wct_dtype=jnp.float32) -> Dict[str, np.ndarray]:
    """Calibration absmaxes for :func:`stylize_wct_q8`."""
    from ..ops.wct import wct_fuse

    content, style = _calib_cap(content, style)
    n = content.shape[0]

    def collect(p, c, s):
        x = jnp.concatenate([c, s], axis=0).astype(jnp.bfloat16)
        return _collect_rp_sequence(
            _rp_sequence_convs(p, "encoder"), _rp_sequence_convs(p, "decoder"),
            x, lambda f: wct_fuse(f[:n].astype(jnp.float32),
                                  f[n:].astype(jnp.float32),
                                  method=method, dtype=wct_dtype),
            jnp.bfloat16)[1]

    absmax = jax.jit(collect)(params, content, style)
    scales = np.asarray([max(float(a), 1e-6) / 127.0 for a in absmax],
                        np.float32)
    return {"act_scales": scales}


def stylize_wct_q8(params, scales, content, style, method="closed-form",
                   wct_dtype=jnp.float32, dtype=jnp.bfloat16,
                   block_rows: int = 16,
                   interpret: bool = False) -> jnp.ndarray:
    """Int8 PTQ WCTRP serving (reference wct_rp.py:42-194 semantics) —
    the same RPSequence stacks as adain with the whiten-color fuse at
    the deepest feature; the eigendecomposition stays f32 (the style
    covariance is the signal), only conv I/O is quantized."""
    from ..ops.wct import wct_fuse

    enc = _rp_sequence_convs(params, "encoder")
    dec = _rp_sequence_convs(params, "decoder")
    act_scales = np.asarray(scales["act_scales"], np.float32)
    it = iter(range(len(act_scales)))
    conv_q = _make_conv_q_std(dtype, block_rows, interpret)
    n = content.shape[0]

    x2 = jnp.concatenate([content, style], axis=0).astype(dtype)
    x, x_s = _encode_std_q8(enc, act_scales, it, x2, dtype, conv_q)
    f = (x.astype(jnp.float32) * x_s if x_s is not None
         else x.astype(jnp.float32))
    fused = wct_fuse(f[:n], f[n:], method=method, dtype=wct_dtype)

    out = _decode_std_q8(dec, act_scales, it, fused.astype(dtype), dtype,
                         conv_q)
    return out.astype(content.dtype)


def calibrate_spade_q8(params, content, style) -> Dict[str, np.ndarray]:
    """Calibration absmaxes for :func:`stylize_spade_q8` (content-encoder
    scales then style-encoder scales; the SPADE generator stays bf16)."""
    content, style = _calib_cap(content, style)

    def collect(p, c, s):
        ident = lambda f: f
        _, a_c = _collect_rp_sequence(
            _rp_sequence_convs(p, "rp_content_encoder"), [],
            c.astype(jnp.bfloat16), ident, jnp.bfloat16)
        _, a_s = _collect_rp_sequence(
            _rp_sequence_convs(p, "rp_style_encoder"), [],
            s.astype(jnp.bfloat16), ident, jnp.bfloat16)
        return a_c + a_s

    absmax = jax.jit(collect)(params, content, style)
    return {"act_scales": np.asarray(
        [max(float(a), 1e-6) / 127.0 for a in absmax], np.float32)}


def stylize_spade_q8(params, scales, content, style, ndf: int = 2,
                     spade_norm: str = "instance", dtype=jnp.bfloat16,
                     block_rows: int = 16,
                     interpret: bool = False) -> jnp.ndarray:
    """Int8 PTQ SpadeRP serving (reference spade_rp.py:149-247: two
    increasing-depth RP encoders, SPADE generator decoding the *style*
    features conditioned on the *content* features).

    At the default ndf=2 the generator is a sliver of the FLOPs — the
    cost is the two full-resolution increase stacks (128->256->512
    tails), which run the standard-layout int8 kernel chained
    int8->int8. The SPADE blocks (normalization-modulated convs) stay
    bf16 flax."""
    from ..nn.spade import SpadeDecoder

    enc_c = _rp_sequence_convs(params, "rp_content_encoder")
    enc_s = _rp_sequence_convs(params, "rp_style_encoder")
    act_scales = np.asarray(scales["act_scales"], np.float32)
    it = iter(range(len(act_scales)))
    conv_q = _make_conv_q_std(dtype, block_rows, interpret)

    cf, c_s = _encode_std_q8(enc_c, act_scales, it, content.astype(dtype),
                             dtype, conv_q)
    if c_s is not None:
        cf = _deq(cf, c_s, dtype)
    sf, s_s = _encode_std_q8(enc_s, act_scales, it, style.astype(dtype),
                             dtype, conv_q)
    if s_s is not None:
        sf = _deq(sf, s_s, dtype)

    dec = SpadeDecoder(ndf=ndf, spade_norm=spade_norm,
                       condition_nc=enc_c[-1][0].shape[3], dtype=dtype)
    out = dec.apply({"params": params["rp_decoder"]}, sf, cf, train=False)
    return out.astype(content.dtype)


def _mst_fuse_f32(cf_f, sf_f, n_clusters: int, lam: float):
    """MST transform on folded f32 features: the k-means/graph-cut chain
    is raster-order sensitive, so unfold just for the transform (exactly
    as the bf16 folded path does, fast_path.py::stylize_mst_folded)."""
    from ..ops.mst import mst_transfer_batch
    out = mst_transfer_batch(unfold(cf_f).astype(jnp.float32),
                             unfold(sf_f).astype(jnp.float32),
                             n_clusters, lam)
    return fold(out)


def calibrate_mst_q8(params, content, style, stylized_layers: int = 1,
                     n_clusters: int = 3,
                     mst_lambda: float = 0.0) -> Dict[str, np.ndarray]:
    """Calibration absmaxes for :func:`stylize_mst_folded_q8` — encoder
    chain scales for both images, then each eligible decoder conv's
    input scale, in consumption order."""
    dtype = jnp.bfloat16

    def collect(p, content, style):
        enc = _folded_blocks(p["ms"]["rp_shared_encoder"])
        dec = _folded_blocks(p["ms"]["rp_decoder"])
        absmax: List[jnp.ndarray] = []

        def conv(x, k, b):
            return _lrelu(folded_conv(x, k.astype(dtype), b.astype(dtype)))

        def encode(img):
            x = fold(img.astype(dtype))
            feats = []
            for li, (k, b) in enumerate(enc):
                x = conv(x, k, b)
                nxt_eligible = (li + 1 < len(enc)
                                and _q8_eligible(enc[li + 1][0]))
                if nxt_eligible or (li == len(enc) - 1
                                    and _q8_eligible(k)):
                    absmax.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
                feats.append(x)
            return feats

        c_feats = encode(content)
        s_feats = encode(style)
        stylized = _mst_fuse_f32(c_feats[-1].astype(jnp.float32),
                                 s_feats[-1].astype(jnp.float32),
                                 n_clusters, mst_lambda)
        k, b = dec[0]
        if _q8_eligible(k):
            absmax.append(jnp.max(jnp.abs(stylized)))
        stylized = conv(stylized.astype(dtype), k, b)
        pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
        for i, (_, sf) in enumerate(pairs):
            if i + 1 < stylized_layers:
                stylized = _mst_fuse_f32(stylized.astype(jnp.float32),
                                         sf.astype(jnp.float32),
                                         n_clusters, mst_lambda)
            k, b = dec[i + 1]
            if _q8_eligible(k):
                absmax.append(jnp.max(jnp.abs(stylized
                                              .astype(jnp.float32))))
            stylized = conv(stylized.astype(dtype), k, b)
        return absmax

    absmax = jax.jit(collect)(params, content, style)
    return {"act_scales": np.asarray(
        [max(float(a), 1e-6) / 127.0 for a in absmax], np.float32)}


def stylize_mst_folded_q8(params, scales, content, style,
                          stylized_layers: int = 1, n_clusters: int = 3,
                          mst_lambda: float = 0.0, dtype=jnp.bfloat16,
                          block_rows: int = 16,
                          interpret: bool = False) -> jnp.ndarray:
    """Int8 PTQ MSTRP serving (reference adain_rp.py:425-448 semantics,
    k-means + graph-cut label transfer from utils/mst.py): chained-int8
    folded encode of both images; the MST transform itself stays f32 on
    raster-order features (it is an eigendecomposition + assignment
    chain, not conv work); decoder convs run the folded int8 kernel."""
    enc = _folded_blocks(params["ms"]["rp_shared_encoder"])
    dec = _folded_blocks(params["ms"]["rp_decoder"])
    act_scales = np.asarray(scales["act_scales"], np.float32)
    it = iter(range(len(act_scales)))
    conv_q = _make_conv_q(dtype, block_rows, interpret)

    c_feats = _encode_q8(enc, act_scales, it, content, dtype, conv_q)
    s_feats = _encode_q8(enc, act_scales, it, style, dtype, conv_q)

    def _deq_f(pair):
        q, s = pair
        x = q.astype(jnp.float32)
        return x * s if s is not None else x

    def _dec_conv(x_f32, k, b):
        if _q8_eligible(k):
            s_in = float(act_scales[next(it)])
            return conv_q(quantize_activations(x_f32, s_in), s_in, k, b)
        return _lrelu(folded_conv(x_f32.astype(dtype), k.astype(dtype),
                                  b.astype(dtype)))

    stylized = _mst_fuse_f32(_deq_f(c_feats[-1]), _deq_f(s_feats[-1]),
                             n_clusters, mst_lambda)
    k, b = dec[0]
    stylized = _dec_conv(stylized, k, b)
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (_, sf) in enumerate(pairs):
        if i + 1 < stylized_layers:
            stylized = _mst_fuse_f32(stylized.astype(jnp.float32),
                                     _deq_f(sf), n_clusters, mst_lambda)
        k, b = dec[i + 1]
        stylized = _dec_conv(stylized.astype(jnp.float32), k, b)
    return unfold(stylized).astype(content.dtype)


def _mrf_stacks(params):
    return (_rp_sequence_convs(params, "rp_content_encoder"),
            _rp_sequence_convs(params, "rp_style_encoder"),
            _rp_sequence_convs(params, "rp_decoder"))


def calibrate_mrf_q8(params, content, style) -> Dict[str, np.ndarray]:
    """Calibration absmaxes for :func:`stylize_mrf_q8` (content-encoder
    scales, then style-encoder scales, then decoder scales — the exact
    order the q8 pass consumes them)."""
    content, style = _calib_cap(content, style)

    def collect(p, c, s):
        enc_c, enc_s, dec = _mrf_stacks(p)
        ident = lambda f: f
        cf, a_c = _collect_rp_sequence(enc_c, [], c.astype(jnp.bfloat16),
                                       ident, jnp.bfloat16)
        sf, a_s = _collect_rp_sequence(enc_s, [], s.astype(jnp.bfloat16),
                                       ident, jnp.bfloat16)
        fused = jnp.concatenate([cf, sf], axis=-1)
        _, a_d = _collect_rp_sequence([], dec, fused, ident, jnp.bfloat16)
        return a_c + a_s + a_d

    absmax = jax.jit(collect)(params, content, style)
    return {"act_scales": np.asarray(
        [max(float(a), 1e-6) / 127.0 for a in absmax], np.float32)}


def stylize_mrf_q8(params, scales, content, style, dtype=jnp.bfloat16,
                   block_rows: int = 16,
                   interpret: bool = False) -> jnp.ndarray:
    """Int8 PTQ MRFRP serving (reference mrf_rp.py:63-108 semantics: two
    increasing-depth RP encoders, channel-concat fuse, decreasing-depth
    RP decoder — all stride-1 full-resolution zero-pad relu convs).

    The lane-aligned layers carry nearly all the MACs at the default
    h32/rp5 (128->256->512 encode tails of both encoders, the
    1024->512->256->128 decode head) and run the standard-layout int8
    kernel chained int8->int8; the narrow boundary layers run bf16 XLA.
    The two encoders have distinct parameters (unlike adain's shared
    stack), so content and style encode separately."""
    enc_c, enc_s, dec = _mrf_stacks(params)
    act_scales = np.asarray(scales["act_scales"], np.float32)
    it = iter(range(len(act_scales)))
    conv_q = _make_conv_q_std(dtype, block_rows, interpret)

    cf, c_s = _encode_std_q8(enc_c, act_scales, it, content.astype(dtype),
                             dtype, conv_q)
    if c_s is not None:
        cf = _deq(cf, c_s, dtype)
    sf, s_s = _encode_std_q8(enc_s, act_scales, it, style.astype(dtype),
                             dtype, conv_q)
    if s_s is not None:
        sf = _deq(sf, s_s, dtype)
    fused = jnp.concatenate([cf, sf], axis=-1)
    out = _decode_std_q8(dec, act_scales, it, fused, dtype, conv_q)
    return out.astype(content.dtype)


# ---------------------------------------------------------------------------
# VGG-based families: sanet / dynamic_sanet (reference network/sanet.py:
# 196-423) and src (reference network/base.py:562-649).  Their serving cost
# is dominated by the frozen 5(4)-stage VGG encode of BOTH images plus the
# VGG-mirror decoder — reflect-pad relu convs at 128..512 channels, exactly
# the regime where the standard-layout int8 Pallas kernel measured
# 1.9-2.6x XLA bf16 (BASELINE.md, tools/bench_conv2d_q8.py).  The attention
# transform (f/g/h 1x1 convs + flash attention + merge conv) stays bf16:
# the softmax attention is the style signal, and it is a small share of
# the FLOPs.  Max pools and nearest upsamples commute with the symmetric
# per-tensor quantizer, so the chain stays int8 across stage boundaries.


class _ScaleStream:
    """One ordered stream of activation scales, shared by the calibration
    pass (``recording``: runs bf16, appends absmaxes) and the q8 pass
    (replays the calibrated scales in the identical order).  Keeping both
    passes on the same code path makes scale-order mismatches impossible."""

    def __init__(self, scales=None):
        self.scales = None if scales is None else np.asarray(scales,
                                                             np.float32)
        self.absmax: List[jnp.ndarray] = []
        self._i = 0

    @property
    def recording(self) -> bool:
        return self.scales is None

    def take(self, ref):
        """Next scale; in recording mode, derive it later from absmax(ref)."""
        if self.recording:
            self.absmax.append(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            return None
        s = float(self.scales[self._i])
        self._i += 1
        return s


def _reflect_conv(x, k, b, dtype, act: bool = True):
    if k.shape[0] > 1:
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, k.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(dtype)
    return jnp.maximum(y, 0) if act else y


def _maxpool2x_any(x):
    """2x2/2 max pool on even inputs — dtype-agnostic (int8 pools exactly:
    max commutes with the monotone symmetric quantizer)."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def _upsample2x_any(x):
    """Nearest x2 (replication) — dtype-agnostic, exact on int8."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _deq(q, scale, dtype):
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _conv_chain_q8(convs, program, x, dtype, conv_q, st, taps=None):
    """Drive a reflect+relu conv chain through the int8 kernel.

    ``convs``: [(kernel, bias)]; ``program[i]`` = (pre, act) with pre in
    {None, 'pool', 'up'} applied before conv i and act False only for a
    final un-activated conv.  Lane-aligned convs run int8 (chained int8
    while the NEXT conv is also aligned — pools/upsamples are transparent
    to the chain); the rest run bf16 XLA.  ``taps``: indices whose
    post-activation output is returned (dequantized) — returns (x, {i: t}).
    In ``st.recording`` mode everything runs bf16 and the stream records
    absmaxes at exactly the points the q8 replay consumes scales."""
    taps = taps or ()
    out_taps = {}
    x = x.astype(dtype)
    x_s = None      # replay mode: scale of the current int8 tensor
    virt = False    # recording mode: replay would be int8 here
    for li, (k, b) in enumerate(convs):
        pre, act = program[li]
        if pre == "pool":
            x = _maxpool2x_any(x)
        elif pre == "up":
            x = _upsample2x_any(x)
        eligible = _q8_eligible(k) and k.shape[0] == 3 and act
        is_q = virt if st.recording else (x_s is not None)
        if eligible:
            if not is_q:
                s = st.take(x)
                if not st.recording:
                    x, x_s = quantize_activations(x, s), s
            nxt = convs[li + 1][0] if li + 1 < len(convs) else None
            chain = (nxt is not None and program[li + 1][1]
                     and _q8_eligible(nxt) and nxt.shape[0] == 3)
            if st.recording:
                x = _reflect_conv(x, k, b, dtype)
                if chain:
                    st.take(x)
                virt = chain
            elif chain:
                out_s = st.take(None)
                x, x_s = conv_q(x, x_s, k, b, out_scale=out_s), out_s
            else:
                x, x_s = conv_q(x, x_s, k, b), None
        else:
            if x_s is not None:
                x, x_s = _deq(x, x_s, dtype), None
            virt = False
            x = _reflect_conv(x, k, b, dtype, act=act)
        if li in taps:
            out_taps[li] = _deq(x, x_s, dtype) if x_s is not None else x
    if x_s is not None:
        x = _deq(x, x_s, dtype)
    return x, out_taps


def _vgg_q8_layers(vgg_params, num_stages):
    """(convs, program, tap_conv_indices) for the vgg_normalised encoder
    (nn/vgg.py semantics: 1x1 head, reflect 3x3 relu convs, ceil pool
    before the last conv of stages 2+; taps at relu{k}_1)."""
    from ..nn.vgg import _STAGES
    n_convs = 2 + sum(len(_STAGES[s]) for s in range(1, num_stages))
    convs = [(vgg_params[f"conv_{i}"]["Conv_0"]["kernel"],
              vgg_params[f"conv_{i}"]["Conv_0"]["bias"])
             for i in range(n_convs)]
    program = [(None, False), (None, True)]  # 1x1 head; conv->relu1_1
    tap_idx = [1]
    i = 2
    for stage in range(2, num_stages + 1):
        specs = _STAGES[stage - 1]
        for j in range(len(specs)):
            program.append(("pool" if j == len(specs) - 1 else None, True))
            i += 1
        tap_idx.append(i - 1)
    return convs, program, tap_idx


def _vgg_encode_q8(vgg_params, x, num_stages, dtype, conv_q, st):
    """[relu1_1..relu{num_stages}_1] with the aligned VGG convs int8."""
    convs, program, tap_idx = _vgg_q8_layers(vgg_params, num_stages)
    _, taps = _conv_chain_q8(convs, program, x, dtype, conv_q, st,
                             taps=tap_idx)
    return [taps[i] for i in tap_idx]


def calibrate_vgg_targets_q8(vgg_vars, content, style) -> Dict[str, np.ndarray]:
    """Activation scales for the no-grad VGG loss-TARGET encode used by
    int8-target training (``train_q8_targets`` — round-4 VERDICT item 2).

    The VGG is frozen, so one absmax pass over a representative batch
    fixes the scales for the whole run (the serving-PTQ recipe)."""
    def collect(vgg_vars, c, s):
        st = _ScaleStream()
        _vgg_encode_q8(vgg_vars["params"],
                       jnp.concatenate([s, c], axis=0).astype(jnp.bfloat16),
                       4, jnp.bfloat16, None, st)
        return st.absmax

    absmax = jax.jit(collect)(vgg_vars, content, style)
    return {"act_scales": np.asarray(
        [max(float(a), 1e-6) / 127.0 for a in absmax], np.float32)}


def vgg_target_taps_q8(vgg_vars, scales, imgs, dtype=jnp.bfloat16,
                       block_rows: int = 16, interpret: bool = False,
                       conv_impl: str = "auto"):
    """[relu1_1..relu4_1] taps of ``imgs`` through the chained-int8 VGG
    encoder — the training loss's no-grad style/content targets
    (reference adain_rp.py:327-329 runs these as full-precision frozen
    forwards; they carry no gradients, so int8 only perturbs the loss
    TARGET values, never the backward path).

    ``conv_impl``: 'pallas' = the standard-layout fused kernel; 'xla' =
    XLA's int8 conv + fused epilogue (same integer math); 'auto' applies
    the LD small-batch lesson (policy.LD_MIXED_ENGINE_MIN_2N): below a
    2N batch of 8 the mixed Mosaic+XLA program collapses, so the whole
    target pass runs one engine (XLA) — the r4 b1 −11% q8tgt regression
    was exactly this mix (VERDICT r5 item 3)."""
    st = _ScaleStream(scales["act_scales"])
    if conv_impl == "auto":
        from ..policy import LD_MIXED_ENGINE_MIN_2N
        conv_impl = ("pallas" if imgs.shape[0] >= LD_MIXED_ENGINE_MIN_2N
                     else "xla")
    if conv_impl == "xla" and not interpret:
        def conv_q(x_q, x_scale, k, b, out_scale=None):
            return _xla_conv_q8(x_q, x_scale, k, b, dtype,
                                out_scale=out_scale, alpha=0.0)
    else:
        conv_q = _make_conv_q_std(dtype, block_rows, interpret, "reflect")
    return _vgg_encode_q8(vgg_vars["params"],
                          jax.lax.stop_gradient(imgs).astype(dtype),
                          4, dtype, conv_q, st)


# VGG-mirror decoder program (nn/decoder.py): conv name -> (pre, act)
_MIRROR_PROGRAM = [(None, True), ("up", True), (None, True), (None, True),
                   (None, True), ("up", True), (None, True), ("up", True),
                   (None, False)]


def _mirror_decode_q8(dec_params, x, dtype, conv_q, st):
    convs = [(dec_params[f"conv{i}"]["Conv_0"]["kernel"],
              dec_params[f"conv{i}"]["Conv_0"]["bias"])
             for i in range(9)]
    out, _ = _conv_chain_q8(convs, _MIRROR_PROGRAM, x, dtype, conv_q, st)
    return out


def _sanet_transform_bf16(params, feats, n, adaptive, ada_module,
                          blockwise, dtype):
    """The attention transform on the (2N-batched) relu4_1/relu5_1 taps —
    bf16 flax apply of the exact model submodules."""
    from .sanet import AdaptiveTransform, Transform
    c4, s4 = feats[3][:n], feats[3][n:]
    c5, s5 = feats[4][:n], feats[4][n:]
    if adaptive:
        r4 = s4.shape[1] * s4.shape[2]
        r5 = s5.shape[1] * s5.shape[2]
        mod = AdaptiveTransform(512, r4, r5, ada_module, blockwise,
                                dtype=dtype)
        out, _aux = mod.apply({"params": params}, c4, s4, c5, s5)
        return out
    return Transform(512, dtype=dtype).apply({"params": params},
                                             c4, s4, c5, s5)


def _sanet_q8_pass(variables, vgg_vars, content, style, st, dtype,
                   conv_q, adaptive, ada_module, blockwise):
    n = content.shape[0]
    x2 = jnp.concatenate([content, style], axis=0)
    feats = _vgg_encode_q8(vgg_vars["params"], x2, 5, dtype, conv_q, st)
    fusion = _sanet_transform_bf16(variables["params"]["transform"], feats,
                                   n, adaptive, ada_module, blockwise, dtype)
    return _mirror_decode_q8(variables["params"]["decoder"],
                             fusion.astype(dtype), dtype, conv_q, st)


def calibrate_sanet_q8(variables, vgg_vars, content, style,
                       adaptive: bool = False, ada_module: str = "aea",
                       blockwise: str = "auto") -> Dict[str, np.ndarray]:
    """One bf16 calibration pass -> activation scales for
    :func:`stylize_sanet_q8` (same code path, recording stream)."""
    def collect(variables, vgg_vars, c, s):
        st = _ScaleStream()
        _sanet_q8_pass(variables, vgg_vars, c, s, st, jnp.bfloat16,
                       None, adaptive, ada_module, blockwise)
        return st.absmax

    absmax = jax.jit(collect)(variables, vgg_vars, content, style)
    return {"act_scales": np.asarray(
        [max(float(a), 1e-6) / 127.0 for a in absmax], np.float32)}


def stylize_sanet_q8(variables, vgg_vars, scales, content, style,
                     adaptive: bool = False, ada_module: str = "aea",
                     blockwise: str = "auto", dtype=jnp.bfloat16,
                     block_rows: int = 16,
                     interpret: bool = False) -> jnp.ndarray:
    """Int8 PTQ SANet serving (reference sanet.py:196-275 / 278-423):
    chained-int8 VGG encode of both images (2N batch), bf16 attention
    transform, int8 VGG-mirror decode."""
    st = _ScaleStream(scales["act_scales"])
    conv_q = _make_conv_q_std(dtype, block_rows, interpret, "reflect")
    out = _sanet_q8_pass(variables, vgg_vars, content, style, st, dtype,
                         conv_q, adaptive, ada_module, blockwise)
    return out.astype(content.dtype)


def _src_q8_pass(params, vgg_vars, content, style, st, dtype, conv_q):
    from ..ops.stats import adaptive_instance_normalization as adain
    n = content.shape[0]
    x2 = jnp.concatenate([content, style], axis=0)
    feats = _vgg_encode_q8(vgg_vars["params"], x2, 4, dtype, conv_q, st)
    f4 = feats[3].astype(jnp.float32)
    t = adain(f4[:n], f4[n:])
    return _mirror_decode_q8(params["decoder"], t.astype(dtype), dtype,
                             conv_q, st)


def calibrate_src_q8(params, vgg_vars, content, style) -> Dict[str,
                                                               np.ndarray]:
    """Calibration scales for :func:`stylize_src_q8`."""
    def collect(params, vgg_vars, c, s):
        st = _ScaleStream()
        _src_q8_pass(params, vgg_vars, c, s, st, jnp.bfloat16, None)
        return st.absmax

    absmax = jax.jit(collect)(params, vgg_vars, content, style)
    return {"act_scales": np.asarray(
        [max(float(a), 1e-6) / 127.0 for a in absmax], np.float32)}


def stylize_src_q8(params, vgg_vars, scales, content, style,
                   dtype=jnp.bfloat16, block_rows: int = 16,
                   interpret: bool = False) -> jnp.ndarray:
    """Int8 PTQ SourceNet serving (reference base.py:562-649: VGG encode
    both images to relu4_1, AdaIN fuse, VGG-mirror decode)."""
    st = _ScaleStream(scales["act_scales"])
    conv_q = _make_conv_q_std(dtype, block_rows, interpret, "reflect")
    out = _src_q8_pass(params, vgg_vars, content, style, st, dtype, conv_q)
    return out.astype(content.dtype)


# ---------------------------------------------------------------------------
# ld_adain (LD v1) int8 PTQ serving
# ---------------------------------------------------------------------------

def _lrelu_conv(x, k, b, dtype):
    """bf16 reflect-pad conv + lrelu(0.2) — the Conv2dBlock default the
    whole LD family is built from (reference adain_rp.py:484-567; pad =
    K//2 covers both the 3x3 small and 7x7 big branches)."""
    p = k.shape[0] // 2
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, k.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(dtype)
    return jnp.where(y >= 0, y, 0.2 * y)


def _xla_conv_q8(x_q, x_s, k, b, dtype, out_scale=None, alpha: float = 0.2):
    """Int8 reflect conv through XLA's own conv path + fused epilogue.

    For contractions K*K*C >= ~5k (the LD 7x7 branches) XLA's int8
    ``conv_general_dilated`` engages the true 2x int8 MXU rate on v5e —
    measured 255 TOP/s at 7x7 c256 and 172 at 7x7 c128 vs the 197 TF/s
    bf16 peak (tools/hw/hw_conv7_probe*.py, 2026-08-19; the first paths
    in this repo to exceed the bf16-rate floor — BASELINE.md's "never
    observed" conclusion was specific to Mosaic dot_general and XLA 3x3
    convs).  The Pallas standard-layout kernel stays the pick for 3x3."""
    p = k.shape[0] // 2
    w_q, w_scale = quantize_weights(k.astype(jnp.float32))
    xp = jnp.pad(x_q, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp, w_q, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    f = y.astype(jnp.float32) * (x_s * w_scale) + b.astype(jnp.float32)
    f = jnp.where(f >= 0, f, alpha * f)
    if out_scale is None:
        return f.astype(dtype)
    q = jnp.clip(jnp.round(f / out_scale), -127, 127)
    return q.astype(jnp.int8)


def _ld_stacks(params):
    """[(small_kb, big_kb)] per encoder layer + [dec_kb] from the LD v1
    param tree (models/ld_adain.py: rp_enc{i}_{small,big}_revf /
    rp_dec{i} Conv2dBlocks)."""
    def kb(name):
        c = params[name]["PadConv_0"]["Conv_0"]
        return c["kernel"], c["bias"]

    L = sum(1 for n in params if n.endswith("_small_revf"))
    enc = [(kb(f"rp_enc{i}_small_revf"), kb(f"rp_enc{i}_big_revf"))
           for i in range(L)]
    D = sum(1 for n in params if n.startswith("rp_dec"))
    dec = [kb(f"rp_dec{i}") for i in range(D)]
    return enc, dec


def _ld_q8_pass(params, content, style, st, dtype, conv_q,
                stylized_layers: int):
    """LD v1 forward (2N shared encode — exact, models/ld_adain.py:257-279)
    with the lane-aligned layers int8: at each aligned dual-branch layer
    the input is quantized ONCE and both branches consume the same int8
    tensor — the 3x3 small branch through the Pallas standard-layout
    kernel, the 7x7 big branch through XLA's int8 conv (2x-rate window,
    see _xla_conv_q8) — and both requantize to a SHARED output scale so
    the channel-concat stays a pure int8 concat.  Aligned decoder convs
    quantize per-conv (the AdaIN fusion additions between them are the
    style signal and stay float, mirroring every other q8 path)."""
    from ..ops.stats import adaptive_instance_normalization as adain

    enc, dec = _ld_stacks(params)
    L = len(enc)
    n = content.shape[0]

    def elig(i):
        (ks, _), (kg, _) = enc[i]
        return _q8_eligible(ks) and _q8_eligible(kg)

    x = jnp.concatenate([content, style], axis=0).astype(dtype)
    x_q8 = False   # is x (really or virtually) int8 right now?
    x_s = None     # replay: the int8 scale
    feats = []     # (tensor, scale-or-None) per layer
    for i in range(L):
        (ks, bs_), (kg, bg) = enc[i]
        if elig(i):
            if not x_q8:
                s = st.take(x)
                if not st.recording:
                    x, x_s = quantize_activations(x, s), s
            chain = i + 1 < L and elig(i + 1)
            if st.recording:
                sm = _lrelu_conv(x, ks, bs_, dtype)
                bg_o = _lrelu_conv(x, kg, bg, dtype)
                x = jnp.concatenate([sm, bg_o], axis=-1)
                if chain:
                    st.take(x)  # shared branch out scale
                x_q8, x_s = chain, None
                feats.append((x, None))
            else:
                out_s = st.take(None) if chain else None
                sm = conv_q(x, x_s, ks, bs_, out_scale=out_s)
                bg_o = _xla_conv_q8(x, x_s, kg, bg, dtype, out_scale=out_s)
                x = jnp.concatenate([sm, bg_o], axis=-1)
                x_q8, x_s = chain, out_s
                feats.append((x, out_s))
        else:
            if not st.recording and x_s is not None:
                x = _deq(x, x_s, dtype)
            x_q8, x_s = False, None
            sm = _lrelu_conv(x, ks, bs_, dtype)
            bg_o = _lrelu_conv(x, kg, bg, dtype)
            x = jnp.concatenate([sm, bg_o], axis=-1)
            feats.append((x, None))

    def fsplit(i):
        t, s = feats[i]
        f = t if s is None else _deq(t, s, dtype)
        return f[:n], f[n:]

    def dec_apply(x, k, b):
        if _q8_eligible(k):
            s = st.take(x)
            if not st.recording:
                return conv_q(quantize_activations(x, s), s, k, b)
        return _lrelu_conv(x, k, b, dtype)

    # decode (models/ld_adain.py:228-255, variant 1: running-fusion
    # adain(stylized, style_feat) — reference adain_rp.py:550)
    cf, sf = fsplit(L - 1)
    stylized = dec_apply(adain(cf, sf).astype(dtype), *dec[0])
    for i in range(L - 1):
        _, sfi = fsplit(L - 2 - i)
        if i < stylized_layers - 1:
            stylized = stylized + adain(stylized, sfi).astype(dtype)
        stylized = dec_apply(stylized, *dec[i + 1])
    return stylized


def calibrate_ld_q8(params, content, style,
                    stylized_layers: int = 5) -> Dict[str, np.ndarray]:
    """Calibration scales for :func:`stylize_ld_q8` (recording pass over
    the identical code path; batches capped like the other wide-channel
    calibrators)."""
    content, style = _calib_cap(content, style)

    def collect(params, c, s):
        st = _ScaleStream()
        _ld_q8_pass(params, c, s, st, jnp.bfloat16, None, stylized_layers)
        return st.absmax

    absmax = jax.jit(collect)(params, content, style)
    return {"act_scales": np.asarray(
        [max(float(a), 1e-6) / 127.0 for a in absmax], np.float32)}


def stylize_ld_q8(params, scales, content, style,
                  stylized_layers: int = 5, dtype=jnp.bfloat16,
                  block_rows: int = 16, interpret: bool = False,
                  conv_impl: str = "auto") -> jnp.ndarray:
    """Int8 PTQ LD v1 serving (reference adain_rp.py:484-567): the
    dual-branch 128/256-channel layers and the two wide decoder convs
    int8, AdaIN fusions bf16.

    ``conv_impl`` picks the int8 conv engine for the 3x3 smalls and
    decoder convs (the 7x7 bigs always run through XLA — its int8 conv
    path is the only one that engages the 2x MXU rate, 284-346 TOP/s):

    - ``'pallas'``: the standard-layout Mosaic kernel — fastest at
      batch >= 4 (2N encode >= 8), where XLA lays the convs out
      row-major and the two engines share layouts for free.
    - ``'xla'``: everything through :func:`_xla_conv_q8` — at small
      batch XLA's convs switch to a space-to-batch form with layout
      {3,0,2,1:T(2,128)} while Mosaic custom calls pin row-major
      {3,2,1,0:T(8,128)(4,1)}, and mixing them inserts ~1.5 GB of
      transposing relayout copies per pass (s32[2,512,512,256] conv
      outputs among them — measured 210 ms vs 52 ms at b1 512px,
      tools/hw/hw_ld_q8_bisect.py + the HLO dump). One engine =
      one layout world.
    - ``'auto'``: ``'pallas'`` iff the shared 2N encode batch >= 8.

    Measured 512px (h16/L5, v5e): b1 13.5 -> 19.4 img/s, b2 12.1 ->
    16.3 (xla), b4 15.2 -> 26.4 (pallas) — vs the bf16 fast path."""
    if conv_impl == "auto":
        from ..policy import LD_MIXED_ENGINE_MIN_2N
        conv_impl = ("pallas" if 2 * content.shape[0]
                     >= LD_MIXED_ENGINE_MIN_2N else "xla")
    st = _ScaleStream(scales["act_scales"])
    if conv_impl == "xla":
        def conv_q(x_q, x_s, k, b, out_scale=None):
            return _xla_conv_q8(x_q, x_s, k, b, dtype,
                                out_scale=out_scale, alpha=0.2)
    else:
        conv_q = _make_conv_q_std(dtype, block_rows, interpret, "reflect",
                                  alpha=0.2)
    out = _ld_q8_pass(params, content, style, st, dtype, conv_q,
                      stylized_layers)
    return out.astype(content.dtype)


def _ld2_stacks(params):
    """[(small_kb, conv1x1_kb, conv_a_kb, conv_b_kb)] per encoder layer +
    [dec_kb] from the LD v2 param tree (models/ld_adain.py: the big branch
    is a VGGishBigBranch — conv1x1 (linear) -> reflect 3x3 relu x2 ->
    2x2/2 maxpool -> trailing reflect pad -> nearest re-upsample;
    reference adain_rp.py:580-625)."""
    def kb(sub):
        c = sub["PadConv_0"]["Conv_0"]
        return c["kernel"], c["bias"]

    L = sum(1 for n in params if n.endswith("_small_revf"))
    enc = []
    for i in range(L):
        big = params[f"rp_enc{i}_big_revf"]
        enc.append((kb(params[f"rp_enc{i}_small_revf"]),
                    (big["conv1x1"]["kernel"], big["conv1x1"]["bias"]),
                    (big["conv_a"]["Conv_0"]["kernel"],
                     big["conv_a"]["Conv_0"]["bias"]),
                    (big["conv_b"]["Conv_0"]["kernel"],
                     big["conv_b"]["Conv_0"]["bias"])))
    D = sum(1 for n in params if n.startswith("rp_dec"))
    dec = [kb(params[f"rp_dec{i}"]) for i in range(D)]
    return enc, dec


def _conv1x1(x, k, b, dtype):
    """The VGGishBigBranch head: a linear (un-activated) 1x1 conv.  Stays
    bf16 — its contraction (K = C) sits below every measured int8
    fast-rate window and it carries ~2% of the family's MACs."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(dtype)


def _ld2_q8_pass(params, content, style, st, dtype, conv_lrelu, conv_relu,
                 stylized_layers: int):
    """LD v2 forward (2N shared encode — exact, no batch-coupled ops)
    with the lane-aligned dual-branch layers int8.

    At each aligned layer three convs quantize: the 3x3 small branch
    (lrelu), and the big branch's two full-resolution reflect 3x3 relu
    convs chained int8 (the conv1x1 between the shared input and conv_a
    stays bf16, so conv_a's input is quantized separately).  The maxpool
    / trailing pad / nearest upsample run bf16 on conv_b's float output
    (they're past the wide full-res convs that carry the MACs), and the
    branch concat is float — the deepest concat feeds AdaIN, which is
    the style signal and never quantizes.  The decoder reuses the v1
    running-fusion decode (reference adain_rp.py:550) with aligned convs
    int8."""
    from ..ops.stats import adaptive_instance_normalization as adain
    from .ld_adain import _resize_nearest

    enc, dec = _ld2_stacks(params)
    L = len(enc)
    n = content.shape[0]

    def elig(i):
        (ks, _), _, (ka, _), (kb_, _) = enc[i]
        return (_q8_eligible(ks) and _q8_eligible(ka)
                and _q8_eligible(kb_))

    x = jnp.concatenate([content, style], axis=0).astype(dtype)
    feats = []
    for i in range(L):
        (ks, bs_), c1, (ka, ba), (kb_, bb) = enc[i]
        h, w = x.shape[1], x.shape[2]
        t = _conv1x1(x, *c1, dtype)
        if elig(i):
            s_x = st.take(x)
            s_t = st.take(t)
            if st.recording:
                sm = _lrelu_conv(x, ks, bs_, dtype)
                a = _reflect_conv(t, ka, ba, dtype)
                st.take(a)  # conv_a -> conv_b chain scale
                bg = _reflect_conv(a, kb_, bb, dtype)
            else:
                sm = conv_lrelu(quantize_activations(x, s_x), s_x, ks, bs_)
                s_ab = st.take(None)
                a = conv_relu(quantize_activations(t, s_t), s_t, ka, ba,
                              out_scale=s_ab)
                bg = conv_relu(a, s_ab, kb_, bb)
        else:
            sm = _lrelu_conv(x, ks, bs_, dtype)
            a = _reflect_conv(t, ka, ba, dtype)
            bg = _reflect_conv(a, kb_, bb, dtype)
        bg = _maxpool2x_any(bg)
        bg = jnp.pad(bg, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        bg = _resize_nearest(bg, h, w)
        x = jnp.concatenate([sm, bg.astype(sm.dtype)], axis=-1)
        feats.append(x)

    def fsplit(i):
        return feats[i][:n], feats[i][n:]

    def dec_apply(x, k, b):
        if _q8_eligible(k):
            s = st.take(x)
            if not st.recording:
                return conv_lrelu(quantize_activations(x, s), s, k, b)
        return _lrelu_conv(x, k, b, dtype)

    # decode (models/ld_adain.py:228-255, variant 2 = variant 1's
    # running-fusion adain(stylized, style_feat) — reference adain_rp:550)
    cf, sf = fsplit(L - 1)
    stylized = dec_apply(adain(cf, sf).astype(dtype), *dec[0])
    for i in range(L - 1):
        _, sfi = fsplit(L - 2 - i)
        if i < stylized_layers - 1:
            stylized = stylized + adain(stylized, sfi).astype(dtype)
        stylized = dec_apply(stylized, *dec[i + 1])
    return stylized


def calibrate_ld2_q8(params, content, style,
                     stylized_layers: int = 5) -> Dict[str, np.ndarray]:
    """Calibration scales for :func:`stylize_ld2_q8` (recording pass over
    the identical code path; batches capped like the other wide-channel
    calibrators)."""
    content, style = _calib_cap(content, style)

    def collect(params, c, s):
        st = _ScaleStream()
        _ld2_q8_pass(params, c, s, st, jnp.bfloat16, None, None,
                     stylized_layers)
        return st.absmax

    absmax = jax.jit(collect)(params, content, style)
    return {"act_scales": np.asarray(
        [max(float(a), 1e-6) / 127.0 for a in absmax], np.float32)}


def stylize_ld2_q8(params, scales, content, style,
                   stylized_layers: int = 5, dtype=jnp.bfloat16,
                   block_rows: int = 16, interpret: bool = False,
                   conv_impl: str = "auto") -> jnp.ndarray:
    """Int8 PTQ LD v2 serving (reference adain_rp.py:580-625): the
    lane-aligned dual-branch layers int8 — the 3x3 small (lrelu) plus
    the big branch's two full-resolution 3x3 relu convs — and the wide
    decoder convs int8; conv1x1 / pool / upsample / AdaIN fusions bf16.

    All int8 convs here are 3x3, so ``conv_impl`` is a pure engine
    choice with no mixed-engine layout risk (see :func:`stylize_ld_q8`);
    ``'pallas'`` = the standard-layout Mosaic kernel, ``'xla'`` = XLA's
    int8 conv, ``'auto'`` = pallas iff the shared 2N encode batch >= 4
    — with no XLA int8 convs in the mix the crossover sits LOWER than
    v1's (hw A/B 2026-08-19: b1 pallas 23.0 vs xla 25.5 img/s, b2 28.2
    vs 22.2).

    Measured 512px (h8/L5, v5e) vs the bf16 path: b1 26.9 -> 25.5
    (-5%: the one point below bf16 — only ~44% of the family's MACs are
    lane-aligned), b2 20.9 -> 28.2 (+35%), b4 24.3 -> 27.9 (+15%)."""
    if conv_impl == "auto":
        from ..policy import LD_PALLAS_MIN_2N
        conv_impl = ("pallas" if 2 * content.shape[0]
                     >= LD_PALLAS_MIN_2N else "xla")
    st = _ScaleStream(scales["act_scales"])
    if conv_impl == "xla":
        def conv_lrelu(x_q, x_s, k, b, out_scale=None):
            return _xla_conv_q8(x_q, x_s, k, b, dtype,
                                out_scale=out_scale, alpha=0.2)

        def conv_relu(x_q, x_s, k, b, out_scale=None):
            return _xla_conv_q8(x_q, x_s, k, b, dtype,
                                out_scale=out_scale, alpha=0.0)
    else:
        conv_lrelu = _make_conv_q_std(dtype, block_rows, interpret,
                                      "reflect", alpha=0.2)
        conv_relu = _make_conv_q_std(dtype, block_rows, interpret,
                                     "reflect", alpha=0.0)
    out = _ld2_q8_pass(params, content, style, st, dtype, conv_lrelu,
                       conv_relu, stylized_layers)
    return out.astype(content.dtype)
