"""LDMS ("Large-receptive-field Dual-branch MultiScale") AdaIN RP family.

Reference ``network/adain_rp.py:484-858`` — five variants, all sharing the
idea of pairing a small-receptive-field branch with a big-RF branch at
every RP layer and fusing channel-wise:

  v1 (``ld_adain``)  : big RF = 7x7 Conv2dBlock; widths double per layer;
                       single fused stream (adain_rp.py:484-567)
  v2 (``ld_adain2``) : big RF = pooled VGG-ish branch, nearest re-upsample;
                       single fused stream (adain_rp.py:570-625)
  v3 (``ld_adain3``) : two *separate* streams (fine/coarse), constant
                       width, fuse only for the decoder; element-wise-sum
                       decode (adain_rp.py:628-708)
  v4 (``ld_adain4``) : v3 with channel-concat decode and the fusion taken
                       from the *content* features (adain_rp.py:711-819)
  v5 (``ld_adain5``) : v4 with learned ConvTranspose upsampling instead of
                       nearest interpolation (adain_rp.py:822-858)

Reference quirks preserved/documented:
  * v1-v3 decode with ``stylized_layers < layer_num`` computes
    ``stylized + []`` in torch (a TypeError, adain_rp.py:543-552) — i.e.
    those settings are unrunnable upstream; here the un-fused path cleanly
    skips the addition.
  * the v1/v2 shallower-scale fusion is ``AdaIN(stylized, style_feat)``
    (adain_rp.py:550) while v4/v5 fuse ``AdaIN(content_feat, style_feat)``
    (adain_rp.py:791) — both kept exactly.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import Conv2dBlock, PadConv, make_torch_bias_init, \
    torch_conv_kernel_init
from ..ops.segment import masked_adain_batch
from ..ops.stats import adaptive_instance_normalization as adain


def _resize_nearest(x, h, w):
    """torch ``F.interpolate(mode='nearest')`` semantics: source index =
    ``floor(dst * in / out)`` (top-left anchored), which differs from
    jax.image.resize's half-pixel-center rule for non-integer scales —
    the v2/v3 big branch upsamples (H/2+2) -> H, a non-integer ratio."""
    hi = (jnp.arange(h) * x.shape[1]) // h
    wi = (jnp.arange(w) * x.shape[2]) // w
    return x[:, hi][:, :, wi]


class VGGishBigBranch(nn.Module):
    """The pooled big-RF branch of v2-v5 (adain_rp.py:586-594 etc.):
    conv1x1 → (reflect-pad, 3x3 conv, relu) ×2 → ceil-mode maxpool
    [→ trailing reflection pad for v2/v3]."""
    features: int
    trailing_pad: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        x = nn.Conv(self.features, (1, 1), use_bias=True,
                    kernel_init=torch_conv_kernel_init,
                    bias_init=make_torch_bias_init(fan_in),
                    dtype=self.dtype, name="conv1x1")(x)
        for name in ("conv_a", "conv_b"):
            conv = PadConv(self.features, 3, 1, 1, "reflect",
                           dtype=self.dtype, name=name)
            y = conv(x)  # registers params (same tree either way)
            if VGGISH_INT8:
                # DCE drops the unused bf16 conv above under jit; the
                # int8 form reads the registered params directly
                p = self.scope.get_variable("params", name)
                y = _dyn_q8_conv3x3_reflect(
                    x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                    self.dtype or x.dtype)
            x = nn.relu(y)
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        if self.trailing_pad:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return x


# Measurement-only A/B switches (round-4 VERDICT item 8): dynamic-int8
# forms of the LD residual candidates — the v5 non-overlap upsampler
# projection and the v3-v5 pooled-branch 3x3 convs.  The revised hardware
# model predicts no win (contractions K=8-16 / K*K*C=72-144, far below
# the ~5k XLA int8 fast-rate window and the K>=256 Mosaic window), so
# these exist to MEASURE that prediction (tools/hw/hw_ld_residual_q8.py);
# only the hw runner may flip them (dynamic rounding has no useful VJP —
# serving-only).
NONOVERLAP_INT8 = False
VGGISH_INT8 = False


def _dyn_q8_dot(x2d, km):
    """Dynamic per-tensor int8 matmul: quantize both operands on the
    fly, int32 accumulate, dequantize.  Measurement-path only."""
    sx = jnp.maximum(jnp.max(jnp.abs(x2d.astype(jnp.float32))), 1e-12) / 127
    sk = jnp.maximum(jnp.max(jnp.abs(km.astype(jnp.float32))), 1e-12) / 127
    xq = jnp.clip(jnp.round(x2d.astype(jnp.float32) / sx), -127,
                  127).astype(jnp.int8)
    kq = jnp.clip(jnp.round(km.astype(jnp.float32) / sk), -127,
                  127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, kq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * sk)


def _dyn_q8_conv3x3_reflect(x, kernel, bias, dtype):
    """Dynamic per-tensor int8 reflect 3x3 conv + bias via XLA's int8
    conv path.  Measurement-path only."""
    sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127
    sk = jnp.maximum(jnp.max(jnp.abs(kernel.astype(jnp.float32))),
                     1e-12) / 127
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127,
                  127).astype(jnp.int8)
    kq = jnp.clip(jnp.round(kernel.astype(jnp.float32) / sk), -127,
                  127).astype(jnp.int8)
    xq = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    acc = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sk) + bias.astype(jnp.float32)
    return y.astype(dtype)


class NonOverlapConvTranspose(nn.Module):
    """ConvTranspose with kernel_size == strides (the v5 upsamplers,
    reference adain_rp.py:822-858): each output pixel receives exactly
    one kernel tap, so the transpose is a 1x1 projection C -> s*s*Co on
    the coarse grid followed by depth-to-space.  XLA lowers the generic
    ConvTranspose to an input-dilated conv that multiplies mostly zeros
    — s^2 times the useful MACs (1024x at the deepest s=32 layer); this
    exact rewrite is one MXU matmul.  Param tree (kernel (s, s, C, Co)
    lecun-normal, bias (Co,) zeros) identical to ``nn.ConvTranspose``'s
    defaults, so checkpoints are interchangeable (equality-tested in
    tests/test_models.py)."""
    features: int
    kernel_size: Tuple[int, int] = (2, 2)
    strides: Tuple[int, int] = (2, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        assert (kh, kw) == tuple(self.strides)
        n, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        # flax ConvTranspose applies the taps spatially flipped (the
        # transpose of a correlation); flip to match bit-for-bit
        km = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(
            c, kh * kw * self.features).astype(dt)
        if NONOVERLAP_INT8:
            y = _dyn_q8_dot(x.reshape(-1, c), km).astype(dt)
        else:
            y = jax.lax.dot_general(x.astype(dt).reshape(-1, c), km,
                                    (((1,), (0,)), ((), ())))
        y = y.reshape(n, h, w, kh, kw, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        y = y.reshape(n, h * kh, w * kw, self.features)
        return y + bias.astype(dt)


class LDAdaINRP(nn.Module):
    variant: int = 1  # 1..5
    layer_num: int = 5
    hidden_dim: int = 16
    stylized_layers: int = 5
    inception_num: int = 0
    use_mask: bool = False
    max_seg_labels: int = 64
    dtype: Any = None

    def setup(self):
        assert self.variant in (1, 2, 3, 4, 5)
        L, h = self.layer_num, self.hidden_dim
        doubling = self.variant in (1, 2)
        widths = [h * 2 ** i for i in range(L)] if doubling else [h] * L

        smalls, bigs = [], []
        for i, w in enumerate(widths):
            smalls.append(Conv2dBlock(
                features=w, kernel_size=3, padding=1,
                inception_num=self.inception_num, dtype=self.dtype,
                name=f"rp_enc{i}_small_revf"))
            if self.variant == 1:
                # the layer-0 big branch is 3x3 in the reference; only
                # layers >= 1 widen to 7x7 (adain_rp.py:503-514)
                ks = 3 if i == 0 else 7
                bigs.append(Conv2dBlock(
                    features=w, kernel_size=ks, padding=ks // 2,
                    inception_num=self.inception_num, dtype=self.dtype,
                    name=f"rp_enc{i}_big_revf"))
            else:
                bigs.append(VGGishBigBranch(
                    features=w, trailing_pad=self.variant in (2, 3),
                    dtype=self.dtype, name=f"rp_enc{i}_big_revf"))
        self.smalls, self.bigs = smalls, bigs
        self.enc_out = widths[-1]

        self.decs = self._build_decoders(L, self.enc_out)

        if self.variant == 5:
            self.ups = [NonOverlapConvTranspose(
                features=h, kernel_size=(2 ** (i + 1),) * 2,
                strides=(2 ** (i + 1),) * 2, dtype=self.dtype,
                name=f"up_{i}") for i in range(L)]

    def _build_decoders(self, L: int, enc_out: int) -> List[Conv2dBlock]:
        sl = self.stylized_layers
        mk = lambda i, fout: Conv2dBlock(
            features=fout, kernel_size=3, padding=1,
            inception_num=self.inception_num, dtype=self.dtype,
            name=f"rp_dec{i}")
        decs = []
        if self.variant in (1, 2):
            # adain_rp.py:517-536 (in-dims implicit in flax; out-dims match)
            hidden = enc_out
            for i in range(L - 1):
                if i < sl - 1:
                    decs.append(mk(i, hidden))
                else:
                    decs.append(mk(i, hidden // 2))
                hidden //= 2
            decs.append(mk(L - 1, 3))
        elif self.variant == 3:
            # adain_rp.py:670-688
            hidden = enc_out
            for i in range(L - 1):
                if i < sl - 1:
                    decs.append(mk(i, hidden * 2))
                else:
                    decs.append(mk(i, hidden))
            decs.append(mk(L - 1, 3))
        else:  # v4 / v5: adain_rp.py:751-778
            hidden = enc_out
            for i in range(L - 1):
                if i < sl - 1:
                    decs.append(mk(i, hidden * 2))
                else:
                    decs.append(mk(i, hidden))
            decs.append(mk(L - 1, 3))
        return decs

    # ------------------------------------------------------------------
    def encode_intermediate(self, x, train: bool = False):
        L = self.layer_num
        if self.variant in (1, 2):
            feats, cur = [], x
            for i in range(L):
                s = self.smalls[i](cur, train=train)
                b = self.bigs[i](cur) if self.variant != 1 else \
                    self.bigs[i](cur, train=train)
                if self.variant == 2:
                    b = _resize_nearest(b, s.shape[1], s.shape[2])
                cur = jnp.concatenate([s, b], axis=-1)
                feats.append(cur)
            return feats
        # v3/v4/v5: separate fine and coarse streams
        feats, fine, coarse = [], x, x
        for i in range(L):
            fine = self.smalls[i](fine, train=train)
            coarse = self.bigs[i](coarse)
            if self.variant == 5:
                b = self.ups[i](coarse)
                # ConvTranspose output may overshoot fine's dims when the
                # coarse stream carries the reference's odd pad/pool sizes;
                # crop/resize to the fine grid (reference aligns via exact
                # power-of-two sizes only).
                if b.shape[1:3] != fine.shape[1:3]:
                    b = _resize_nearest(b, fine.shape[1], fine.shape[2])
            else:
                b = _resize_nearest(coarse, fine.shape[1], fine.shape[2])
            feats.append(jnp.concatenate([fine, b], axis=-1))
        return feats

    def decode(self, content_feats, style_feats, c_labels=None, s_labels=None,
               use_mask: bool = False, train: bool = False):
        L_lbl = self.max_seg_labels

        def fuse_content(cf, sf):
            if use_mask and c_labels is not None:
                return masked_adain_batch(cf, sf, c_labels, s_labels, L_lbl)
            return adain(cf, sf)

        stylized = fuse_content(content_feats[-1], style_feats[-1])
        stylized = self.decs[0](stylized, train=train)
        pairs = list(zip(content_feats[:-1], style_feats[:-1]))[::-1]
        for i, (cf, sf) in enumerate(pairs):
            if self.variant in (4, 5):
                prefix = fuse_content(cf, sf)  # content-side fusion (791)
                stylized = self.decs[i + 1](
                    jnp.concatenate([stylized, prefix], axis=-1), train=train)
            else:
                if i < self.stylized_layers - 1:
                    if use_mask and c_labels is not None:
                        fusion = masked_adain_batch(cf, sf, c_labels,
                                                    s_labels, L_lbl)
                    else:
                        fusion = adain(stylized, sf)  # running-fusion (550)
                    stylized = self.decs[i + 1](stylized + fusion, train=train)
                else:
                    stylized = self.decs[i + 1](stylized, train=train)
        return stylized

    def __call__(self, content, style, train: bool = False,
                 c_labels=None, s_labels=None, test_mode: bool = False):
        # One 2N pass through the shared encoder (exact — no batch-coupled
        # ops in the LD stacks). XLA picks far better conv layouts for the
        # 2N shapes — the same small-batch pathology class as BASELINE.md's
        # adain b1/b4 inversion. Measured on v5e at 512px:
        # ld_adain b4 9.3 -> 15.2, b1 neutral (13.0 -> 13.4).
        # v3/v4 measured the OPPOSITE at b4 (42.8 -> 36.6 / 44.8 -> 32.4),
        # and v5 — which benefited while its ConvTranspose dominated
        # (b1 6.4 -> 10.9) — flipped once the NonOverlapConvTranspose
        # rewrite removed that sink (b4 40.4 -> 30.7, b1 neutral), so the
        # batching is gated to variant 1, plus variant 2 at batch >= 4
        # (hw_ld2_2n_ab.py 2026-08-19: b4 20.8 -> 24.1, b1 27.0 -> 23.5;
        # threshold lives in rpst.policy.LD2_2N_ENCODE_MIN_BATCH).
        from ..policy import LD2_2N_ENCODE_MIN_BATCH
        if self.variant == 1 or (self.variant == 2 and content.shape[0]
                                 >= LD2_2N_ENCODE_MIN_BATCH):
            n = content.shape[0]
            feats = self.encode_intermediate(
                jnp.concatenate([content, style], axis=0), train=train)
            cf = [f[:n] for f in feats]
            sf = [f[n:] for f in feats]
        else:
            cf = self.encode_intermediate(content, train=train)
            sf = self.encode_intermediate(style, train=train)
        return self.decode(cf, sf, c_labels, s_labels,
                           use_mask=self.use_mask and test_mode, train=train)
