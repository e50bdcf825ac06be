"""AdaIN RP model family.

  * AdaINRP            — reference ``network/adain_rp.py:15-138`` (single
    fusion at the deepest feature; increasing/decreasing plain conv stacks)
  * MultiScaleAdaINRP  — ``adain_rp.py:141-345`` (the flagship: fuse at
    every RP scale with residual re-fusion; deeper/constant stacks;
    optional SE attention, channel shuffle, attention-sort, masked AdaIN)
  * CCAMRP             — ``adain_rp.py:348-422`` (cross-channel attention
    residual at each scale; the reference's CCAMDec params were
    accidentally unregistered — here they are real trainable params, math
    unchanged)
  * SELastRP           — ``adain_rp.py:451-481`` (SE bottleneck on the last
    fusion)
  * MSTRP              — ``adain_rp.py:425-448`` (graph-cut multimodal
    style matching at each fused scale; non-differentiable transform, so
    only the decoder trains — preserved via stop_gradient)

TPU-first notes: fusion scales all run at full resolution (the RP
property), so the decode loop is a short static Python loop over
submodules — XLA unrolls and fuses it; no data-dependent control flow.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import SEBottleneck
from ..nn.blocks import (RPSequence, RPStack, rp_constant_dims,
                         rp_decrease_dims, rp_deeper_dims, rp_increase_dims,
                         rp_shallower_dims)
from ..ops.mst import mst_transfer_batch
from ..ops.segment import masked_adain_batch
from ..ops.stats import adaptive_instance_normalization as adain
from .base import channel_shuffle, sort_channels_by_attention


def _fuse(content_feat, style_feat, c_labels, s_labels, use_mask: bool,
          num_labels: int):
    """AdaIN or segment-masked AdaIN, matching decode()'s use_mask switch
    (adain_rp.py:292-300)."""
    if use_mask and c_labels is not None:
        return masked_adain_batch(content_feat, style_feat, c_labels,
                                  s_labels, num_labels)
    return adain(content_feat, style_feat)


class AdaINRP(nn.Module):
    """Single-scale RP AdaIN (reference AdaINRPNet)."""
    rp_blocks: int = 5
    hidden_dim: int = 16
    use_mask: bool = False
    max_seg_labels: int = 64
    dtype: Any = None

    def setup(self):
        enc_out = self.hidden_dim * 2 ** (self.rp_blocks - 1)
        self.encoder = RPSequence(
            dims=rp_increase_dims(self.rp_blocks, 3, self.hidden_dim, enc_out),
            dtype=self.dtype)
        self.decoder = RPSequence(
            dims=rp_decrease_dims(self.rp_blocks, enc_out, enc_out // 2, 3),
            dtype=self.dtype)

    def __call__(self, content, style, train: bool = False,
                 c_labels=None, s_labels=None):
        # one 2N pass through the shared encoder (exact: plain conv+relu,
        # no batch-coupled state; measured much better XLA conv shapes at
        # small batch — see BASELINE.md round-2 training note)
        n = content.shape[0]
        if n > 1:
            feats = self.encoder(jnp.concatenate([content, style], axis=0),
                                 train=train)
            cf, sf = feats[:n], feats[n:]
        else:
            cf = self.encoder(content, train=train)
            sf = self.encoder(style, train=train)
        fused = _fuse(cf, sf, c_labels, s_labels, self.use_mask,
                      self.max_seg_labels)
        return self.decoder(fused, train=train)


class MultiScaleAdaINRP(nn.Module):
    """Multiscale RP AdaIN (reference MultiScaleAdaINRPNet).

    decode(): AdaIN at the deepest scale, then walking the decoder blocks,
    each shallower scale is re-fused and added residually:
    ``stylized = dec[i+1](stylized + AdaIN(content_feat_i, style_feat_i))``
    (adain_rp.py:286-302 — note the fusion argument is the *content
    feature*, not the running stylized, unlike CCAM/LD variants).
    """
    rp_blocks: int = 5
    hidden_dim: int = 32
    enc_stack_way: str = "constant"
    inception_num: int = 0
    attention: str = "none"
    shuffle: bool = False
    shuffle_layers: int = 1
    sort: bool = False
    use_mask: bool = False
    max_seg_labels: int = 64
    dtype: Any = None

    def setup(self):
        if self.enc_stack_way == "deeper":
            enc_out = self.hidden_dim * 2 ** (self.rp_blocks - 1)
            enc_dims = rp_deeper_dims(self.rp_blocks, 3, self.hidden_dim, enc_out)
            dec_dims = rp_shallower_dims(self.rp_blocks, enc_out, enc_out // 2, 3)
            enc_attention = "none"  # deeper builder takes no attention arg
        else:  # constant (adain_rp.py:158-168)
            enc_out = self.hidden_dim
            enc_dims = rp_constant_dims(self.rp_blocks, 3, self.hidden_dim, enc_out)
            dec_dims = rp_constant_dims(self.rp_blocks, enc_out, self.hidden_dim, 3)
            enc_attention = self.attention
        self.encoder = RPStack(dims=enc_dims, inception_num=self.inception_num,
                               attention=enc_attention, dtype=self.dtype,
                               name="rp_shared_encoder")
        # the reference decoder is built WITHOUT inception/attention in both
        # stack branches (adain_rp.py:158, 168)
        self.decoder = RPStack(dims=dec_dims, dtype=self.dtype,
                               name="rp_decoder")

    def encode_intermediate(self, x, train: bool = False):
        return self.encoder.intermediates_with_attention(x, train=train)

    def _prep_feats(self, feats, atts, do_shuffle: bool,
                    do_sort: bool = True):
        if do_shuffle and self.shuffle:
            feats = [channel_shuffle(f) if i <= self.shuffle_layers else f
                     for i, f in enumerate(feats)]
        if do_sort and self.sort:
            feats = [sort_channels_by_attention(f, a) if a is not None else f
                     for f, a in zip(feats, atts)]
        return feats

    def decode(self, content_feats, style_feats, c_labels=None, s_labels=None,
               use_mask: bool = False, train: bool = False):
        num_labels = self.max_seg_labels
        stylized = _fuse(content_feats[-1], style_feats[-1], c_labels,
                         s_labels, use_mask, num_labels)
        stylized = self.decoder.apply_block(stylized, 0, train=train)
        pairs = list(zip(content_feats[:-1], style_feats[:-1]))[::-1]
        for i, (cf, sf) in enumerate(pairs):
            fusion = _fuse(cf, sf, c_labels, s_labels, use_mask, num_labels)
            stylized = self.decoder.apply_block(stylized + fusion, i + 1,
                                                train=train)
        return stylized

    def __call__(self, content, style, train: bool = False,
                 c_labels=None, s_labels=None, test_mode: bool = False):
        cf, c_atts = self.encode_intermediate(content, train=train)
        sf, s_atts = self.encode_intermediate(style, train=train)
        # channel shuffle applies only at test time (adain_rp.py:251-260);
        # attention-sort applies inside decode in both modes (289-291).
        # NB the reference reads attention maps cached on the *shared*
        # encoder modules (adain_rp.py:240), and the style image is encoded
        # last — so BOTH sorts use the style pass's attention. Preserved.
        cf = self._prep_feats(cf, s_atts, do_shuffle=test_mode)
        sf = self._prep_feats(sf, s_atts, do_shuffle=test_mode)
        return self.decode(cf, sf, c_labels, s_labels,
                           use_mask=self.use_mask and test_mode, train=train)


class CCAMDec(nn.Module):
    """Cross-channel attention decode (adain_rp.py:348-385).

    Inputs detached; ``scale`` starts at 0 and is a *registered* trainable
    parameter here (the reference's ``.cuda()`` wrapper silently
    unregistered it, freezing it at 0 — we fix the registration, keep the
    math)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, y):
        x = jax.lax.stop_gradient(x)
        y = jax.lax.stop_gradient(y)
        n, h, w, c = x.shape
        k = y.shape[-1]
        xr = x.reshape(n, h * w, c)
        yr = y.reshape(n, -1, k)
        energy = jnp.einsum("npc,npk->nck", xr, yr)  # (N, C, K)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attention = jax.nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("nck,npk->npc", attention, yr).reshape(n, h, w, c)
        scale = self.param("scale", nn.initializers.zeros, (1,))
        return x + scale * out


class CCAMRP(nn.Module):
    """Multiscale AdaIN + per-layer CCAM residual (CrossChannelAttentionRPNet).

    decode differs from MultiScaleAdaINRP: the shallower-scale fusion is
    ``AdaIN(stylized, style_feat)`` (adain_rp.py:414) and the attention
    residual is added before each decoder block; ``stylized_layers`` limits
    how many scales are fused (adain_rp.py:409)."""
    rp_blocks: int = 5
    hidden_dim: int = 32
    enc_stack_way: str = "constant"
    inception_num: int = 0
    attention: str = "none"
    shuffle: bool = False
    shuffle_layers: int = 1
    sort: bool = False
    stylized_layers: int = 5
    use_mask: bool = False
    max_seg_labels: int = 64
    dtype: Any = None

    def setup(self):
        ms = MultiScaleAdaINRP(
            rp_blocks=self.rp_blocks, hidden_dim=self.hidden_dim,
            enc_stack_way=self.enc_stack_way, inception_num=self.inception_num,
            attention=self.attention, shuffle=self.shuffle,
            shuffle_layers=self.shuffle_layers, sort=self.sort,
            use_mask=self.use_mask, max_seg_labels=self.max_seg_labels,
            dtype=self.dtype, name="ms")
        self.ms = ms
        self.channel_attentions = [CCAMDec(dtype=self.dtype, name=f"ccam_{i}")
                                   for i in range(self.rp_blocks)]

    def __call__(self, content, style, train: bool = False,
                 c_labels=None, s_labels=None, test_mode: bool = False):
        cf, c_atts = self.ms.encode_intermediate(content, train=train)
        sf, s_atts = self.ms.encode_intermediate(style, train=train)
        # the reference CCAM decode override drops the sort branch
        # (adain_rp.py:400-422) — shuffle still applies via test()
        cf = self.ms._prep_feats(cf, c_atts, do_shuffle=test_mode,
                                 do_sort=False)
        sf = self.ms._prep_feats(sf, s_atts, do_shuffle=test_mode,
                                 do_sort=False)
        use_mask = self.use_mask and test_mode
        L = self.max_seg_labels

        stylized = _fuse(cf[-1], sf[-1], c_labels, s_labels, use_mask, L)
        att_res = self.channel_attentions[0](cf[-1], sf[-1])
        stylized = self.ms.decoder.apply_block(stylized + att_res, 0, train=train)
        pairs = list(zip(cf[:-1], sf[:-1]))[::-1]
        for i, (cfi, sfi) in enumerate(pairs):
            if i + 1 < self.stylized_layers:
                stylized = _fuse(stylized, sfi, c_labels, s_labels, use_mask, L)
                att_res = self.channel_attentions[i + 1](stylized, sfi)
                stylized = self.ms.decoder.apply_block(
                    stylized + att_res, i + 1, train=train)
            else:
                stylized = self.ms.decoder.apply_block(stylized, i + 1,
                                                       train=train)
        return stylized


class SELastRP(nn.Module):
    """Multiscale AdaIN with one SE bottleneck on the final fusion
    (SELastMultiScaleAdaINRPNet, adain_rp.py:451-481)."""
    rp_blocks: int = 5
    hidden_dim: int = 32
    enc_stack_way: str = "constant"
    inception_num: int = 0
    attention: str = "none"
    use_mask: bool = False
    max_seg_labels: int = 64
    dtype: Any = None

    def setup(self):
        self.ms = MultiScaleAdaINRP(
            rp_blocks=self.rp_blocks, hidden_dim=self.hidden_dim,
            enc_stack_way=self.enc_stack_way, inception_num=self.inception_num,
            attention=self.attention, use_mask=self.use_mask,
            max_seg_labels=self.max_seg_labels, dtype=self.dtype, name="ms")
        self.attention_block = SEBottleneck(planes=self.hidden_dim,
                                            dtype=self.dtype)

    def __call__(self, content, style, train: bool = False,
                 c_labels=None, s_labels=None, test_mode: bool = False):
        cf, _ = self.ms.encode_intermediate(content, train=train)
        sf, _ = self.ms.encode_intermediate(style, train=train)
        use_mask = self.use_mask and test_mode
        L = self.max_seg_labels

        stylized = adain(cf[-1], sf[-1])
        stylized = self.ms.decoder.apply_block(stylized, 0, train=train)
        pairs = list(zip(cf[:-1], sf[:-1]))[::-1]
        for i, (cfi, sfi) in enumerate(pairs):
            if use_mask and c_labels is not None:
                stylized = masked_adain_batch(cfi, sfi, c_labels, s_labels, L)
            else:
                stylized = adain(stylized, sfi)
                if i == len(pairs) - 1:
                    stylized, _ = self.attention_block(stylized, train=train)
            stylized = self.ms.decoder.apply_block(stylized, i + 1, train=train)
        return stylized


class MSTRP(nn.Module):
    """Multiscale RP with graph-cut multimodal style transfer fusion
    (GlobalMSTRPNet, adain_rp.py:425-448). The transform detaches both
    inputs, so gradients reach only the decoder."""
    rp_blocks: int = 5
    hidden_dim: int = 32
    enc_stack_way: str = "constant"
    inception_num: int = 0
    attention: str = "none"
    stylized_layers: int = 1
    n_clusters: int = 3
    mst_lambda: float = 0.0  # reference constructs MST with lam=0 (adain_rp.py:434)
    dtype: Any = None

    def setup(self):
        self.ms = MultiScaleAdaINRP(
            rp_blocks=self.rp_blocks, hidden_dim=self.hidden_dim,
            enc_stack_way=self.enc_stack_way, inception_num=self.inception_num,
            attention=self.attention, dtype=self.dtype, name="ms")

    def __call__(self, content, style, train: bool = False,
                 c_labels=None, s_labels=None, test_mode: bool = False):
        cf, _ = self.ms.encode_intermediate(content, train=train)
        sf, _ = self.ms.encode_intermediate(style, train=train)

        stylized = mst_transfer_batch(
            jax.lax.stop_gradient(cf[-1]), jax.lax.stop_gradient(sf[-1]),
            self.n_clusters, self.mst_lambda)
        stylized = self.ms.decoder.apply_block(stylized, 0, train=train)
        pairs = list(zip(cf[:-1], sf[:-1]))[::-1]
        for i, (cfi, sfi) in enumerate(pairs):
            if i + 1 < self.stylized_layers:
                stylized = mst_transfer_batch(
                    stylized, jax.lax.stop_gradient(sfi),
                    self.n_clusters, self.mst_lambda)
            stylized = self.ms.decoder.apply_block(stylized, i + 1, train=train)
        return stylized
