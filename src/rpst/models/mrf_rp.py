"""MRF RP model; reference ``network/mrf_rp.py``.

Two separate increasing-depth RP encoders (content & style), channel-concat
fuse, decreasing-depth RP decoder.  Losses (mrf_rp.py:109-136):
  * MRF loss: top-k cosine affinity mask × squared-Euclidean distances over
    frozen-VGG relu4_1 features of (stylized, style), normalized by HW·k;
  * cycle losses: the stylized image is re-encoded with both RP encoders;
    style loss = stats MSE vs the style encoding, content loss = MSE vs the
    content encoding.

The reference's ``MRFLoss`` flattens with ``view(C, -1)`` which silently
scrambles batches for N>1 (mrf_rp.py:14-15); here the loss is computed
per-sample (vmap) and averaged — identical for N=1, correct for N>1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import RPSequence, rp_decrease_dims, rp_increase_dims
from ..ops.affinity import (cal_affinity_map, cal_dist,
                            mrf_topk_masked_dist_sum)
from .base import mse, style_stat_loss


def mrf_loss(content_feat, style_feat, k: int = 5,
             chunk: int = 0) -> jnp.ndarray:
    """Per-sample MRF loss (mrf_rp.py:12-23), NHWC (N, H, W, C).

    ``chunk > 0`` streams the (HW, HW) affinity/distance matrices in row
    chunks (O(chunk·HW) memory) instead of materializing them — required
    headroom above 512px where HW² no longer fits comfortably."""

    def per_sample(cf, sf):
        h, w, c = cf.shape
        if chunk:
            total = mrf_topk_masked_dist_sum(cf, sf, k, chunk)
        else:
            aff = cal_affinity_map(cf, sf, k)  # (HW, HW)
            dist = cal_dist(cf.reshape(-1, c).T, sf.reshape(-1, c).T)
            total = jnp.sum(aff * dist)
        return total / (h * w * k)

    return jnp.mean(jax.vmap(per_sample)(content_feat, style_feat))


class MRFRP(nn.Module):
    rp_blocks: int = 5
    hidden_dim: int = 16
    k: int = 5
    mrf_chunk: int = 0  # 0 = dense (HW, HW); >0 = streamed row chunks
    dtype: Any = None

    def setup(self):
        enc_out = self.hidden_dim * 2 ** (self.rp_blocks - 1)
        self.content_encoder = RPSequence(
            dims=rp_increase_dims(self.rp_blocks, 3, self.hidden_dim, enc_out),
            dtype=self.dtype, name="rp_content_encoder")
        self.style_encoder = RPSequence(
            dims=rp_increase_dims(self.rp_blocks, 3, self.hidden_dim, enc_out),
            dtype=self.dtype, name="rp_style_encoder")
        self.decoder = RPSequence(
            dims=rp_decrease_dims(self.rp_blocks, enc_out * 2, enc_out, 3),
            dtype=self.dtype, name="rp_decoder")

    def __call__(self, content, style, train: bool = False,
                 c_labels=None, s_labels=None):
        cf = self.content_encoder(content, train=train)
        sf = self.style_encoder(style, train=train)
        return self.decoder(jnp.concatenate([cf, sf], axis=-1), train=train)

    def loss(self, vgg_features, content, style,
             train: bool = True) -> Dict[str, jnp.ndarray]:
        cf = self.content_encoder(content, train=train)
        sf = self.style_encoder(style, train=train)
        stylized = self.decoder(jnp.concatenate([cf, sf], axis=-1), train=train)

        f_stylized = vgg_features(stylized)
        f_style = jax.lax.stop_gradient(vgg_features(style))
        loss_mrf = mrf_loss(f_stylized[-1], f_style[-1], self.k,
                            chunk=self.mrf_chunk)

        content_prime = self.content_encoder(stylized, train=train)
        style_prime = self.style_encoder(stylized, train=train)
        loss_s = style_stat_loss(style_prime, sf)
        loss_c = mse(content_prime, cf)
        return {"mrf_loss": loss_mrf, "style_loss": loss_s,
                "content_loss": loss_c}
