"""SPADE RP model; reference ``network/spade_rp.py:149-247``.

Two increasing-depth RP encoders; the decoder is a SPADE generator that
decodes the *style* features conditioned on the *content* features
(spade_rp.py:215, 227 — argument order preserved)."""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..nn.blocks import RPSequence, rp_increase_dims
from ..nn.spade import SpadeDecoder


class SpadeRP(nn.Module):
    rp_blocks: int = 5
    hidden_dim: int = 2
    ndf: int = 2
    spade_norm: str = "instance"
    dtype: Any = None

    def setup(self):
        enc_out = self.hidden_dim * 2 ** (self.rp_blocks - 1)
        self.content_encoder = RPSequence(
            dims=rp_increase_dims(self.rp_blocks, 3, self.hidden_dim, enc_out),
            dtype=self.dtype, name="rp_content_encoder")
        self.style_encoder = RPSequence(
            dims=rp_increase_dims(self.rp_blocks, 3, self.hidden_dim, enc_out),
            dtype=self.dtype, name="rp_style_encoder")
        self.decoder = SpadeDecoder(ndf=self.ndf, spade_norm=self.spade_norm,
                                    condition_nc=enc_out, dtype=self.dtype,
                                    name="rp_decoder")

    def __call__(self, content, style, train: bool = False,
                 c_labels=None, s_labels=None):
        cf = self.content_encoder(content, train=train)
        sf = self.style_encoder(style, train=train)
        # decode style features conditioned on content (spade_rp.py:215)
        return self.decoder(sf, cf, train=train)
