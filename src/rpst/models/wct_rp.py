"""WCT RP model; reference ``network/wct_rp.py:42-194``.

Increasing-depth RP encoder + decreasing-depth RP decoder with a
whitening-coloring fuse at the deepest feature.  The fuse detaches both
inputs (wct_rp.py:160-163), so only the decoder (and optionally the
encoder via the reconstruction losses' indirect path — which the detach
blocks) receives gradients from the fused features; the encoder still
trains through the style/content losses unless frozen by resume
(wct_rp.py:67-72)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import RPSequence, rp_decrease_dims, rp_increase_dims
from ..ops.wct import wct_fuse


class WCTRP(nn.Module):
    rp_blocks: int = 5
    hidden_dim: int = 16
    method: str = "closed-form"  # reference default (wct_rp.py:82)
    # reference casts to float64 before whiten/color (wct_rp.py:160);
    # float32 is the TPU-native default, float64 needs jax x64 (CPU path)
    wct_dtype: str = "float32"
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
        # one 2N pass through the shared encoder (exact; better XLA conv
        # shapes at small batch — see BASELINE.md round-2 training note)
        n = content.shape[0]
        if n > 1:
            feats = self.encoder(jnp.concatenate([content, style], axis=0),
                                 train=train)
            cf, sf = feats[:n], feats[n:]
        else:
            cf = self.encoder(content, train=train)
            sf = self.encoder(style, train=train)
        fused = wct_fuse(cf, sf, method=self.method,
                         dtype=jnp.dtype(self.wct_dtype))
        return self.decoder(fused, train=train)
