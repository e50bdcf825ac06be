"""SourceNet — the baseline AdaIN of Huang & Belongie; reference
``network/base.py:562-649``.

Frozen VGG encoder + trainable VGG-mirror decoder.  Unlike the RP family,
the content loss compares the stylized image's relu4_1 against the AdaIN
*target* ``t`` (base.py:634-639), and the fusion happens at relu4_1
resolution (H/8), so masked AdaIN labels are nearest-resized to the
feature grid."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.decoder import VGGMirrorDecoder
from ..ops.segment import masked_adain_batch
from ..ops.stats import adaptive_instance_normalization as adain
from .base import mse, style_stat_loss


def _resize_labels(labels, h, w):
    # torch-style nearest (floor(dst*in/out)): top-left anchored gather
    hi = (jnp.arange(h) * labels.shape[1]) // h
    wi = (jnp.arange(w) * labels.shape[2]) // w
    return labels[:, hi][:, :, wi]


class SourceNet(nn.Module):
    use_mask: bool = False
    max_seg_labels: int = 64
    dtype: Any = None

    def setup(self):
        self.decoder = VGGMirrorDecoder(dtype=self.dtype)

    def stylize_from_feats(self, content_feats, style_feats,
                           c_labels=None, s_labels=None,
                           test_mode: bool = False):
        c4, s4 = content_feats[-1], style_feats[-1]
        if self.use_mask and test_mode and c_labels is not None:
            h, w = c4.shape[1:3]
            t = masked_adain_batch(c4, s4,
                                   _resize_labels(c_labels, h, w),
                                   _resize_labels(s_labels, h, w),
                                   self.max_seg_labels)
        else:
            t = adain(c4, s4)
        return self.decoder(t)

    def __call__(self, content_feats, style_feats, c_labels=None,
                 s_labels=None, test_mode: bool = False):
        return self.stylize_from_feats(content_feats, style_feats,
                                       c_labels, s_labels, test_mode)

    def loss(self, vgg_features, content, style,
             train: bool = True) -> Dict[str, jnp.ndarray]:
        content_feats = jax.lax.stop_gradient(vgg_features(content))
        style_feats = jax.lax.stop_gradient(vgg_features(style))
        t = adain(content_feats[-1], style_feats[-1])
        g_t = self.decoder(t)
        g_t_feats = vgg_features(g_t)
        loss_c = mse(g_t_feats[-1], jax.lax.stop_gradient(t))
        loss_s = sum(style_stat_loss(g, jax.lax.stop_gradient(s))
                     for g, s in zip(g_t_feats, style_feats))
        return {"style_loss": loss_s, "content_loss": loss_c}
