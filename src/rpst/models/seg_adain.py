"""Segmentation-aware AdaIN RP; reference ``network/seg_adain_rp.py``.

  * ``cross_entropy_loss`` — seg_adain_rp.py:6-22: bilinear-upsampled
    class-weighted cross entropy with ignore label −1.
  * ``SegRPNet``           — seg_adain_rp.py:28-35: an RP segmentation head
    over encoder features.
  * ``SegAdaINRP``         — seg_adain_rp.py:38-165: the AdaIN RP net whose
    forward accepts (content, style, content_label, style_label).

The reference class crashes on construction (it references the
commented-out ``self.class_weights``, seg_adain_rp.py:87-96) and is
shadowed out of the registry by import order — this implementation is the
runnable version of its evident intent: the Cityscapes class weights are
real (default to the commented values), the seg head is constructible, and
the forward computes the same style/content losses the reference computes
(its segmentation loss path is commented out upstream and stays optional
here via ``seg_loss_weight``)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import RPStack, rp_constant_dims
from .adain_rp import AdaINRP

# seg_adain_rp.py:87-91 (commented in the reference)
CITYSCAPES_CLASS_WEIGHTS = (
    0.8373, 0.918, 0.866, 1.0345, 1.0166, 0.9969, 0.9754, 1.0489,
    0.8786, 1.0023, 0.9539, 0.9843, 1.1116, 0.9037, 1.0865, 1.0955,
    1.0865, 1.1529, 1.0507)


def cross_entropy_loss(logits: jnp.ndarray, target: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       ignore_label: int = -1) -> jnp.ndarray:
    """Class-weighted CE with ignore label; logits NHWC, target NHW int.

    Logits are bilinearly resized to the target resolution first
    (seg_adain_rp.py:14-18)."""
    n, h, w, c = logits.shape
    th, tw = target.shape[1:3]
    if (h, w) != (th, tw):
        logits = jax.image.resize(logits, (n, th, tw, c), method="linear")
    valid = target != ignore_label
    safe_target = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, safe_target[..., None], axis=-1)[..., 0]
    w_map = (weight[safe_target] if weight is not None
             else jnp.ones_like(picked))
    w_map = jnp.where(valid, w_map, 0.0)
    return -jnp.sum(picked * w_map) / jnp.maximum(jnp.sum(w_map), 1.0)


class SegRPNet(nn.Module):
    """RP segmentation head (seg_adain_rp.py:28-35) using build_rp_blocks
    semantics (constant-ish Conv2dBlock stack ending at class_num)."""
    rp_blocks: int = 5
    seg_hidden_dim: int = 32
    class_num: int = 19
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = rp_constant_dims(self.rp_blocks, x.shape[-1],
                                self.seg_hidden_dim, self.class_num)
        return RPStack(dims=dims, dtype=self.dtype, name="seg_head")(
            x, train=train)


class SegAdaINRP(nn.Module):
    rp_blocks: int = 5
    hidden_dim: int = 16
    class_num: int = 19
    seg_hidden_dim: int = 32
    seg_loss_weight: float = 0.0  # reference's seg path is commented out
    dtype: Any = None

    def setup(self):
        self.net = AdaINRP(rp_blocks=self.rp_blocks,
                           hidden_dim=self.hidden_dim, dtype=self.dtype,
                           name="adain_rp")
        if self.seg_loss_weight > 0:
            self.seg_head = SegRPNet(rp_blocks=self.rp_blocks,
                                     seg_hidden_dim=self.seg_hidden_dim,
                                     class_num=self.class_num,
                                     dtype=self.dtype)

    def __call__(self, content, style, train: bool = False,
                 c_labels=None, s_labels=None):
        return self.net(content, style, train=train)

    def loss(self, vgg_features, content, style, train: bool = True,
             content_label=None) -> Dict[str, jnp.ndarray]:
        from .base import perceptual_rp_losses
        stylized = self.net(content, style, train=train)
        loss_dict, _ = perceptual_rp_losses(
            vgg_features, stylized, style, content, 1.0, 1.0)
        out = {"style_loss": loss_dict["style_loss"],
               "content_loss": loss_dict["content_loss"]}
        if self.seg_loss_weight > 0 and content_label is not None:
            cf = self.net.encoder(content, train=train)
            logits = self.seg_head(cf, train=train)
            out["seg_loss"] = cross_entropy_loss(
                logits, content_label,
                jnp.asarray(CITYSCAPES_CLASS_WEIGHTS)[:self.class_num])
        return out
