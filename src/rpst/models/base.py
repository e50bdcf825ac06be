"""Shared model-level helpers: perceptual losses and fusion utilities.

The reference computes the same two perceptual losses in every RP model
(``network/adain_rp.py:81-88, 321-345``):

  * style loss  — MSE between per-layer (mean, std) of the stylized image's
    frozen-VGG features and the style image's, summed over relu1_1..relu4_1;
  * content loss — MSE between relu4_1 features of stylized and content.

SANet adds normalized content losses and identity losses
(``sanet.py:226-268``); SourceNet compares against the AdaIN target
(``base.py:629-649``).  Those model-specific variants live with their
models; the primitives live here.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.stats import calc_mean_std, mean_variance_norm

VGGFeatures = Callable[[jnp.ndarray], List[jnp.ndarray]]


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def style_stat_loss(input_feat: jnp.ndarray, target_feat: jnp.ndarray) -> jnp.ndarray:
    """MSE of instance mean/std pairs (``calc_style_loss``, adain_rp.py:84-88)."""
    im, istd = calc_mean_std(input_feat)
    tm, tstd = calc_mean_std(target_feat)
    return mse(im, tm) + mse(istd, tstd)


def perceptual_rp_losses(vgg_features: VGGFeatures,
                         stylized: jnp.ndarray,
                         style: jnp.ndarray,
                         content: jnp.ndarray,
                         content_weight: float,
                         style_weight: float) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """The standard RP-family loss (adain_rp.py:321-345).

    Three frozen-VGG forwards (stylized, style, content) — the second hot
    region of the training step; VGG params are constants under jit so XLA
    fuses/schedules these together.
    """
    f_stylized = vgg_features(stylized)
    # style + content need no gradients — run them as ONE batched VGG
    # forward (2x the rows, better MXU utilization than two passes;
    # the stylized pass stays separate so backward only spans its rows)
    n = style.shape[0]
    f_sc = vgg_features(jax.lax.stop_gradient(
        jnp.concatenate([style, content], axis=0)))
    f_style = [f[:n] for f in f_sc]
    f_content = [f[n:] for f in f_sc]
    loss_s = sum(style_stat_loss(a, jax.lax.stop_gradient(b))
                 for a, b in zip(f_stylized, f_style))
    loss_c = mse(f_stylized[-1], jax.lax.stop_gradient(f_content[-1]))
    total = content_weight * loss_c + style_weight * loss_s
    return {
        "style_loss": loss_s,
        "content_loss": loss_c,
        "total_loss": total,
    }, total


def normalized_content_loss(input_feat: jnp.ndarray,
                            target_feat: jnp.ndarray) -> jnp.ndarray:
    """SANet's mean-variance-normalized content MSE (sanet.py:226-230)."""
    return mse(mean_variance_norm(input_feat),
               mean_variance_norm(jax.lax.stop_gradient(target_feat)))


def channel_shuffle(feat: jnp.ndarray, groups: int = 4) -> jnp.ndarray:
    """Channel shuffle (adain_rp.py:304-311) in NHWC."""
    n, h, w, c = feat.shape
    return (feat.reshape(n, h, w, groups, c // groups)
            .swapaxes(3, 4)
            .reshape(n, h, w, c))


def sort_channels_by_attention(feat: jnp.ndarray,
                               attention: jnp.ndarray) -> jnp.ndarray:
    """Sort channels by SE attention weight, descending
    (``sort_by_weights``, adain_rp.py:230-249). attention: (N,1,1,C)."""
    order = jnp.argsort(-attention[:, 0, 0, :], axis=-1)  # (N, C)
    return jnp.take_along_axis(feat, order[:, None, None, :], axis=-1)
