"""Feature-statistics primitives (AdaIN family), NHWC, TPU-first.

Functional equivalents of the reference ops with identical numerics:

  * ``calc_mean_std``      — reference ``network/base.py:399-407``
    (per-(N,C) mean and **unbiased**-variance std over H*W, eps inside sqrt)
  * ``adaptive_instance_normalization`` — ``network/base.py:410-418``
  * ``mean_variance_norm`` — ``network/sanet.py:20-24``
  * ``groupwise_adain``    — ``utils/mst.py:18-30`` (prototype style stats)

Layout: all functions take NHWC (TPU-native). The reference is NCHW; the
drivers transpose at the image boundary only.  All reductions happen in
float32 even when activations are bfloat16, mirroring how instance-norm
statistics must not be computed in half precision.
"""

from __future__ import annotations

import jax.numpy as jnp


def calc_mean_std(feat: jnp.ndarray, eps: float = 1e-5):
    """Per-sample, per-channel mean/std over spatial dims.

    feat: (N, H, W, C) -> mean, std each (N, 1, 1, C).

    Matches torch ``view(N, C, -1).var(dim=2)`` which uses the *unbiased*
    estimator (ddof=1), with ``eps`` added to the variance before sqrt.
    """
    assert feat.ndim == 4, f"expected NHWC, got shape {feat.shape}"
    f32 = feat.astype(jnp.float32)
    mean = jnp.mean(f32, axis=(1, 2), keepdims=True)
    # unbiased variance: sum((x-mean)^2) / (HW - 1)
    n = feat.shape[1] * feat.shape[2]
    var = jnp.sum((f32 - mean) ** 2, axis=(1, 2), keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var + eps)
    return mean.astype(feat.dtype), std.astype(feat.dtype)


def adaptive_instance_normalization(content_feat: jnp.ndarray,
                                    style_feat: jnp.ndarray,
                                    eps: float = 1e-5) -> jnp.ndarray:
    """AdaIN: re-normalize content statistics to style statistics.

    Reference ``network/base.py:410-418``. Shapes must match except that
    spatial dims of style may differ (the reference asserts equality, but
    only channel counts matter mathematically; we keep the strict check).
    """
    assert content_feat.shape[-1] == style_feat.shape[-1], (
        content_feat.shape, style_feat.shape)
    style_mean, style_std = calc_mean_std(style_feat, eps)
    content_mean, content_std = calc_mean_std(content_feat, eps)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


def mean_variance_norm(feat: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Zero-mean unit-std per (N, C); reference ``network/sanet.py:20-24``."""
    mean, std = calc_mean_std(feat, eps)
    return (feat - mean) / std


def groupwise_adain(content_feat: jnp.ndarray, style_feat: jnp.ndarray,
                    eps: float = 1e-5) -> jnp.ndarray:
    """AdaIN against *prototype* (channel-averaged) style statistics.

    Reference ``utils/mst.py:18-30``: style mean/std are themselves averaged
    across the channel group so every content channel is recolored with one
    scalar mean/std prototype per sample.
    """
    content_mean, content_std = calc_mean_std(content_feat, eps)
    style_mean, style_std = calc_mean_std(style_feat, eps)
    style_mean_proto = jnp.mean(style_mean, axis=-1, keepdims=True)
    style_std_proto = jnp.mean(style_std, axis=-1, keepdims=True)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std_proto + style_mean_proto
