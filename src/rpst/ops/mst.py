"""Multimodal style transfer (MST): graph-cut channel matching, on device.

Reference pipeline (``utils/mst.py:114-177``), per sample:
  1. k-means over *style channels* (each channel's HW response is a point)
     — sklearn on CPU in the reference; jit k-means here (``ops/kmeans``);
  2. data term: cosine distance of every *content channel* to each style
     cluster center (``data_term``, mst.py:33-52);
  3. labels: α-expansion over a 1-D chain of channels with Potts pairwise
     λ(1−I) (mst.py:55-59, 149-158) — exact chain DP here
     (``ops/graphcut``); the reference instantiates λ=0
     (``network/adain_rp.py:434``), reducing to per-channel argmin;
  4. recolor: per content channel, ``groupwise_adain`` against its matched
     style cluster — the cluster's *prototype* mean/std, i.e. the average
     of the member channels' per-channel statistics (mst.py:18-30,
     161-177).

Step 4 is reformulated densely: instead of ragged per-cluster feature
gathers + masked composition, compute per-style-channel stats once, then
segment-mean them into (k,) prototypes and gather by the content channel's
label — identical output, no ragged shapes, fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .graphcut import chain_map_labeling, potts_pairwise
from .kmeans import kmeans


def _channel_mean_std(feat_hwc: jnp.ndarray, eps: float = 1e-5):
    """Per-channel spatial mean/std (unbiased, eps inside sqrt) for one
    sample; (H, W, C) -> ((C,), (C,))."""
    h, w, c = feat_hwc.shape
    x = feat_hwc.reshape(-1, c)
    n = h * w
    mean = jnp.mean(x, axis=0)
    var = jnp.sum((x - mean) ** 2, axis=0) / max(n - 1, 1)
    return mean, jnp.sqrt(var + eps)


def mst_transfer(content_feat: jnp.ndarray, style_feat: jnp.ndarray,
                 n_clusters: int = 3, lam: float = 0.0,
                 kmeans_iters: int = 25) -> jnp.ndarray:
    """MST fusion for one sample; (H, W, C) inputs -> (H, W, C)."""
    h, w, c = content_feat.shape
    cf = content_feat.reshape(-1, c).astype(jnp.float32)  # (HW, C)
    sf = style_feat.reshape(-1, c).astype(jnp.float32)

    # 1. cluster style channels (rows = channels, dims = HW responses)
    s_channels = sf.T  # (C, HW)
    s_labels, centers = kmeans(s_channels, n_clusters, iters=kmeans_iters)

    # 2. cosine-distance data term of content channels vs centers
    c_channels = cf.T  # (C, HW)
    dots = c_channels @ centers.T  # (C, k)
    c_norm = jnp.linalg.norm(c_channels, axis=1, keepdims=True)
    k_norm = jnp.linalg.norm(centers, axis=1, keepdims=True).T
    D = 1.0 - dots / jnp.maximum(c_norm @ k_norm, 1e-12)

    # 3. chain MAP labeling (λ=0 in the reference ⇒ argmin per channel)
    if lam == 0.0:
        c_labels = jnp.argmin(D, axis=1).astype(jnp.int32)
    else:
        c_labels = chain_map_labeling(D, potts_pairwise(n_clusters, lam))

    # 4. groupwise AdaIN against matched cluster prototypes
    c_mean, c_std = _channel_mean_std(content_feat.astype(jnp.float32))
    s_mean, s_std = _channel_mean_std(style_feat.astype(jnp.float32))
    onehot = jax.nn.one_hot(s_labels, n_clusters, dtype=jnp.float32)  # (C, k)
    count = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)  # (k,)
    mean_proto = (onehot.T @ s_mean) / count  # (k,)
    std_proto = (onehot.T @ s_std) / count
    normalized = (cf - c_mean[None, :]) / c_std[None, :]
    out = normalized * std_proto[c_labels][None, :] + mean_proto[c_labels][None, :]
    return out.reshape(h, w, c).astype(content_feat.dtype)


def mst_transfer_batch(content_feat: jnp.ndarray, style_feat: jnp.ndarray,
                       n_clusters: int = 3, lam: float = 0.0) -> jnp.ndarray:
    """Batched MST (the reference loops per sample, mst.py:161-177)."""
    return jax.vmap(lambda c, s: mst_transfer(c, s, n_clusters, lam))(
        content_feat, style_feat)
