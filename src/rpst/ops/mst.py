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


def _sym_pow_fullrank(A: jnp.ndarray, power: float) -> jnp.ndarray:
    """V diag(|e|^power) V^T with NO cutoff/regularization.

    ``labeled_whiten_and_color`` (reference ``utils/mst.py:71-101``) runs
    torch.svd on the covariance with the eigenvalue cutoff *commented out*
    (mst.py:73-78, 92-97) and no diagonal regularization — unlike the WCT
    model path (``ops/wct.py``).  torch.svd of a symmetric matrix returns
    singular values |e| with matching left/right subspaces, so the
    reconstruction equals the eigh form on |e|.  A near-singular covariance
    sends |e|^-0.5 to inf exactly as the reference's SVD path blows up; the
    caller detects the resulting non-finite output and applies the
    reference's fallback (mst.py:106-109).
    """
    e, v = jnp.linalg.eigh(A)
    d = jnp.power(jnp.abs(e), power)
    return (v * d[..., None, :]) @ jnp.swapaxes(v, -1, -2)


def labeled_whiten_and_color(f_c: jnp.ndarray, f_s: jnp.ndarray,
                             alpha: float, label: jnp.ndarray) -> jnp.ndarray:
    """Per-label WCT — port of reference ``utils/mst.py:62-111`` (dead code
    in the reference pipeline, kept for inventory parity).

    Args:
      f_c: (H, W, C) content feature (reference is (C, H, W); NHWC here).
      f_s: (K, C) style feature rows (the reference passes ``f_s`` whose
           transpose is (C, K), mst.py:85-86).
      alpha: blend weight for the colored result (mst.py:105).
      label: (H, W) or (H, W, 1) binary spatial mask, broadcast over
             channels like the reference's ``f_c * label``.

    Reference quirks preserved:
      * the masked content mean divides by H*W, zeros included
        (``torch.mean(cf, 1)``, mst.py:66) — not by the mask count;
      * the content covariance is normalized by ``sum(label)/C - 1``
        (mst.py:70), i.e. (masked-pixel count − 1) for a channel-broadcast
        mask;
      * full-rank spectrum, no cutoff (mst.py:73-78);
      * on numerical failure the unmodified masked content is returned
        (``except:`` at mst.py:106-109 — here: non-finite detection, the
        XLA-compatible equivalent of catching the MAGMA convergence error).
    """
    if label.ndim == 2:
        label = label[..., None]
    h, w, c = f_c.shape
    label = jnp.broadcast_to(label.astype(f_c.dtype), (h, w, 1))
    fc_masked = f_c * label  # (H, W, C)
    cf = fc_masked.reshape(-1, c)  # (HW, C)
    c_mean = jnp.mean(cf, axis=0)  # mean over ALL pixels incl. zeros
    cf = (fc_masked - c_mean[None, None, :] * label).reshape(-1, c)
    n_masked = jnp.sum(label) * c  # == torch.sum(label) for expanded mask
    c_cov = (cf.T @ cf) / (n_masked / c - 1.0)
    whitened = _sym_pow_fullrank(c_cov, -0.5) @ cf.T  # (C, HW)

    sf = f_s.T.astype(f_c.dtype)  # (C, K), mst.py:85
    k = sf.shape[1]
    s_mean = jnp.mean(sf, axis=1, keepdims=True)
    sfc = sf - s_mean
    s_cov = (sfc @ sfc.T) / (k - 1)
    colored = (_sym_pow_fullrank(s_cov, 0.5) @ whitened).T.reshape(h, w, c)
    colored = colored + s_mean[:, 0][None, None, :] * label
    out = alpha * colored + (1.0 - alpha) * fc_masked

    ok = jnp.all(jnp.isfinite(out))
    return jnp.where(ok, out, fc_masked)
