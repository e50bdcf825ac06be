"""Affinity / distance ops used by the MRF loss and adaptive SANet.

Functional equivalents of:
  * ``cal_dist``            — reference ``network/base.py:349-360``
    (pairwise squared-Euclidean distance between column-vector sets)
  * ``cal_affinity_map``    — reference ``network/base.py:317-346``
    (cosine-similarity matrix with binary union of per-row and per-column
    top-k scatter masks)
  * ``cal_affinity_matrix`` — reference ``network/sanet.py:12-18``
    (batched channel-normalized cosine affinity)

The reference hardcodes ``.cuda()`` and a batch-1 ``squeeze()`` in
``cal_affinity_map``; here everything is device-neutral and explicitly
batched where the math allows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cal_dist(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distances.

    A: (d, m), B: (d, n) -> (m, n) with D[i, j] = ||A[:, i] - B[:, j]||^2.
    Matches ``network/base.py:349-360`` (including possible small negative
    values from cancellation, which the MRF loss tolerates).
    """
    a2 = jnp.sum(A * A, axis=0)[:, None]
    b2 = jnp.sum(B * B, axis=0)[None, :]
    return a2 + b2 - 2.0 * (A.T @ B)


def _topk_mask(scores: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """Binary mask with exactly the top-k entries along ``axis`` set to 1.

    Uses top-k + scatter (exact index semantics, matching torch
    ``topk``/``scatter_`` at ``base.py:338-344``) rather than a threshold
    compare, so ties resolve identically up to index order.
    """
    if axis == 0:
        return _topk_mask(scores.T, k, 1).T
    n_rows, n_cols = scores.shape
    _, idx = jax.lax.top_k(scores, k)  # (n_rows, k)
    rows = jnp.broadcast_to(jnp.arange(n_rows)[:, None], idx.shape)
    mask = jnp.zeros_like(scores)
    return mask.at[rows, idx].set(1.0)


def cal_affinity_map(content_feat: jnp.ndarray, style_feat: jnp.ndarray,
                     k: int = 3, reverse: bool = False) -> jnp.ndarray:
    """Binary affinity between content and style positions.

    content_feat/style_feat: (H, W, C) single-sample feature maps (the
    reference squeezes a batch-1 NCHW tensor, ``base.py:320-321``).
    Returns (H*W, H*W) with 1s where a pair is in the column top-k OR the
    row top-k of the channel-normalized cosine similarity.
    """
    h, w, c = content_feat.shape
    cf = content_feat.reshape(h * w, c)
    sf = style_feat.reshape(h * w, c)
    # F.normalize(dim=0) in NCHW normalizes across channels per position.
    cf = cf / jnp.maximum(jnp.linalg.norm(cf, axis=1, keepdims=True), 1e-12)
    sf = sf / jnp.maximum(jnp.linalg.norm(sf, axis=1, keepdims=True), 1e-12)
    attention = cf @ sf.T  # (HWc, HWs)
    if reverse:
        attention = -attention
    # union of per-column top-k (axis 0) and per-row top-k (axis 1) scatter
    mask = jnp.maximum(_topk_mask(attention, k, axis=0),
                       _topk_mask(attention, k, axis=1))
    return mask


def cal_affinity_matrix(content_feat: jnp.ndarray,
                        style_feat: jnp.ndarray) -> jnp.ndarray:
    """Batched cosine affinity; reference ``network/sanet.py:12-18``.

    content_feat/style_feat: (N, H, W, C) -> (N, HWc, HWs).
    """
    n, h, w, c = content_feat.shape
    cf = content_feat.reshape(n, h * w, c)
    sf = style_feat.reshape(n, -1, c)
    cf = cf / jnp.maximum(jnp.linalg.norm(cf, axis=2, keepdims=True), 1e-12)
    sf = sf / jnp.maximum(jnp.linalg.norm(sf, axis=2, keepdims=True), 1e-12)
    return jnp.einsum("npc,nqc->npq", cf, sf)
