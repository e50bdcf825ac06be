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


def _l2_normalize_rows(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def mrf_topk_masked_dist_sum(content_feat: jnp.ndarray,
                             style_feat: jnp.ndarray,
                             k: int, chunk: int = 1024) -> jnp.ndarray:
    """Streaming (chunked) equivalent of ``sum(cal_affinity_map * cal_dist)``.

    The dense MRF loss materializes two (HW, HW) matrices — 67 MB each in
    f32 at 512px relu4_1 (HW=4096), the repo's "long-context" wall
    (SURVEY §5). This version streams row chunks of the cosine-similarity
    and distance matrices, keeping O(chunk·HW) memory:

      pass 1  per-column running top-k of the similarity via ``lax.scan``
              (carry: (k, HW) best-so-far, merged per chunk);
      pass 2  per row chunk: row top-k threshold, union mask
              ``sim >= row_kth  OR  sim >= col_kth``, masked distance sum.

    Matches the dense union-mask semantics exactly for distinct values;
    exact ties at the k-th value may include extra pairs (the dense path
    resolves ties by index order) — measure-zero for float features.

    content_feat/style_feat: (H, W, C) single-sample maps, as in
    ``cal_affinity_map``. Returns the masked distance sum (scalar).
    """
    h, w, c = content_feat.shape
    hw = h * w
    cf = content_feat.reshape(hw, c)
    sf = style_feat.reshape(hw, c)
    cfn = _l2_normalize_rows(cf)
    sfn = _l2_normalize_rows(sf)

    chunk = min(chunk, hw)
    pad = (-hw) % chunk
    n_chunks = (hw + pad) // chunk
    valid = (jnp.arange(hw + pad) < hw)
    cfn_p = jnp.pad(cfn, ((0, pad), (0, 0)))
    cf_p = jnp.pad(cf, ((0, pad), (0, 0)))
    cfn_chunks = cfn_p.reshape(n_chunks, chunk, c)
    cf_chunks = cf_p.reshape(n_chunks, chunk, c)
    valid_chunks = valid.reshape(n_chunks, chunk)

    # ---- pass 1: per-column (style position) top-k thresholds ----
    def col_pass(carry, xs):
        cfc, vc = xs
        sim = cfc @ sfn.T                      # (chunk, HW)
        sim = jnp.where(vc[:, None], sim, -jnp.inf)
        stacked = jnp.concatenate([carry, sim.T], axis=1)  # (HW, k+chunk)
        carry = jax.lax.top_k(stacked, k)[0]   # (HW, k)
        return carry, None

    col_top, _ = jax.lax.scan(col_pass,
                              jnp.full((hw, k), -jnp.inf, cfn.dtype),
                              (cfn_chunks, valid_chunks))
    col_kth = col_top[:, -1]                   # (HW,)

    # ---- pass 2: row thresholds + union-masked distance sum ----
    b2 = jnp.sum(sf * sf, axis=1)              # (HW,)

    def row_pass(acc, xs):
        cfc_n, cfc, vc = xs
        sim = cfc_n @ sfn.T                    # (chunk, HW)
        row_kth = jax.lax.top_k(sim, k)[0][:, -1]
        mask = jnp.logical_or(sim >= row_kth[:, None],
                              sim >= col_kth[None, :])
        a2 = jnp.sum(cfc * cfc, axis=1)
        dist = a2[:, None] + b2[None, :] - 2.0 * (cfc @ sf.T)
        contrib = jnp.where(mask & vc[:, None], dist, 0.0)
        return acc + jnp.sum(contrib), None

    total, _ = jax.lax.scan(row_pass, jnp.zeros((), cf.dtype),
                            (cfn_chunks, cf_chunks, valid_chunks))
    return total
