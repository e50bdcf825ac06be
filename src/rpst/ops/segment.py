"""Segment-masked AdaIN — jittable, fixed-label-universe formulation.

The reference (``network/base.py:421-530``) opens segmentation PNGs from
disk *inside the forward pass*, builds per-label index lists on the host,
and runs ragged ``index_select``/``index_copy_`` per label.  That design is
host-bound and shape-dynamic — hostile to XLA.

TPU-native redesign (same math, same outputs):
  * segmentation masks are decoded/resized in the **data pipeline** and
    enter the device as dense integer label maps (N, H, W);
  * a static label universe of ``L`` labels (config ``max_seg_labels``)
    makes every shape static;
  * per-label masked statistics are computed for all labels at once with a
    one-hot matmul (MXU-friendly), using the same unbiased variance + eps
    as ``calc_mean_std_for_masked_feat`` (``base.py:465-475``);
  * the label-validity filter (``compute_label_info``, ``base.py:421-439``:
    both sides > 10 px and size ratio < 100x) is evaluated on device;
  * invalid or absent labels fall back to the untouched content feature,
    exactly like the reference's ``target_feat = content_feat.clone()``
    + per-valid-label ``index_copy_`` (``base.py:512-527``).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-5


def _per_label_stats(feat2d: jnp.ndarray, onehot: jnp.ndarray):
    """Masked per-label mean/std.

    feat2d: (P, C) features, onehot: (L, P) {0,1} membership.
    Returns mean (L, C), std (L, C), count (L,).
    Unbiased variance over each label's pixel set + eps, matching
    ``base.py:465-475`` (torch ``var(dim=1)`` default unbiased).
    """
    count = jnp.sum(onehot, axis=1)  # (L,)
    denom = jnp.maximum(count, 1.0)[:, None]
    mean = (onehot @ feat2d) / denom  # (L, C)
    sq = onehot @ (feat2d * feat2d)  # (L, C) sum of squares per label
    # unbiased: (sum_sq - n*mean^2) / (n - 1)
    var = (sq - count[:, None] * mean * mean) / jnp.maximum(count - 1.0, 1.0)[:, None]
    std = jnp.sqrt(jnp.maximum(var, 0.0) + _EPS)
    return mean, std, count


def masked_adain(content_feat: jnp.ndarray, style_feat: jnp.ndarray,
                 content_labels: jnp.ndarray, style_labels: jnp.ndarray,
                 num_labels: int) -> jnp.ndarray:
    """Per-semantic-label AdaIN for one sample.

    content_feat: (H, W, C); style_feat: (Hs, Ws, C);
    content_labels: (H, W) int32 in [0, num_labels); style_labels likewise.
    Labels outside [0, num_labels) are treated as invalid (untouched).
    """
    h, w, c = content_feat.shape
    cf = content_feat.reshape(-1, c).astype(jnp.float32)
    sf = style_feat.reshape(-1, c).astype(jnp.float32)
    cl = content_labels.reshape(-1)
    sl = style_labels.reshape(-1)

    lids = jnp.arange(num_labels, dtype=cl.dtype)
    c_onehot = (cl[None, :] == lids[:, None]).astype(jnp.float32)  # (L, Pc)
    s_onehot = (sl[None, :] == lids[:, None]).astype(jnp.float32)  # (L, Ps)

    c_mean, c_std, c_count = _per_label_stats(cf, c_onehot)
    s_mean, s_std, s_count = _per_label_stats(sf, s_onehot)

    # validity filter: compute_label_info (base.py:421-439)
    valid = ((c_count > 10) & (s_count > 10)
             & (c_count < 100 * s_count) & (s_count < 100 * c_count))

    # gather each pixel's label statistics; labels outside [0, L) are
    # invalid by definition (jax clips gather indices, so guard explicitly)
    in_range = (cl >= 0) & (cl < num_labels)
    cl_safe = jnp.clip(cl, 0, num_labels - 1)
    pix_valid = (valid[cl_safe] & in_range)[:, None]  # (Pc, 1)
    pm_c, ps_c = c_mean[cl_safe], c_std[cl_safe]  # (Pc, C)
    pm_s, ps_s = s_mean[cl_safe], s_std[cl_safe]
    normalized = (cf - pm_c) / ps_c * ps_s + pm_s
    out = jnp.where(pix_valid, normalized, cf)
    return out.reshape(h, w, c).astype(content_feat.dtype)


def masked_adain_batch(content_feat: jnp.ndarray, style_feat: jnp.ndarray,
                       content_labels: jnp.ndarray, style_labels: jnp.ndarray,
                       num_labels: int) -> jnp.ndarray:
    """Batched masked AdaIN; the reference loops per batch item
    (``do_mask_stylized``, ``network/adain_rp.py:313-319``) — here a vmap."""
    import jax
    return jax.vmap(masked_adain, in_axes=(0, 0, 0, 0, None))(
        content_feat, style_feat, content_labels, style_labels, num_labels)
