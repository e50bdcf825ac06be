"""Model-internal visualizations.

The reference dumps diagnostic heatmaps from inside the models:
  * adaptive-SANet claim maps — threshold / attention-before /
    attention-after panels (``network/sanet.py:334-366``),
  * per-layer SE channel-attention heatmaps
    (``visualize_channel_attention``, ``network/adain_rp.py:193-213``),
  * feature-map grids next to a reference image
    (``visualize_feature_map`` adain_rp.py:215-228 + ``make_grid``
    utils/common.py:5-27).

Here the models return those tensors as aux outputs (pure functions don't
stash state), and this module renders them on the host.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
from PIL import Image


def _render_heatmap(ax, data, vmin=0.0, vmax=1.0, title=None):
    im = ax.imshow(np.asarray(data), vmin=vmin, vmax=vmax, cmap="rocket"
                   if _has_seaborn() else "magma", aspect="auto")
    if title:
        ax.set_title(title)
    ax.set_xticks([])
    ax.set_yticks([])
    return im


def _has_seaborn() -> bool:
    try:
        import seaborn  # noqa: F401
        return True
    except ImportError:
        return False


def save_claim_maps(aux: dict, out_dir, iterations: int = 0, bid: int = 0,
                    index: int = 0):
    """Adaptive-SANet claim-map sheet (sanet.py:346-366 semantics).

    aux: the 'relu5_1' aux dict from AdaptiveTransform — claim_value
    (N, HW, 1), claim_before/claim_after (N, HW, HW)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cv = np.asarray(aux["claim_value"])[0, :, 0]
    hw = cv.shape[0]
    side = int(np.sqrt(hw))
    before = np.asarray(aux["claim_before"])[0, index].reshape(side, side)
    after = np.asarray(aux["claim_after"])[0, index].reshape(side, side)

    fig, ax = plt.subplots(2, 2, constrained_layout=True)
    _render_heatmap(ax[0, 0], cv.reshape(side, side), title="Dynamic threshold")
    _render_heatmap(ax[0, 1], before, title="Attention before claim")
    _render_heatmap(ax[1, 0], after, title="Attention after claim")
    ax[1, 1].axis("off")
    out = Path(out_dir) / "claim_map"
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"it_{iterations}_bid_{bid}.png"
    fig.savefig(path)
    plt.close(fig)
    return str(path)


def save_channel_attention(attention_maps, out_dir, iterations: int = 0,
                           bid: int = 0):
    """Per-layer SE channel-attention heatmaps (adain_rp.py:193-213).

    attention_maps: list of (N, 1, 1, C) arrays (None entries skipped)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    maps = [m for m in attention_maps if m is not None]
    if not maps:
        return None
    fig, axes = plt.subplots(len(maps), 1, constrained_layout=True,
                             squeeze=False)
    for idx, att in enumerate(maps):
        a = np.asarray(att)
        row = a.reshape(a.shape[0] * a.shape[-1])[None, :]
        _render_heatmap(axes[idx, 0], row, title=f"Layer {idx}")
    out = Path(out_dir) / "claim_map"
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"it_{iterations}_bid_{bid}.png"
    fig.savefig(path)
    plt.close(fig)
    return str(path)


def make_grid(reference_img: Image.Image, imgs, w_num: int, span: int = 0,
              unit_size: int = 512) -> Image.Image:
    """Feature-sheet grid with the reference image in a leading column
    (utils/common.py:5-27 semantics)."""
    h_num = max(1, len(imgs) // w_num)
    w = w_num * (unit_size + span)
    h = h_num * (unit_size + span)
    whole = Image.new("RGB", ((w_num + 1) * (unit_size + span), h),
                      (255, 255, 255))
    whole.paste(reference_img.resize((unit_size, unit_size)), (0, 0))
    x = y = 0
    for img in imgs:
        whole.paste(img.resize((unit_size, unit_size)),
                    (unit_size + span + x, y))
        x += unit_size + span
        if x >= w:
            x = 0
            y += unit_size + span
    return whole


def save_feature_maps(reference_img, feats, out_dir, iterations: int = 0,
                      bid: int = 0, suffix: str = "content",
                      channels: int = 8, unit_size: int = 256):
    """First-``channels`` feature maps of every layer as a grid
    (visualize_feature_map, adain_rp.py:215-228)."""
    ref = Image.fromarray(
        (np.clip(np.asarray(reference_img), 0, 1) * 255).astype(np.uint8))
    tiles = []
    for feat in feats:
        f = np.asarray(feat)[0]  # (H, W, C)
        for c in range(min(channels, f.shape[-1])):
            fm = f[..., c]
            lo, hi = fm.min(), fm.max()
            fm = (fm - lo) / (hi - lo + 1e-8)
            tiles.append(Image.fromarray((fm * 255).astype(np.uint8), "L")
                         .convert("RGB"))
    sheet = make_grid(ref, tiles, channels, unit_size=unit_size)
    out = Path(out_dir) / "visualize"
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"it_{iterations}_bid_{bid}_{suffix}.png"
    sheet.save(path)
    return str(path)
