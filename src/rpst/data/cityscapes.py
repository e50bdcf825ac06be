"""Cityscapes side-by-side dataset; reference ``datasets/cityspaces.py``.

Splits pix2pix-style side-by-side images into (content | label) halves and
maps the 34 raw Cityscapes ids to 19 train ids with −1 ignore
(cityspaces.py:36-49)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

_IGNORE = -1
CITYSCAPES_LABEL_MAPPING = {
    -1: _IGNORE, 0: _IGNORE, 1: _IGNORE, 2: _IGNORE, 3: _IGNORE, 4: _IGNORE,
    5: _IGNORE, 6: _IGNORE, 7: 0, 8: 1, 9: _IGNORE, 10: _IGNORE, 11: 2,
    12: 3, 13: 4, 14: _IGNORE, 15: _IGNORE, 16: _IGNORE, 17: 5, 18: _IGNORE,
    19: 6, 20: 7, 21: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14,
    28: 15, 29: _IGNORE, 30: _IGNORE, 31: 16, 32: 17, 33: 18,
}

# vectorized LUT for ids 0..255 (ids outside the mapping stay as-is, like
# the reference's in-place remap which only touches mapped keys)
_LUT = np.arange(256, dtype=np.int32)
for k, v in CITYSCAPES_LABEL_MAPPING.items():
    if k >= 0:
        _LUT[k] = v


def convert_label(label: np.ndarray, inverse: bool = False) -> np.ndarray:
    if not inverse:
        return _LUT[label.astype(np.int32).clip(0, 255)]
    out = label.copy()
    for k, v in CITYSCAPES_LABEL_MAPPING.items():
        out[label == v] = k
    return out


class CityscapesDataset:
    """(content, label) pairs from side-by-side images (cityspaces.py:28-84).

    The reference decodes with cv2 BGR→RGB and BGR→GRAY; PIL produces the
    same RGB content, and for the label half the grayscale conversion of a
    gray-encoded id map is id-preserving.
    """

    def __init__(self, img_dir, img_size: int = 256):
        self.img_dir = img_dir
        self.img_names = sorted(os.listdir(img_dir))
        self.img_size = img_size

    def __len__(self):
        return len(self.img_names)

    def __getitem__(self, index):
        path = os.path.join(self.img_dir, self.img_names[index])
        img = np.asarray(Image.open(path).convert("RGB"))
        s = self.img_size
        content = img[:, :s, :]
        label_rgb = img[:, s:2 * s, :]
        # ITU-R 601 luma, matching cv2.COLOR_BGR2GRAY on a gray-ish id map
        label = np.round(label_rgb[..., 0] * 0.299 + label_rgb[..., 1] * 0.587
                         + label_rgb[..., 2] * 0.114).astype(np.int32)
        label = convert_label(label)
        content = Image.fromarray(content).resize((s, s), Image.BILINEAR)
        content = np.asarray(content, np.float32) / 255.0
        return content, label
