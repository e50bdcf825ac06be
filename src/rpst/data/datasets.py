"""Datasets — host-side equivalents of ``datasets/base.py``.

Each dataset yields numpy; batching/prefetch lives in ``loader.py``.
Test datasets return ``(content, style, content_name, style_name,
c_mask, s_mask)`` like the reference's 6-tuples (mask entries are decoded
label maps here rather than paths — the reference opens mask PNGs inside
the model forward, ``base.py:450-455``; we move that IO into the pipeline).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

from .transforms import load_image, load_mask


class ImageFolderDataset:
    """Single-image glob dataset (reference ``Dataset``, base.py:31-48)."""

    def __init__(self, root, img_size: int, fmt: str = "*"):
        self.root = root
        self.paths = sorted(Path(root).glob(fmt))
        self.img_size = img_size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        return load_image(self.paths[index], self.img_size)


class FlatFolderDataset(ImageFolderDataset):
    """Reference ``FlatFolderDataset`` (base.py:7-28), default fmt '*/P*'."""

    def __init__(self, root, img_size: int, fmt: str = "*/P*", root2=None):
        super().__init__(root, img_size, fmt)
        if root2 is not None:
            self.paths.extend(sorted(Path(root2).glob("*")))


class FmtDataset(ImageFolderDataset):
    """Reference ``FmtDataset`` (base.py:168-185)."""


class PairedDataset:
    """content/ and style/ subdirs matched by filename (base.py:51-86)."""

    def __init__(self, root, img_size: int):
        self.root = root
        self.content_dir = os.path.join(root, "content")
        self.style_dir = os.path.join(root, "style")
        self.content_names = sorted(os.listdir(self.content_dir))
        self.img_size = img_size

    def __len__(self):
        return len(self.content_names)

    def _names(self, index):
        cname = self.content_names[index]
        return cname, cname

    def __getitem__(self, index):
        cname, sname = self._names(index)
        content = load_image(os.path.join(self.content_dir, cname), self.img_size)
        style = load_image(os.path.join(self.style_dir, sname), self.img_size)
        return (content, style, os.path.splitext(cname)[0],
                os.path.splitext(sname)[0], None, None)


class PhotorealisticPairedDataset(PairedDataset):
    """in*/tar* name mapping + segmentation masks from labelme_segmentation/
    (base.py:89-131)."""

    def __init__(self, root, img_size: int, max_labels: int = 64):
        super().__init__(root, img_size)
        self.seg_dir = os.path.join(root, "labelme_segmentation")
        self.max_labels = max_labels

    def _names(self, index):
        cname = self.content_names[index]
        sname = "tar{}".format(cname.replace("in", ""))
        return cname, sname

    def _mask(self, name: str) -> Optional[np.ndarray]:
        path = os.path.join(self.seg_dir, f"{os.path.splitext(name)[0]}.png")
        if not os.path.exists(path):
            return None
        return load_mask(path, self.img_size)

    def __getitem__(self, index):
        cname, sname = self._names(index)
        content = load_image(os.path.join(self.content_dir, cname), self.img_size)
        style = load_image(os.path.join(self.style_dir, sname), self.img_size)
        return (content, style, os.path.splitext(cname)[0],
                os.path.splitext(sname)[0], self._mask(cname),
                self._mask(sname))


class IdentityDataset(PhotorealisticPairedDataset):
    """Reconstruction oracle: style := content (base.py:134-165)."""

    def __getitem__(self, index):
        cname, sname = self._names(index)
        content = load_image(os.path.join(self.content_dir, cname), self.img_size)
        mask = self._mask(cname)
        return (content, content, os.path.splitext(cname)[0],
                os.path.splitext(sname)[0], mask, mask)


def build_test_dataset(cfg):
    """Dispatch on cfg.test_dataset like train.py:150-157."""
    kind = cfg.test_dataset
    if kind == "photoreal":
        return PhotorealisticPairedDataset(cfg.test_dir, cfg.img_size,
                                           cfg.max_seg_labels)
    if kind == "iden_photoreal":
        return IdentityDataset(cfg.test_dir, cfg.img_size, cfg.max_seg_labels)
    if kind == "fmt":
        return FmtDataset(cfg.test_dir, cfg.img_size)
    if kind == "paired":
        return PairedDataset(cfg.test_dir, cfg.img_size)
    raise ValueError(f"unknown test_dataset {kind!r}")
