"""Host-side image transforms matching the reference pipeline exactly.

The reference transform is ``transforms.Resize((img_size, img_size))`` +
``ToTensor()`` (``train.py:41-46``): an aspect-squashing bilinear resize to
a square, then [0,1] float — **no mean/std normalization** (the VGG's 1x1
head bakes it in, ``base.py:58``)."""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageFile

# match reference robustness settings (train.py:25-27)
Image.MAX_IMAGE_PIXELS = None
ImageFile.LOAD_TRUNCATED_IMAGES = True


def load_image(path, img_size: int) -> np.ndarray:
    """Load → RGB → (img_size, img_size) bilinear squash → f32 HWC [0,1].

    Fast path: the native C++ decoder (``rpst.data.native_io`` —
    libjpeg/libpng + a bit-exact port of PIL's fixed-point BILINEAR
    resample), which releases the GIL so the threaded loader decodes in
    parallel.  PIL handles whatever the native path declines
    (CMYK/16-bit/...), producing identical bytes where both apply."""
    from . import native_io
    arr = native_io.load_image_native(path, img_size)
    if arr is not None:
        return arr
    img = Image.open(str(path)).convert("RGB")
    if img_size:
        img = img.resize((img_size, img_size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def load_mask(path, img_size: int) -> np.ndarray:
    """Segmentation mask → (img_size, img_size) int32 label map.

    Nearest-neighbor resize (labels must not be interpolated). Multi-channel
    masks use the first channel."""
    img = Image.open(str(path))
    if img_size:
        img = img.resize((img_size, img_size), Image.NEAREST)
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.int32)


def to_u8(arr) -> np.ndarray:
    """f32 [0,1] → uint8 with the save-side rounding (clip·255+0.5 floor).

    Exact round trip for ``load_image`` outputs (u/255·255+0.5 floors
    back to u for every byte value), so shipping uint8 across the
    host↔device boundary (4× less transfer than f32) loses nothing."""
    a = np.asarray(arr, np.float32)
    return (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def to_image(array) -> Image.Image:
    """NHWC/HWC float [0,1] (or already-quantized uint8) → PIL image
    (clip like torchvision save_image)."""
    arr = np.asarray(array)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.dtype == np.uint8:
        return Image.fromarray(arr, "RGB")
    arr = np.clip(arr, 0.0, 1.0)
    return Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8), "RGB")
