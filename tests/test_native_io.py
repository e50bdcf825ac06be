"""Native C++ image IO vs the PIL reference pipeline.

The training transform is Resize((s, s), BILINEAR) + ToTensor()
(reference train.py:41-46); the native decoder must reproduce PIL's
output *byte-exact* (same libjpeg decode, same fixed-point resample
arithmetic) so swapping the data path cannot move training numerics.
"""

import numpy as np
import pytest
from PIL import Image

from rpst.data import native_io
from rpst.data.transforms import load_image


def _pil_expected(path, img_size):
    img = Image.open(str(path)).convert("RGB")
    if img_size:
        img = img.resize((img_size, img_size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native imageio lib unavailable")


def _structured(rng, h, w):
    """Random + gradients + sharp edges (stress the resample rounding)."""
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    arr[: h // 3] = np.linspace(0, 255, w, dtype=np.uint8)[None, :, None]
    arr[h // 3: h // 2, : w // 2] = 255
    arr[h // 3: h // 2, w // 2:] = 0
    return arr


@pytest.mark.parametrize("size", [(96, 64), (64, 96), (128, 128), (31, 57)])
@pytest.mark.parametrize("target", [64, 48, 200, 0])
def test_png_decode_resize_matches_pil_exactly(tmp_path, size, target):
    rng = np.random.default_rng(size[0] * 1000 + target)
    arr = _structured(rng, *size)
    p = tmp_path / "img.png"
    Image.fromarray(arr, "RGB").save(p)
    native = native_io.load_image_native(p, target)
    assert native is not None
    np.testing.assert_array_equal(native, _pil_expected(p, target))


@pytest.mark.parametrize("quality", [95, 60])
def test_jpeg_decode_resize_matches_pil_exactly(tmp_path, quality):
    rng = np.random.default_rng(quality)
    arr = _structured(rng, 80, 120)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr, "RGB").save(p, quality=quality)
    native = native_io.load_image_native(p, 64)
    assert native is not None
    np.testing.assert_array_equal(native, _pil_expected(p, 64))


def test_grayscale_and_palette_png(tmp_path):
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (40, 52), dtype=np.uint8)
    pg = tmp_path / "gray.png"
    Image.fromarray(gray, "L").save(pg)
    native = native_io.load_image_native(pg, 32)
    np.testing.assert_array_equal(native, _pil_expected(pg, 32))

    pal = Image.fromarray(
        rng.integers(0, 256, (40, 52, 3), dtype=np.uint8), "RGB").convert(
        "P", palette=Image.ADAPTIVE)
    pp = tmp_path / "pal.png"
    pal.save(pp)
    native = native_io.load_image_native(pp, 32)
    np.testing.assert_array_equal(native, _pil_expected(pp, 32))


def test_rgba_png_drops_alpha_like_pil_convert(tmp_path):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (33, 47, 4), dtype=np.uint8)
    p = tmp_path / "rgba.png"
    Image.fromarray(arr, "RGBA").save(p)
    native = native_io.load_image_native(p, 24)
    np.testing.assert_array_equal(native, _pil_expected(p, 24))


def test_load_image_routes_through_native(tmp_path):
    """transforms.load_image must give identical results whichever path."""
    rng = np.random.default_rng(3)
    p = tmp_path / "x.png"
    Image.fromarray(rng.integers(0, 256, (50, 70, 3), np.uint8), "RGB").save(p)
    np.testing.assert_array_equal(load_image(p, 48), _pil_expected(p, 48))


def test_unsupported_falls_back(tmp_path):
    """A non-JPEG/PNG file: native path declines, load_image still works."""
    rng = np.random.default_rng(4)
    p = tmp_path / "x.bmp"
    Image.fromarray(rng.integers(0, 256, (20, 20, 3), np.uint8), "RGB").save(p)
    assert native_io.load_image_native(p, 16) is None
    assert load_image(p, 16).shape == (16, 16, 3)


def test_image_size_probe(tmp_path):
    rng = np.random.default_rng(5)
    p = tmp_path / "x.png"
    Image.fromarray(rng.integers(0, 256, (21, 37, 3), np.uint8), "RGB").save(p)
    arr = native_io.load_image_native(p, 0)
    assert arr.shape == (21, 37, 3)
    np.testing.assert_array_equal(arr, _pil_expected(p, 0))
