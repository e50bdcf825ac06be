"""Data pipeline tests: transform parity with torchvision, dataset
semantics, infinite sampler, loaders, Cityscapes label mapping."""

import numpy as np
import pytest
from PIL import Image

from rpst.data import (CityscapesDataset, IdentityDataset, ImageFolderDataset,
                       InfiniteLoader, InfiniteSampler, PairedDataset,
                       PhotorealisticPairedDataset, iter_batches)
from rpst.data.cityscapes import convert_label
from rpst.data.transforms import load_image, load_mask


@pytest.fixture
def image_tree(tmp_path, rng):
    for sub in ("content", "style", "test/content", "test/style",
                "test/labelme_segmentation"):
        (tmp_path / sub).mkdir(parents=True, exist_ok=True)
    for i in range(3):
        arr = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
        for sub in ("content", "style"):
            Image.fromarray(arr, "RGB").save(tmp_path / sub / f"in{i}.png")
        Image.fromarray(arr, "RGB").save(tmp_path / "test/content" / f"in{i}.png")
        Image.fromarray(arr, "RGB").save(tmp_path / "test/style" / f"tar{i}.png")
        mask = rng.integers(0, 4, (40, 60), dtype=np.uint8)
        Image.fromarray(mask, "L").save(
            tmp_path / "test/labelme_segmentation" / f"in{i}.png")
        Image.fromarray(mask, "L").save(
            tmp_path / "test/labelme_segmentation" / f"tar{i}.png")
    return tmp_path


def test_load_image_semantics(image_tree):
    """Aspect-squashing bilinear resize + [0,1] float (Resize+ToTensor).

    torchvision isn't in this image; validate against PIL directly (the
    reference's transforms.Resize IS PIL bilinear under the hood)."""
    path = image_tree / "content" / "in0.png"
    got = load_image(path, 32)
    expected = np.asarray(
        Image.open(path).convert("RGB").resize((32, 32), Image.BILINEAR),
        np.float32) / 255.0
    np.testing.assert_allclose(got, expected, atol=1e-6)
    assert got.dtype == np.float32 and got.min() >= 0 and got.max() <= 1
    assert got.shape == (32, 32, 3)  # squashed, not cropped


def test_folder_dataset(image_tree):
    ds = ImageFolderDataset(image_tree / "content", img_size=24)
    assert len(ds) == 3
    assert ds[0].shape == (24, 24, 3)


def test_paired_and_photoreal_datasets(image_tree):
    # the tree uses in*/tar* names, so the photoreal mapping finds styles
    ds = PhotorealisticPairedDataset(image_tree / "test", img_size=16)
    c, s, cn, sn, cm, sm = ds[0]
    assert cn.startswith("in") and sn.startswith("tar")
    assert cm.shape == (16, 16) and cm.dtype == np.int32


def test_identity_dataset_style_is_content(image_tree):
    ds = IdentityDataset(image_tree / "test", img_size=16)
    c, s, *_ = ds[0]
    np.testing.assert_array_equal(c, s)


def test_infinite_sampler_covers_all():
    it = InfiniteSampler(5, seed=0)
    seen = [next(it) for _ in range(11)]
    assert set(seen) >= set(range(5))


def test_infinite_sampler_host_shards_partition_stream():
    """Per-host shards (same seed) interleave to exactly the single-host
    stream — the multi-host feeder contract."""
    full = InfiniteSampler(7, seed=3)
    s0 = InfiniteSampler(7, seed=3, shard_index=0, shard_count=2)
    s1 = InfiniteSampler(7, seed=3, shard_index=1, shard_count=2)
    stream = [next(full) for _ in range(20)]
    merged = []
    for _ in range(10):
        merged.append(next(s0))
        merged.append(next(s1))
    assert merged == stream


def test_infinite_loader_batches(image_tree):
    ds = ImageFolderDataset(image_tree / "content", img_size=16)
    loader = InfiniteLoader(ds, batch_size=2, num_workers=2, seed=0)
    b = next(loader)
    assert b.shape == (2, 16, 16, 3)
    loader.close()


def test_iter_batches_with_masks(image_tree):
    ds = PhotorealisticPairedDataset(image_tree / "test", img_size=16)
    batches = list(iter_batches(ds, 2))
    assert len(batches) == 2  # 3 items -> sizes 2, 1
    c, s, cn, sn, cm, sm = batches[0]
    assert c.shape == (2, 16, 16, 3) and cm.shape == (2, 16, 16)


def test_cityscapes_label_mapping():
    raw = np.array([[7, 8, 0], [26, 33, 5]], np.uint8)
    mapped = convert_label(raw)
    np.testing.assert_array_equal(mapped, [[0, 1, -1], [13, 18, -1]])


def test_cityscapes_dataset(tmp_path, rng):
    # side-by-side image: photo | gray-encoded labels
    s = 16
    photo = rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
    ids = rng.integers(0, 34, (s, s), dtype=np.uint8)
    label_rgb = np.stack([ids] * 3, axis=-1)
    side = np.concatenate([photo, label_rgb], axis=1)
    Image.fromarray(side, "RGB").save(tmp_path / "0.png")
    ds = CityscapesDataset(tmp_path, img_size=s)
    content, label = ds[0]
    assert content.shape == (s, s, 3)
    np.testing.assert_array_equal(label, convert_label(ids))
