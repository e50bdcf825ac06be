"""Tests for the offline tools: grid composition and Cityscapes prep.

Covers the last two previously-untested components (PARITY.md "—" rows):
``tools/grid.py`` (reference ``utils/grid.py:51-71,170-204``) and
``tools/prepare_cityscapes.py`` (reference
``utils/prepare_cityscapes_dataset.py:28-66``), against tiny synthetic
image trees.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

_TOOLS = Path(__file__).resolve().parent.parent / "tools"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, _TOOLS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


grid = _load("grid")
prep = _load("prepare_cityscapes")


def _solid(color, size=(8, 8)):
    return Image.new("RGB", size, color)


class TestGrid:
    def test_compose_with_margin_layout(self):
        imgs = [_solid((255, 0, 0)), _solid((0, 255, 0)), _solid((0, 0, 255))]
        sheet = grid.image_compose_with_margin(imgs, unit_size=8, margin=2)
        # reference utils/grid.py:51-71: n*unit + (n+1)*margin wide,
        # unit + 2*margin tall, white background.
        assert sheet.size == (3 * 8 + 4 * 2, 8 + 2 * 2)
        px = np.asarray(sheet)
        assert tuple(px[0, 0]) == (255, 255, 255)          # margin bg
        assert tuple(px[4, 4]) == (255, 0, 0)              # first unit
        assert tuple(px[4, 2 + 10 + 4]) == (0, 255, 0)     # second unit
        assert tuple(px[4, 2 + 20 + 4]) == (0, 0, 255)     # third unit
        assert tuple(px[4, 10]) == (255, 255, 255)         # inter-image margin

    def test_compose_resizes_to_unit(self):
        imgs = [_solid((10, 20, 30), size=(32, 16))]
        sheet = grid.image_compose_with_margin(imgs, unit_size=8, margin=0)
        assert sheet.size == (8, 8)
        assert tuple(np.asarray(sheet)[4, 4]) == (10, 20, 30)

    def test_vstack(self):
        a = _solid((255, 0, 0), size=(10, 4))
        b = _solid((0, 255, 0), size=(6, 3))
        out = grid.vstack([a, b], margin=2)
        assert out.size == (10, 4 + 2 + 3)
        px = np.asarray(out)
        assert tuple(px[0, 0]) == (255, 0, 0)
        assert tuple(px[5, 0]) == (255, 255, 255)          # margin row
        assert tuple(px[6, 0]) == (0, 255, 0)
        assert tuple(px[6, 8]) == (255, 255, 255)          # width pad

    def _fake_tree(self, tmp_path):
        cdir = tmp_path / "content"
        sdir = tmp_path / "style"
        m1 = tmp_path / "m1"
        m2 = tmp_path / "m2"
        for d in (cdir, sdir, m1, m2):
            d.mkdir()
        _solid((200, 0, 0)).save(cdir / "in1.png")
        _solid((0, 200, 0)).save(sdir / "tar1.png")   # in/tar name mapping
        _solid((0, 0, 200)).save(m1 / "in1-tar1.png")
        _solid((9, 9, 9)).save(m1 / "in1-tar1-cat.png")  # panel: must skip
        _solid((200, 200, 0)).save(m2 / "in1-tar1.png")
        return cdir, sdir, m1, m2

    def test_compose_compared_imgs(self, tmp_path):
        cdir, sdir, m1, m2 = self._fake_tree(tmp_path)
        sheet = grid.compose_compared_imgs(cdir, sdir, [m1, m2],
                                           unit_size=8, margin=2)
        # one row: content | style | m1 | m2 — the -cat panel is excluded
        assert sheet.size == (4 * 8 + 5 * 2, 8 + 2 * 2)
        px = np.asarray(sheet)
        assert tuple(px[4, 4]) == (200, 0, 0)
        assert tuple(px[4, 14]) == (0, 200, 0)
        assert tuple(px[4, 24]) == (0, 0, 200)
        assert tuple(px[4, 34]) == (200, 200, 0)

    def test_compose_compared_imgs_no_match_exits(self, tmp_path):
        (tmp_path / "c").mkdir()
        (tmp_path / "s").mkdir()
        with pytest.raises(SystemExit):
            grid.compose_compared_imgs(tmp_path / "c", tmp_path / "s", [])

    def test_cli(self, tmp_path):
        import subprocess
        cdir, sdir, m1, m2 = self._fake_tree(tmp_path)
        out = tmp_path / "sheet.png"
        r = subprocess.run(
            [sys.executable, str(_TOOLS / "grid.py"), "--dirs", str(m1),
             str(m2), "--content", str(cdir), "--style", str(sdir),
             "--out", str(out), "--unit", "8", "--margin", "2"],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert out.exists()
        assert Image.open(out).size == (4 * 8 + 5 * 2, 8 + 2 * 2)


class TestPrepareCityscapes:
    def _fake_cityscapes(self, tmp_path, phases=("val",), n=2):
        gt = tmp_path / "gtFine"
        left = tmp_path / "leftImg8bit"
        for phase in phases:
            (gt / phase / "city").mkdir(parents=True)
            (left / phase / "city").mkdir(parents=True)
            for i in range(n):
                stem = f"city_{i:06d}_000019"
                Image.new("RGB", (64, 32), (i * 30 % 256, 0, 0)).save(
                    gt / phase / "city" / f"{stem}_gtFine_labelIds.png")
                Image.new("RGB", (64, 32), (0, i * 30 % 256, 0)).save(
                    left / phase / "city" / f"{stem}_leftImg8bit.png")
        return gt, left

    def test_process_layouts(self, tmp_path):
        gt, left = self._fake_cityscapes(tmp_path, phases=("val",), n=2)
        out = tmp_path / "out"
        prep.process(str(gt), str(left), str(out), "val")
        # val → test split (reference prepare_cityscapes_dataset.py:30-36)
        for sub, count in (("test", 2), ("testA", 2), ("testB", 2)):
            files = sorted((out / sub).glob("*.jpg"))
            assert len(files) == count, sub
        side = Image.open(out / "test" / "0.jpg")
        assert side.size == (2 * prep.SIZE, prep.SIZE)   # photo | seg
        photo = Image.open(out / "testA" / "0_A.jpg")
        seg = Image.open(out / "testB" / "0_B.jpg")
        assert photo.size == (prep.SIZE, prep.SIZE)
        assert seg.size == (prep.SIZE, prep.SIZE)
        # left half of the side-by-side is the photo, right half the segmap
        # (index 0's colors are all-black with i=0 → check index 1: photo
        # (0,30,0), segmap (30,0,0), modulo JPEG noise)
        side1 = np.asarray(Image.open(out / "test" / "1.jpg"))
        assert side1[256, 256, 1] > 10 and side1[256, 256, 0] < 20  # photo
        assert side1[256, 768, 0] > 10 and side1[256, 768, 1] < 20  # segmap

    def test_train_phase_keeps_name(self, tmp_path):
        gt, left = self._fake_cityscapes(tmp_path, phases=("train",), n=1)
        out = tmp_path / "out"
        prep.process(str(gt), str(left), str(out), "train")
        assert (out / "train" / "0.jpg").exists()
        assert (out / "trainA" / "0_A.jpg").exists()
        assert (out / "trainB" / "0_B.jpg").exists()

    def test_mismatched_pair_asserts(self, tmp_path):
        gt, left = self._fake_cityscapes(tmp_path, phases=("val",), n=1)
        # rename the photo so ids no longer match
        p = next((left / "val" / "city").glob("*_leftImg8bit.png"))
        p.rename(p.with_name("city_999999_000019_leftImg8bit.png"))
        with pytest.raises(AssertionError):
            prep.process(str(gt), str(left), str(tmp_path / "o"), "val")

    def test_count_mismatch_asserts(self, tmp_path):
        gt, left = self._fake_cityscapes(tmp_path, phases=("val",), n=2)
        next((left / "val" / "city").glob("*.png")).unlink()
        with pytest.raises(AssertionError):
            prep.process(str(gt), str(left), str(tmp_path / "o"), "val")
