"""Visualization rendering tests (host-side, no device work)."""

import numpy as np
from PIL import Image

from rpst.viz import (make_grid, save_channel_attention, save_claim_maps,
                      save_feature_maps)


def test_make_grid_shape():
    ref = Image.new("RGB", (64, 64), (255, 0, 0))
    tiles = [Image.new("RGB", (32, 32), (0, 255, 0)) for _ in range(8)]
    sheet = make_grid(ref, tiles, w_num=4, unit_size=32)
    assert sheet.size == (5 * 32, 2 * 32)


def test_save_claim_maps(tmp_path, rng):
    hw = 16
    aux = {"claim_value": rng.random((1, hw, 1)).astype(np.float32),
           "claim_before": rng.random((1, hw, hw)).astype(np.float32),
           "claim_after": rng.random((1, hw, hw)).astype(np.float32)}
    path = save_claim_maps(aux, tmp_path, iterations=5, bid=1)
    assert path and (tmp_path / "claim_map" / "it_5_bid_1.png").exists()


def test_save_channel_attention(tmp_path, rng):
    maps = [rng.random((1, 1, 1, 8)).astype(np.float32), None,
            rng.random((1, 1, 1, 8)).astype(np.float32)]
    path = save_channel_attention(maps, tmp_path, iterations=2)
    assert path and (tmp_path / "claim_map" / "it_2_bid_0.png").exists()
    assert save_channel_attention([None], tmp_path) is None


def test_save_feature_maps(tmp_path, rng):
    ref = rng.random((16, 16, 3)).astype(np.float32)
    feats = [rng.random((1, 16, 16, 8)).astype(np.float32) for _ in range(2)]
    path = save_feature_maps(ref, feats, tmp_path, suffix="content",
                             unit_size=16)
    assert path and (tmp_path / "visualize" / "it_0_bid_0_content.png").exists()


def test_grid_tool_composes_sheet(tmp_path, rng):
    """tools/grid.py: method-comparison sheet composition
    (reference utils/grid.py:170-204 semantics)."""
    import importlib.util
    from PIL import Image
    spec = importlib.util.spec_from_file_location(
        "grid_tool", "tools/grid.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    dirs = {}
    for d in ("content", "style", "m1", "m2"):
        p = tmp_path / d
        p.mkdir()
        for stem in ("a", "b"):
            # method dirs use test.py's "{content}-{style}.png" convention
            nme = f"{stem}-{stem}.png" if d.startswith("m") else f"{stem}.png"
            Image.fromarray(
                (rng.random((16, 16, 3)) * 255).astype("uint8"),
                "RGB").save(p / nme)
        dirs[d] = p

    sheet = mod.compose_compared_imgs(
        dirs["content"], dirs["style"], [dirs["m1"], dirs["m2"]],
        unit_size=16, margin=2)
    # rows = images, cols = content|style|m1|m2 (+margins)
    assert sheet.size[0] >= 4 * 16 and sheet.size[1] >= 2 * 16
    out = tmp_path / "sheet.png"
    sheet.save(out)
    assert out.exists()


def test_prepare_cityscapes_tool(tmp_path, rng):
    """tools/prepare_cityscapes.py pairs gtFine labels with leftImg8bit
    photos and emits side-by-side 512x(2*512) sheets
    (reference utils/prepare_cityscapes_dataset.py:28-66)."""
    import importlib.util
    from PIL import Image
    spec = importlib.util.spec_from_file_location(
        "prep_cs", "tools/prepare_cityscapes.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    gt = tmp_path / "gtFine" / "train" / "city"
    left = tmp_path / "leftImg8bit" / "train" / "city"
    gt.mkdir(parents=True)
    left.mkdir(parents=True)
    base = "city_000000_000019"
    Image.fromarray(rng.integers(0, 33, (64, 128), dtype="uint8"),
                    "L").save(gt / f"{base}_gtFine_labelIds.png")
    Image.fromarray(rng.integers(0, 255, (64, 128, 3), dtype="uint8"),
                    "RGB").save(left / f"{base}_leftImg8bit.png")
    out = tmp_path / "out"
    mod.process(tmp_path / "gtFine", tmp_path / "leftImg8bit", out, "train")
    made = list(out.rglob("*.jpg")) + list(out.rglob("*.png"))
    assert made, "no output images written"
