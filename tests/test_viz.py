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
