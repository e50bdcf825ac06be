#!/usr/bin/env python
"""Cityscapes preprocessing; reference ``utils/prepare_cityscapes_dataset.py``.

Pairs ``gtFine/*_labelIds.png`` with ``leftImg8bit`` photos, resizes to
512², and emits both side-by-side (pix2pix) and split (cyclegan) layouts.

Usage:
  python tools/prepare_cityscapes.py --gtFine_dir gtFine/ \\
      --leftImg8bit_dir leftImg8bit/ --output_dir datasets/cityscapes/
"""

import argparse
import glob
import os

from PIL import Image

SIZE = 512


def load_resized(path):
    return Image.open(path).convert("RGB").resize((SIZE, SIZE))


def check_matching(segmap_path, photo_path):
    seg_id = os.path.basename(segmap_path).replace("_gtFine_labelIds", "")
    photo_id = os.path.basename(photo_path).replace("_leftImg8bit", "")
    assert seg_id == photo_id, f"{segmap_path} vs {photo_path} don't match"


def process(gtfine_dir, left_dir, output_dir, phase):
    save_phase = "test" if phase == "val" else "train"
    savedir = os.path.join(output_dir, save_phase)
    os.makedirs(savedir, exist_ok=True)
    os.makedirs(savedir + "A", exist_ok=True)
    os.makedirs(savedir + "B", exist_ok=True)

    segmaps = sorted(glob.glob(
        os.path.join(gtfine_dir, phase, "*", "*_labelIds.png")))
    photos = sorted(glob.glob(
        os.path.join(left_dir, phase, "*", "*_leftImg8bit.png")))
    assert len(segmaps) == len(photos), (len(segmaps), len(photos))

    for i, (seg_path, photo_path) in enumerate(zip(segmaps, photos)):
        check_matching(seg_path, photo_path)
        seg = load_resized(seg_path)
        photo = load_resized(photo_path)
        side = Image.new("RGB", (2 * SIZE, SIZE))
        side.paste(photo, (0, 0))
        side.paste(seg, (SIZE, 0))
        side.save(os.path.join(savedir, f"{i}.jpg"), format="JPEG",
                  subsampling=0, quality=100)
        photo.save(os.path.join(savedir + "A", f"{i}_A.jpg"), format="JPEG",
                   subsampling=0, quality=100)
        seg.save(os.path.join(savedir + "B", f"{i}_B.jpg"), format="JPEG",
                 subsampling=0, quality=100)
        if len(segmaps) >= 10 and i % (len(segmaps) // 10) == 0:
            print(f"{i} / {len(segmaps)}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gtFine_dir", required=True)
    ap.add_argument("--leftImg8bit_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    args = ap.parse_args()
    for phase in ("val", "train"):
        print(f"Preparing Cityscapes {phase}")
        process(args.gtFine_dir, args.leftImg8bit_dir, args.output_dir, phase)
    print("Done")
