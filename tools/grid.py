#!/usr/bin/env python
"""Qualitative comparison sheets — the reference's offline viz tooling
(``utils/grid.py:51-204``, ``utils/cmp.py``, ``utils/exp.py``) as one
parameterized CLI instead of hardcoded experiment paths.

Composes method-comparison grids: for each content/style pair, a row of
[content | style | method1 | method2 | ...] with margins; plus simple
hstack/vstack helpers.

Usage:
  python tools/grid.py --dirs out/m1 out/m2 --content c/ --style s/ \\
      --out sheet.png [--unit 256 --margin 4]
"""

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image


def image_compose_with_margin(images, unit_size: int = 256, margin: int = 4,
                              bg=(255, 255, 255)) -> Image.Image:
    """Horizontal strip with margins (utils/grid.py:51-71 semantics)."""
    n = len(images)
    w = n * unit_size + (n + 1) * margin
    h = unit_size + 2 * margin
    sheet = Image.new("RGB", (w, h), bg)
    for i, img in enumerate(images):
        img = img.resize((unit_size, unit_size), Image.BILINEAR)
        sheet.paste(img, (margin + i * (unit_size + margin), margin))
    return sheet


def vstack(sheets, margin: int = 0, bg=(255, 255, 255)) -> Image.Image:
    w = max(s.width for s in sheets)
    h = sum(s.height for s in sheets) + margin * (len(sheets) - 1)
    out = Image.new("RGB", (w, h), bg)
    y = 0
    for s in sheets:
        out.paste(s, (0, y))
        y += s.height + margin
    return out


def compose_compared_imgs(content_dir, style_dir, method_dirs, unit_size=256,
                          margin=4) -> Image.Image:
    """One row per content image: content | style | each method's output
    (utils/grid.py:170-204 semantics, path-parameterized)."""
    contents = sorted(Path(content_dir).glob("*"))
    styles = {p.stem: p for p in Path(style_dir).glob("*")}
    rows = []
    for cpath in contents:
        stem = cpath.stem
        spath = styles.get(stem) or styles.get(
            "tar" + stem.replace("in", ""))
        if spath is None:
            continue
        row_imgs = [Image.open(cpath).convert("RGB"),
                    Image.open(spath).convert("RGB")]
        for mdir in method_dirs:
            candidates = sorted(Path(mdir).glob(f"{stem}-*[!t].png"))
            candidates = [c for c in candidates
                          if not c.name.endswith("-cat.png")]
            if not candidates:
                continue
            row_imgs.append(Image.open(candidates[0]).convert("RGB"))
        rows.append(image_compose_with_margin(row_imgs, unit_size, margin))
    if not rows:
        raise SystemExit("no matching content/style/method outputs found")
    return vstack(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="+", required=True,
                    help="method output dirs (stylized PNGs)")
    ap.add_argument("--content", required=True)
    ap.add_argument("--style", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--unit", type=int, default=256)
    ap.add_argument("--margin", type=int, default=4)
    args = ap.parse_args()
    sheet = compose_compared_imgs(args.content, args.style, args.dirs,
                                  args.unit, args.margin)
    sheet.save(args.out)
    print(f"wrote {args.out} ({sheet.width}x{sheet.height})")


if __name__ == "__main__":
    main()
