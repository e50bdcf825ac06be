#!/usr/bin/env python
"""Generate a structured synthetic image corpus for convergence runs.

No image datasets ship in this environment (zero egress), so training
dynamics are demonstrated on synthetic content/style folders whose
images have real spatial structure (gradients, shapes, stripes,
checkers — not iid noise), giving the style-statistics losses a
non-degenerate target.  Usage:

    python tools/make_synthetic_corpus.py /tmp/rpst_corpus --n 16 --size 512
"""

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def _gradient(rng, size):
    a = rng.uniform(0, 1, 3)
    b = rng.uniform(0, 1, 3)
    t = np.linspace(0, 1, size)
    axis = rng.integers(0, 2)
    g = t[:, None] if axis == 0 else t[None, :]
    img = a[None, None] * (1 - g[..., None]) + b[None, None] * g[..., None]
    return img


def _shapes(rng, size, k=12):
    img = np.full((size, size, 3), rng.uniform(0, 1, 3), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(k):
        cx, cy = rng.integers(0, size, 2)
        r = rng.integers(size // 16, size // 4)
        color = rng.uniform(0, 1, 3)
        if rng.integers(0, 2):
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
        else:
            mask = (np.abs(xx - cx) < r) & (np.abs(yy - cy) < r)
        img[mask] = color
    return img


def _stripes(rng, size):
    period = rng.integers(8, 64)
    phase = rng.uniform(0, np.pi)
    angle = rng.uniform(0, np.pi)
    yy, xx = np.mgrid[0:size, 0:size]
    t = (np.cos(angle) * xx + np.sin(angle) * yy) / period + phase
    w = 0.5 + 0.5 * np.sin(2 * np.pi * t)
    a = rng.uniform(0, 1, 3)
    b = rng.uniform(0, 1, 3)
    return a[None, None] * (1 - w[..., None]) + b[None, None] * w[..., None]


def _checker(rng, size):
    cell = rng.integers(16, 96)
    yy, xx = np.mgrid[0:size, 0:size]
    w = ((xx // cell + yy // cell) % 2).astype(np.float32)
    a = rng.uniform(0, 1, 3)
    b = rng.uniform(0, 1, 3)
    return a[None, None] * (1 - w[..., None]) + b[None, None] * w[..., None]


GENS = [_gradient, _shapes, _stripes, _checker]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    for sub in ("content", "style", "test/content", "test/style"):
        (args.root / sub).mkdir(parents=True, exist_ok=True)
    for i in range(args.n):
        for sub in ("content", "style"):
            gen = GENS[(i + (0 if sub == "content" else 2)) % len(GENS)]
            img = np.clip(gen(rng, args.size), 0, 1)
            # mild texture so instance std never degenerates
            img = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8), "RGB").save(
                args.root / sub / f"{i:03d}.png")
    for i in range(4):
        for sub in ("test/content", "test/style"):
            gen = GENS[(i + (1 if sub.endswith("content") else 3))
                       % len(GENS)]
            img = np.clip(gen(rng, args.size), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8), "RGB").save(
                args.root / sub / f"{i:03d}.png")
    print(f"corpus at {args.root}: {args.n} content + {args.n} style "
          f"+ 4/4 test @ {args.size}px")


if __name__ == "__main__":
    main()
