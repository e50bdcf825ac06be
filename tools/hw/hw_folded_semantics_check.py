#!/usr/bin/env python
"""On-chip semantics check of ops/folded.py's slice-compose helpers vs
numpy oracles, all JITTED (2026-08-20 find: XLA:TPU miscompiles
``concat([x[:,1:2,:,:64], x[:,0:1,:,64:]], -1)`` to read row 1 for BOTH
halves — eager and CPU are correct, so every CPU test passed while every
TPU folded path consumed wrong reflect rings).

Run after any change to ops/folded.py and after jax/libtpu updates.
Exit 0 = all helpers compile to the right values on this backend.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "src"))

import jax
import jax.numpy as jnp
import numpy as np

from rpst.ops.folded import (_col_ring, _row_ring, fold, folded_reflect_pad,
                             unfold)

FAILED = []


def check(name, got, exp):
    err = np.abs(np.asarray(got, np.float32) - np.asarray(exp, np.float32))
    ok = err.max() == 0
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|err|={err.max():.0f}",
          flush=True)
    if not ok:
        FAILED.append(name)


def np_fold(x):
    n, h, w, c = x.shape
    v = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return np.concatenate([v[:, :, 0, :, 0], v[:, :, 0, :, 1],
                           v[:, :, 1, :, 0], v[:, :, 1, :, 1]], axis=-1)


def np_reflect_pad_folded(xf):
    """Reflect-pad in the ORIGINAL domain, then fold (ground truth)."""
    n, h, w, c4 = xf.shape
    c = c4 // 4
    x = np_unfold(xf)
    xp = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return np_fold(xp)


def np_unfold(xf):
    n, h, w, c4 = xf.shape
    c = c4 // 4
    v = xf.reshape(n, h, w, 4, c)
    out = np.zeros((n, 2 * h, 2 * w, c), v.dtype)
    out[:, 0::2, 0::2] = v[:, :, :, 0]
    out[:, 0::2, 1::2] = v[:, :, :, 1]
    out[:, 1::2, 0::2] = v[:, :, :, 2]
    out[:, 1::2, 1::2] = v[:, :, :, 3]
    return out


def main():
    rng = np.random.default_rng(0)
    for dtype in (np.int8, np.float32):
        x = jnp.asarray(rng.integers(-127, 128, (2, 16, 24, 128))
                        .astype(dtype))
        xn = np.asarray(x)
        half = 64
        top_np = np.concatenate([xn[:, 1:2, :, :half],
                                 xn[:, 0:1, :, half:]], -1)
        bot_np = np.concatenate([xn[:, 15:16, :, :half],
                                 xn[:, 14:15, :, half:]], -1)
        check(f"_row_ring top {np.dtype(dtype).name}",
              jax.jit(lambda v: _row_ring(v, True))(x), top_np)
        check(f"_row_ring bottom {np.dtype(dtype).name}",
              jax.jit(lambda v: _row_ring(v, False))(x), bot_np)

        pad = jax.jit(folded_reflect_pad)(x)
        exp_pad = np_reflect_pad_folded(xn)
        check(f"folded_reflect_pad {np.dtype(dtype).name}", pad, exp_pad)

        img = jnp.asarray(rng.normal(size=(1, 16, 16, 3))
                          .astype(np.float32))
        check("fold/unfold roundtrip",
              jax.jit(lambda v: unfold(fold(v)))(img), np.asarray(img))

    print("FAILED:" if FAILED else "all folded helpers compile correctly",
          FAILED if FAILED else "")
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
