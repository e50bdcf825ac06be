#!/usr/bin/env python
"""Identify WHAT the fused2 kernel computed for the corrupt boundary
rows: emulate y2 row 0 in numpy under different ring hypotheses and
match against the chip output."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "src"))

import jax
import jax.numpy as jnp
import numpy as np

from rpst.ops.pallas.folded_conv_q8 import (fused_folded_conv_q8,
                                            quantize_activations,
                                            quantize_weights)
from rpst.ops.pallas.folded_conv2_q8 import fused_folded_conv2_q8

C = 32
C4 = 4 * C
HALF = C4 // 2


def emulate_row(y1, w2, deq2, b2, inv2, row_m1, row_0, row_p1):
    """int conv row: rows are (W, C4) int8; returns requantized int8."""
    W = row_0.shape[0]
    rows = np.stack([row_m1, row_0, row_p1]).astype(np.int32)  # (3, W, C4)
    # column rings (folded reflect in W): left ring col from cols 0/1
    # with subcol swap; same formula as the kernel
    lane = np.arange(C4)
    subcol0 = ((lane // C) % 2) == 0
    out = np.zeros((W, w2.shape[-1]), np.int32)
    for dc, shift in ((0, -1), (1, 0), (2, 1)):
        for dr in range(3):
            r = rows[dr]
            if shift == -1:
                ring = np.where(subcol0[None, :], r[1:2], r[0:1])
                sl = np.concatenate([ring, r[:-1]], axis=0)
            elif shift == 1:
                ring = np.where(subcol0[None, :], r[W - 1:W], r[W - 2:W - 1])
                sl = np.concatenate([r[1:], ring], axis=0)
            else:
                sl = r
            out += sl @ w2[dr, dc].astype(np.int32)
    y = out.astype(np.float32) * deq2 + b2
    y = np.where(y >= 0, y, 0.2 * y)
    return np.clip(np.round(y * inv2), -127, 127).astype(np.int8)


def main():
    rng = np.random.default_rng(0)
    x_scale = 0.02
    w_q, w_scale = quantize_weights(jnp.asarray(
        rng.normal(size=(3, 3, C4, C4)).astype(np.float32) * 0.2))
    w2_q, w2_scale = quantize_weights(jnp.asarray(
        rng.normal(size=(3, 3, C4, C4)).astype(np.float32) * 0.2))
    b1_f = jnp.asarray(rng.normal(size=(C4,)).astype(np.float32))
    b2_f = jnp.asarray(rng.normal(size=(C4,)).astype(np.float32))
    o1s, o2s = 0.9, 1.1
    sc1 = jnp.stack([(x_scale * w_scale).astype(jnp.float32), b1_f,
                     jnp.broadcast_to(jnp.float32(1.0 / o1s),
                                      w_scale.shape)])
    sc2 = jnp.stack([(o1s * w2_scale).astype(jnp.float32), b2_f,
                     jnp.broadcast_to(jnp.float32(1.0 / o2s),
                                      w2_scale.shape)])
    bs, h = 1, 64
    xf = rng.normal(size=(bs, h, 256, C4)).astype(np.float32) * 2.0
    x_q = quantize_activations(jnp.asarray(xf), x_scale)
    y1_ref = np.asarray(jax.jit(lambda x: fused_folded_conv_q8(
        x, w_q, sc1, out_int8=True))(x_q))
    _, y2 = jax.jit(lambda x: fused_folded_conv2_q8(
        x, w_q, sc1, w2_q, sc2, out_int8=True))(x_q)
    y2 = np.asarray(y2)

    w2 = np.asarray(w2_q)
    deq2 = np.asarray(sc2[0])
    b2 = np.asarray(sc2[1])
    inv2 = 1.0 / o2s
    y1 = y1_ref[0]  # (h, W, C4)

    ring_ok = np.where(np.arange(C4)[None, :] < HALF, y1[1], y1[0])
    ring_swap = np.where(np.arange(C4)[None, :] < HALF, y1[0], y1[1])
    cands = {
        "correct ring": (ring_ok, y1[0], y1[1]),
        "swapped-half ring": (ring_swap, y1[0], y1[1]),
        "zero ring": (np.zeros_like(y1[0]), y1[0], y1[1]),
        "clamp (row0 dup)": (y1[0], y1[0], y1[1]),
        "row1 dup": (y1[1], y1[0], y1[1]),
        "no-pad shift (rows 0,1,2)": (y1[0], y1[1], y1[2]),
    }
    got_row0 = y2[0, 0]
    for name, (m1, r0, p1) in cands.items():
        pred = emulate_row(y1, w2, deq2, b2, inv2, m1, r0, p1)
        err = np.abs(pred.astype(np.int32) - got_row0.astype(np.int32))
        print(f"row0 vs {name}: max|err|={err.max()} "
              f"mismatch={np.count_nonzero(err)}", flush=True)

    # bottom row 63: ring = [row63 | row62]
    ring_b = np.where(np.arange(C4)[None, :] < HALF, y1[63], y1[62])
    ring_b_swap = np.where(np.arange(C4)[None, :] < HALF, y1[62], y1[63])
    got_rowN = y2[0, 63]
    for name, (m1, r0, p1) in {
        "correct ring": (y1[62], y1[63], ring_b),
        "swapped-half": (y1[62], y1[63], ring_b_swap),
        "zero ring": (y1[62], y1[63], np.zeros_like(y1[0])),
        "clamp": (y1[62], y1[63], y1[63]),
        "shift (61,62,63)": (y1[61], y1[62], y1[63]),
    }.items():
        pred = emulate_row(y1, w2, deq2, b2, inv2, m1, r0, p1)
        err = np.abs(pred.astype(np.int32) - got_rowN.astype(np.int32))
        print(f"row63 vs {name}: max|err|={err.max()} "
              f"mismatch={np.count_nonzero(err)}", flush=True)


if __name__ == "__main__":
    main()
