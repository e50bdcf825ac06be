#!/usr/bin/env python
"""Confirm/localize the single-layer fused_folded_conv_q8 out_int8=True
boundary-row corruption on hardware: compare EVERY row against an exact
integer numpy emulation (including requantization), for both ring-splice
variants (value-domain default and ring_dma) and both out dtypes."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "src"))

import jax
import jax.numpy as jnp
import numpy as np

from rpst.ops.pallas.folded_conv_q8 import (fused_folded_conv_q8,
                                            quantize_activations,
                                            quantize_weights)

C = 32
C4 = 4 * C
HALF = C4 // 2
W = 256


def emulate(x, rings, w, deq, b, inv, out_int8):
    """x: (h, W, C4) int8; rings: (2, W, C4) int8 host ring rows."""
    h = x.shape[0]
    xp = np.concatenate([rings[0:1], x, rings[1:2]], axis=0).astype(np.int32)
    lane = np.arange(C4)
    subcol0 = ((lane // C) % 2) == 0
    out = np.zeros((h, W, w.shape[-1]), np.int32)
    for r in range(h):
        rows = xp[r:r + 3]
        for dc, shift in ((0, -1), (1, 0), (2, 1)):
            for dr in range(3):
                q = rows[dr]
                if shift == -1:
                    ring = np.where(subcol0[None, :], q[1:2], q[0:1])
                    sl = np.concatenate([ring, q[:-1]], axis=0)
                elif shift == 1:
                    ring = np.where(subcol0[None, :], q[W - 1:W],
                                    q[W - 2:W - 1])
                    sl = np.concatenate([q[1:], ring], axis=0)
                else:
                    sl = q
                out[r] += sl @ w[dr, dc].astype(np.int32)
    y = out.astype(np.float32) * deq + b
    y = np.where(y >= 0, y, 0.2 * y)
    if out_int8:
        return np.clip(np.round(y * inv), -127, 127).astype(np.int8)
    return y


def main():
    from rpst.ops.folded import _row_ring

    rng = np.random.default_rng(0)
    x_scale = 0.02
    w_q, w_scale = quantize_weights(jnp.asarray(
        rng.normal(size=(3, 3, C4, C4)).astype(np.float32) * 0.2))
    b_f = jnp.asarray(rng.normal(size=(C4,)).astype(np.float32))
    osc = 0.9
    sc = jnp.stack([(x_scale * w_scale).astype(jnp.float32), b_f,
                    jnp.broadcast_to(jnp.float32(1.0 / osc),
                                     w_scale.shape)])
    for h in (64, 32):
        xf = rng.normal(size=(1, h, W, C4)).astype(np.float32) * 2.0
        x_q = quantize_activations(jnp.asarray(xf), x_scale)
        rings = np.concatenate(
            [np.asarray(_row_ring(x_q, True)),
             np.asarray(_row_ring(x_q, False))], axis=1)[0]
        for out_int8 in (True, False):
            for ring_dma in (False, True):
                got = np.asarray(jax.jit(
                    lambda x: fused_folded_conv_q8(
                        x, w_q, sc, out_int8=out_int8,
                        ring_dma=ring_dma))(x_q),
                    np.float32)[0]
                ref = emulate(np.asarray(x_q)[0], rings, np.asarray(w_q),
                              np.asarray(sc[0]), np.asarray(sc[1]),
                              1.0 / osc, out_int8).astype(np.float32)
                err = np.abs(got - ref)
                tol = 0.0 if out_int8 else 0.25
                bad = np.unique(np.nonzero(err > tol)[0])
                print(f"{'PASS' if len(bad) == 0 else 'FAIL'} h{h} "
                      f"out_int8={out_int8} ring_dma={ring_dma}: "
                      f"max|err|={err.max():.3f} bad_rows={bad[:6]}",
                      flush=True)


if __name__ == "__main__":
    main()
