#!/usr/bin/env python
"""Fast on-chip bit-exactness check for fused_folded_conv2_q8 only
(iteration loop for the full tools/hw_kernel_check.py)."""

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

FAILED = []


def check(name, got, ref, atol):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    err = np.abs(got - ref).max()
    ok = err <= atol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|err| = {err:.3e}",
          flush=True)
    if not ok:
        FAILED.append(name)


def main():
    rng = np.random.default_rng(0)
    C = 32
    x_scale = 0.02
    w_q, w_scale = quantize_weights(jnp.asarray(
        rng.normal(size=(3, 3, 4 * C, 4 * C)).astype(np.float32) * 0.2))
    w2_q, w2_scale = quantize_weights(jnp.asarray(
        rng.normal(size=(3, 3, 4 * C, 4 * C)).astype(np.float32) * 0.2))
    b1_f = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
    b2_f = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
    o1s, o2s = 0.9, 1.1
    sc1 = jnp.stack([(x_scale * w_scale).astype(jnp.float32), b1_f,
                     jnp.broadcast_to(jnp.float32(1.0 / o1s),
                                      w_scale.shape)])
    sc2 = jnp.stack([(o1s * w2_scale).astype(jnp.float32), b2_f,
                     jnp.broadcast_to(jnp.float32(1.0 / o2s),
                                      w2_scale.shape)])
    for bs, h in ((1, 64), (2, 32), (1, 16)):
        xf = rng.normal(size=(bs, h, 256, 4 * C)).astype(np.float32) * 2.0
        x_q = quantize_activations(jnp.asarray(xf), x_scale)
        y1_ref = jax.jit(lambda x: fused_folded_conv_q8(
            x, w_q, sc1, out_int8=True))(x_q)
        y2_ref = jax.jit(lambda y: fused_folded_conv_q8(
            y, w2_q, sc2, out_int8=True))(y1_ref)
        y1, y2 = jax.jit(lambda x: fused_folded_conv2_q8(
            x, w_q, sc1, w2_q, sc2, out_int8=True))(x_q)
        check(f"y1 b{bs} h{h}", y1, y1_ref, atol=0.0)
        check(f"y2 b{bs} h{h}", y2, y2_ref, atol=0.0)
        if FAILED:
            # localize: which rows/cols differ?
            d = np.abs(np.asarray(y2, np.int32) - np.asarray(y2_ref,
                                                            np.int32))
            rows = np.unique(np.nonzero(d)[1])
            cols = np.unique(np.nonzero(d)[2])
            lanes = np.unique(np.nonzero(d)[3])
            print(f"  diff rows {rows[:8]}..{rows[-1] if len(rows) else ''} "
                  f"({len(rows)}/{d.shape[1]}), cols {len(cols)}/{d.shape[2]}, "
                  f"lanes {len(lanes)}/{d.shape[3]}", flush=True)
            break
    print("FAILED:" if FAILED else "all fused2 checks pass on hardware",
          FAILED if FAILED else "")
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
