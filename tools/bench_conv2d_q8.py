#!/usr/bin/env python
"""Microbench: standard-layout int8 Pallas conv vs XLA bf16/int8 convs.

The wide-channel stacks (adain increase: up to 512 ch at 512px; wct
deeper) are MXU-compute-bound.  BASELINE.md measured XLA int8 convs at
only 1.1-1.2x bf16 (never engaging the 2x int8 MXU rate); this bench
answers whether the hand-written im2col-free dot kernel
(``ops/pallas/conv2d_q8``) claims it.  Chained non-hoistable loop, one
device sync per window — same methodology as bench.py.

    python tools/bench_conv2d_q8.py [--img 512] [--iters 10]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import jax
import jax.numpy as jnp
import numpy as np

from rpst.ops.pallas.conv2d_q8 import fused_conv2d_q8
from rpst.ops.pallas.folded_conv_q8 import (quantize_activations,
                                            quantize_weights)


def bench(fn, *args, iters=10, repeats=3):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(x, rest, n):
        def body(i, carry):
            acc, x = carry
            # chain: output feeds next input (same shape/dtype — ch == co
            # and requantized int8), so the loop body can't be hoisted
            y = fn(x, *rest)
            return (acc + jnp.float32(jnp.max(jnp.abs(y).astype(
                jnp.float32))), y)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))[0]

    x, rest = args[0], args[1:]
    float(run_n(x, rest, iters))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(x, rest, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    img = 512
    iters = 10
    if "--img" in sys.argv:
        img = int(sys.argv[sys.argv.index("--img") + 1])
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    for ch, batch in ((128, 1), (256, 1), (512, 1), (256, 4)):
        co = ch
        flops = 2 * batch * img * img * 9 * ch * co
        xf = rng.normal(size=(batch, img, img, ch)).astype(np.float32)
        k = rng.normal(size=(3, 3, ch, co)).astype(np.float32) * 0.05
        b = rng.normal(size=(co,)).astype(np.float32)

        # --- XLA bf16 reflect conv + bias + lrelu (current serving) ---
        kb = jnp.asarray(k).astype(jnp.bfloat16)
        bb = jnp.asarray(b).astype(jnp.bfloat16)
        x16 = jnp.asarray(xf).astype(jnp.bfloat16)

        def conv_bf16(x, k, b):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode="reflect")
            y = jax.lax.conv_general_dilated(
                xp, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            return jnp.where(y >= 0, y, 0.2 * y).astype(x.dtype)

        t_bf16 = bench(conv_bf16, x16, kb, bb, iters=iters)

        # --- XLA int8 conv, int32 accumulate (measured-rejected path) ---
        w_q, w_scale = quantize_weights(jnp.asarray(k))
        x_scale = 0.05
        x_q = quantize_activations(jnp.asarray(xf), x_scale)
        deq = (x_scale * w_scale).astype(jnp.float32)
        inv_out = jnp.full((co,), 1.0 / x_scale, jnp.float32)

        def conv_xla_q8(x_q, w_q):
            xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode="reflect")
            acc = jax.lax.conv_general_dilated(
                xp, w_q, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * deq + jnp.asarray(b)
            y = jnp.where(y >= 0, y, 0.2 * y)
            return jnp.clip(jnp.round(y * inv_out), -127, 127) \
                .astype(jnp.int8)

        t_xla_q8 = bench(conv_xla_q8, x_q, w_q, iters=iters)

        # --- Pallas int8 kernel (int8 in -> int8 out, chained) ---
        scales = jnp.stack([deq, jnp.asarray(b), inv_out])
        t_pl_q8 = bench(
            lambda x, w, s: fused_conv2d_q8(x, w, s, out_int8=True),
            x_q, w_q, scales, iters=iters)

        tf = lambda t: flops / t / 1e12
        print(f"ch{ch} b{batch} {img}px REFLECT: "
              f"XLA bf16 {t_bf16*1e3:.2f} ms ({tf(t_bf16):.0f} TFLOP/s) | "
              f"XLA int8 {t_xla_q8*1e3:.2f} ms ({tf(t_xla_q8):.0f}) | "
              f"Pallas int8 {t_pl_q8*1e3:.2f} ms ({tf(t_pl_q8):.0f}) "
              f"[{t_bf16/t_pl_q8:.2f}x bf16, {t_xla_q8/t_pl_q8:.2f}x "
              f"XLA-int8]", flush=True)

        # --- zero-pad variants (RPSequence / adain family layout; XLA
        # folds the zero pad into a SAME conv — the fair fight) ---
        def conv_bf16_zero(x, k, b):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            return jnp.maximum(y, 0).astype(x.dtype)

        t_bf16_z = bench(conv_bf16_zero, x16, kb, bb, iters=iters)

        def conv_xla_q8_zero(x_q, w_q):
            acc = jax.lax.conv_general_dilated(
                x_q, w_q, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = jnp.maximum(acc.astype(jnp.float32) * deq + jnp.asarray(b),
                            0)
            return jnp.clip(jnp.round(y * inv_out), -127, 127) \
                .astype(jnp.int8)

        t_xla_q8_z = bench(conv_xla_q8_zero, x_q, w_q, iters=iters)

        t_pl_q8_z = bench(
            lambda x, w, s: fused_conv2d_q8(x, w, s, out_int8=True,
                                            alpha=0.0, pad_mode="zero"),
            x_q, w_q, scales, iters=iters)

        print(f"ch{ch} b{batch} {img}px ZERO:    "
              f"XLA bf16 {t_bf16_z*1e3:.2f} ms ({tf(t_bf16_z):.0f} "
              f"TFLOP/s) | "
              f"XLA int8 {t_xla_q8_z*1e3:.2f} ms ({tf(t_xla_q8_z):.0f}) | "
              f"Pallas int8 {t_pl_q8_z*1e3:.2f} ms ({tf(t_pl_q8_z):.0f}) "
              f"[{t_bf16_z/t_pl_q8_z:.2f}x bf16, "
              f"{t_xla_q8_z/t_pl_q8_z:.2f}x XLA-int8]", flush=True)


if __name__ == "__main__":
    main()
