"""Size the LD-family 7x7 int8 opportunity (NOTES.md next-round item).

ld_adain (v1)'s big-RF branches are reflect 7x7 lrelu convs; the two
lane-aligned ones (128->128, 256->256 at 512px) carry 2.1 of the
family's 6.2 TFLOP/img.  Before building a K=7 variant of the
standard-layout int8 kernel, measure what XLA already achieves on these
shapes: (a) bf16 reflect 7x7 + lrelu (the current ld bf16 path), and
(b) XLA int8 conv (historically 1.1-1.2x bf16 — never engages the int8
rate).  If (a) already runs near the ~197 TF/s bf16-rate MXU floor, a
Pallas kernel has no XLA-arbitrage win and the LD q8 path is not worth
building; if it is far below, the 3x3 kernel's measured 1.9-2.6x
arbitrage likely generalizes.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_conv7_probe.py
"""
import sys
import time
from functools import partial
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))
import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)


def bench_op(make_x, op, iters=30, repeats=3):
    """bench.py chained-fori methodology: iters chained applications in
    one jit, scalar fetch (block_until_ready doesn't sync the tunnel)."""
    x0 = make_x()

    @partial(jax.jit, static_argnames=("n",))
    def run_n(x, n):
        def body(i, carry):
            x, acc = carry
            # i-dependent input perturbation prevents loop-invariant
            # hoisting (bench.py:_bench_chained) — without it XLA computes
            # the conv ONCE and the loop times nothing (first run of this
            # probe printed 1462 "TF/s", 7x the chip's bf16 peak)
            if x.dtype == jnp.int8:
                x = x.at[0, 0, 0, 0].add((i % 2).astype(jnp.int8))
            else:
                x = x.at[0, 0, 0, 0].add(1e-12 * i)
            y = op(x)
            return (x, acc + jnp.float32(jnp.mean(y.astype(jnp.float32))))

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    float(run_n(x0, iters))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(x0, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


for C in (128, 256):
    H = W = 512
    K = 7
    rng = np.random.default_rng(0)
    w_f = jnp.asarray(rng.normal(0, 0.05, (K, K, C, C)), jnp.bfloat16)
    b_f = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.bfloat16)
    flops = 2 * H * W * K * K * C * C

    def bf16_conv(x, w=w_f, b=b_f):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jnp.where(y >= 0, y, 0.2 * y)

    per = bench_op(lambda: jnp.asarray(
        rng.random((1, H, W, C), np.float32), jnp.bfloat16), bf16_conv)
    print(f"XLA bf16 reflect7x7+lrelu C={C}: {per*1e3:.3f} ms  "
          f"{flops/per/1e12:.1f} TF/s", flush=True)

    w_q = jnp.asarray(rng.integers(-127, 128, (K, K, C, C)), jnp.int8)

    def int8_conv(x, w=w_q):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return y

    per = bench_op(lambda: jnp.asarray(
        rng.integers(-127, 128, (1, H, W, C)), jnp.int8), int8_conv)
    print(f"XLA int8 7x7 conv C={C}: {per*1e3:.3f} ms  "
          f"{flops/per/1e12:.1f} TOP/s", flush=True)

    # 3x3 reference points on the same channel widths (the shapes where
    # the Pallas 3x3 kernel measured 1.9-2.6x XLA bf16)
    w3 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.bfloat16)
    flops3 = 2 * H * W * 3 * 3 * C * C

    def bf16_conv3(x, w=w3, b=b_f):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jnp.where(y >= 0, y, 0.2 * y)

    per = bench_op(lambda: jnp.asarray(
        rng.random((1, H, W, C), np.float32), jnp.bfloat16), bf16_conv3)
    print(f"XLA bf16 reflect3x3+lrelu C={C}: {per*1e3:.3f} ms  "
          f"{flops3/per/1e12:.1f} TF/s", flush=True)

print("HW CONV7 PROBE DONE", flush=True)
