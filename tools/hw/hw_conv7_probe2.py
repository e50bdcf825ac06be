"""Follow-up to hw_conv7_probe.py: map the XLA int8-conv fast-rate
window.  The first probe measured XLA int8 7x7 at 253.7 TOP/s (C=256)
— ABOVE the 197 TF/s bf16 MXU peak, the repo's first observation of
the 2x int8 rate (BASELINE.md's round-3 model said it was unreachable;
that conclusion was drawn from Mosaic dot_general and XLA 3x3 convs).
This probe asks: (a) does the rate engage for 3x3 at wide channels
(would obsolete the Pallas standard-layout kernel)? (b) does a fused
dequant->bias->lrelu->requant epilogue keep the 7x7 rate (the form the
LD q8 path needs)? (c) 5x5 as the K-threshold bisect.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_conv7_probe2.py
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
    x0 = make_x()

    @partial(jax.jit, static_argnames=("n",))
    def run_n(x, n):
        def body(i, carry):
            x, acc = carry
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


rng = np.random.default_rng(0)
H = W = 512


def int8_conv(K, C, Co, epilogue):
    w_q = jnp.asarray(rng.integers(-127, 128, (K, K, C, Co)), jnp.int8)
    deq = jnp.asarray(rng.random(Co) * 1e-3, jnp.float32)
    bias = jnp.asarray(rng.normal(size=Co), jnp.float32)

    def op(x):
        p = K // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, w_q, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        if not epilogue:
            return y
        f = y.astype(jnp.float32) * deq + bias
        f = jnp.where(f >= 0, f, 0.2 * f)
        return jnp.clip(jnp.round(f * 9.0), -127, 127).astype(jnp.int8)

    per = bench_op(lambda: jnp.asarray(
        rng.integers(-127, 128, (1, H, W, C)), jnp.int8), op)
    flops = 2 * H * W * K * K * C * Co
    tag = "+epi->int8" if epilogue else " raw-int32"
    print(f"XLA int8 {K}x{K} C={C}->{Co}{tag}: {per*1e3:.3f} ms  "
          f"{flops/per/1e12:.1f} TOP/s", flush=True)


# (a) 3x3 at wide channels — does the fast rate engage at K*K*C >= ~2k?
int8_conv(3, 256, 256, False)
int8_conv(3, 512, 512, False)
int8_conv(3, 512, 256, False)
# (c) 5x5 bisect
int8_conv(5, 256, 256, False)
# (b) the epilogue-fused forms the LD path would use
int8_conv(7, 256, 256, True)
int8_conv(7, 128, 128, True)
int8_conv(3, 512, 256, True)
print("HW CONV7 PROBE2 DONE", flush=True)
