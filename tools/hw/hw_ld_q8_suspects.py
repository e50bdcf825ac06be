"""Microbench the two suspects the LD q8 bisect isolated
(hw_ld_q8_bisect.py: enc4 +48 ms where components sum 15, dec0 +129
where components sum ~6):

  M1. XLA int8 7x7 C=256 with out_scale=None (bf16 out) — the shipping
      layer-4 form; the earlier microbench only timed the int8-out form.
  M2. Pallas std 3x3 Cin=512 -> Co=256, n=1, bf16 out (dec0's conv;
      block_rows shrinks to 2 at c512 -> 256 grid steps/img).
  M3. adain(cf, sf) at 512ch 512px + quantize (dec0's prologue).
  M4. XLA int8 7x7 C=256 n=2 int8-out control (known-fast: 11.9 ms).

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_ld_q8_suspects.py
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

from rpst.models import fast_path_q8 as q8
from rpst.ops.stats import adaptive_instance_normalization as adain

rngn = np.random.default_rng(0)


def bench_fn(fn, x0, iters=20, repeats=3):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(a, n):
        def body(i, carry):
            a0, acc = carry
            a0 = a0.at[0, 0, 0, 0].add((i % 2).astype(a0.dtype))
            y = fn(a0)
            return (a0, acc + jnp.float32(jnp.mean(y.astype(jnp.float32))))

        _, acc = jax.lax.fori_loop(0, n, body, (a, jnp.float32(0)))
        return acc

    float(run_n(x0, iters))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(x0, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def _std_kernel(x_q, k, b, out_scale=None):
    from rpst.ops.pallas.conv2d_q8 import fused_conv2d_q8
    w_q, w_s = q8.quantize_weights(k)
    srow2 = (jnp.zeros_like(w_s) if out_scale is None
             else jnp.broadcast_to(jnp.float32(1 / out_scale), w_s.shape))
    sc = jnp.stack([0.01 * w_s, b, srow2])
    return fused_conv2d_q8(x_q, w_q, sc, out_int8=out_scale is not None,
                           alpha=0.2, pad_mode="reflect", block_rows=16)


# M1 / M4: XLA int8 7x7 C=256 n=2, bf16-out vs int8-out
x_q = jnp.asarray(rngn.integers(-127, 128, (2, 512, 512, 256)), jnp.int8)
k7 = jnp.asarray(rngn.normal(0, 0.05, (7, 7, 256, 256)), jnp.float32)
b7 = jnp.zeros((256,), jnp.float32)
for tag, osc in (("M1 xla7x7 bf16-out", None), ("M4 xla7x7 int8-out", 0.02)):
    per = bench_fn(lambda x, _o=osc: q8._xla_conv_q8(
        x, 0.01, k7, b7, jnp.bfloat16, out_scale=_o), x_q)
    print(f"{tag} C=256 n=2: {per*1e3:.2f} ms", flush=True)

# M2: Pallas std 3x3 512->256 n=1, bf16-out and int8-out
x_q1 = jnp.asarray(rngn.integers(-127, 128, (1, 512, 512, 512)), jnp.int8)
k3 = jnp.asarray(rngn.normal(0, 0.05, (3, 3, 512, 256)), jnp.float32)
b3 = jnp.zeros((256,), jnp.float32)
for tag, osc in (("M2 pallas3x3 bf16-out", None),
                 ("M2 pallas3x3 int8-out", 0.02)):
    per = bench_fn(lambda x, _o=osc: _std_kernel(x, k3, b3, out_scale=_o),
                   x_q1)
    print(f"{tag} 512->256 n=1: {per*1e3:.2f} ms", flush=True)

# M2b: same contraction at the fast shape for reference: 3x3 256->256 n=2
k3b = jnp.asarray(rngn.normal(0, 0.05, (3, 3, 256, 256)), jnp.float32)
per = bench_fn(lambda x: _std_kernel(x, k3b, b7), x_q)
print(f"M2b pallas3x3 256->256 n=2 bf16-out: {per*1e3:.2f} ms", flush=True)

# M3: adain + quantize at (1,512,512,512)
f = jnp.asarray(rngn.normal(0, 1, (2, 512, 512, 512)), jnp.bfloat16)


def m3(f):
    out = adain(f[:1], f[1:]).astype(jnp.bfloat16)
    return q8.quantize_activations(out, 0.02)


per = bench_fn(m3, f)
print(f"M3 adain+quant 512ch: {per*1e3:.2f} ms", flush=True)
print("HW LD SUSPECTS DONE", flush=True)
