"""Ablate the LD q8 b1 regression (26.3 img/s at b4 but 4.75 at b1 vs
13.5 bf16): which int8 component collapses at small batch?

Arms (512px, b1 and b2):
  A. full q8 (Pallas 3x3 smalls + XLA int8 7x7 bigs + int8 decs)
  B. bigs bf16 (int8 input dequantized for the big branch)
  C. smalls bf16 (XLA int8 bigs only)
  D. decs bf16 (encoder int8 only)
plus raw component microbenches at n=2.

Run serialized:
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_ld_q8_ablate.py
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

import bench
from bench import _bench_chained, _rand_pair
from rpst.config import load_config
from rpst.models import build_model
from rpst.models import fast_path_q8 as q8

cfg = load_config(dict(network="ld_adain", img_size=512, hidden_dim=16,
                       rp_blocks=5, use_mask=False,
                       compute_dtype="bfloat16"))
bundle = build_model(cfg)
rng = jax.random.PRNGKey(0)

_orig_xla = q8._xla_conv_q8
_orig_makeconv = q8._make_conv_q_std


def _bf16_big(x_q, x_s, k, b, dtype, out_scale=None, alpha=0.2):
    f = q8._deq(x_q, x_s, dtype)
    y = q8._lrelu_conv(f, k, b, dtype)
    if out_scale is None:
        return y
    return q8.quantize_activations(y, out_scale)


def _bf16_small_factory(dtype, block_rows, interpret, pad_mode="zero",
                        alpha=0.0):
    def conv_q(x_q, x_scale, k, b, out_scale=None):
        f = q8._deq(x_q, x_scale, dtype)
        y = q8._lrelu_conv(f, k, b, dtype)
        if out_scale is None:
            return y
        return q8.quantize_activations(y, out_scale)

    return conv_q


def run(tag, batch, patch_big=False, patch_small=False):
    q8._xla_conv_q8 = _bf16_big if patch_big else _orig_xla
    q8._make_conv_q_std = (_bf16_small_factory if patch_small
                           else _orig_makeconv)
    try:
        content, style = _rand_pair(batch, 512)
        variables = jax.jit(partial(bundle.model.init, train=False))(
            rng, content, style)
        params = variables["params"]
        scales = q8.calibrate_ld_q8(params, content, style,
                                    stylized_layers=cfg.stylized_layers)

        def apply(params, c, s):
            # pin the mixed engine: conv_impl='auto' (added after these
            # measurements) would route small batches XLA-only and
            # silently change what the arms measure
            return q8.stylize_ld_q8(params, scales, c, s,
                                    stylized_layers=cfg.stylized_layers,
                                    conv_impl="pallas")

        per = _bench_chained(apply, params, content, style, iters=10)
        print(f"{tag} b{batch}: {batch/per:.2f} img/s ({per*1e3:.1f} ms)",
              flush=True)
    finally:
        q8._xla_conv_q8 = _orig_xla
        q8._make_conv_q_std = _orig_makeconv


for batch in (1, 2):
    run("A full-q8   ", batch)
    run("B bigs-bf16 ", batch, patch_big=True)
    run("C smalls-bf16", batch, patch_small=True)

# raw component microbenches at n=2 (the b1 2N encode batch)
rngn = np.random.default_rng(0)


def bench_fn(fn, *args, iters=20, repeats=3):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(a, n):
        def body(i, carry):
            a0, acc = carry
            if a0.dtype == jnp.int8:
                a0 = a0.at[0, 0, 0, 0].add((i % 2).astype(jnp.int8))
            else:
                a0 = a0.at[0, 0, 0, 0].add(1e-12 * i)
            y = fn(a0, *args[1:])
            return (a0, acc + jnp.float32(jnp.mean(y.astype(jnp.float32))))

        _, acc = jax.lax.fori_loop(0, n, body, (a, jnp.float32(0)))
        return acc

    float(run_n(args[0], iters))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(args[0], iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


for n in (2, 8):
    for C in (128, 256):
        x_q = jnp.asarray(rngn.integers(-127, 128, (n, 512, 512, C)),
                          jnp.int8)
        k = jnp.asarray(rngn.normal(0, 0.05, (7, 7, C, C)), jnp.float32)
        b = jnp.zeros((C,), jnp.float32)
        per = bench_fn(lambda x: _orig_xla(x, 0.01, k, b, jnp.bfloat16,
                                           out_scale=0.02), x_q)
        tops = 2 * n * 512 * 512 * 49 * C * C / per / 1e12
        print(f"xla int8 7x7 C={C} n={n}: {per*1e3:.2f} ms {tops:.0f} TOP/s",
              flush=True)
print("HW LD ABLATE DONE", flush=True)
