"""Resolve the LD q8 small-batch collapse (hw_ld_q8_ablate.py, b1:
full-q8 210 ms vs bigs-only-int8 63 ms vs bf16 74 ms — the Pallas 3x3
custom call and the XLA int8 7x7 conv are catastrophically
super-additive when both consume the same int8 tensor; a bare
optimization_barrier changed nothing because it preserves layout).

Arms (512px, h16/L5):
  A. full q8 (shipping path) ............ b1 ref 210 ms / b4 ref 151 ms
  E. full q8 + FRESH int8 copy for the XLA conv (deq->requant behind a
     barrier — bit-identical codes, layout-independent tensor): if the
     collapse is a layout conflict on the shared operand, E is fast.
  C. bigs-only int8 (smalls+decs bf16) at b2/b4 — the b1 winner's
     scaling, for the fallback policy if E fails.
plus raw component microbenches (XLA int8 7x7, Pallas std 3x3) at
n=2/n=8, C=128/256.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_ld_q8_fix.py
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


def _xla_fresh(x_q, x_s, k, b, dtype, out_scale=None, alpha=0.2):
    # independent, bit-identical int8 tensor: int8 codes survive a
    # deq->requant round trip exactly; the barrier stops XLA from
    # CSE-ing it back into the shared operand
    f = jax.lax.optimization_barrier(q8._deq(x_q, x_s, jnp.float32))
    x2 = q8.quantize_activations(f, x_s)
    return _orig_xla(x2, x_s, k, b, dtype, out_scale=out_scale,
                     alpha=alpha)


def _bf16_small_factory(dtype, block_rows, interpret, pad_mode="zero",
                        alpha=0.2):
    def conv_q(x_q, x_scale, k, b, out_scale=None):
        f = q8._deq(x_q, x_scale, dtype)
        y = q8._lrelu_conv(f, k, b, dtype)
        if out_scale is None:
            return y
        return q8.quantize_activations(y, out_scale)

    return conv_q


def run(tag, batch, xla_fn=None, patch_small=False):
    q8._xla_conv_q8 = xla_fn or _orig_xla
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
            # pin the mixed engine (conv_impl='auto' postdates this
            # experiment and would reroute small batches XLA-only)
            return q8.stylize_ld_q8(params, scales, c, s,
                                    stylized_layers=cfg.stylized_layers,
                                    conv_impl="pallas")

        per = _bench_chained(apply, params, content, style, iters=10)
        print(f"{tag} b{batch}: {batch/per:.2f} img/s ({per*1e3:.1f} ms)",
              flush=True)
    except Exception as e:
        print(f"{tag} b{batch}: FAILED {type(e).__name__}: {e}",
              flush=True)
    finally:
        q8._xla_conv_q8 = _orig_xla
        q8._make_conv_q_std = _orig_makeconv


for batch in (1, 4):
    run("E fresh-copy", batch, xla_fn=_xla_fresh)
for batch in (2, 4):
    run("C bigs-only ", batch, patch_small=True)


# raw component microbenches
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


def _std_kernel(x_q, k, b, alpha=0.2):
    from rpst.ops.pallas.conv2d_q8 import fused_conv2d_q8
    w_q, w_s = q8.quantize_weights(k)
    sc = jnp.stack([0.01 * w_s, b, jnp.zeros_like(w_s)])
    return fused_conv2d_q8(x_q, w_q, sc, out_int8=False, alpha=alpha,
                           pad_mode="reflect", block_rows=16)


for n in (2, 8):
    for C, KK in ((128, 7), (256, 7), (128, 3), (256, 3)):
        x_q = jnp.asarray(rngn.integers(-127, 128, (n, 512, 512, C)),
                          jnp.int8)
        k = jnp.asarray(rngn.normal(0, 0.05, (KK, KK, C, C)), jnp.float32)
        b = jnp.zeros((C,), jnp.float32)
        if KK == 7:
            per = bench_fn(lambda x: _orig_xla(x, 0.01, k, b, jnp.bfloat16,
                                               out_scale=0.02), x_q)
            name = "xla int8 7x7"
        else:
            per = bench_fn(lambda x: _std_kernel(x, k, b), x_q)
            name = "pallas std 3x3"
        tops = 2 * n * 512 * 512 * KK * KK * C * C / per / 1e12
        print(f"{name} C={C} n={n}: {per*1e3:.2f} ms {tops:.0f} TOP/s",
              flush=True)
print("HW LD FIX DONE", flush=True)
