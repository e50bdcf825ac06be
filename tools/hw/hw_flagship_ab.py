"""Flagship b8 int8 headroom A/B (NOTES.md round-3 analysis).

q8 b8 is ~1.14x bf16-folded while the int8 MXU rate is 2x — this runner
measures the cheap levers first (same-day, serialized, box idle):
  1. bf16-folded b8 reference point
  2. q8 b8 block_rows sweep (8/16/24/32) — bigger BR amortizes the
     per-grid-step slab-shift VPU work and DMA issue overhead
  3. q8 b1 block_rows sweep (latency side)

Run:  PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_flagship_ab.py
"""
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

import bench
from bench import _bench_chained, _rand_pair, build


def run_q8(batch: int, block_rows: int, iters: int = 20,
           wide_k: bool = False):
    from rpst.models.fast_path_q8 import (calibrate_multi_adain_q8,
                                          stylize_multi_adain_folded_q8)
    from rpst.ops.pallas import folded_conv_q8 as fq8
    bundle = build("bfloat16")
    rng = jax.random.PRNGKey(0)
    content, style = _rand_pair(batch, bench.IMG)
    variables = bundle.model.init(rng, content, style, train=False)
    old = fq8.WIDE_K_DEFAULT
    fq8.WIDE_K_DEFAULT = wide_k
    try:
        scales = calibrate_multi_adain_q8(variables["params"], content, style)

        def apply(variables, c, s):
            return stylize_multi_adain_folded_q8(variables["params"], scales,
                                                 c, s, block_rows=block_rows)

        per = _bench_chained(apply, variables, content, style, iters=iters)
    finally:
        fq8.WIDE_K_DEFAULT = old
    tag = " wideK" if wide_k else ""
    print(f"q8 b{batch} BR={block_rows}{tag}: {batch/per:.2f} img/s "
          f"({per*1e3:.2f} ms/pass)", flush=True)
    return batch / per


def check_wide_k_exact():
    """On-chip bit-exactness of the wide-K kernel vs the 9-matmul form
    (interpret mode can't validate Mosaic lowering — NOTES.md)."""
    import numpy as np
    from rpst.ops.pallas.folded_conv_q8 import fused_folded_conv_q8
    rng = np.random.default_rng(0)
    x_q = jnp.asarray(rng.integers(-127, 128, (2, 64, 64, 128), np.int32),
                      jnp.int8)
    w_q = jnp.asarray(rng.integers(-127, 128, (3, 3, 128, 128), np.int32),
                      jnp.int8)
    sc = jnp.stack([jnp.full((128,), 3e-4, jnp.float32),
                    jnp.asarray(rng.normal(size=128), jnp.float32),
                    jnp.full((128,), 9.0, jnp.float32)])
    for out_int8 in (False, True):
        f_ref = jax.jit(lambda x, w, s: fused_folded_conv_q8(
            x, w, s, out_int8=out_int8, with_stats=True, wide_k=False))
        f_new = jax.jit(lambda x, w, s: fused_folded_conv_q8(
            x, w, s, out_int8=out_int8, with_stats=True, wide_k=True))
        ref = jax.tree.map(np.asarray, f_ref(x_q, w_q, sc))
        got = jax.tree.map(np.asarray, f_new(x_q, w_q, sc))
        for r, g, name in zip(ref, got, ("out", "s1", "s2")):
            d = np.max(np.abs(r.astype(np.float64) - g.astype(np.float64)))
            ok = "OK" if d == 0 else "MISMATCH"
            print(f"wideK exact out_int8={out_int8} {name}: "
                  f"max|d|={d} {ok}", flush=True)
            if d != 0:
                raise RuntimeError("wide-K kernel mismatch on hardware")


def run_adain_q8(batch: int, wide_k, iters: int = 10):
    """Standard-layout kernel A/B: adain h32/rp5 int8 serving with the
    conv2d wide-K setting (False vs 'auto' = engage at C < 256)."""
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.nn.vgg import init_vgg_params
    from rpst.models.fast_path_q8 import calibrate_adain_q8, stylize_adain_q8
    from rpst.ops.pallas import conv2d_q8 as cq8
    cfg = load_config(dict(network="adain", rp_blocks=5, hidden_dim=32,
                           img_size=bench.IMG))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content, style = _rand_pair(batch, bench.IMG)
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    old = cq8.WIDE_K_DEFAULT
    cq8.WIDE_K_DEFAULT = wide_k
    try:
        scales = calibrate_adain_q8(variables["params"], content, style)

        def apply(variables, c, s):
            return stylize_adain_q8(variables["params"], scales, c, s)

        per = _bench_chained(apply, variables, content, style, iters=iters)
    finally:
        cq8.WIDE_K_DEFAULT = old
    print(f"adain-q8 b{batch} wide_k={wide_k}: {batch/per:.2f} img/s "
          f"({per*1e3:.2f} ms/pass)", flush=True)
    return batch / per


def run_bf16(batch: int, iters: int = 20):
    from rpst.models.fast_path import stylize_multi_adain_folded
    bundle = build("bfloat16")
    rng = jax.random.PRNGKey(0)
    content, style = _rand_pair(batch, bench.IMG)
    variables = bundle.model.init(rng, content, style, train=False)

    def apply(variables, c, s):
        return stylize_multi_adain_folded(variables["params"], c, s)

    per = _bench_chained(apply, variables, content, style, iters=iters)
    print(f"bf16-folded b{batch}: {batch/per:.2f} img/s "
          f"({per*1e3:.2f} ms/pass)", flush=True)
    return batch / per


if __name__ == "__main__":
    # wide-K contraction (K=3*C4 engages the 2x int8 MXU rate that
    # K=128 leaves idle): exactness gate first, then the A/B
    try:
        check_wide_k_exact()
        for batch in (8, 1):
            for wk in (False, True):
                run_q8(batch, 16, wide_k=wk)
    except Exception as e:
        print(f"wideK: {type(e).__name__}: {str(e)[:300]}", flush=True)
    for wk in (False, "auto"):
        try:
            run_adain_q8(4, wk)
        except Exception as e:
            print(f"adain-q8 wide_k={wk}: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    run_bf16(8)
    for br in (8, 24, 32):
        try:
            run_q8(8, br)
        except Exception as e:
            print(f"q8 b8 BR={br}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    for br in (32,):
        try:
            run_q8(1, br)
        except Exception as e:
            print(f"q8 b1 BR={br}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print("FLAGSHIP AB DONE", flush=True)
