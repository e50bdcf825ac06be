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


def run_q8(batch: int, block_rows: int, iters: int = 20):
    from rpst.models.fast_path_q8 import (calibrate_multi_adain_q8,
                                          stylize_multi_adain_folded_q8)
    bundle = build("bfloat16")
    rng = jax.random.PRNGKey(0)
    content, style = _rand_pair(batch, bench.IMG)
    variables = bundle.model.init(rng, content, style, train=False)
    scales = calibrate_multi_adain_q8(variables["params"], content, style)

    def apply(variables, c, s):
        return stylize_multi_adain_folded_q8(variables["params"], scales,
                                             c, s, block_rows=block_rows)

    per = _bench_chained(apply, variables, content, style, iters=iters)
    print(f"q8 b{batch} BR={block_rows}: {batch/per:.2f} img/s "
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
    run_bf16(8)
    for br in (8, 16, 24, 32):
        try:
            run_q8(8, br)
        except Exception as e:
            print(f"q8 b8 BR={br}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    for br in (16, 32):
        try:
            run_q8(1, br)
        except Exception as e:
            print(f"q8 b1 BR={br}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print("FLAGSHIP AB DONE", flush=True)
