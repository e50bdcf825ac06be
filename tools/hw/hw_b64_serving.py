#!/usr/bin/env python
"""Round-5 VERDICT item 8: push serving past the b48 ceiling.

r4: b64 died in RESOURCE_EXHAUSTED while the amortization curve was
still rising at b48.  Attempts, in order: plain b64; b56; b64 with
buffer donation on the chained bench loop (donate the carry batch);
and a memory budget print for the winner/loser."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "src"))

import jax
import jax.numpy as jnp
import numpy as np

import bench


def main():
    bundle = bench.build("bfloat16")
    for batch in (56, 64):
        try:
            ips, med = bench.bench_stylize(bundle, batch, iters=5,
                                           repeats=2, mode="q8")
            bench.log(f"[b64] q8 batch={batch}: {ips:.2f} img/s "
                      f"({med*1e3:.1f} ms/pass)")
        except Exception as e:
            bench.log(f"[b64] q8 batch={batch}: {type(e).__name__}: "
                      f"{str(e)[:200]}")
        jax.clear_caches()
    # single-pass (no chained loop) b64: the fori_loop carry may be the
    # marginal buffer — measure a plain jit apply with donated inputs
    from rpst.models.fast_path_q8 import (calibrate_multi_adain_q8,
                                          stylize_multi_adain_folded_q8)
    rng = jax.random.PRNGKey(0)
    for batch in (64,):
        try:
            content = jnp.asarray(np.random.default_rng(0).random(
                (batch, 512, 512, 3), np.float32))
            style = jnp.asarray(np.random.default_rng(1).random(
                (batch, 512, 512, 3), np.float32))
            variables = bundle.model.init(rng, content[:1], style[:1],
                                          train=False)
            params = variables["params"]
            scales = calibrate_multi_adain_q8(params, content[:8],
                                              style[:8])
            f = jax.jit(lambda p, c, s: stylize_multi_adain_folded_q8(
                p, scales, c, s), donate_argnums=(1, 2))
            out = f(params, content, style)
            jnp.mean(out).block_until_ready()
            best = float("inf")
            for _ in range(3):
                content2 = jnp.asarray(np.random.default_rng(2).random(
                    (batch, 512, 512, 3), np.float32))
                style2 = jnp.asarray(np.random.default_rng(3).random(
                    (batch, 512, 512, 3), np.float32))
                t0 = time.perf_counter()
                out = f(params, content2, style2)
                float(jnp.mean(out))
                best = min(best, time.perf_counter() - t0)
            bench.log(f"[b64] q8 single-pass donated batch={batch}: "
                      f"{batch/best:.2f} img/s ({best*1e3:.1f} ms) "
                      f"(incl. one fetch)")
        except Exception as e:
            bench.log(f"[b64] donated batch={batch}: {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
