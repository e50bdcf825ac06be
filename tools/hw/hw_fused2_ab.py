#!/usr/bin/env python
"""A/B: two-layer fused int8 encoder pairs vs the unfused chain
(round-4 VERDICT item 4) on the flagship q8 serving path, real chip.

Run AFTER tools/hw_kernel_check.py passes (bit-exactness gate).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "src"))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from rpst.config import load_config
from rpst.models import build_model
from rpst.models.fast_path_q8 import (calibrate_multi_adain_q8,
                                      stylize_multi_adain_folded_q8)


def main():
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=5, hidden_dim=32, inception_num=0,
                           attention="none", img_size=512,
                           compute_dtype="bfloat16"))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    for batch in (1, 8, 48):
        try:
            content = jnp.asarray(np.random.default_rng(0).random(
                (batch, 512, 512, 3), np.float32))
            style = jnp.asarray(np.random.default_rng(1).random(
                (batch, 512, 512, 3), np.float32))
            variables = bundle.model.init(rng, content[:1], style[:1],
                                          train=False)
            params = variables["params"]
            scales = calibrate_multi_adain_q8(params, content[:min(batch, 8)],
                                              style[:min(batch, 8)])
            for fuse in (False, True):
                def apply(params, c, s, fuse=fuse):
                    return stylize_multi_adain_folded_q8(
                        params, scales, c, s, fuse_pairs=fuse)
                per = bench._bench_chained(apply, params, content, style,
                                           iters=8 if batch <= 8 else 5,
                                           repeats=3)
                bench.log(f"[fused2] b{batch} fuse_pairs={fuse}: "
                          f"{batch/per:.2f} img/s ({per*1e3:.1f} ms)")
            jax.clear_caches()
        except Exception as e:
            bench.log(f"[fused2] b{batch}: {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
