#!/usr/bin/env python
"""Round-5 VERDICT item 7: high-res spatially-sharded TRAINING rows.

One real chip, so the spatial mesh degenerates to {spatial: 1} — this
still routes the full shard_map Pallas train path (halo ppermutes become
self-copies) and measures its real overhead vs the plain single-device
step.  Rows:
  * 1024px b1/b2: plain step vs spatial shard_map step (A/B)
  * 2048px b1: the memory-bound case the spatial path exists for —
    plain step (expected OOM or slow) vs spatial shard_map step
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
from rpst.dist import make_mesh, make_sharded_train_step, replicate, \
    shard_batch
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params
from rpst.train import create_train_state, make_train_step


def _measure(step, state, vgg_vars, c, s, iters=4, repeats=2):
    state, parts = step(state, vgg_vars, c, s)
    float(parts["total_loss"])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, parts = step(state, vgg_vars, c, s)
        float(parts["total_loss"])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def run(img, batch, spatial_route):
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=5, hidden_dim=32, inception_num=0,
                           attention="none", img_size=img,
                           batch_size=batch, compute_dtype="bfloat16",
                           exec_strategy="folded",
                           folded_train_pallas=True))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.asarray(np.random.default_rng(0).random(
        (batch, img, img, 3), np.float32))
    s = jnp.asarray(np.random.default_rng(1).random(
        (batch, img, img, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=4)
    state, tx = create_train_state(bundle, rng, c, s, vgg_vars)
    label = f"{img}px b{batch} " + ("spatial" if spatial_route else "plain")
    try:
        if spatial_route:
            mesh = make_mesh({"data": 1, "spatial": 1}, jax.devices()[:1])
            state = replicate(state, mesh)
            vgg_r = replicate(vgg_vars, mesh)
            cd = shard_batch(c, mesh, spatial=True)
            sd = shard_batch(s, mesh, spatial=True)
            step = make_sharded_train_step(bundle, tx, mesh, spatial=True)
            per = _measure(step, state, vgg_r, cd, sd)
        else:
            step = make_train_step(bundle, tx)
            per = _measure(step, state, vgg_vars, c, s)
        bench.log(f"[spatial-train] {label}: {batch/per:.2f} img/s "
                  f"({per*1e3:.1f} ms/step)")
    except Exception as e:
        bench.log(f"[spatial-train] {label}: {type(e).__name__}: "
                  f"{str(e)[:160]}")
    jax.clear_caches()


def main():
    for img, batch in ((1024, 1), (1024, 2)):
        for spatial_route in (False, True):
            run(img, batch, spatial_route)
    for spatial_route in (False, True):
        run(2048, 1, spatial_route)


if __name__ == "__main__":
    main()
