"""Device-resident perceptual-target cache (train/target_cache.py).

The style/content VGG forwards in the RP loss produce TARGETS only
(reference adain_rp.py:327-329; no gradients flow through them) and depend
solely on the raw images + the frozen encoder, so caching them per dataset
index and gathering by slot inside the step must reproduce the recompute
path's losses and gradients exactly.  These tests pin that equivalence,
the LRU slot mechanics, and the train.py CLI wiring; the on-hw throughput
A/B is recorded in BASELINE.md.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.config import load_config
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params
from rpst.train.target_cache import DeviceTargetCache

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _setup(rng, batch=2, img=32):
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=3, hidden_dim=16, img_size=img,
                           inception_num=0, attention="none",
                           exec_strategy="folded",
                           compute_dtype="float32"))
    bundle = build_model(cfg)
    content = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    style = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    key = jax.random.PRNGKey(0)
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    params = bundle.model.init(key, content, style, train=False)["params"]
    return bundle, vgg_vars, params, content, style


def test_cached_targets_loss_grad_match(rng):
    """Loss parts and parameter gradients through precomputed targets
    match the recompute path, and a cache HIT returns the miss-computed
    targets bit-exactly (f32/bf16 storage round-trips)."""
    bundle, vgg_vars, params, content, style = _setup(rng)

    def loss_base(p):
        total, (parts, _) = bundle.loss({"params": p}, vgg_vars,
                                        content, style, train=True)
        return total, parts

    cache = DeviceTargetCache(img_size=32, dtype=jnp.float32,
                              content_slots=4, style_slots=4)
    t_miss = cache.targets_for_batch(vgg_vars, style, content,
                                     [0, 1], [0, 1])
    t_hit = cache.targets_for_batch(vgg_vars, style, content,
                                    [0, 1], [0, 1])
    assert cache.stats() == {"hit_steps": 1, "miss_steps": 1,
                             "content_cached": 2, "style_cached": 2}
    for a, b in zip(jax.tree.leaves(t_miss), jax.tree.leaves(t_hit)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss_cached(p):
        total, (parts, _) = bundle.loss({"params": p}, vgg_vars,
                                        content, style, train=True,
                                        targets=t_hit)
        return total, parts

    (tb, pb), gb = jax.value_and_grad(loss_base, has_aux=True)(params)
    (tc, pc), gc = jax.value_and_grad(loss_cached, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(tc), np.asarray(tb), rtol=2e-5)
    for k in ("style_loss", "content_loss"):
        np.testing.assert_allclose(np.asarray(pc[k]), np.asarray(pb[k]),
                                   rtol=2e-5)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_lru_eviction_and_slot_reuse(rng):
    """content_slots=2: a third distinct key evicts the least-recently
    used entry and reuses its slot; the evicted key misses on return."""
    bundle, vgg_vars, _, content, style = _setup(rng, batch=1)
    cache = DeviceTargetCache(img_size=32, dtype=jnp.float32,
                              content_slots=2, style_slots=8)
    for ck in (0, 1):
        cache.targets_for_batch(vgg_vars, style, content, [0], [ck])
    assert cache._c_map == {0: 0, 1: 1}
    cache.targets_for_batch(vgg_vars, style, content, [0], [0])  # touch 0
    cache.targets_for_batch(vgg_vars, style, content, [0], [2])  # evict 1
    assert 1 not in cache._c_map
    assert cache._c_map[2] == 1  # reused slot of the evicted key
    n_miss = cache.miss_steps
    cache.targets_for_batch(vgg_vars, style, content, [0], [1])
    assert cache.miss_steps == n_miss + 1


def test_train_step_with_targets_matches(rng):
    """One optimizer step through the with_targets jitted step equals the
    plain step (same batch, same init)."""
    from rpst.train.step import (create_train_state, make_train_step)

    bundle, vgg_vars, _, content, style = _setup(rng)
    key = jax.random.PRNGKey(3)
    state0, tx = create_train_state(bundle, key, content, style, vgg_vars)
    step_plain = make_train_step(bundle, tx, skip_nonfinite=False)
    step_t = make_train_step(bundle, tx, skip_nonfinite=False,
                             with_targets=True)

    cache = DeviceTargetCache(img_size=32, dtype=jnp.float32,
                              content_slots=4, style_slots=4)
    t = cache.targets_for_batch(vgg_vars, style, content, [0, 1], [0, 1])

    s_plain, parts_plain = step_plain(state0, vgg_vars, content, style)
    state0b, _ = create_train_state(bundle, key, content, style, vgg_vars)
    s_t, parts_t = step_t(state0b, vgg_vars, content, style, t)
    np.testing.assert_allclose(np.asarray(parts_t["total_loss"]),
                               np.asarray(parts_plain["total_loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s_t.params),
                    jax.tree.leaves(s_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_train_cli_target_cache(tmp_path):
    """train.py --set target_cache=8: steady-state steps hit (tiny corpus
    ⇒ full coverage after step 1) and the run produces finite losses."""
    from PIL import Image
    import yaml

    rng = np.random.default_rng(0)
    data, out = tmp_path / "data", tmp_path / "out"
    for sub in ("content", "style"):
        (data / sub).mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8),
                            "RGB").save(data / sub / f"{i}.png")
    cfg = dict(network="multi_adain", enc_stack_way="constant", rp_blocks=2,
               hidden_dim=8, inception_num=0, attention="none", img_size=32,
               batch_size=2, max_iter=8, test_iter=100,
               snapshot_save_iter=100, log_iter=1, num_workers=0, lr=1e-4,
               lr_decay=0.0, content_weight=1.0, style_weight=1.0,
               exec_strategy="folded", compute_dtype="float32",
               target_cache=8,
               content_dir=str(data / "content"),
               style_dir=str(data / "style"),
               test_dir="", output=str(out), vgg="")
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    r = subprocess.run([sys.executable, str(REPO / "train.py"),
                        "--config", str(cfg_path)],
                       capture_output=True, text=True, env=env,
                       cwd=str(REPO), timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "target_cache: 8 content slots" in r.stderr + r.stdout
    metrics = list((out / "logs").rglob("*.jsonl"))
    assert metrics
    rows = [json.loads(l) for l in metrics[0].read_text().splitlines() if l]
    assert rows and all(np.isfinite(row["total_loss"]) for row in rows)
    # with 3 images per corpus and 8 slots, everything is cached after the
    # first few steps — the tail of the run must be hitting
    log = r.stderr + r.stdout
    assert "tcache_hit_steps" in log
    import re
    hits = [int(m.group(1)) for m in
            re.finditer(r"tcache_hit_steps (\d+)/(\d+)", log)]
    assert hits and hits[-1] >= 3
