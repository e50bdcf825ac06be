"""Multi-process (multi-host) training: two real OS processes join one
jax.distributed run on the CPU backend and train together.

Covers VERDICT round-2 item 6: ``distributed: true`` config path through
``jax.distributed.initialize``, per-host sharded input feeding
(``InfiniteSampler`` shard_index/shard_count), global-batch assembly via
``jax.make_array_from_process_local_data``, and process-0 gating of
checkpoint/metric/eval writes.  The reference is single-process by
construction (SURVEY §2.4)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _make_data(root: Path, n: int = 4, size: int = 16):
    rng = np.random.default_rng(0)
    for sub in ["content", "style"]:
        (root / sub).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (size, size, 3), dtype=np.uint8),
                "RGB").save(root / sub / f"{i:02d}.png")


def _write_cfg(path: Path, data: Path, out: Path):
    import yaml
    cfg = dict(network="multi_adain", enc_stack_way="constant", rp_blocks=2,
               hidden_dim=8, inception_num=0, attention="none", img_size=16,
               batch_size=2, max_iter=4, test_iter=100,
               snapshot_save_iter=3, log_iter=1, num_workers=0, lr=1e-4,
               lr_decay=0.0, content_weight=1.0, style_weight=1.0,
               content_dir=str(data / "content"),
               style_dir=str(data / "style"), test_dir="",
               output=str(out), vgg="", distributed=True,
               coordinator_address="localhost:12355", num_processes=2)
    path.write_text(yaml.safe_dump(cfg))


def test_two_process_training(tmp_path):
    data, out, cfg = tmp_path / "data", tmp_path / "out", tmp_path / "cfg.yaml"
    _make_data(data)
    _write_cfg(cfg, data, out)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    # one device per process (conftest exports 8 virtual CPU devices for
    # in-process tests; here the 2 processes ARE the parallelism)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "train.py"), "--config", str(cfg),
             "--set", f"process_id={pid}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO))
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout)
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    # process 0 wrote the output tree; exactly one writer
    ckpts = [p for p in (out / "checkpoints").iterdir() if p.is_dir()]
    assert ckpts, outs[0][-2000:]
    logs = list((out / "logs").rglob("*.jsonl"))
    assert logs
    # loss lines logged by process 0 only, finite values
    assert "Iterations 1" in outs[0]
    assert "Iterations 1" not in outs[1]
    import json
    records = [json.loads(l) for l in logs[0].read_text().splitlines() if l]
    assert records and all(
        np.isfinite(v) for r in records for k, v in r.items() if k != "step")

    # the multi-process checkpoint (sharded jax.Array leaves) restores in a
    # plain single-process session — the cross-mode fine-tune path
    import jax
    import jax.numpy as jnp
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.nn.vgg import init_vgg_params
    from rpst.train import create_train_state, restore_checkpoint
    c = load_config(cfg)
    bundle = build_model(c)
    x = jnp.zeros((2, c.img_size, c.img_size, 3))
    _, vgg_vars = init_vgg_params(jax.random.PRNGKey(1),
                                  num_stages=bundle.vgg_stages)
    state, _ = create_train_state(bundle, jax.random.PRNGKey(0), x, x,
                                  vgg_vars)
    state = restore_checkpoint(sorted(ckpts)[-1], state)
    assert int(state.step) == 3
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(state.params))
