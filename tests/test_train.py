"""Train-step, checkpoint, and schedule tests (CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.config import load_config
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params
from rpst.train import (create_train_state, latest_step, make_train_step,
                        restore_checkpoint, save_checkpoint)
from rpst.train.step import reference_lr_schedule

BASE = dict(network="multi_adain", enc_stack_way="constant", rp_blocks=3,
            hidden_dim=8, img_size=16, batch_size=2, lr=1e-3,
            lr_decay=1e-5, attention="none")


def _make(over=None):
    cfg = load_config({**BASE, **(over or {})})
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 3), np.float32))
    s = jnp.asarray(np.random.default_rng(1).random((2, 16, 16, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    state, tx = create_train_state(bundle, rng, c, s, vgg_vars)
    return bundle, tx, state, vgg_vars, c, s


@pytest.mark.slow
def test_train_step_reduces_loss():
    bundle, tx, state, vgg_vars, c, s = _make()
    step = make_train_step(bundle, tx)
    losses = []
    for _ in range(8):
        state, parts = step(state, vgg_vars, c, s)
        losses.append(float(parts["total_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_lr_schedule_matches_reference():
    """lr / (1 + decay*i) with i starting at 1 (train.py:57-61, 182)."""
    sched = reference_lr_schedule(0.001, 0.01)
    assert np.isclose(float(sched(0)), 0.001 / (1 + 0.01 * 1))
    assert np.isclose(float(sched(99)), 0.001 / (1 + 0.01 * 100))


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    bundle, tx, state, vgg_vars, c, s = _make()
    step = make_train_step(bundle, tx)
    state, _ = step(state, vgg_vars, c, s)
    state, _ = step(state, vgg_vars, c, s)
    state = jax.tree.map(np.asarray, state)  # detach from donated buffers
    path = save_checkpoint(tmp_path, state)
    assert latest_step(tmp_path) == 2

    fresh_bundle, fresh_tx, fresh, _, _, _ = _make()
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues identically from the restored state
    s1, p1 = step(state, vgg_vars, c, s)
    s2, p2 = make_train_step(fresh_bundle, fresh_tx)(restored, vgg_vars, c, s)
    np.testing.assert_allclose(float(p1["total_loss"]),
                               float(p2["total_loss"]), rtol=1e-6)


@pytest.mark.slow
def test_frozen_encoder_gets_no_updates():
    """WCT resume semantics: encoder frozen (wct_rp.py:67-72)."""
    cfg = load_config({**BASE, "network": "wct"})
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3), np.float32))
    s = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    state, tx = create_train_state(bundle, rng, c, s, vgg_vars,
                                   freeze_prefixes=("encoder",))
    step = make_train_step(bundle, tx)
    # snapshot to host before stepping: the jitted step donates the state
    enc_before = [np.asarray(x) for x in jax.tree.leaves(state.params["encoder"])]
    dec_before = [np.asarray(x) for x in jax.tree.leaves(state.params["decoder"])]
    new_state, _ = step(state, vgg_vars, c, s)
    enc_after = jax.tree.leaves(new_state.params["encoder"])
    for a, b in zip(enc_before, enc_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    dec_after = jax.tree.leaves(new_state.params["decoder"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(dec_before, dec_after))


@pytest.mark.slow
def test_batch_stats_update_under_jit():
    bundle, tx, state, vgg_vars, c, s = _make({"attention": "se"})
    assert "batch_stats" in state.extra
    step = make_train_step(bundle, tx)
    before = [np.asarray(x)
              for x in jax.tree.leaves(state.extra["batch_stats"])]
    new_state, _ = step(state, vgg_vars, c, s)
    after = jax.tree.leaves(new_state.extra["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


@pytest.mark.slow
def test_metric_writer_tensorboard_roundtrip(tmp_path):
    """MetricWriter emits TensorBoard event files readable by the TB
    event loader, alongside the JSONL log (reference parity with
    tensorboardX scalars, train.py:86,196-198)."""
    from rpst.train.metrics import MetricWriter

    w = MetricWriter(tmp_path)
    w.write(1, {"total_loss": 2.5, "style_loss": 1.25})
    w.write(2, {"total_loss": 2.0, "style_loss": 1.0})
    w.close()

    event_files = list((tmp_path / "logs").glob("events.out.tfevents.*"))
    assert event_files, "no TB event file written"
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)
    from tensorboard.util import tensor_util
    seen = {}
    for ev in EventFileLoader(str(event_files[0])).Load():
        for v in getattr(ev.summary, "value", []):
            which = v.WhichOneof("value")
            if which == "simple_value":
                seen[(v.tag, ev.step)] = v.simple_value
            elif which == "tensor":
                seen[(v.tag, ev.step)] = float(
                    tensor_util.make_ndarray(v.tensor))
    assert seen[("total_loss", 1)] == 2.5
    assert seen[("style_loss", 2)] == 1.0
