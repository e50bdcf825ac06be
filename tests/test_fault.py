"""Fault-handling tests: non-finite update skipping, signal checkpointing."""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np

from rpst.train.fault import (CheckpointOnSignal, apply_update_if_finite,
                              tree_all_finite)
import pytest


def test_tree_all_finite():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    bad = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, jnp.nan])}}
    assert bool(tree_all_finite(good))
    assert not bool(tree_all_finite(bad))


def test_apply_update_if_finite_skips_nan():
    old = {"w": jnp.zeros(2)}
    new = {"w": jnp.ones(2)}
    state, skipped = apply_update_if_finite(old, new, jnp.float32(jnp.nan),
                                            {"g": jnp.ones(2)})
    np.testing.assert_array_equal(np.asarray(state["w"]), [0, 0])
    assert bool(skipped)

    state, skipped = apply_update_if_finite(old, new, jnp.float32(1.0),
                                            {"g": jnp.ones(2)})
    np.testing.assert_array_equal(np.asarray(state["w"]), [1, 1])
    assert not bool(skipped)


@pytest.mark.slow
def test_nonfinite_guard_in_train_step():
    """A NaN batch must not poison the parameters."""
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.nn.vgg import init_vgg_params
    from rpst.train import create_train_state, make_train_step

    cfg = load_config(dict(network="adain", rp_blocks=3, hidden_dim=4,
                           img_size=8, batch_size=1))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.ones((1, 8, 8, 3))
    _, vgg_vars = init_vgg_params(rng, num_stages=4)
    state, tx = create_train_state(bundle, rng, c, c, vgg_vars)
    step = make_train_step(bundle, tx)
    params_before = [np.asarray(x) for x in jax.tree.leaves(state.params)]

    bad = jnp.full((1, 8, 8, 3), jnp.nan)
    state, parts = step(state, vgg_vars, bad, bad)
    assert float(parts["skipped"]) == 1.0
    for a, b in zip(params_before, jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert int(state.step) == 1  # step still advances (schedule continuity)

    state, parts = step(state, vgg_vars, c, c * 0.5)
    assert float(parts["skipped"]) == 0.0


def test_checkpoint_on_signal():
    with CheckpointOnSignal() as stop:
        assert not stop.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert stop.requested
    # handler restored
    assert signal.getsignal(signal.SIGTERM) != stop._handler
