"""Gradient accumulation (``grad_accum``): microbatched steps must
reproduce the full-batch gradient.

Every rpst loss is a batch mean, so averaging the per-microbatch
gradients over equal-sized chunks equals the full-batch gradient exactly
(up to float reassociation).  BatchNorm families (sel_multi_adain) are
the documented exception — each microbatch normalizes with its own batch
statistics, the standard accumulation caveat — so equality is asserted
on stat-free families and the BN family is asserted to run + stay
finite + update running stats per microbatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rpst.config import load_config
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params
from rpst.train import create_train_state, make_train_step

_TINY = dict(img_size=32, rp_blocks=2, hidden_dim=8, inception_num=0,
             attention="none", batch_size=4, compute_dtype="float32")


def _setup(network, **over):
    cfg = load_config({**_TINY, "network": network, **over})
    bundle = build_model(cfg)
    gen = np.random.default_rng(0)
    c = jnp.asarray(gen.random((4, 32, 32, 3), np.float32))
    s = jnp.asarray(gen.random((4, 32, 32, 3), np.float32))
    _, vgg_vars = init_vgg_params(jax.random.PRNGKey(1),
                                  num_stages=bundle.vgg_stages)
    state, _ = create_train_state(bundle, jax.random.PRNGKey(0), c, s,
                                  vgg_vars)
    tx = optax.sgd(1.0)  # param delta == gradient (see test_train_matrix)
    state = state.replace(opt_state=tx.init(state.params))
    return bundle, tx, state, vgg_vars, c, s


@pytest.mark.parametrize("network", ["multi_adain", "wct", "sanet"])
def test_grad_accum_matches_full_batch(network):
    bundle, tx, state, vgg_vars, c, s = _setup(network)
    ref_state, ref_parts = make_train_step(bundle, tx)(
        state, vgg_vars, c, s)

    bundle2, tx2, state2, vgg_vars2, _, _ = _setup(network,
                                                   grad_accum=2)
    acc_state, acc_parts = make_train_step(bundle2, tx2)(
        state2, vgg_vars2, c, s)

    np.testing.assert_allclose(float(ref_parts["total_loss"]),
                               float(acc_parts["total_loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(acc_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_grad_accum_batchnorm_family_runs():
    bundle, tx, state, vgg_vars, c, s = _setup("sel_multi_adain",
                                               grad_accum=2)
    before = jax.tree.map(np.asarray, state.extra)
    new_state, parts = make_train_step(bundle, tx)(state, vgg_vars, c, s)
    assert np.isfinite(float(parts["total_loss"]))
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(before),
                        jax.tree.leaves(jax.tree.map(np.asarray,
                                                     new_state.extra))))
    assert changed, "BN running stats did not update through the scan"


def test_grad_accum_indivisible_batch_rejected():
    bundle, tx, state, vgg_vars, c, s = _setup("multi_adain",
                                               grad_accum=3)
    with pytest.raises(Exception):
        make_train_step(bundle, tx)(state, vgg_vars, c, s)
