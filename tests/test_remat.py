"""Rematerialization: identical training numerics, lower activation memory."""

import jax
import jax.numpy as jnp
import numpy as np

from rpst.config import load_config
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params
from rpst.train import create_train_state, make_train_step
import pytest

pytestmark = pytest.mark.slow


def _run(remat: bool):
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=3, hidden_dim=8, img_size=16,
                           batch_size=2, lr=1e-3, remat=remat))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 3), np.float32))
    s = jnp.asarray(np.random.default_rng(1).random((2, 16, 16, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=4)
    state, tx = create_train_state(bundle, rng, c, s, vgg_vars)
    step = make_train_step(bundle, tx)
    for _ in range(3):
        state, parts = step(state, vgg_vars, c, s)
    return (np.asarray(jax.tree.leaves(state.params)[0]),
            float(parts["total_loss"]))


def test_remat_matches_standard():
    p0, l0 = _run(remat=False)
    p1, l1 = _run(remat=True)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(p0, p1, rtol=1e-5, atol=1e-6)
