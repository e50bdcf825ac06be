"""Multi-device correctness on the 8-virtual-CPU mesh.

Data-parallel and spatially-sharded train steps must produce the same
numbers as the single-device step — XLA inserts the all-reduces/halo
exchanges; these tests prove the shardings don't change the math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rpst.config import load_config
from rpst.dist import make_mesh, make_sharded_train_step, replicate, \
    shard_batch, shard_params_tp, tp_shardings
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params
from rpst.train import create_train_state, make_train_step
import pytest

pytestmark = pytest.mark.slow

BASE = dict(network="multi_adain", enc_stack_way="constant", rp_blocks=3,
            hidden_dim=8, img_size=16, batch_size=8, lr=1e-3, lr_decay=0.0)


def _setup():
    cfg = load_config(BASE)
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 3), np.float32))
    s = jnp.asarray(np.random.default_rng(1).random((8, 16, 16, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    state, tx = create_train_state(bundle, rng, c, s, vgg_vars)
    return bundle, tx, state, vgg_vars, c, s


def test_mesh_construction():
    mesh = make_mesh({"data": 4, "spatial": 2})
    assert mesh.axis_names == ("data", "spatial")
    assert mesh.devices.shape == (4, 2)


def test_dp_matches_single_device():
    bundle, tx, state, vgg_vars, c, s = _setup()
    single_step = make_train_step(bundle, tx)
    ref_state, ref_parts = single_step(state, vgg_vars, c, s)

    bundle2, tx2, state2, vgg_vars2, _, _ = _setup()
    mesh = make_mesh({"data": 8})
    state2 = replicate(state2, mesh)
    vgg_vars2 = replicate(vgg_vars2, mesh)
    cd = shard_batch(c, mesh)
    sd = shard_batch(s, mesh)
    dp_step = make_sharded_train_step(bundle2, tx2, mesh)
    dp_state, dp_parts = dp_step(state2, vgg_vars2, cd, sd)

    np.testing.assert_allclose(float(ref_parts["total_loss"]),
                               float(dp_parts["total_loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(dp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_spatial_sharding_matches_single_device():
    """Image-height sharding (halo exchange through stride-1 convs)."""
    bundle, tx, state, vgg_vars, c, s = _setup()
    single_step = make_train_step(bundle, tx)
    ref_state, ref_parts = single_step(state, vgg_vars, c, s)

    bundle2, tx2, state2, vgg_vars2, _, _ = _setup()
    mesh = make_mesh({"data": 4, "spatial": 2})
    state2 = replicate(state2, mesh)
    vgg_vars2 = replicate(vgg_vars2, mesh)
    cd = shard_batch(c, mesh, spatial=True)
    sd = shard_batch(s, mesh, spatial=True)
    sp_step = make_sharded_train_step(bundle2, tx2, mesh, spatial=True)
    sp_state, sp_parts = sp_step(state2, vgg_vars2, cd, sd)

    np.testing.assert_allclose(float(ref_parts["total_loss"]),
                               float(sp_parts["total_loss"]),
                               rtol=1e-5, atol=1e-6)


def test_wct_dp_step_runs():
    """WCT's per-sample eigh under vmap must partition over the mesh."""
    cfg = load_config({**BASE, "network": "wct"})
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 3), np.float32))
    s = jnp.asarray(np.random.default_rng(1).random((8, 16, 16, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    state, tx = create_train_state(bundle, rng, c, s, vgg_vars)
    mesh = make_mesh({"data": 8})
    state = replicate(state, mesh)
    vgg_vars = replicate(vgg_vars, mesh)
    step = make_sharded_train_step(bundle, tx, mesh)
    new_state, parts = step(state, vgg_vars, shard_batch(c, mesh),
                            shard_batch(s, mesh))
    assert np.isfinite(float(parts["total_loss"]))


def test_folded_exec_dp_spatial_matches_single_device():
    """exec_strategy='folded' under a data x spatial mesh: XLA partitions
    the fold/unfold reshapes and folded convs (halo exchanges included)
    with no change to the math."""
    cfg = load_config(dict(BASE, exec_strategy="folded"))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 3), np.float32))
    s = jnp.asarray(np.random.default_rng(1).random((8, 16, 16, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    state, tx = create_train_state(bundle, rng, c, s, vgg_vars)
    single_step = make_train_step(bundle, tx)
    ref_state, ref_parts = single_step(state, vgg_vars, c, s)

    cfg2 = load_config(dict(BASE, exec_strategy="folded"))
    bundle2 = build_model(cfg2)
    state2, tx2 = create_train_state(bundle2, rng, c, s, vgg_vars)
    mesh = make_mesh({"data": 4, "spatial": 2})
    state2 = replicate(state2, mesh)
    vgg_vars2 = replicate(vgg_vars, mesh)
    cd = shard_batch(c, mesh, spatial=True)
    sd = shard_batch(s, mesh, spatial=True)
    sp_step = make_sharded_train_step(bundle2, tx2, mesh, spatial=True)
    sp_state, sp_parts = sp_step(state2, vgg_vars2, cd, sd)

    np.testing.assert_allclose(float(ref_parts["total_loss"]),
                               float(sp_parts["total_loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(sp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_tp_channel_sharding_matches_single_device():
    """Tensor parallelism (SURVEY §2.4 'optional channel-sharded conv'):
    conv kernels/biases and their Adam moments sharded on the channel dim
    over a 'model' axis must reproduce the single-device step exactly —
    XLA inserts the channel all-gathers from the param shardings alone."""
    base = dict(BASE, hidden_dim=16)
    cfg = load_config(base)
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 3), np.float32))
    s = jnp.asarray(np.random.default_rng(1).random((8, 16, 16, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    state, tx = create_train_state(bundle, rng, c, s, vgg_vars)
    single_step = make_train_step(bundle, tx)
    ref_state, ref_parts = single_step(state, vgg_vars, c, s)

    bundle2 = build_model(load_config(base))
    state2, tx2 = create_train_state(bundle2, rng, c, s, vgg_vars)
    mesh = make_mesh({"data": 2, "model": 4})
    sharding = tp_shardings(state2, mesh, min_channels=8)
    # at least the hidden convs (cout=16, divisible by tp=4) must shard
    n_sharded = sum(
        1 for sh in jax.tree.leaves(sharding)
        if sh.spec != jax.sharding.PartitionSpec())
    assert n_sharded > 4, "TP spec tree sharded nothing"
    state2 = jax.device_put(state2, sharding)
    vgg_vars2 = replicate(vgg_vars, mesh)
    cd = shard_batch(c, mesh)
    sd = shard_batch(s, mesh)
    tp_step = make_sharded_train_step(bundle2, tx2, mesh,
                                      state_sharding=sharding)
    tp_state, tp_parts = tp_step(state2, vgg_vars2, cd, sd)

    np.testing.assert_allclose(float(ref_parts["total_loss"]),
                               float(tp_parts["total_loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(tp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # the updated params must still be channel-sharded on device
    kernel_shardings = [
        x.sharding.spec for x in jax.tree.leaves(tp_state.params)
        if getattr(x, "ndim", 0) == 4 and x.shape[-1] == 16]
    assert any("model" in str(spec) for spec in kernel_shardings)


def test_shard_params_tp_helper():
    bundle, tx, state, vgg_vars, c, s = _setup()
    mesh = make_mesh({"data": 2, "model": 4})
    sharded = shard_params_tp(state, mesh, min_channels=8)
    assert jax.tree.structure(sharded) == jax.tree.structure(state)
