"""Spatially sharded folded TRAINING (models/fast_path_spatial.py,
loss_and_grads_multi_adain_folded_spatial): the shard_map train path —
per-shard fused Pallas kernels with the custom-VJP backward pair, adjoint
halo rows over the ppermute transpose, reflect-pad adjoint at global
edges, psum'd stat/weight grads — must reproduce the single-device fused
path's loss AND gradients on the 8-virtual-CPU mesh.

This closes round-3 VERDICT item 3: multi-device folded training no
longer forfeits the fused-kernel path (the train.py Pallas-off gate is
removed for {data, spatial} meshes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.config import load_config
from rpst.dist import make_mesh, make_sharded_train_step, \
    spatial_folded_train_ok
from rpst.models import build_model
from rpst.models.fast_path_spatial import (
    loss_and_grads_multi_adain_folded_spatial)
from rpst.nn.vgg import init_vgg_params

pytestmark = pytest.mark.slow


def _setup(rng, batch=2, img=32, hidden=32, rp_blocks=3):
    # hidden 32 -> folded 128 channels: the Pallas-eligible lane width
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=rp_blocks, hidden_dim=hidden,
                           img_size=img, inception_num=0, attention="none",
                           exec_strategy="folded", folded_train_pallas=True,
                           compute_dtype="float32",
                           content_weight=1.0, style_weight=2.0))
    bundle = build_model(cfg)
    content = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    style = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    key = jax.random.PRNGKey(0)
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.model.init(key, content, style, train=False)
    return bundle, vgg_vars, variables["params"], content, style


def _single_device_ref(bundle, vgg_vars, params, content, style):
    """Loss + grads through the single-device folded fused path
    (ModelBundle.loss with folded_train_pallas — the Pallas custom VJP in
    interpret mode on CPU for the XLA-equal reference)."""
    def loss_fn(p):
        total, (parts, _) = bundle.loss({"params": p}, vgg_vars, content,
                                        style, train=True)
        return total, parts

    (total, parts), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    return total, parts, grads


def _tree_allclose(a, b, atol, rtol=1e-4):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            atol=atol, rtol=rtol,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("mesh_shape,img", [({"spatial": 2}, 32),
                                            ({"spatial": 4}, 64),
                                            ({"data": 2, "spatial": 2}, 32)])
def test_spatial_grads_match_single_device(mesh_shape, img, rng):
    """Per-parameter gradient equality: spatial shard_map (Pallas
    interpret, halo-adjoint exchange) vs the single-device path.
    (spatial=4 needs img 64: >= 2 relu4_1 rows per shard.)"""
    bundle, vgg_vars, params, content, style = _setup(rng, img=img)
    _, ref_parts, ref_grads = _single_device_ref(
        bundle, vgg_vars, params, content, style)

    n_dev = int(np.prod(list(mesh_shape.values())))
    mesh = make_mesh(mesh_shape, jax.devices()[:n_dev])
    total, parts, grads = jax.jit(
        lambda p, v, c, s: loss_and_grads_multi_adain_folded_spatial(
            p, v, c, s, mesh, content_weight=1.0, style_weight=2.0,
            dtype=jnp.float32, interpret=True))(
        params, vgg_vars["params"], content, style)

    np.testing.assert_allclose(float(parts["content_loss"]),
                               float(ref_parts["content_loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(parts["style_loss"]),
                               float(ref_parts["style_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(total),
                               float(ref_parts["total_loss"]), rtol=1e-4)
    _tree_allclose(grads, ref_grads, atol=2e-4)


def test_spatial_grads_single_shard_degenerates(rng):
    """n_shards=1: the halo rows ARE the reflect ring, so the shard_map
    path must equal the single-device one exactly (validates the
    folded_conv_act_halo VJP against folded_conv_act)."""
    bundle, vgg_vars, params, content, style = _setup(rng)
    _, ref_parts, ref_grads = _single_device_ref(
        bundle, vgg_vars, params, content, style)
    mesh = make_mesh({"data": 1, "spatial": 1}, jax.devices()[:1])
    total, parts, grads = jax.jit(
        lambda p, v, c, s: loss_and_grads_multi_adain_folded_spatial(
            p, v, c, s, mesh, content_weight=1.0, style_weight=2.0,
            dtype=jnp.float32, interpret=True))(
        params, vgg_vars["params"], content, style)
    np.testing.assert_allclose(float(total),
                               float(ref_parts["total_loss"]), rtol=1e-5)
    _tree_allclose(grads, ref_grads, atol=5e-5)


def test_spatial_grads_narrow_stack_xla_branch(rng):
    """hidden 8 -> folded 32 channels: every layer takes the XLA halo
    branch (native autodiff through ppermute) — equality still holds."""
    bundle, vgg_vars, params, content, style = _setup(rng, hidden=8)
    _, ref_parts, ref_grads = _single_device_ref(
        bundle, vgg_vars, params, content, style)
    mesh = make_mesh({"spatial": 2}, jax.devices()[:2])
    total, parts, grads = jax.jit(
        lambda p, v, c, s: loss_and_grads_multi_adain_folded_spatial(
            p, v, c, s, mesh, content_weight=1.0, style_weight=2.0,
            dtype=jnp.float32, interpret=True))(
        params, vgg_vars["params"], content, style)
    np.testing.assert_allclose(float(total),
                               float(ref_parts["total_loss"]), rtol=1e-4)
    _tree_allclose(grads, ref_grads, atol=2e-4)


def test_sharded_train_step_uses_spatial_pallas(rng):
    """make_sharded_train_step selects the shard_map Pallas path for the
    folded flagship on a {data, spatial} mesh, takes a step, and the loss
    decreases over a few iterations."""
    from rpst.train import create_train_state
    from rpst.train.step import make_optimizer

    bundle, vgg_vars, params, content, style = _setup(rng)
    mesh = make_mesh({"data": 2, "spatial": 2}, jax.devices()[:4])
    assert spatial_folded_train_ok(bundle, mesh)
    state, tx = create_train_state(bundle, jax.random.PRNGKey(1), content,
                                   style, vgg_vars)
    step = make_sharded_train_step(bundle, tx, mesh, spatial=True)
    from rpst.dist import replicate, shard_batch
    state = replicate(state, mesh)
    vgg_r = replicate(vgg_vars, mesh)
    c = shard_batch(np.asarray(content), mesh, spatial=True)
    s = shard_batch(np.asarray(style), mesh, spatial=True)
    losses = []
    for _ in range(3):
        state, parts = step(state, vgg_r, c, s)
        losses.append(float(parts["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ccam_spatial_grads_match_single_device(rng):
    """CCAM spatial folded training (psum'd energies, stop-gradient
    attention inputs, trainable scale params): gradient equality vs the
    single-device folded loss path."""
    from rpst.models.fast_path_spatial import (
        loss_and_grads_ccam_folded_spatial)

    cfg = load_config(dict(network="ccam", enc_stack_way="constant",
                           rp_blocks=3, hidden_dim=32, img_size=32,
                           inception_num=0, attention="none",
                           stylized_layers=3, exec_strategy="folded",
                           folded_train_pallas=True,
                           compute_dtype="float32",
                           content_weight=1.0, style_weight=2.0))
    bundle = build_model(cfg)
    content = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    key = jax.random.PRNGKey(0)
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    params = variables["params"]
    # non-zero CCAM scales so their gradient paths are live
    for i in range(3):
        if f"ccam_{i}" in params:
            params[f"ccam_{i}"]["scale"] = jnp.full((1,), 0.3)

    def loss_fn(p):
        total, (parts, _) = bundle.loss({"params": p}, vgg_vars, content,
                                        style, train=True)
        return total, parts

    (_, ref_parts), ref_grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    mesh = make_mesh({"spatial": 2}, jax.devices()[:2])
    total, parts, grads = jax.jit(
        lambda p, v, c, s: loss_and_grads_ccam_folded_spatial(
            p, v, c, s, mesh, stylized_layers=3, content_weight=1.0,
            style_weight=2.0, dtype=jnp.float32, interpret=True))(
        params, vgg_vars["params"], content, style)
    np.testing.assert_allclose(float(total),
                               float(ref_parts["total_loss"]), rtol=1e-4)
    _tree_allclose(grads, ref_grads, atol=2e-4)
    # the registered scale params get non-zero gradients
    assert float(jnp.abs(grads["ccam_0"]["scale"]).max()) > 0


def test_sel_spatial_grads_and_stats_match_single_device(rng):
    """SELastRP spatial folded training: train-mode BatchNorm batch
    stats psum over the mesh, running-stat updates and gradients both
    equal the single-device folded train path."""
    from rpst.models.fast_path_spatial import (
        loss_and_grads_sel_folded_spatial)

    cfg = load_config(dict(network="sel_multi_adain",
                           enc_stack_way="constant", rp_blocks=3,
                           hidden_dim=32, img_size=32, inception_num=0,
                           attention="none", exec_strategy="folded",
                           folded_train_pallas=True,
                           compute_dtype="float32",
                           content_weight=1.0, style_weight=2.0))
    bundle = build_model(cfg)
    content = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    key = jax.random.PRNGKey(0)
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        total, (parts, muts) = bundle.loss({"params": p, **extra},
                                           vgg_vars, content, style,
                                           train=True)
        return total, (parts, muts)

    (_, (ref_parts, ref_muts)), ref_grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    mesh = make_mesh({"data": 2, "spatial": 2}, jax.devices()[:4])
    total, parts, grads, muts = jax.jit(
        lambda p, bs, v, c, s: loss_and_grads_sel_folded_spatial(
            p, bs, v, c, s, mesh, content_weight=1.0, style_weight=2.0,
            dtype=jnp.float32, interpret=True))(
        params, extra["batch_stats"], vgg_vars["params"], content, style)
    np.testing.assert_allclose(float(total),
                               float(ref_parts["total_loss"]), rtol=1e-4)
    _tree_allclose(grads, ref_grads, atol=2e-4)
    _tree_allclose(muts, ref_muts, atol=1e-5)


def test_spatial_folded_train_ok_gates():
    """The selector refuses TP meshes and non-flagship configs."""
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=3, hidden_dim=32, img_size=32,
                           exec_strategy="folded",
                           folded_train_pallas=True))
    bundle = build_model(cfg)
    tp_mesh = make_mesh({"data": 2, "model": 2}, jax.devices()[:4])
    assert not spatial_folded_train_ok(bundle, tp_mesh)
    ok_mesh = make_mesh({"data": 2, "spatial": 2}, jax.devices()[:4])
    assert spatial_folded_train_ok(bundle, ok_mesh)
    cfg2 = cfg.replace(network="mst")
    assert not spatial_folded_train_ok(build_model(cfg2), ok_mesh)
    cfg2b = cfg.replace(network="sel_multi_adain")
    assert spatial_folded_train_ok(build_model(cfg2b), ok_mesh)
    cfg3 = cfg.replace(folded_train_pallas=False)
    assert not spatial_folded_train_ok(build_model(cfg3), ok_mesh)
    cfg4 = cfg.replace(network="ccam")
    assert spatial_folded_train_ok(build_model(cfg4), ok_mesh)
    # height constraint: 3 VGG pools + 2 relu4_1 rows per spatial shard
    cfg5 = cfg.replace(img_size=16)
    assert not spatial_folded_train_ok(build_model(cfg5), ok_mesh)
