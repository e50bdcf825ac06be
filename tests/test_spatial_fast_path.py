"""Spatially sharded folded serving (models/fast_path_spatial.py) on the
8-virtual-CPU mesh: the shard_map path — per-shard Pallas kernels
(interpret mode), ppermute halo rows, psum'd AdaIN statistics — must
reproduce the single-device folded stylize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.config import load_config
from rpst.dist import make_mesh
from rpst.models import build_model
from rpst.models.fast_path import stylize_multi_adain_folded
from rpst.models.fast_path_spatial import (
    _conv_lrelu_halo, stylize_multi_adain_folded_spatial)
from rpst.ops.folded import fold, fold_bias, fold_conv_kernel, folded_conv

pytestmark = pytest.mark.slow


def _flagship(rng, batch=2, img=32, hidden=32):
    # hidden 32 -> folded 128 channels: the Pallas-eligible lane width
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=3, hidden_dim=hidden, img_size=img,
                           inception_num=0, attention="none"))
    bundle = build_model(cfg)
    content = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    style = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    variables = bundle.model.init(jax.random.PRNGKey(0), content, style,
                                  train=False)
    return variables["params"], content, style


def test_conv_halo_matches_ring_conv():
    """One sharded folded conv (halo rows spliced into the kernel's ring
    slot) equals the single-device reflect-ring conv."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 16, 16, 128), np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 128, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    y = folded_conv(x, k, b)
    ref = jnp.where(y >= 0, y, 0.2 * y)
    mesh = make_mesh({"spatial": 4}, jax.devices()[:4])
    got = jax.jit(jax.shard_map(
        lambda xl: _conv_lrelu_halo(xl, k, b, "spatial", 4, True),
        mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(None, "spatial"),),
        out_specs=jax.sharding.PartitionSpec(None, "spatial"),
        check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("mesh_shape", [{"spatial": 4},
                                        {"data": 2, "spatial": 4}])
def test_spatial_stylize_matches_single_device(mesh_shape):
    rng = np.random.default_rng(1)
    params, content, style = _flagship(rng)
    ref = np.asarray(stylize_multi_adain_folded(
        params, content, style, dtype=jnp.float32, use_pallas=False))
    n_dev = int(np.prod(list(mesh_shape.values())))
    mesh = make_mesh(mesh_shape, jax.devices()[:n_dev])
    got = np.asarray(jax.jit(
        lambda p, c, s: stylize_multi_adain_folded_spatial(
            p, c, s, mesh, dtype=jnp.float32, interpret=True))(
        params, content, style))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-5)


def test_spatial_stylize_narrow_stack_xla_path():
    """Non-lane-aligned widths take the halo-padded XLA branch end to end
    (hidden 8 -> folded 32 channels: every layer below 128 lanes)."""
    rng = np.random.default_rng(2)
    params, content, style = _flagship(rng, hidden=8)
    ref = np.asarray(stylize_multi_adain_folded(
        params, content, style, dtype=jnp.float32, use_pallas=False))
    mesh = make_mesh({"spatial": 2}, jax.devices()[:2])
    got = np.asarray(jax.jit(
        lambda p, c, s: stylize_multi_adain_folded_spatial(
            p, c, s, mesh, dtype=jnp.float32, interpret=True))(
        params, content, style))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-5)


def test_spatial_sel_matches_single_device(rng):
    """SELastRP spatial path (halo convs + zero-halo SE bottleneck conv +
    psum'd SE pool) equals the single-device folded stylize."""
    from rpst.models.fast_path import stylize_sel_multi_adain_folded
    from rpst.models.fast_path_spatial import (
        stylize_sel_multi_adain_folded_spatial)
    from rpst.nn.vgg import init_vgg_params

    cfg = load_config(dict(network="sel_multi_adain",
                           enc_stack_way="constant",
                           rp_blocks=4, hidden_dim=32, img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)

    ref = np.asarray(stylize_sel_multi_adain_folded(
        variables, content, style, dtype=jnp.float32, use_pallas=False))
    mesh = make_mesh({"spatial": 4}, jax.devices()[:4])
    got = np.asarray(jax.jit(
        lambda v, c, s: stylize_sel_multi_adain_folded_spatial(
            v, c, s, mesh, dtype=jnp.float32, interpret=True))(
        variables, content, style))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-5)


def test_spatial_ccam_matches_single_device(rng):
    """CCAMRP spatial path (psum'd cross-channel energies) equals the
    single-device folded stylize."""
    from rpst.models.fast_path import stylize_ccam_folded
    from rpst.models.fast_path_spatial import stylize_ccam_folded_spatial
    from rpst.nn.vgg import init_vgg_params

    cfg = load_config(dict(network="ccam", enc_stack_way="constant",
                           rp_blocks=4, hidden_dim=32, img_size=32,
                           stylized_layers=4))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    variables = jax.tree.map(lambda x: x, variables)
    for i in range(4):
        if f"ccam_{i}" in variables["params"]:
            variables["params"][f"ccam_{i}"]["scale"] = jnp.full((1,), 0.4)

    ref = np.asarray(stylize_ccam_folded(
        variables, content, style, stylized_layers=4, dtype=jnp.float32,
        use_pallas=False))
    mesh = make_mesh({"spatial": 2}, jax.devices()[:2])
    got = np.asarray(jax.jit(
        lambda v, c, s: stylize_ccam_folded_spatial(
            v, c, s, mesh, stylized_layers=4, dtype=jnp.float32,
            interpret=True))(variables, content, style))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-5)


@pytest.mark.parametrize("adaptive,ada_module", [
    (False, "aea"), (True, "aea"), (True, "relu")])
def test_spatial_sanet_matches_single_device(rng, adaptive, ada_module):
    """SANet spatial path (halo VGG encode, all-gathered style K/V,
    per-shard flash attention, halo mirror decode) matches the standard
    single-device stylize.  The adaptive route streams with the
    factorized thresholds (equality vs dense pinned separately in
    test_adaptive_blockwise at <=1e-3)."""
    from rpst.models.fast_path_spatial import stylize_sanet_spatial
    from rpst.nn.vgg import init_vgg_params

    net = "dynamic_sanet" if adaptive else "sanet"
    cfg = load_config(dict(network=net, img_size=64,
                           ada_module=ada_module))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=5)
    variables = bundle.init(key, content, style, vgg_vars)

    ref = np.asarray(bundle.stylize(variables, vgg_vars, content, style))
    mesh = make_mesh({"spatial": 2}, jax.devices()[:2])
    got = np.asarray(jax.jit(
        lambda v, g, c, s: stylize_sanet_spatial(
            v, g, c, s, mesh, adaptive=adaptive, ada_module=ada_module,
            dtype=jnp.float32, interpret=True))(
        variables, vgg_vars, content, style))
    tol = 2e-3 if adaptive else 2e-4
    np.testing.assert_allclose(got, ref, atol=tol, rtol=1e-4)
