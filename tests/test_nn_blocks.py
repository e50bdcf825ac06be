"""NN layer tests: cross-framework parity with torch on identical weights.

The strongest check of conv/pad/pool semantics: initialize the flax
modules, export their weights into an equivalent torch module graph
(built here from the published vgg_normalised architecture), and compare
outputs elementwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from rpst.nn import (Conv2dBlock, RPSequence, RPStack, VGG19Encoder,
                     VGGMirrorDecoder, rp_constant_dims, rp_decrease_dims,
                     rp_increase_dims)
from rpst.nn.vgg import init_vgg_params
import pytest


def _to_torch_conv(conv: tnn.Conv2d, kernel_hwio, bias):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(kernel_hwio), (3, 2, 0, 1))))
        conv.bias.copy_(torch.from_numpy(np.asarray(bias)))


def test_vgg_matches_torch_oracle(rng):
    """flax VGG == torch vgg_normalised graph with the same weights."""
    key = jax.random.PRNGKey(3)
    model, params = init_vgg_params(key, num_stages=4)

    # torch oracle of the published vgg_normalised layout up to relu4_1
    specs = [(3, 3, 1), (3, 64, 3), (64, 64, 3), (64, 128, 3), (128, 128, 3),
             (128, 256, 3), (256, 256, 3), (256, 256, 3), (256, 256, 3),
             (256, 512, 3)]
    convs = [tnn.Conv2d(i, o, k) for (i, o, k) in specs]
    p = params["params"]
    for ci, conv in enumerate(convs):
        w = p[f"conv_{ci}"]["Conv_0"]["kernel"]
        b = p[f"conv_{ci}"]["Conv_0"]["bias"]
        _to_torch_conv(conv, w, b)

    pad = tnn.ReflectionPad2d(1)
    pool = tnn.MaxPool2d(2, 2, 0, ceil_mode=True)
    relu = tnn.ReLU()

    def torch_forward(x):
        feats = []
        x = convs[0](x)
        x = relu(convs[1](pad(x)))
        feats.append(x)
        x = relu(convs[2](pad(x)))
        x = relu(convs[3](pad(pool(x))))
        feats.append(x)
        x = relu(convs[4](pad(x)))
        x = relu(convs[5](pad(pool(x))))
        feats.append(x)
        for ci in (6, 7, 8):
            x = relu(convs[ci](pad(x)))
        x = relu(convs[9](pad(pool(x))))
        feats.append(x)
        return feats

    x = np.random.default_rng(0).random((1, 3, 33, 37), np.float32)  # odd dims
    with torch.no_grad():
        expected = torch_forward(torch.from_numpy(x))
    got = model.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(got) == 4
    for g, e in zip(got, expected):
        ge = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(ge, e.numpy(), rtol=1e-4, atol=1e-4)


def test_decoder_output_shape_and_upsampling():
    key = jax.random.PRNGKey(0)
    dec = VGGMirrorDecoder()
    x = jnp.ones((2, 8, 8, 512))
    params = dec.init(key, x)
    out = dec.apply(params, x)
    assert out.shape == (2, 64, 64, 3)


def test_conv2dblock_matches_torch(rng):
    """Conv2dBlock (reflect pad + conv + lrelu) == torch equivalent."""
    key = jax.random.PRNGKey(1)
    blk = Conv2dBlock(features=8, kernel_size=3, padding=1, activation="lrelu")
    x = rng.normal(size=(1, 12, 12, 5)).astype(np.float32)
    params = blk.init(key, jnp.asarray(x))
    out = blk.apply(params, jnp.asarray(x))

    conv = tnn.Conv2d(5, 8, 3)
    w = params["params"]["PadConv_0"]["Conv_0"]["kernel"]
    b = params["params"]["PadConv_0"]["Conv_0"]["bias"]
    _to_torch_conv(conv, w, b)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        expected = tnn.functional.leaky_relu(
            conv(tnn.ReflectionPad2d(1)(tx)), 0.2)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               expected.numpy(), rtol=1e-4, atol=1e-5)


def test_rp_stack_dim_plans():
    assert rp_increase_dims(5, 3, 16, 256) == [
        (3, 16), (16, 32), (32, 64), (64, 128), (128, 256)]
    assert rp_decrease_dims(5, 256, 128, 3) == [
        (256, 128), (128, 64), (64, 32), (32, 16), (16, 3)]
    assert rp_constant_dims(5, 3, 32, 32) == [
        (3, 32), (32, 32), (32, 32), (32, 32), (32, 32)]


def test_rp_stack_preserves_resolution():
    key = jax.random.PRNGKey(0)
    for dims in (rp_constant_dims(4, 3, 16, 16), rp_increase_dims(3, 3, 8, 16)):
        stack = RPStack(dims=dims)
        x = jnp.ones((1, 24, 24, 3))
        params = stack.init(key, x)
        feats = stack.apply(params, x, method=stack.intermediates)
        assert len(feats) == len(dims)
        for f, (_, out_d) in zip(feats, dims):
            assert f.shape[1:3] == (24, 24)  # resolution preserved
            assert f.shape[-1] == out_d


def test_se_attention_sows_attention_map():
    key = jax.random.PRNGKey(0)
    blk = Conv2dBlock(features=16, kernel_size=3, padding=1, attention="se")
    x = jnp.ones((2, 8, 8, 3))
    vars_ = blk.init(key, x, train=True)
    y, muts = blk.apply(vars_, x, train=True,
                        mutable=["batch_stats", "intermediates"])
    att = muts["intermediates"]["attention_map"][0]
    assert att.shape == (2, 1, 1, 16)
    assert float(att.min()) >= 0.0 and float(att.max()) <= 1.0


def test_rp_sequence_zero_pad_matches_torch(rng):
    """RPSequence (zero-padded conv+relu) == torch Conv2d(padding=1)+ReLU."""
    key = jax.random.PRNGKey(2)
    seq = RPSequence(dims=[(3, 6), (6, 4)])
    x = rng.normal(size=(1, 9, 11, 3)).astype(np.float32)
    params = seq.init(key, jnp.asarray(x))
    out = seq.apply(params, jnp.asarray(x))

    convs = [tnn.Conv2d(3, 6, 3, padding=1), tnn.Conv2d(6, 4, 3, padding=1)]
    for i, conv in enumerate(convs):
        w = params["params"][f"conv_{i}"]["Conv_0"]["kernel"]
        b = params["params"][f"conv_{i}"]["Conv_0"]["bias"]
        _to_torch_conv(conv, w, b)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        e = torch.relu(convs[1](torch.relu(convs[0](tx))))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               e.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_vgg_pth_import_and_npz_conversion(rng, tmp_path):
    """The real-weights import path (reference train.py:89-92), exercised
    with a synthetic vgg_normalised-format .pth: torch state dict ->
    load_vgg_params(.pth) and -> tools/convert_vgg.py -> .npz -> loader.
    Both must reproduce the torch Sequential's features exactly."""
    import importlib.util
    from pathlib import Path

    from rpst.nn.vgg import _TORCH_CONV_INDICES, load_vgg_params

    # synthetic vgg_normalised state dict (full 44-layer Sequential keys)
    torch.manual_seed(0)
    specs = [(3, 3, 1), (3, 64, 3), (64, 64, 3), (64, 128, 3),
             (128, 128, 3), (128, 256, 3), (256, 256, 3), (256, 256, 3),
             (256, 256, 3), (256, 512, 3), (512, 512, 3), (512, 512, 3),
             (512, 512, 3), (512, 512, 3)]
    sd = {}
    for idx, (cin, cout, k) in zip(_TORCH_CONV_INDICES, specs):
        sd[f"{idx}.weight"] = torch.randn(cout, cin, k, k) * 0.1
        sd[f"{idx}.bias"] = torch.randn(cout) * 0.1
    pth = tmp_path / "vgg_normalised.pth"
    torch.save(sd, str(pth))

    # torch oracle of the first two stages is enough to validate mapping;
    # build the full reference-layout Sequential
    from tests.reference_oracle import fresh_vgg, inject_conv, to_nhwc, \
        to_torch
    tvgg = fresh_vgg()
    with torch.no_grad():
        for idx in _TORCH_CONV_INDICES:
            tvgg[idx].weight.copy_(sd[f"{idx}.weight"])
            tvgg[idx].bias.copy_(sd[f"{idx}.bias"])

    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expected = tvgg[:31](to_torch(x)).numpy()  # relu4_1

    # .pth branch
    model, variables = load_vgg_params(str(pth), num_stages=4)
    got = np.asarray(model.apply(variables, jnp.asarray(x))[-1])
    # 10 conv layers of accumulation: XLA vs MKL float noise ~1e-3 rel
    np.testing.assert_allclose(got, np.transpose(expected, (0, 2, 3, 1)),
                               rtol=2e-3, atol=2e-3)

    # convert_vgg .npz branch
    spec = importlib.util.spec_from_file_location(
        "convert_vgg", Path(__file__).parent.parent / "tools/convert_vgg.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    npz = tmp_path / "vgg.npz"
    mod.convert(str(pth), str(npz))
    model2, variables2 = load_vgg_params(str(npz), num_stages=4)
    got2 = np.asarray(model2.apply(variables2, jnp.asarray(x))[-1])
    np.testing.assert_allclose(got2, got, rtol=1e-6, atol=1e-7)
