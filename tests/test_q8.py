"""Int8 quantized serving path: kernel exactness (interpret) vs an
emulated integer reference, and end-to-end quality vs the bf16 path."""

import jax
import jax.numpy as jnp
import numpy as np

from rpst.config import load_config
from rpst.models import build_model
from rpst.models.fast_path import stylize_multi_adain_folded
from rpst.models.fast_path_q8 import (calibrate_multi_adain_q8,
                                      stylize_multi_adain_folded_q8)
from rpst.nn.vgg import init_vgg_params
from rpst.ops.folded import fold_bias, fold_conv_kernel, folded_reflect_pad
from rpst.ops.pallas.folded_conv_q8 import (fused_folded_conv_q8,
                                            quantize_activations,
                                            quantize_weights)
import pytest

pytestmark = pytest.mark.slow


def _emulated_q8(x_q, w_q, deq, bias):
    """Integer conv reference: ring pad in int8, VALID conv in int32,
    dequant + bias + lrelu in f32."""
    xp = folded_reflect_pad(x_q.astype(jnp.float32)).astype(jnp.int32)
    y = jax.lax.conv_general_dilated(
        xp.astype(jnp.float32), w_q.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * deq + bias
    return jnp.where(y >= 0, y, 0.2 * y)


def test_fused_q8_kernel_interpret(rng):
    c = 32
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4 * c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    kf, bf = fold_conv_kernel(k), fold_bias(b)
    x_scale = float(jnp.max(jnp.abs(x))) / 127.0
    x_q = quantize_activations(x, x_scale)
    w_q, w_scale = quantize_weights(kf)
    deq = x_scale * w_scale
    sc = jnp.stack([deq, bf.astype(jnp.float32), jnp.zeros_like(deq)])

    expected = _emulated_q8(x_q, w_q, deq, bf.astype(jnp.float32))
    got = fused_folded_conv_q8(x_q, w_q, sc, out_int8=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expected), rtol=2e-2, atol=1e-2)


def test_q8_stylize_quality_vs_bf16(rng):
    """PTQ int8 folded stylize stays close to the bf16 folded path."""
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=4, hidden_dim=32, img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    params = variables["params"]

    ref = np.asarray(stylize_multi_adain_folded(
        params, content, style, dtype=jnp.float32, use_pallas=False))
    scales = calibrate_multi_adain_q8(params, content, style)
    assert len(scales["act_scales"]) > 0
    got = np.asarray(stylize_multi_adain_folded_q8(
        params, scales, content, style, dtype=jnp.float32, interpret=True))

    mse = float(np.mean((got - ref) ** 2))
    span = float(ref.max() - ref.min()) or 1.0
    psnr = 10 * np.log10(span * span / max(mse, 1e-12))
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_sel_multi_adain_quality_vs_f32(rng):
    """Int8 PTQ SELastRP serving stays close to the folded f32 path."""
    from rpst.models.fast_path import stylize_sel_multi_adain_folded
    from rpst.models.fast_path_q8 import (calibrate_sel_multi_adain_q8,
                                          stylize_sel_multi_adain_folded_q8)

    cfg = load_config(dict(network="sel_multi_adain",
                           enc_stack_way="constant",
                           rp_blocks=4, hidden_dim=32, img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)

    ref = np.asarray(stylize_sel_multi_adain_folded(
        variables, content, style, dtype=jnp.float32, use_pallas=False))
    scales = calibrate_sel_multi_adain_q8(variables, content, style)
    assert len(scales["act_scales"]) > 0
    got = np.asarray(stylize_sel_multi_adain_folded_q8(
        variables, scales, content, style, dtype=jnp.float32,
        interpret=True))

    mse = float(np.mean((got - ref) ** 2))
    span = float(ref.max() - ref.min()) or 1.0
    psnr = 10 * np.log10(span * span / max(mse, 1e-12))
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_ccam_quality_vs_f32(rng):
    """Int8 PTQ CCAMRP serving (int8-reduced CCAM energies) stays close
    to the folded f32 path."""
    from rpst.models.fast_path import stylize_ccam_folded
    from rpst.models.fast_path_q8 import (calibrate_ccam_q8,
                                          stylize_ccam_folded_q8)

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
    scales = calibrate_ccam_q8(variables, content, style, stylized_layers=4)
    assert len(scales["act_scales"]) > 0
    got = np.asarray(stylize_ccam_folded_q8(
        variables, scales, content, style, stylized_layers=4,
        dtype=jnp.float32, interpret=True))

    mse = float(np.mean((got - ref) ** 2))
    span = float(ref.max() - ref.min()) or 1.0
    psnr = 10 * np.log10(span * span / max(mse, 1e-12))
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_adain_quality_vs_f32(rng):
    """Int8 PTQ AdaINRP serving (standard-layout wide-channel kernel)
    stays close to the standard f32 model path."""
    from rpst.models.fast_path_q8 import (calibrate_adain_q8,
                                          stylize_adain_q8)

    cfg = load_config(dict(network="adain", rp_blocks=5, hidden_dim=32,
                           img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    params = variables["params"]

    ref = np.asarray(bundle.model.apply(
        {"params": params}, content, style, train=False))
    scales = calibrate_adain_q8(params, content, style)
    # h32/rp5: enc records 3 (input of (128,256), outputs of the two
    # eligible layers), decoder records 2 (inputs of (512,256), (256,128))
    assert len(scales["act_scales"]) == 5
    got = np.asarray(stylize_adain_q8(params, scales, content, style,
                                      dtype=jnp.float32, interpret=True))

    mse = float(np.mean((got - ref) ** 2))
    span = float(ref.max() - ref.min()) or 1.0
    psnr = 10 * np.log10(span * span / max(mse, 1e-12))
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_wct_quality_vs_f32(rng):
    """Int8 PTQ WCTRP serving stays close to the standard f32 model."""
    from rpst.models.fast_path_q8 import calibrate_wct_q8, stylize_wct_q8

    cfg = load_config(dict(network="wct", rp_blocks=5, hidden_dim=32,
                           img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    params = variables["params"]

    ref = np.asarray(bundle.model.apply(
        {"params": params}, content, style, train=False))
    scales = calibrate_wct_q8(params, content, style)
    assert len(scales["act_scales"]) == 5
    got = np.asarray(stylize_wct_q8(params, scales, content, style,
                                    dtype=jnp.float32, interpret=True))

    mse = float(np.mean((got - ref) ** 2))
    span = float(ref.max() - ref.min()) or 1.0
    psnr = 10 * np.log10(span * span / max(mse, 1e-12))
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_fused_q8_kernel_stats(rng):
    """with_stats returns the exact f32 post-activation channel sums."""
    n, h, w, c4 = 2, 8, 16, 128
    x_q = jnp.asarray(rng.integers(-10, 11, (n, h, w, c4), np.int8))
    w_q = jnp.asarray(rng.integers(-10, 11, (3, 3, c4, c4), np.int8))
    deq = jnp.asarray(rng.uniform(1e-3, 2e-3, c4).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.3, c4).astype(np.float32))
    sc = jnp.stack([deq, bias, jnp.full_like(deq, 30.0)])
    out, s1, s2 = fused_folded_conv_q8(x_q, w_q, sc, out_int8=True,
                                       with_stats=True, block_rows=4,
                                       interpret=True)
    y = _emulated_q8(x_q, w_q, deq, bias)  # exact f32 post-lrelu
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(jnp.sum(y, axis=(1, 2))),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.sum(y * y, axis=(1, 2))),
                               rtol=1e-4, atol=1e-3)


def _psnr(got, ref):
    mse = float(np.mean((got - ref) ** 2))
    span = float(ref.max() - ref.min()) or 1.0
    return 10 * np.log10(span * span / max(mse, 1e-12))


def test_q8_sanet_quality_vs_f32(rng):
    """Int8 PTQ SANet serving (chained-int8 VGG encode + bf16 attention
    transform + int8 mirror decode) stays close to the standard f32 path."""
    from rpst.models.fast_path_q8 import calibrate_sanet_q8, stylize_sanet_q8

    cfg = load_config(dict(network="sanet", img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=5)
    variables = bundle.init(key, content, style, vgg_vars)

    ref = np.asarray(bundle.stylize(variables, vgg_vars, content, style))
    scales = calibrate_sanet_q8(variables, vgg_vars, content, style)
    # VGG: conv_4 input + conv_4..conv_12 chained outputs = 10;
    # mirror decoder: conv0 input + conv0..conv4 chained outputs = 6
    assert len(scales["act_scales"]) == 16
    got = np.asarray(stylize_sanet_q8(variables, vgg_vars, scales,
                                      content, style, dtype=jnp.float32,
                                      interpret=True))
    psnr = _psnr(got, ref)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_dynamic_sanet_quality_vs_f32(rng):
    """Int8 PTQ adaptive-SANet serving matches the standard f32 path."""
    from rpst.models.fast_path_q8 import calibrate_sanet_q8, stylize_sanet_q8

    cfg = load_config(dict(network="dynamic_sanet", img_size=32,
                           ada_module="aea"))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=5)
    variables = bundle.init(key, content, style, vgg_vars)

    ref = np.asarray(bundle.stylize(variables, vgg_vars, content, style))
    scales = calibrate_sanet_q8(variables, vgg_vars, content, style,
                                adaptive=True, ada_module="aea")
    got = np.asarray(stylize_sanet_q8(variables, vgg_vars, scales,
                                      content, style, adaptive=True,
                                      ada_module="aea", dtype=jnp.float32,
                                      interpret=True))
    psnr = _psnr(got, ref)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_src_quality_vs_f32(rng):
    """Int8 PTQ SourceNet serving matches the standard f32 path."""
    from rpst.models.fast_path_q8 import calibrate_src_q8, stylize_src_q8

    cfg = load_config(dict(network="src", img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)

    ref = np.asarray(bundle.stylize(variables, vgg_vars, content, style))
    scales = calibrate_src_q8(variables["params"], vgg_vars, content, style)
    # VGG 4 stages: conv_4 input + conv_4..conv_8 chained = 6; decoder 6
    assert len(scales["act_scales"]) == 12
    got = np.asarray(stylize_src_q8(variables["params"], vgg_vars, scales,
                                    content, style, dtype=jnp.float32,
                                    interpret=True))
    psnr = _psnr(got, ref)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_mrf_quality_vs_f32(rng):
    """Int8 PTQ MRFRP serving (two int8 RP encoders, channel-concat,
    int8 decode head) stays close to the standard f32 path."""
    from rpst.models.fast_path_q8 import calibrate_mrf_q8, stylize_mrf_q8

    cfg = load_config(dict(network="mrf", img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    params = variables["params"]

    ref = np.asarray(bundle.model.apply(
        {"params": params}, content, style, train=False))
    scales = calibrate_mrf_q8(params, content, style)
    # h32/rp5 per encoder: input of (128,256) + outputs of the two
    # eligible tail layers = 3 (x2 encoders); decoder: inputs of
    # (1024,512), (512,256), (256,128) = 3
    assert len(scales["act_scales"]) == 9
    got = np.asarray(stylize_mrf_q8(params, scales, content, style,
                                    dtype=jnp.float32, interpret=True))
    psnr = _psnr(got, ref)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_seg_adain_quality_vs_f32(rng):
    """seg_adain serving == AdaINRP on the nested adain_rp subtree; the
    adain q8 path applies unchanged."""
    from rpst.models.fast_path_q8 import (calibrate_adain_q8,
                                          stylize_adain_q8)

    cfg = load_config(dict(network="seg_adain", img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    params = variables["params"]["adain_rp"]

    ref = np.asarray(bundle.stylize(variables, vgg_vars, content, style))
    scales = calibrate_adain_q8(params, content, style)
    got = np.asarray(stylize_adain_q8(params, scales, content, style,
                                      dtype=jnp.float32, interpret=True))
    psnr = _psnr(got, ref)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_mst_quality_vs_f32(rng):
    """Int8 PTQ MSTRP serving: chained-int8 folded encode, f32 MST
    transform (k-means + graph-cut stays full precision), int8 decode.
    The discrete label transfer may flip borderline assignments under
    int8 feature noise, so the tolerance is looser than the pure-conv
    families."""
    from rpst.models.fast_path_q8 import (calibrate_mst_q8,
                                          stylize_mst_folded_q8)

    cfg = load_config(dict(network="mst", enc_stack_way="constant",
                           rp_blocks=3, hidden_dim=32, img_size=32,
                           stylized_layers=1, n_clusters=2))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)

    ref = np.asarray(bundle.stylize(variables, vgg_vars, content, style))
    scales = calibrate_mst_q8(variables["params"], content, style,
                              stylized_layers=1, n_clusters=2)
    got = np.asarray(stylize_mst_folded_q8(
        variables["params"], scales, content, style, stylized_layers=1,
        n_clusters=2, dtype=jnp.float32, interpret=True))
    psnr = _psnr(got, ref)
    assert psnr > 25.0, f"PSNR {psnr:.1f} dB"


def test_q8_spade_quality_vs_f32(rng):
    """Int8 PTQ SpadeRP serving (int8 encoders, bf16 SPADE generator)
    stays close to the standard f32 path."""
    from rpst.models.fast_path_q8 import (calibrate_spade_q8,
                                          stylize_spade_q8)

    cfg = load_config(dict(network="spade", img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    params = variables["params"]

    ref = np.asarray(bundle.stylize(variables, vgg_vars, content, style))
    scales = calibrate_spade_q8(params, content, style)
    # 3 scales per encoder at h32/rp5 (input of (128,256) + the two
    # eligible tail outputs)
    assert len(scales["act_scales"]) == 6
    got = np.asarray(stylize_spade_q8(params, scales, content, style,
                                      ndf=cfg.ndf,
                                      spade_norm=cfg.spade_norm,
                                      dtype=jnp.float32, interpret=True))
    psnr = _psnr(got, ref)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


@pytest.mark.parametrize("conv_impl", ["pallas", "xla"])
def test_q8_ld_adain_quality_vs_f32(rng, conv_impl):
    """Int8 PTQ LD v1 serving (aligned dual-branch layers int8, shared
    out-scale concat, wide decoder convs int8) stays close to the
    standard f32 path — for BOTH conv engines: 'pallas' (batch >= 4)
    and 'xla' (small batch — one layout world, no Mosaic/XLA-conv
    relayout storm; see stylize_ld_q8)."""
    from rpst.models.fast_path_q8 import calibrate_ld_q8, stylize_ld_q8

    cfg = load_config(dict(network="ld_adain", img_size=32, hidden_dim=16,
                           rp_blocks=5, use_mask=False))
    bundle = build_model(cfg)
    assert bundle.q8_infer()
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    variables = bundle.init(key, content, style, None)
    params = variables["params"]

    ref = np.asarray(bundle.stylize(variables, None, content, style))
    scales = calibrate_ld_q8(params, content, style,
                             stylized_layers=cfg.stylized_layers)
    # h16/L5: layer-3 input scale, the layer-3 shared branch out scale
    # (= layer-4 input), dec0 input, dec1 input = 4
    assert len(scales["act_scales"]) == 4
    got = np.asarray(stylize_ld_q8(params, scales, content, style,
                                   stylized_layers=cfg.stylized_layers,
                                   dtype=jnp.float32, interpret=True,
                                   conv_impl=conv_impl))
    psnr = _psnr(got, ref)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


@pytest.mark.parametrize("conv_impl", ["pallas", "xla"])
def test_q8_ld_adain2_quality_vs_f32(rng, conv_impl):
    """Int8 PTQ LD v2 serving (aligned dual-branch layers int8: the 3x3
    small plus the big branch's two full-res 3x3 relu convs chained
    int8; conv1x1/pool/upsample bf16) stays close to the standard f32
    path for both conv engines."""
    from rpst.models.fast_path_q8 import calibrate_ld2_q8, stylize_ld2_q8

    cfg = load_config(dict(network="ld_adain2", img_size=32, hidden_dim=8,
                           rp_blocks=5, use_mask=False))
    bundle = build_model(cfg)
    assert bundle.q8_infer()
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    variables = bundle.init(key, content, style, None)
    params = variables["params"]

    ref = np.asarray(bundle.stylize(variables, None, content, style))
    scales = calibrate_ld2_q8(params, content, style,
                              stylized_layers=cfg.stylized_layers)
    # h8/L5: layer 4 is the one aligned layer (input 128) -> 3 scales
    # (shared input, conv_a input, conv_a->conv_b link) + dec0 input = 4
    assert len(scales["act_scales"]) == 4
    got = np.asarray(stylize_ld2_q8(params, scales, content, style,
                                    stylized_layers=cfg.stylized_layers,
                                    dtype=jnp.float32, interpret=True,
                                    conv_impl=conv_impl))
    psnr = _psnr(got, ref)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


def test_q8_ld_gate():
    """q8_infer for the LD family: v1/v2 with an aligned deepest layer
    only; masked fusion and the v3-v5 variants serve bf16."""
    mk = lambda **kw: build_model(load_config(dict(img_size=32, **kw)))
    assert mk(network="ld_adain", hidden_dim=16, rp_blocks=5).q8_infer()
    assert mk(network="ld_adain2", hidden_dim=8, rp_blocks=5).q8_infer()
    # v2's exact 2x2/2 maxpool needs an even image size
    assert not build_model(load_config(dict(
        network="ld_adain2", img_size=33, hidden_dim=8,
        rp_blocks=5))).q8_infer()
    assert not mk(network="ld_adain2", hidden_dim=4, rp_blocks=5).q8_infer()
    assert not mk(network="ld_adain2", hidden_dim=8, rp_blocks=5,
                  use_mask=True).q8_infer()
    # narrow stack: deepest width 4*2^4 = 64 misses the 128 lanes
    assert not mk(network="ld_adain", hidden_dim=4, rp_blocks=5).q8_infer()
    assert not mk(network="ld_adain", hidden_dim=16, rp_blocks=5,
                  use_mask=True).q8_infer()
    # the q8 pass reads only PadConv_0 per block — inception 1x1 stacks
    # would be silently dropped, so the gate must refuse them
    assert not mk(network="ld_adain", hidden_dim=16, rp_blocks=5,
                  inception_num=1).q8_infer()
    # L=1: the single layer reads the 3-channel image — nothing eligible
    assert not mk(network="ld_adain", hidden_dim=128,
                  ld_layer_num=1).q8_infer()
    assert not mk(network="ld_adain5", hidden_dim=16, rp_blocks=5).q8_infer()


def test_encode_std_q8_eligible_before_ineligible(rng):
    """An int8-eligible layer followed by an XLA (non-aligned) layer must
    emit DEQUANTIZED floats and consume no scale there — calibration
    (_collect_rp_sequence) records none at that point, so an int8 out
    would desync the scale stream and feed raw codes into the bf16 conv
    (the std-layout twin of the guard in the folded _encode_q8)."""
    from rpst.models.fast_path_q8 import (_collect_rp_sequence,
                                          _encode_std_q8, _make_conv_q_std,
                                          _same_conv_relu)

    def mk(cin, cout, scale=0.15):
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
        return k * scale, b * 0.1
    # inelig (3->128), elig (128->128), elig (128->128), inelig (128->64)
    enc = [mk(3, 128), mk(128, 128), mk(128, 128), mk(128, 64)]
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)

    _, absmax = _collect_rp_sequence(enc, [], x.astype(jnp.bfloat16),
                                     lambda f: f, jnp.bfloat16)
    act_scales = np.asarray([float(a) / 127.0 for a in absmax], np.float32)
    assert len(act_scales) == 2  # li0->li1 input and li1->li2 chain only

    ref = x.astype(jnp.bfloat16)
    for k, b in enc:
        ref = _same_conv_relu(ref, k, b, jnp.bfloat16)

    it = iter(range(len(act_scales)))
    conv_q = _make_conv_q_std(jnp.bfloat16, 16, interpret=True)
    got, got_s = _encode_std_q8(enc, act_scales, it, x.astype(jnp.bfloat16),
                                jnp.bfloat16, conv_q)
    assert got_s is None  # deepest layer is ineligible -> float out
    # every recorded scale consumed, none left over (stream stays in sync)
    assert next(it, None) is None
    ref = np.asarray(ref, np.float32)
    err = np.abs(np.asarray(got, np.float32) - ref)
    assert float(err.mean()) < 0.05 * (float(np.abs(ref).mean()) + 1e-6)


def test_fused_q8_kernel_wide_k_bit_exact(rng):
    """The wide-K (K=3*C4 lane-stacked) contraction must be bit-exact vs
    the 9-matmul form — int32 tap sums reassociate exactly. Covers both
    output modes and the fused-stats epilogue."""
    c = 32
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4 * c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    kf, bf = fold_conv_kernel(k), fold_bias(b)
    x_scale = float(jnp.max(jnp.abs(x))) / 127.0
    x_q = quantize_activations(x, x_scale)
    w_q, w_scale = quantize_weights(kf)
    deq = x_scale * w_scale
    inv = jnp.full_like(deq, 8.0)
    sc = jnp.stack([deq, bf.astype(jnp.float32), inv])

    ref = fused_folded_conv_q8(x_q, w_q, sc, out_int8=False,
                               interpret=True, wide_k=False)
    got = fused_folded_conv_q8(x_q, w_q, sc, out_int8=False,
                               interpret=True, wide_k=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    ref8, rs1, rs2 = fused_folded_conv_q8(x_q, w_q, sc, out_int8=True,
                                          with_stats=True,
                                          interpret=True, wide_k=False)
    got8, gs1, gs2 = fused_folded_conv_q8(x_q, w_q, sc, out_int8=True,
                                          with_stats=True,
                                          interpret=True, wide_k=True)
    np.testing.assert_array_equal(np.asarray(got8), np.asarray(ref8))
    np.testing.assert_array_equal(np.asarray(gs1), np.asarray(rs1))
    np.testing.assert_array_equal(np.asarray(gs2), np.asarray(rs2))


def test_fused_q8_wide_k_auto_batch_gate(rng):
    """wide_k='auto' (the default) engages at batch >= 4 and stays
    bit-exact either way (measured: +3% b8, -7% b1 — BASELINE.md)."""
    c = 32
    for batch in (1, 4):
        x = jnp.asarray(rng.normal(size=(batch, 8, 8, 4 * c))
                        .astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32)
                        * 0.2)
        b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
        kf, bf = fold_conv_kernel(k), fold_bias(b)
        x_scale = float(jnp.max(jnp.abs(x))) / 127.0
        x_q = quantize_activations(x, x_scale)
        w_q, w_scale = quantize_weights(kf)
        sc = jnp.stack([x_scale * w_scale, bf.astype(jnp.float32),
                        jnp.full_like(w_scale, 8.0)])
        ref = fused_folded_conv_q8(x_q, w_q, sc, out_int8=True,
                                   interpret=True, wide_k=False)
        auto = fused_folded_conv_q8(x_q, w_q, sc, out_int8=True,
                                    interpret=True, wide_k="auto")
        np.testing.assert_array_equal(np.asarray(auto), np.asarray(ref))
