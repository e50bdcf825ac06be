"""Folded (space-to-depth) execution — exactness tests vs the standard
path: same params, same inputs, (near-)identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from rpst.config import load_config
from rpst.models import build_model
from rpst.models.fast_path import stylize_multi_adain_folded
from rpst.nn.vgg import init_vgg_params
from rpst.ops.folded import (fold, fold_bias, fold_conv_kernel, folded_adain,
                             folded_conv, folded_reflect_pad, unfold)
from rpst.ops.stats import adaptive_instance_normalization
import pytest


def test_fold_unfold_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 16, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unfold(fold(x))), np.asarray(x))


def test_folded_conv_matches_reference_conv(rng):
    """Folded reflect-pad conv == reflect-pad conv on the image."""
    x = jnp.asarray(rng.random((1, 16, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 6)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    expected = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    got = unfold(folded_conv(fold(x), fold_conv_kernel(k), fold_bias(b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_folded_reflect_pad_ring_values(rng):
    """The folded ring carries exactly the reflect-padded original pixels."""
    x = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
    xp_ref = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    got = unfold(folded_reflect_pad(fold(x)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(xp_ref))


def test_folded_conv_bc_matches_ring(rng):
    """Boundary-corrected conv == ring-padded conv (both exact)."""
    for (h, w) in ((16, 16), (8, 12)):
        x = jnp.asarray(rng.random((2, h, w, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        kf, bf = fold_conv_kernel(k), fold_bias(b)
        ring = folded_conv(fold(x), kf, bf, impl="ring")
        bc = folded_conv(fold(x), kf, bf, impl="bc")
        np.testing.assert_allclose(np.asarray(bc), np.asarray(ring),
                                   rtol=1e-5, atol=1e-5)


def test_folded_adain_matches(rng):
    c = jnp.asarray(rng.random((2, 16, 16, 8)).astype(np.float32) * 3)
    s = jnp.asarray(rng.random((2, 16, 16, 8)).astype(np.float32) + 1)
    expected = adaptive_instance_normalization(c, s)
    got = unfold(folded_adain(fold(c), fold(s)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_folded_flagship_matches_standard_path(rng):
    """Full flagship stylize: folded execution == standard execution with
    the same parameters (f32 to isolate reassociation error)."""
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=4, hidden_dim=8, img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)

    standard = np.asarray(bundle.stylize(variables, vgg_vars, content, style))
    folded = np.asarray(stylize_multi_adain_folded(
        variables["params"], content, style, dtype=jnp.float32))
    np.testing.assert_allclose(folded, standard, rtol=1e-4, atol=1e-4)
    mae = np.abs(folded - standard).mean()
    assert mae < 1e-5, mae


def test_fused_pallas_folded_conv_interpret(rng):
    """Fused Pallas reflect-pad+conv+lrelu kernel (interpret mode) ==
    XLA ring path, for lane-filling channel widths (C4 = 128)."""
    from rpst.ops.pallas.folded_conv import fused_folded_conv

    for (h, w, c), bs in (((16, 16, 32), 1), ((32, 16, 32), 2)):
        x = jnp.asarray(rng.normal(size=(bs, h, w, 4 * c)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
        kf, bf = fold_conv_kernel(k), fold_bias(b)
        ref = folded_conv(x, kf, bf)
        ref = jnp.where(ref >= 0, ref, 0.2 * ref)
        got = fused_folded_conv(x, kf, bf, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_folded_exec_strategy_loss_and_grads_match(rng):
    """exec_strategy='folded' training: loss and gradients match the
    standard execution with the same params (f32)."""
    from rpst.nn.vgg import init_vgg_params

    common = dict(network="multi_adain", enc_stack_way="constant",
                  rp_blocks=3, hidden_dim=8, img_size=16)
    b_std = build_model(load_config(dict(common)))
    b_fold = build_model(load_config(dict(common, exec_strategy="folded")))
    assert not b_std.folded_exec() and b_fold.folded_exec()

    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = b_std.init(key, content, style, vgg_vars)

    def loss(bundle):
        def f(params):
            total, _ = bundle.loss({"params": params}, vgg_vars,
                                   content, style, train=True)
            return total
        return jax.value_and_grad(f)(variables["params"])

    (l_std, g_std), (l_fold, g_fold) = loss(b_std), loss(b_fold)
    np.testing.assert_allclose(float(l_fold), float(l_std), rtol=1e-4)
    flat_std = jax.tree_util.tree_leaves(g_std)
    flat_fold = jax.tree_util.tree_leaves(g_fold)
    for a, b in zip(flat_fold, flat_std):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_folded_exec_strategy_stylize_matches(rng):
    from rpst.nn.vgg import init_vgg_params

    common = dict(network="multi_adain", enc_stack_way="constant",
                  rp_blocks=3, hidden_dim=8, img_size=16)
    b_std = build_model(load_config(dict(common)))
    b_fold = build_model(load_config(dict(common, exec_strategy="folded")))
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = b_std.init(key, content, style, vgg_vars)
    a = np.asarray(b_std.stylize(variables, vgg_vars, content, style))
    b = np.asarray(b_fold.stylize(variables, vgg_vars, content, style))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_folded_vgg_stats_match_standard(rng):
    """vgg_perceptual_stats (stages 1-2 folded, pool = sub-block max,
    stats via folded_calc_mean_std) must equal the standard VGG19Encoder
    stats + relu4_1 exactly (up to reassociation)."""
    from rpst.nn.vgg import init_vgg_params
    from rpst.nn.vgg_folded import vgg_perceptual_stats
    from rpst.ops.stats import calc_mean_std

    key = jax.random.PRNGKey(0)
    model, vgg_vars = init_vgg_params(key, num_stages=4)
    x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))

    stats, relu4 = vgg_perceptual_stats(vgg_vars, x, dtype=jnp.float32)
    feats = model.apply(vgg_vars, x)
    assert len(stats) == 4
    for (m, s), f in zip(stats, feats):
        em, es = calc_mean_std(f)
        np.testing.assert_allclose(np.asarray(m), np.asarray(em)[:, 0, 0, :],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s), np.asarray(es)[:, 0, 0, :],
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(relu4), np.asarray(feats[-1]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_folded_perceptual_loss_matches_standard(rng):
    from rpst.models.base import perceptual_rp_losses
    from rpst.nn.vgg import VGG19Encoder, init_vgg_params
    from rpst.nn.vgg_folded import perceptual_rp_losses_folded

    key = jax.random.PRNGKey(1)
    model, vgg_vars = init_vgg_params(key, num_stages=4)
    stylized = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    content = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))

    expected, etotal = perceptual_rp_losses(
        lambda x: model.apply(vgg_vars, x), stylized, style, content, 1.0, 3.0)
    got, total = perceptual_rp_losses_folded(vgg_vars, stylized, style,
                                             content, 1.0, 3.0,
                                             dtype=jnp.float32)
    np.testing.assert_allclose(float(total), float(etotal), rtol=1e-5)
    np.testing.assert_allclose(float(got["style_loss"]),
                               float(expected["style_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(got["content_loss"]),
                               float(expected["content_loss"]), rtol=1e-5)


@pytest.mark.slow
def test_folded_sel_multi_adain_stylize_matches(rng):
    """SELastRP folded inference (SE bottleneck with eval BatchNorm as
    folded channel affines) == the standard path."""
    from rpst.nn.vgg import init_vgg_params

    common = dict(network="sel_multi_adain", enc_stack_way="constant",
                  rp_blocks=3, hidden_dim=16, img_size=16)
    b_std = build_model(load_config(dict(common)))
    b_fold = build_model(load_config(dict(common, exec_strategy="folded")))
    assert not b_fold.folded_exec() and b_fold.folded_infer()
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = b_std.init(key, content, style, vgg_vars)
    a = np.asarray(b_std.stylize(variables, vgg_vars, content, style))
    b = np.asarray(b_fold.stylize(variables, vgg_vars, content, style))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_folded_ccam_stylize_matches(rng):
    """CCAMRP folded inference (cross-channel attention over folded
    sub-position blocks) == the standard path, including a nonzero
    trained 'scale' so the attention branch actually contributes."""
    from rpst.nn.vgg import init_vgg_params

    common = dict(network="ccam", enc_stack_way="constant",
                  rp_blocks=3, hidden_dim=8, img_size=16,
                  stylized_layers=2)
    b_std = build_model(load_config(dict(common)))
    b_fold = build_model(load_config(dict(common, exec_strategy="folded")))
    assert b_fold.folded_infer()
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = b_std.init(key, content, style, vgg_vars)
    variables = jax.tree.map(lambda x: x, variables)  # unfreeze copy
    for i in range(3):
        if f"ccam_{i}" in variables["params"]:  # lazily created: only
            # the stylized_layers-gated modules that actually ran exist
            variables["params"][f"ccam_{i}"]["scale"] = jnp.full((1,), 0.5)
    a = np.asarray(b_std.stylize(variables, vgg_vars, content, style))
    b = np.asarray(b_fold.stylize(variables, vgg_vars, content, style))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_folded_sel_loss_grads_and_stats_match(rng):
    """exec_strategy='folded' SELastRP training: loss, gradients, AND the
    train-mode BatchNorm batch_stats updates match the standard path."""
    from rpst.nn.vgg import init_vgg_params

    common = dict(network="sel_multi_adain", enc_stack_way="constant",
                  rp_blocks=3, hidden_dim=16, img_size=16)
    b_std = build_model(load_config(dict(common)))
    b_fold = build_model(load_config(dict(common, exec_strategy="folded")))
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = b_std.init(key, content, style, vgg_vars)

    def loss(bundle):
        def f(params):
            total, (parts, muts) = bundle.loss(
                {"params": params, "batch_stats": variables["batch_stats"]},
                vgg_vars, content, style, train=True)
            return total, muts
        return jax.value_and_grad(f, has_aux=True)(variables["params"])

    (l_std, m_std), g_std = loss(b_std)
    (l_fold, m_fold), g_fold = loss(b_fold)
    np.testing.assert_allclose(float(l_fold), float(l_std), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fold), jax.tree.leaves(g_std)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)
    # updated running stats must match (same tree structure and values)
    assert (jax.tree.structure(m_fold["batch_stats"])
            == jax.tree.structure(m_std["batch_stats"]))
    for a, b in zip(jax.tree.leaves(m_fold["batch_stats"]),
                    jax.tree.leaves(m_std["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_folded_ccam_loss_and_grads_match(rng):
    """exec_strategy='folded' CCAMRP training: loss and gradients
    (including through the CCAM attention scale params) match."""
    from rpst.nn.vgg import init_vgg_params

    common = dict(network="ccam", enc_stack_way="constant",
                  rp_blocks=3, hidden_dim=8, img_size=16,
                  stylized_layers=3)
    b_std = build_model(load_config(dict(common)))
    b_fold = build_model(load_config(dict(common, exec_strategy="folded")))
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = b_std.init(key, content, style, vgg_vars)
    variables = jax.tree.map(lambda x: x, variables)
    for i in range(3):
        if f"ccam_{i}" in variables["params"]:
            variables["params"][f"ccam_{i}"]["scale"] = jnp.full((1,), 0.3)

    def loss(bundle):
        def f(params):
            total, _ = bundle.loss({"params": params}, vgg_vars,
                                   content, style, train=True)
            return total
        return jax.value_and_grad(f)(variables["params"])

    (l_std, g_std), (l_fold, g_fold) = loss(b_std), loss(b_fold)
    np.testing.assert_allclose(float(l_fold), float(l_std), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fold), jax.tree.leaves(g_std)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


@pytest.mark.slow
def test_folded_mst_stylize_and_loss_match(rng):
    """MSTRP folded execution (k-means/graph-cut on a raster round trip
    of the fused scale, convs folded) == the standard path. The discrete
    transform runs on bit-different-but-equal-up-to-float-noise features,
    so tolerances allow for borderline cluster assignments."""
    from rpst.nn.vgg import init_vgg_params

    common = dict(network="mst", enc_stack_way="constant",
                  rp_blocks=3, hidden_dim=8, img_size=16,
                  stylized_layers=1, n_clusters=2)
    b_std = build_model(load_config(dict(common)))
    b_fold = build_model(load_config(dict(common, exec_strategy="folded")))
    assert b_fold.folded_infer()
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = b_std.init(key, content, style, vgg_vars)
    a = np.asarray(b_std.stylize(variables, vgg_vars, content, style))
    b = np.asarray(b_fold.stylize(variables, vgg_vars, content, style))
    assert np.abs(b - a).mean() < 1e-4, np.abs(b - a).mean()
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-3)

    def loss(bundle):
        def f(params):
            total, _ = bundle.loss({"params": params}, vgg_vars,
                                   content, style, train=True)
            return total
        return jax.value_and_grad(f)(variables["params"])

    (l_std, g_std), (l_fold, g_fold) = loss(b_std), loss(b_fold)
    np.testing.assert_allclose(float(l_fold), float(l_std), rtol=1e-3)
    # the transform detaches: encoder grads must be zero on BOTH paths
    enc_std = jax.tree.leaves(jax.tree.map(
        lambda g: float(jnp.abs(g).sum()),
        g_std["ms"]["rp_shared_encoder"]))
    enc_fold = jax.tree.leaves(jax.tree.map(
        lambda g: float(jnp.abs(g).sum()),
        g_fold["ms"]["rp_shared_encoder"]))
    assert all(g == 0 for g in enc_std)
    assert all(g == 0 for g in enc_fold)
    for a_, b_ in zip(jax.tree.leaves(g_fold), jax.tree.leaves(g_std)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=5e-3, atol=1e-4)


def test_fused_folded_conv_vjp_interpret(rng):
    """Custom-VJP backward kernel pair (interpret mode) == XLA autodiff of
    the ring path: dx from the rotated-kernel SAME conv + ring-transpose
    corrections, dk/db from the folded correlation kernel."""
    import rpst.ops.pallas.folded_conv as fc
    from rpst.ops.folded import folded_conv

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    for n, h, w, c in ((2, 16, 16, 32), (1, 8, 16, 32), (1, 32, 16, 32)):
        x = jnp.asarray(rng.normal(size=(n, h, w, 4 * c)).astype(np.float32))
        k0 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32)
                         * 0.1)
        b0 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        kf, bf = fold_conv_kernel(k0), fold_bias(b0)
        g = jnp.asarray(rng.normal(size=(n, h, w, 4 * c)).astype(np.float32))

        rx, rk, rb = jax.grad(
            lambda x, kf, bf: jnp.sum(lrelu(folded_conv(x, kf, bf)) * g),
            argnums=(0, 1, 2))(x, kf, bf)

        y = fc.fused_folded_conv(x, kf, bf, interpret=True)
        gz = jnp.where(y >= 0, g, 0.2 * g)
        khat = jnp.transpose(kf[::-1, ::-1], (0, 1, 3, 2))
        dx = fc.fused_folded_conv_grad_input(gz, khat, interpret=True)
        dk, db = fc.fused_folded_conv_grad_weight(x, gz, interpret=True)

        np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                                   rtol=1e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(db), np.asarray(rb),
                                   rtol=1e-4, atol=2e-3)


def test_fused_folded_conv_vjp_rect_channels(rng):
    """Backward kernels with C_in != C_out (wider decoder layers)."""
    import rpst.ops.pallas.folded_conv as fc
    from rpst.ops.folded import folded_conv

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    n, h, w, ci, co = 1, 16, 16, 32, 64
    x = jnp.asarray(rng.normal(size=(n, h, w, 4 * ci)).astype(np.float32))
    k0 = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
    kf, bf = fold_conv_kernel(k0), fold_bias(b0)
    g = jnp.asarray(rng.normal(size=(n, h, w, 4 * co)).astype(np.float32))

    rx, rk, rb = jax.grad(
        lambda x, kf, bf: jnp.sum(lrelu(folded_conv(x, kf, bf)) * g),
        argnums=(0, 1, 2))(x, kf, bf)
    y = fc.fused_folded_conv(x, kf, bf, interpret=True)
    gz = jnp.where(y >= 0, g, 0.2 * g)
    khat = jnp.transpose(kf[::-1, ::-1], (0, 1, 3, 2))
    dx = fc.fused_folded_conv_grad_input(gz, khat, interpret=True)
    dk, db = fc.fused_folded_conv_grad_weight(x, gz, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=1e-4,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rb), rtol=1e-4,
                               atol=2e-3)
