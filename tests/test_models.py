"""Model-family tests: every registry entry builds, computes a loss with
all expected components, stylizes at the right shape, and its gradients
flow to the trainable params (and nowhere else)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.config import load_config
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params

BASE = dict(rp_blocks=3, hidden_dim=8, ld_layer_num=3, stylized_layers=3,
            img_size=32, attention="none", enc_stack_way="constant", ndf=2,
            max_seg_labels=8)

ALL_NETWORKS = ["adain", "multi_adain", "sel_multi_adain", "wct", "ccam",
                "mst", "ld_adain", "ld_adain2", "ld_adain3", "ld_adain4",
                "ld_adain5", "sanet", "dynamic_sanet", "mrf", "spade",
                "src", "seg_adain"]

EXPECTED_PARTS = {
    "mrf": {"content_loss", "style_loss", "mrf_loss", "total_loss"},
    "sanet": {"content_loss", "style_loss", "l_identity1_loss",
              "l_identity2_loss", "total_loss"},
    "dynamic_sanet": {"content_loss", "style_loss", "l_identity1_loss",
                      "l_identity2_loss", "total_loss"},
}
DEFAULT_PARTS = {"content_loss", "style_loss", "total_loss"}


def _setup(network, **over):
    cfg = load_config({**BASE, "network": network, **over})
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    content = jnp.asarray(
        np.random.default_rng(0).random((1, 32, 32, 3), np.float32))
    style = jnp.asarray(
        np.random.default_rng(1).random((1, 32, 32, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    variables = bundle.init(rng, content, style, vgg_vars)
    return bundle, variables, vgg_vars, content, style


# smoke tier keeps one representative of each structural family; the
# rest run in the full (slow) tier
_SMOKE_NETWORKS = {"multi_adain", "wct", "sanet", "ld_adain3", "mrf"}


@pytest.mark.parametrize(
    "network",
    [n if n in _SMOKE_NETWORKS else pytest.param(n, marks=pytest.mark.slow)
     for n in ALL_NETWORKS])
def test_model_loss_and_stylize(network):
    bundle, variables, vgg_vars, content, style = _setup(network)
    total, (parts, _) = bundle.loss(variables, vgg_vars, content, style)
    assert jnp.isfinite(total), (network, parts)
    assert set(parts) == EXPECTED_PARTS.get(network, DEFAULT_PARTS)
    img = bundle.stylize(variables, vgg_vars, content, style)
    assert img.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(img).all())


@pytest.mark.parametrize("network", ["multi_adain", "wct", "sanet", "ld_adain4"])
@pytest.mark.slow
def test_gradients_flow(network):
    bundle, variables, vgg_vars, content, style = _setup(network)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        total, _ = bundle.loss({"params": p, **extra}, vgg_vars,
                               content, style)
        return total

    grads = jax.grad(loss_fn)(params)
    gnorms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
    leaves = jax.tree.leaves(gnorms)
    n_nonzero = sum(1 for g in leaves if g > 0)
    # most params must receive gradient (biases of dead relus can be 0)
    assert n_nonzero >= len(leaves) * 0.5, f"{network}: {n_nonzero}/{len(leaves)}"
    assert all(np.isfinite(g) for g in leaves)


@pytest.mark.slow
def test_wct_fuse_blocks_encoder_gradients_from_fusion():
    """WCT detaches before fusing (wct_rp.py:160-163): with zero loss
    weight on style/content stats the decoder still gets gradients via the
    fused features, while the fusion path contributes none to the encoder."""
    bundle, variables, vgg_vars, content, style = _setup("wct")

    def stylize_sum(p):
        return bundle.stylize({"params": p}, vgg_vars, content, style).sum()

    grads = jax.grad(stylize_sum)(variables["params"])
    enc = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()),
                                       grads["encoder"]))
    dec = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()),
                                       grads["decoder"]))
    assert all(g == 0 for g in enc), "encoder must not see fusion gradients"
    assert any(g > 0 for g in dec)


def test_multi_adain_constant_deeper_shapes():
    for way in ("constant", "deeper"):
        bundle, variables, vgg_vars, content, style = _setup(
            "multi_adain", enc_stack_way=way)
        img = bundle.stylize(variables, vgg_vars, content, style)
        assert img.shape == (1, 32, 32, 3), way


def test_multi_adain_with_se_attention_and_sort():
    bundle, variables, vgg_vars, content, style = _setup(
        "multi_adain", attention="se", sort=True, shuffle=True)
    assert "batch_stats" in variables
    total, (parts, muts) = bundle.loss(variables, vgg_vars, content, style)
    assert "batch_stats" in muts
    img = bundle.stylize(variables, vgg_vars, content, style)
    assert img.shape == (1, 32, 32, 3)


def test_masked_stylize_multi_adain():
    bundle, variables, vgg_vars, content, style = _setup(
        "multi_adain", use_mask=True)
    labels = jnp.zeros((1, 32, 32), jnp.int32).at[:, :16].set(1)
    img = bundle.stylize(variables, vgg_vars, content, style,
                         c_labels=labels, s_labels=labels)
    assert img.shape == (1, 32, 32, 3)
    # masked and unmasked stylization must differ
    img2 = bundle.stylize(variables, vgg_vars, content, style)
    assert not np.allclose(np.asarray(img), np.asarray(img2), atol=1e-5)


def test_ld2_2n_batch_gate_exact():
    """Variant 2 takes the 2N shared-encoder path at batch >= 4 (measured
    +16% at b4 on v5e, hw_ld2_2n_ab.py); it must be EXACT — stylizing a
    batch of 4 equals stylizing each pair alone (batch 1 uses the
    separate-encode path, so this crosses the gate)."""
    bundle, variables, vgg_vars, _, _ = _setup("ld_adain2")
    rng = np.random.default_rng(2)
    content = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
    style = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
    batched = np.asarray(bundle.stylize(variables, vgg_vars, content, style))
    for i in range(4):
        single = np.asarray(bundle.stylize(
            variables, vgg_vars, content[i:i + 1], style[i:i + 1]))
        np.testing.assert_allclose(batched[i:i + 1], single,
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_ld_variants_stylized_layers_lt_layer_num():
    """The reference crashes for ld1-3 with stylized_layers < layer_num
    (`stylized + []`, adain_rp.py:543-552); our decode skips cleanly."""
    for variant in ("ld_adain", "ld_adain4"):
        bundle, variables, vgg_vars, content, style = _setup(
            variant, stylized_layers=1)
        img = bundle.stylize(variables, vgg_vars, content, style)
        assert img.shape == (1, 32, 32, 3)


def test_nonoverlap_conv_transpose_equals_flax():
    """The ld5 upsampler rewrite (1x1 projection + depth-to-space) is
    bit-compatible with nn.ConvTranspose for kernel == stride: same
    param tree (names, shapes, init) and equal outputs."""
    import numpy as np
    from flax import linen as nn
    from rpst.models.ld_adain import NonOverlapConvTranspose

    rng = jax.random.PRNGKey(7)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 8, 6, 16)).astype(np.float32))
    for s in (2, 4, 8):
        ref_mod = nn.ConvTranspose(features=16, kernel_size=(s, s),
                                   strides=(s, s))
        new_mod = NonOverlapConvTranspose(features=16, kernel_size=(s, s),
                                          strides=(s, s))
        p_ref = ref_mod.init(rng, x)
        p_new = new_mod.init(rng, x)
        assert jax.tree.structure(p_ref) == jax.tree.structure(p_new)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
            assert a.shape == b.shape
        out_ref = ref_mod.apply(p_ref, x)
        out_new = new_mod.apply(p_ref, x)  # ref params through new path
        np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                                   rtol=1e-5, atol=1e-5)


def test_q8_infer_gates_on_pool_divisibility():
    """The q8 VGG-family encode pools with exact 2x2/2 halving where the
    bf16 path pools ceil-mode: sanet/dynamic_sanet (four pools to
    relu5_1) need img_size % 16 == 0, src (three pools to relu4_1) needs
    % 8 — anything else must report q8-unsupported so serve.py falls
    back to standard instead of tripping the pool assert at trace time."""
    for net, good, bad in [("sanet", 128, 200), ("dynamic_sanet", 64, 104),
                           ("src", 104, 100)]:
        ok = build_model(load_config(dict(BASE, network=net, img_size=good)))
        no = build_model(load_config(dict(BASE, network=net, img_size=bad)))
        assert ok.q8_infer(), (net, good)
        assert not no.q8_infer(), (net, bad)

def test_q8_recommended_excludes_spade():
    """--mode auto must not pick q8 for spade: its cost is the bf16
    SPADE generator, and on-hw A/B measured the int8 encoders as a net
    regression (9.2 vs 10.9 img/s b4 512px, BASELINE.md round 3). The
    explicit q8 path stays available (q8_infer True)."""
    spade = build_model(load_config(dict(
        BASE, network="spade", spade_norm="instance")))
    assert spade.q8_infer()
    assert not spade.q8_recommended()
    flag = build_model(load_config(dict(
        BASE, network="multi_adain", enc_stack_way="constant",
        hidden_dim=32)))
    assert flag.q8_recommended() == flag.q8_infer()
