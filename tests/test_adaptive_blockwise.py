"""Blockwise adaptive attention (dynamic_sanet) == dense parity path.

The streamed path (``ops/adaptive_attention`` + the factorized AEA
threshold, reference ``network/sanet.py:26-71, 100-138``) must match the
dense (HWc, HWs)-materializing path on values AND gradients — it is the
same math reassociated (psi0 applied through the affinity's low-rank
factors; softmax + re-weighting computed one query block at a time).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.models.sanet import SAModel
from rpst.nn.vgg import init_vgg_params
from rpst.ops.adaptive_attention import adaptive_reweighted_attention


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _dense_reference(F, G, H, clamp, variant, scale):
    S = jax.nn.softmax(jnp.einsum("npc,nqc->npq", F, G), axis=-1)
    if variant == "aea":
        W = jax.nn.sigmoid(scale * (S - clamp))
    else:
        W = jax.nn.softmax(jax.nn.relu(S - clamp), axis=-1)
    return jnp.einsum("npq,nqc->npc", W, H)


@pytest.mark.parametrize("variant", ["aea", "aea_lrelu"])
def test_op_matches_dense(rng, variant):
    n, p, q, c = 2, 96, 80, 32
    F = jnp.asarray(rng.normal(size=(n, p, c)).astype(np.float32))
    G = jnp.asarray(rng.normal(size=(n, q, c)).astype(np.float32))
    H = jnp.asarray(rng.normal(size=(n, q, c)).astype(np.float32))
    clamp = jnp.asarray(rng.uniform(0.3, 0.9, size=(n, p, 1))
                        .astype(np.float32))
    got = adaptive_reweighted_attention(F, G, H, clamp, variant=variant,
                                        block_q=32)
    ref = _dense_reference(F, G, H, clamp, variant, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant", ["aea", "aea_lrelu"])
def test_op_grads_match_dense(rng, variant):
    n, p, q, c = 1, 64, 64, 16
    F = jnp.asarray(rng.normal(size=(n, p, c)).astype(np.float32))
    G = jnp.asarray(rng.normal(size=(n, q, c)).astype(np.float32))
    H = jnp.asarray(rng.normal(size=(n, q, c)).astype(np.float32))
    clamp = jnp.asarray(rng.uniform(0.3, 0.9, size=(n, p, 1))
                        .astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, p, c)).astype(np.float32))

    def loss_block(F, G, H, clamp):
        return jnp.sum(adaptive_reweighted_attention(
            F, G, H, clamp, variant=variant, block_q=16) * g)

    def loss_dense(F, G, H, clamp):
        return jnp.sum(_dense_reference(F, G, H, clamp, variant, 50.0) * g)

    gb = jax.grad(loss_block, argnums=(0, 1, 2, 3))(F, G, H, clamp)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(F, G, H, clamp)
    for a, b in zip(gb, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ada_module", ["aea", "relu"])
def test_model_blockwise_matches_dense(rng, ada_module):
    """Full SAModel stylize: blockwise="always" == "never" on the SAME
    params (the factorized threshold reuses the identical psi0/psi1
    Dense kernels — the param tree must not depend on the path)."""
    img = 64
    key = jax.random.PRNGKey(0)
    vgg, vgg_vars = init_vgg_params(key, num_stages=5)
    content = jnp.asarray(rng.random((1, img, img, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, img, img, 3)).astype(np.float32))
    feats_c = vgg.apply(vgg_vars, content)
    feats_s = vgg.apply(vgg_vars, style)

    dense_model = SAModel(adaptive=True, img_size=img,
                          ada_module=ada_module, blockwise="never")
    params = dense_model.init(key, feats_c, feats_s)
    block_model = SAModel(adaptive=True, img_size=img,
                          ada_module=ada_module, blockwise="always")
    # same param tree must be accepted by both paths
    out_d = dense_model.apply(params, feats_c, feats_s)
    out_b = block_model.apply(params, feats_c, feats_s)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d),
                               rtol=1e-3, atol=1e-3)


def test_model_blockwise_init_tree_matches(rng):
    """Init through the blockwise path produces the identical param tree
    (names AND shapes) as the dense path."""
    img = 64
    key = jax.random.PRNGKey(0)
    vgg, vgg_vars = init_vgg_params(key, num_stages=5)
    x = jnp.asarray(rng.random((1, img, img, 3)).astype(np.float32))
    feats = vgg.apply(vgg_vars, x)

    p_dense = SAModel(adaptive=True, img_size=img,
                      blockwise="never").init(key, feats, feats)
    p_block = SAModel(adaptive=True, img_size=img,
                      blockwise="always").init(key, feats, feats)
    sd = jax.tree.structure(p_dense)
    sb = jax.tree.structure(p_block)
    assert sd == sb
    for a, b in zip(jax.tree.leaves(p_dense), jax.tree.leaves(p_block)):
        assert a.shape == b.shape
