"""Flash-attention kernel tests (Pallas interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rpst.ops.pallas.flash_attention import (_dense_attention,
                                             flash_attention)


def test_flash_matches_dense(rng):
    q = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    dense = _dense_attention(q, k, v)
    flash = flash_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_flash_rectangular(rng):
    """Nq != Nk (SANet merges relu4_1 with upsampled relu5_1 so both occur)."""
    q = jnp.asarray(rng.normal(size=(1, 128, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 64, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 64, 16)).astype(np.float32))
    dense = _dense_attention(q, k, v)
    flash = flash_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_flash_small_fallback(rng):
    """Tiny spatial dims fall back to the dense path."""
    q = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
    out = flash_attention(q, q, q, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_dense_attention(q, q, q)),
                               rtol=1e-5, atol=1e-6)


def test_flash_softmax_rows_sum_to_one(rng):
    """With V = identity-ish basis the attention row sums are recoverable:
    sum_c O[p,c] == 1 when V's columns sum to one per key."""
    n = 32
    q = jnp.asarray(rng.normal(size=(1, n, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, n, 16)).astype(np.float32))
    v = jnp.ones((1, n, 16), jnp.float32) / 16.0
    out = flash_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(out).sum(-1),
                               np.ones((1, n)), rtol=1e-4)


def test_flash_gradients_match_dense(rng):
    q = jnp.asarray(rng.normal(size=(1, 32, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 32, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 32, 16)).astype(np.float32))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, True) ** 2).sum()

    def loss_dense(q, k, v):
        return (_dense_attention(q, k, v) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_flash_backward_kernel_matches_dense(rng):
    """The blockwise backward (dq/dkv Pallas kernels over saved LSE) must
    reproduce dense softmax-attention gradients across multiple blocks and
    rectangular Nq != Nk."""
    q = jnp.asarray(rng.normal(size=(2, 128, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 128, 32)).astype(np.float32))

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, True) * g).sum()

    def f_dense(q, k, v):
        return (_dense_attention(q, k, v) * g).sum()

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_flash_backward_large_logit_stability(rng):
    q = jnp.asarray(rng.normal(size=(1, 64, 16)).astype(np.float32)) * 30
    k = jnp.asarray(rng.normal(size=(1, 64, 16)).astype(np.float32)) * 30
    v = jnp.asarray(rng.normal(size=(1, 64, 16)).astype(np.float32))
    gf = jax.grad(lambda q: (flash_attention(q, k, v, True) ** 2).sum())(q)
    gd = jax.grad(lambda q: (_dense_attention(q, k, v) ** 2).sum())(q)
    assert bool(jnp.isfinite(gf).all())
    # near-one-hot softmax: non-selected grads are ~0, so compare absolutely
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd), atol=1e-3)


def test_flash_numerical_stability_large_logits(rng):
    """Running-max rewrite must survive large logits without overflow."""
    q = jnp.asarray(rng.normal(size=(1, 32, 16)).astype(np.float32)) * 30
    k = jnp.asarray(rng.normal(size=(1, 32, 16)).astype(np.float32)) * 30
    v = jnp.asarray(rng.normal(size=(1, 32, 16)).astype(np.float32))
    out = flash_attention(q, k, v, True)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_dense_attention(q, k, v)),
                               rtol=1e-3, atol=1e-4)
