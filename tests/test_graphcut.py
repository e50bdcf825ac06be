"""Chain-MRF labeling: JAX DP vs C++ DP vs C++ α-expansion, plus the
pure_callback route used from jitted code."""

import numpy as np
import pytest

from rpst.ops.graphcut import chain_map_labeling, potts_pairwise
from rpst.ops.graphcut_cpp import (aexpansion_chain_cpp, available,
                                   chain_energy_cpp, chain_labeling_callback,
                                   chain_viterbi_cpp)

pytestmark = pytest.mark.skipif(not available(),
                                reason="libgraphcut.so not buildable")


def _random_problem(rng, C=32, k=4, lam=0.3):
    D = rng.random((C, k)).astype(np.float64)
    V = lam * (np.ones((k, k)) - np.eye(k))
    return D, V


def _brute_force(D, V):
    import itertools
    C, k = D.shape
    best, best_l = np.inf, None
    for labels in itertools.product(range(k), repeat=C):
        e = sum(D[c, labels[c]] for c in range(C)) + sum(
            V[labels[c], labels[c + 1]] for c in range(C - 1))
        if e < best:
            best, best_l = e, labels
    return np.array(best_l), best


def test_jax_dp_matches_brute_force(rng):
    D, V = _random_problem(rng, C=8, k=3)
    expected, e_best = _brute_force(D, V)
    got = np.asarray(chain_map_labeling(D.astype(np.float32),
                                        V.astype(np.float32)))
    e_got = chain_energy_cpp(D, V, got)
    np.testing.assert_allclose(e_got, e_best, rtol=1e-6)


def test_cpp_viterbi_matches_jax(rng):
    for _ in range(5):
        D, V = _random_problem(rng)
        jl = np.asarray(chain_map_labeling(D.astype(np.float32),
                                           V.astype(np.float32)))
        cl = chain_viterbi_cpp(D, V)
        # both must be exact MAP ⇒ equal energies (labelings may tie)
        np.testing.assert_allclose(chain_energy_cpp(D, V, jl),
                                   chain_energy_cpp(D, V, cl), rtol=1e-5)


def test_aexpansion_reaches_dp_energy_on_chain(rng):
    """α-expansion on a chain converges to (near-)optimal energy; with
    λ=0 it equals per-node argmin exactly (the reference's actual
    configuration, adain_rp.py:434)."""
    D, V = _random_problem(rng, lam=0.0)
    ae = aexpansion_chain_cpp(D, V)
    np.testing.assert_array_equal(ae, np.argmin(D, axis=1))

    D, V = _random_problem(rng, lam=0.3)
    ae = aexpansion_chain_cpp(D, V)
    vit = chain_viterbi_cpp(D, V)
    e_ae = chain_energy_cpp(D, V, ae)
    e_vit = chain_energy_cpp(D, V, vit)
    assert e_ae <= e_vit * 1.05 + 1e-9  # local minimum close to optimum


def test_callback_from_jit(rng):
    import jax
    import jax.numpy as jnp
    D, V = _random_problem(rng, C=16, k=3)

    @jax.jit
    def f(D, V):
        return chain_labeling_callback(D, V)

    got = np.asarray(f(jnp.asarray(D), jnp.asarray(V)))
    expected = chain_viterbi_cpp(D, V)
    np.testing.assert_allclose(chain_energy_cpp(D, V, got),
                               chain_energy_cpp(D, V, expected), rtol=1e-5)
