"""MAP labeling of a 1-D chain MRF — the labeling problem inside MST.

The reference labels content-feature *channels* with style clusters by
calling PyMaxflow's C++ ``aexpansion_grid`` on a (C, k) data term
(``utils/mst.py:149-158``): a 1-D grid of C nodes with Potts pairwise
costs between adjacent channel indices.

On a chain, the MAP labeling is exactly solvable by dynamic programming
(Viterbi) in O(C·k²) — strictly stronger than α-expansion (which only
approximates on general graphs) and fully on-device via ``lax.scan``
(α-expansion would need a host round-trip per step, as the reference does
with ``.cpu().numpy()``).  A C++ α-expansion implementation is also
provided (``rpst/cpp``) behind ``jax.pure_callback`` for strict parity
runs; the DP path is the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chain_map_labeling(D: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """Exact MAP labels of a chain MRF.

    D: (C, k) per-node label costs; V: (k, k) pairwise costs between
    adjacent nodes. Returns (C,) int32 labels minimizing
    ``sum_c D[c, l_c] + sum_c V[l_c, l_{c+1}]``.
    """
    C, k = D.shape

    def fwd(m_prev, d_c):
        # m_prev: (k,) best cost ending at each label of node c-1
        trans = m_prev[:, None] + V  # (k_prev, k)
        best_prev = jnp.argmin(trans, axis=0)  # (k,)
        m = d_c + jnp.min(trans, axis=0)
        return m, best_prev

    m_final, back = jax.lax.scan(fwd, D[0], D[1:])  # back: (C-1, k)
    last = jnp.argmin(m_final).astype(jnp.int32)

    def bwd(lbl, back_c):
        prev = back_c[lbl].astype(jnp.int32)
        return prev, prev

    _, prev_labels = jax.lax.scan(bwd, last, back, reverse=True)
    return jnp.concatenate([prev_labels, last[None]])


def potts_pairwise(k: int, lam: float, dtype=jnp.float32) -> jnp.ndarray:
    """λ(1 − I) pairwise term (``utils/mst.py:55-59``)."""
    return lam * (jnp.ones((k, k), dtype) - jnp.eye(k, dtype=dtype))
