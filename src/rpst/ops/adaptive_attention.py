"""Blockwise (flash-style) adaptive re-weighted attention for
``dynamic_sanet``; reference ``network/sanet.py:26-71, 100-138``.

The reference's AdaptiveSANetAttention materializes TWO dense (HWc, HWs)
matrices per module: the channel-cosine affinity (input to the AEA
threshold MLP) and the softmax attention it re-weights.  At 1024px,
relu4_1 gives HW = 16384 — a 1 GB f32 matrix per image per copy — the
O(HW²) wall the static family already solved with flash attention
(``ops/pallas/flash_attention.py``).

Two structural observations make the adaptive family streamable:

1. **The threshold MLP factorizes.**  ``psi0`` is a *linear* map over
   affinity rows, and an affinity row is itself linear in the style
   factor: ``A[p, q] = ĉ_p · ŝ_q`` (channel-L2-normalized features), so

       psi0(A)[p] = A[p] @ W0 + b0 = ĉ_p @ (ŝᵀ W0) + b0.

   ``M = ŝᵀ W0`` is a (C, K) matrix computed once per style — the
   (HWc, HWs) affinity never exists.  The nonlinearities (leaky-relu,
   psi1, sigmoid/tanh) all act on the (HWc, K) result.  This drops the
   threshold branch from O(HWc·HWs·(C+K)) FLOPs + O(HW²) memory to
   O((HWc+HWs)·C·K) FLOPs + O(HW·K) memory.

2. **The re-weighting is row-local.**  Given the per-query threshold
   ``c_p``, the output row

       O[p] = Σ_q w(P[p, q], c_p) · H[q],   P = softmax_q(F·Gᵀ)

   depends only on query row p (AEA: ``w = σ(scale·(P − c))``;
   AEALRelu: ``w = softmax_q(relu(P − c))``), so query blocks stream
   independently: one (BQ, HWs) score slab at a time, softmax + epilogue
   + value matmul fused by XLA, O(BQ·HWs) live memory.

``jax.checkpoint`` on the block body keeps training memory at the same
O(BQ·HWs): the backward re-computes the slab instead of saving the
per-block probability/weight intermediates that ``lax.scan`` autodiff
would otherwise stash (which would re-materialize the full HW² again).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def adaptive_reweighted_attention(F, G, H, clamp, variant: str = "aea",
                                  scale_value: float = 50.0,
                                  block_q: int = 512):
    """O[p] = Σ_q w(softmax_q(F·Gᵀ)[p, q], c_p)·H[q], streamed.

    F: (N, HWc, C) queries; G, H: (N, HWs, C) keys/values;
    clamp: (N, HWc, 1) per-query thresholds.
    variant "aea": w = sigmoid(scale_value·(P − c))   (sanet.py:44-46)
    variant "aea_lrelu": w = softmax_q(relu(P − c))   (sanet.py:68-70)

    Equals the dense path up to reassociation (the AEALRelu softmax here
    skips max-subtraction — relu(P − c) is bounded by 1, so exp is safe).
    Returns (N, HWc, C) in H.dtype.
    """
    if variant not in ("aea", "aea_lrelu"):
        raise ValueError(f"unknown adaptive attention variant {variant!r}")

    n, p_n, c = F.shape
    bq = min(block_q, p_n)
    pad = (-p_n) % bq
    Fp = jnp.pad(F, ((0, 0), (0, pad), (0, 0)))
    cp = jnp.pad(clamp, ((0, 0), (0, pad), (0, 0)))
    nb = (p_n + pad) // bq
    Fb = Fp.reshape(n, nb, bq, c)
    cb = cp.reshape(n, nb, bq, 1)

    def _one(Fbs, cbs, Gm, Hm):
        def body(carry, xs):
            fb, cl = xs  # (bq, c), (bq, 1)
            s = jax.lax.dot_general(
                fb, Gm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (bq, HWs)
            lse = jax.scipy.special.logsumexp(s, axis=-1, keepdims=True)
            prob = jnp.exp(s - lse)
            if variant == "aea":
                w = jax.nn.sigmoid(scale_value * (prob - cl))
                o = jax.lax.dot_general(
                    w.astype(Hm.dtype), Hm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                e = jnp.exp(jnp.maximum(prob - cl, 0.0))
                o = jax.lax.dot_general(
                    e.astype(Hm.dtype), Hm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = o / jnp.sum(e, axis=-1, keepdims=True)
            return carry, o.astype(Hm.dtype)

        _, ob = jax.lax.scan(jax.checkpoint(body), None, (Fbs, cbs))
        return ob.reshape(-1, Fbs.shape[-1])

    out = jax.vmap(_one, in_axes=(0, 0, 0, 0))(Fb, cb, G, H)
    return out[:, :p_n]
