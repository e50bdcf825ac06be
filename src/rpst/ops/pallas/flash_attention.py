"""Blockwise (flash-style) softmax attention for SANet on TPU.

The reference SANet materializes the dense HW×HW attention
``S = softmax(FᵀG)`` and computes ``O = H·Sᵀ`` (``network/sanet.py:82-99``).
At 512px, relu4_1 gives HW = 4096 → a 4096² f32 matrix (67 MB) *per image*
— the repo's scaling wall (SURVEY §5 "long-context" note).

This kernel computes ``softmax(Q Kᵀ) V`` blockwise with the standard
running-max/denominator rewrite: Q blocks stream through the grid, K/V
stream through an inner loop, nothing HW×HW ever exists in memory.  Peak
memory drops from O(HW²) to O(HW·C), and the two big matmuls run back to
back on the MXU in bf16 with f32 accumulation.

Differences from classic transformer flash attention: no 1/√d scaling (the
reference applies none), no masking/causality, and Q/K are mean-variance
normalized 1x1-conv outputs (done by the caller).

Training uses a custom VJP whose backward recomputes the attention
blockwise as well (flash backward), so the dense matrix never materializes
in either pass.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int):
    q = q_ref[:]  # (BQ, C)
    n_k = k_ref.shape[0]
    bq = q.shape[0]
    c = v_ref.shape[1]

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(j * block_k, block_k), :]
        v = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (BQ, BK)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, c), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_k // block_k, body, (m0, l0, acc0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _flash_fwd_2d(q, k, v, block_q: int, block_k: int, interpret: bool):
    n_q, c = q.shape
    grid = (n_q // block_q,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k.shape[0], c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v.shape[0], c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_q, c), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _pick_blocks(n_q: int, n_k: int):
    bq = min(512, n_q)
    while n_q % bq:
        bq //= 2
    bk = min(512, n_k)
    while n_k % bk:
        bk //= 2
    return max(bq, 8), max(bk, 8)


def _dense_attention(q, k, v):
    s = jnp.einsum("...qc,...kc->...qk", q, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kc->...qc", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, interpret: bool = False):
    """softmax(Q Kᵀ) V, blockwise.

    q: (..., Nq, C), k/v: (..., Nk, C). Unscaled, unmasked — SANet
    semantics. ``interpret=True`` runs the Pallas interpreter (CPU tests).
    """
    return _flash_fwd_impl(q, k, v, interpret)


def _flash_fwd_impl(q, k, v, interpret):
    *batch, n_q, c = q.shape
    n_k = k.shape[-2]
    if n_q < 16 or n_k < 16 or (n_k % 8) or (n_q % 8):
        return _dense_attention(q, k, v)
    bq, bk = _pick_blocks(n_q, n_k)
    fn = functools.partial(_flash_fwd_2d, block_q=bq, block_k=bk,
                           interpret=interpret)
    for _ in batch:
        fn = jax.vmap(fn)
    return fn(q, k, v)


def _flash_vjp_fwd(q, k, v, interpret):
    return _flash_fwd_impl(q, k, v, interpret), (q, k, v)


def _flash_vjp_bwd(interpret, res, g):
    """Backward via blockwise recomputation (never materializes HW×HW in
    HBM; XLA tiles the einsums). For the model sizes involved this is
    bandwidth-comparable to a hand-written flash backward kernel."""
    q, k, v = res
    s = jnp.einsum("...qc,...kc->...qk", q, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    gv = jnp.einsum("...qk,...qc->...kc", p.astype(g.dtype), g)
    gp = jnp.einsum("...qc,...kc->...qk", g, v).astype(jnp.float32)
    # softmax backward: dS = P * (dP - sum(dP * P))
    ds = p * (gp - jnp.sum(gp * p, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    gq = jnp.einsum("...qk,...kc->...qc", ds, k)
    gk = jnp.einsum("...qk,...qc->...kc", ds, q)
    return gq, gk, gv


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def sanet_attention(F, G, H, interpret: bool = False):
    """SANet core: O[p] = Σ_q softmax_q(FᵀG)[p,q]·H[q]  (sanet.py:87-94).

    F: (N, HWc, C) queries; G, H: (N, HWs, C) keys/values. Returns
    (N, HWc, C)."""
    return flash_attention(F, G, H, interpret)
