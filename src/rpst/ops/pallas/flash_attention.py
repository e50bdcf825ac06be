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


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                n_kb: int):
    """Grid = (q_blocks, k_blocks), K fastest-varying. K/V stream through
    pallas's own double-buffered block pipeline; running max/denominator/
    accumulator persist in VMEM scratch across the K sweep — only
    O(block·C) lives on-chip, never (HW, HW)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:]  # (BQ, C)
    k = k_ref[:]  # (BK, C)
    v = v_ref[:]  # (BK, C)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, BK)
    m = m_scr[:]
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new
    acc_scr[:] = acc_new

    @pl.when(j == n_kb - 1)
    def _():
        o_ref[:] = (acc_new / l_new).astype(o_ref.dtype)


def _fwd_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                    acc_scr, *, n_kb: int):
    """Forward that additionally writes the per-row log-sum-exp (replicated
    across 128 lanes — TPU-friendly layout), consumed by the blockwise
    backward kernels."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = m_scr[:]
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new
    acc_scr[:] = acc_new

    @pl.when(j == n_kb - 1)
    def _():
        o_ref[:] = (acc_new / l_new).astype(o_ref.dtype)
        lse_ref[:] = jnp.broadcast_to(m_new + jnp.log(l_new),
                                      lse_ref.shape)


def _flash_fwd_lse_2d(q, k, v, block_q: int, block_k: int, interpret: bool):
    n_q, c = q.shape
    n_k = k.shape[0]
    n_kb = n_k // block_k
    return pl.pallas_call(
        functools.partial(_fwd_kernel_lse, n_kb=n_kb),
        grid=(n_q // block_q, n_kb),
        in_specs=[
            pl.BlockSpec((block_q, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_q, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_q, c), q.dtype),
                   jax.ShapeDtypeStruct((n_q, 128), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(q, k, v)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   acc_scr, *, n_kb: int):
    """dQ = Σ_k dS·K with dS = P ∘ (dO·Vᵀ − Δ), P = exp(QKᵀ − lse).
    Grid (q_blocks, k_blocks), K fastest; dq accumulates in VMEM."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    lse = lse_ref[:, 0:1]
    delta = delta_ref[:, 0:1]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(k.dtype)
    acc_scr[:] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(j == n_kb - 1)
    def _():
        dq_ref[:] = acc_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, n_qb: int):
    """dV = Pᵀ·dO and dK = dSᵀ·Q, accumulated over the Q sweep.
    Grid (k_blocks, q_blocks), Q fastest."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    lse = lse_ref[:, 0:1]
    delta = delta_ref[:, 0:1]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, BK)
    p = jnp.exp(s - lse)
    dv_scr[:] += jax.lax.dot_general(p.astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_scr[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(j == n_qb - 1)
    def _():
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_2d(q, k, v, do, lse, delta, block_q: int, block_k: int,
                  interpret: bool):
    n_q, c = q.shape
    n_k = k.shape[0]
    n_qb, n_kb = n_q // block_q, n_k // block_k

    q_spec_qmaj = pl.BlockSpec((block_q, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    k_spec_qmaj = pl.BlockSpec((block_k, c), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)
    r_spec_qmaj = pl.BlockSpec((block_q, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, n_kb=n_kb),
        grid=(n_qb, n_kb),
        in_specs=[q_spec_qmaj, k_spec_qmaj, k_spec_qmaj, q_spec_qmaj,
                  r_spec_qmaj, r_spec_qmaj],
        out_specs=pl.BlockSpec((block_q, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_q, c), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    q_spec_kmaj = pl.BlockSpec((block_q, c), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)
    k_spec_kmaj = pl.BlockSpec((block_k, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    r_spec_kmaj = pl.BlockSpec((block_q, 128), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, n_qb=n_qb),
        grid=(n_kb, n_qb),
        in_specs=[q_spec_kmaj, k_spec_kmaj, k_spec_kmaj, q_spec_kmaj,
                  r_spec_kmaj, r_spec_kmaj],
        out_specs=[pl.BlockSpec((block_k, c), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block_k, c), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_k, c), k.dtype),
                   jax.ShapeDtypeStruct((n_k, c), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, c), jnp.float32),
                        pltpu.VMEM((block_k, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


def _flash_fwd_2d(q, k, v, block_q: int, block_k: int, interpret: bool):
    n_q, c = q.shape
    n_k = k.shape[0]
    n_kb = n_k // block_k
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_kb=n_kb),
        grid=(n_q // block_q, n_kb),
        in_specs=[
            pl.BlockSpec((block_q, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_q, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(q, k, v)


def _pick_blocks(n_q: int, n_k: int, c: int, itemsize: int):
    """Largest power-of-two blocks that keep the working set well under
    the ~16 MB/core VMEM: q/o/acc rows scale with BQ, double-buffered k/v
    with BK, plus the (BQ, BK) f32 score tile."""
    budget = 10 * 1024 * 1024

    def fits(bq, bk):
        qo = bq * c * (2 * itemsize + 4)          # q + o + f32 acc scratch
        kv = 2 * 2 * bk * c * itemsize            # k, v double-buffered
        s = 4 * bq * bk * 2                       # s + p tiles (f32)
        return qo + kv + s <= budget

    bq = min(512, n_q)
    while n_q % bq:
        bq //= 2
    bk = min(512, n_k)
    while n_k % bk:
        bk //= 2
    while bq > 8 and not fits(bq, bk):
        bq //= 2
    while bk > 8 and not fits(bq, bk):
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


def _eligible(q, k):
    n_q, n_k = q.shape[-2], k.shape[-2]
    return not (n_q < 16 or n_k < 16 or (n_k % 8) or (n_q % 8))


def _flash_fwd_impl(q, k, v, interpret):
    *batch, n_q, c = q.shape
    n_k = k.shape[-2]
    if not _eligible(q, k):
        return _dense_attention(q, k, v)
    bq, bk = _pick_blocks(n_q, n_k, c, q.dtype.itemsize)
    fn = functools.partial(_flash_fwd_2d, block_q=bq, block_k=bk,
                           interpret=interpret)
    for _ in batch:
        fn = jax.vmap(fn)
    return fn(q, k, v)


def _flash_vjp_fwd(q, k, v, interpret):
    if not _eligible(q, k):
        return _dense_attention(q, k, v), (q, k, v, None)
    *batch, n_q, c = q.shape
    bq, bk = _pick_blocks(n_q, k.shape[-2], c, q.dtype.itemsize)
    fn = functools.partial(_flash_fwd_lse_2d, block_q=bq, block_k=bk,
                           interpret=interpret)
    for _ in batch:
        fn = jax.vmap(fn)
    o, lse = fn(q, k, v)
    return o, (q, k, v, (o, lse))


def _dense_bwd(q, k, v, g):
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


def _flash_vjp_bwd(interpret, res, g):
    """Blockwise flash backward: recompute P per (q,k) block from the saved
    log-sum-exp and accumulate dq / dk / dv in VMEM — O(HW·C) memory in the
    backward too (the dense (HW)² gradient matrices never exist in HBM).
    At 512px SANet training that saves ≈67 MB/sample/direction."""
    q, k, v, saved = res
    if saved is None:
        return _dense_bwd(q, k, v, g)
    o, lse = saved
    *batch, n_q, c = q.shape
    # Δ = rowsum(dO ∘ O) — the softmax-backward correction term
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)
    delta = jnp.broadcast_to(delta, (*batch, n_q, 128))
    bq, bk = _pick_blocks(n_q, k.shape[-2], c, q.dtype.itemsize)
    fn = functools.partial(_flash_bwd_2d, block_q=bq, block_k=bk,
                           interpret=interpret)
    for _ in batch:
        fn = jax.vmap(fn)
    return fn(q, k, v, g.astype(q.dtype), lse, delta)


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def sanet_attention(F, G, H, interpret: bool = False):
    """SANet core: O[p] = Σ_q softmax_q(FᵀG)[p,q]·H[q]  (sanet.py:87-94).

    F: (N, HWc, C) queries; G, H: (N, HWs, C) keys/values. Returns
    (N, HWc, C)."""
    return flash_attention(F, G, H, interpret)
