"""Int8 variant of the fused folded conv kernel (quantized serving path).

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS) and the folded
flagship is MXU-compute-bound at batch >= 4 (BASELINE.md), so symmetric
per-tensor-activation x per-channel-weight int8 halves the dominant cost;
int8 activations also halve inter-layer HBM traffic.  Same structure as
``folded_conv.py`` (zero-copy double-buffered slab DMA, precomputed ring
rows spliced in the value domain — see that module's history note on why
ring rows are never stored into the DMA'd scratch — value-domain reflect
ring columns, 9 MXU matmuls) with an int32 accumulator and a fused
dequantize->bias->lrelu->requantize epilogue.

Scales are static (post-training calibration over sample batches — see
``rpst.models.fast_path_q8.calibrate_multi_adain_q8``), the standard PTQ
serving recipe.  Weights are quantized per output channel; activations
per tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .folded_conv import _shrink_block_rows


# Measurement-only switch (see the kernel's TIMING_STUB branch): bounds
# the fused epilogue's cost by replacing it with a 2-op cast. WRONG
# numerics — only the tools/hw timing runners may flip it.
TIMING_STUB = False

# Measurement-only switch: skip the 9 MXU matmuls (acc = a cheap cast of
# one slab window), keeping DMA + ring selects + epilogue + stores.  The
# b8 time under this stub bounds the non-MXU share of the kernel — the
# round-4 bound-localization experiment (VERDICT r3 item 1).  WRONG
# numerics — only the tools/hw timing runners may flip it.
STUB_NOMXU = False

# Cross-grid-step DMA pipeline depth (slabs in flight = depth - 1).
# Default 2 (double buffering); the hw A/B sweeps 3 to test whether slab
# DMA latency serializes behind compute at depth 2.
DMA_DEPTH_DEFAULT = 2

# Ring rows via DMA instead of value-domain splices.  The 2026-08-20
# bound hunt measured ~85% of the kernel's time OUTSIDE the MXU matmuls
# (nomxu stub +17.6%, dma3 +1%, epilogue +5.8%) — among the per-step VPU
# costs are TWO full-slab ``jnp.where`` ring splices executed on EVERY
# grid step though they only matter on the 2 boundary blocks.  With
# ``ring_dma`` the rings input stays in HBM and boundary blocks issue a
# second 1-row async copy into the scratch halo slot — a DMA write, NOT
# a kernel vector store (the round-2 mis-lowering class), so the slab
# comes out of scratch ready and the splices disappear.  Exactness is
# gated on-chip (hw_kernel_check.py ring_dma rows).
RING_DMA_DEFAULT = False


def quantize_weights(w: jnp.ndarray):
    """(..., Cout) float -> (int8 weights, (Cout,) f32 scales)."""
    absmax = jnp.max(jnp.abs(w.reshape(-1, w.shape[-1])), axis=0)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_activations(x: jnp.ndarray, scale):
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8)


def _make_kernel(block_rows: int, num_blocks: int, N: int, H: int, W: int,
                 C4: int, out_int8: bool, with_stats: bool = False,
                 wide_k: bool = False, dma_depth: int = 2,
                 ring_dma: bool = False):
    C = C4 // 4
    BR = block_rows
    total = N * num_blocks
    D = dma_depth

    def kernel(x_hbm, rings_ref, k_ref, scale_ref, o_ref, *rest):
        if ring_dma:
            if with_stats:
                s1_ref, s2_ref, scratch, sem, rsem = rest
            else:
                scratch, sem, rsem = rest
        elif with_stats:
            s1_ref, s2_ref, scratch, sem = rest
            rsem = None
        else:
            scratch, sem = rest
            rsem = None
        n = pl.program_id(0)
        i = pl.program_id(1)
        t = n * num_blocks + i

        def slab_dma(slot, n2, i2, action):
            r0 = i2 * BR

            def cp(src_row, dst_row, rows):
                c = pltpu.make_async_copy(
                    x_hbm.at[n2, pl.ds(src_row, rows)],
                    scratch.at[slot, pl.ds(dst_row, rows)],
                    sem.at[slot])
                c.start() if action == "start" else c.wait()

            def ring_cp(ring_row, dst_row):
                # halo row straight from the rings HBM array into the
                # scratch slot's boundary row — a DMA write, not a kernel
                # vector store (see module history / RING_DMA_DEFAULT)
                c = pltpu.make_async_copy(
                    rings_ref.at[n2, pl.ds(ring_row, 1)],
                    scratch.at[slot, pl.ds(dst_row, 1)],
                    rsem.at[slot])
                c.start() if action == "start" else c.wait()

            if num_blocks == 1:
                cp(0, 1, BR)
                if ring_dma:
                    ring_cp(0, 0)
                    ring_cp(1, BR + 1)
                return

            @pl.when(i2 == 0)
            def _():
                cp(0, 1, BR + 1)
                if ring_dma:
                    ring_cp(0, 0)

            @pl.when(i2 == num_blocks - 1)
            def _():
                cp(r0 - 1, 0, BR + 1)
                if ring_dma:
                    ring_cp(1, BR + 1)

            @pl.when(jnp.logical_and(i2 > 0, i2 < num_blocks - 1))
            def _():
                cp(r0 - 1, 0, BR + 2)

        slot = jax.lax.rem(t, D)

        @pl.when(t == 0)
        def _():  # warm-up: blocks 0..D-2 fetched into slots 0..D-2
            # bound by total: with dma_depth 3 and a single grid step
            # (N=1, num_blocks=1) an unbounded warm-up would DMA-read
            # x_hbm[1] out of bounds (round-4 ADVICE item 2)
            for j in range(min(D - 1, total)):
                # i2 must be TRACED: with a static block index Pallas
                # statically bounds-checks the slices of the untaken
                # pl.when branches inside slab_dma (observed on-chip
                # 2026-08-20: depth-3 warm-up j=1 tripped the middle
                # branch's r0-1+BR+2 end bound)
                slab_dma(j, j // num_blocks,
                         jnp.int32(j % num_blocks), "start")

        t_pre = t + D - 1  # keep D-1 slabs in flight

        @pl.when(t_pre < total)
        def _():
            slab_dma(jax.lax.rem(t_pre, D), t_pre // num_blocks,
                     jax.lax.rem(t_pre, num_blocks), "start")

        slab_dma(slot, n, i, "wait")

        slab = scratch[slot]  # (BR+2, W, C4) int8; boundary halo unset

        if not ring_dma:
            # ring rows spliced in the value domain (never stored to
            # scratch) — two full-slab selects on EVERY grid step; the
            # ring_dma variant avoids them (boundary rows arrive by DMA)
            row = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, 1), 0)
            top = jnp.where(jnp.logical_and(i == 0, row == 0),
                            rings_ref[0, 0][None], slab)
            slab = jnp.where(
                jnp.logical_and(i == num_blocks - 1, row == BR + 1),
                rings_ref[0, 1][None], top)

        lane1 = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, C4), 2)
        subcol0 = ((lane1 // C) % 2) == 0
        left_ring = jnp.where(subcol0, slab[:, 1:2], slab[:, 0:1])
        x_m1 = jnp.concatenate([left_ring, slab[:, :W - 1]], axis=1)
        right_ring = jnp.where(subcol0, slab[:, W - 1:W], slab[:, W - 2:W - 1])
        x_p1 = jnp.concatenate([slab[:, 1:], right_ring], axis=1)

        c4o = k_ref.shape[-1]
        acc = jnp.zeros((BR * W, c4o), jnp.int32)
        if STUB_NOMXU:
            # measurement-only (WRONG numerics): DMA + ring selects +
            # epilogue + stores without the MXU matmuls — acc comes from
            # a cheap widening cast of the center window so the slab
            # values stay live (zeros on channel-changing layers).
            if C4 == c4o:
                acc = slab[1:1 + BR].reshape(BR * W, C4).astype(jnp.int32)
        elif wide_k:
            # v5e's 2x int8 MXU rate feeds two int8 operands per bf16
            # lane slot ALONG K — a K=128 contraction leaves half the
            # int8 throughput idle.  Stack the three column shifts
            # (already-materialized values; a lane-axis concat of
            # 128-aligned chunks costs no cross-lane shuffles) into one
            # K=3*C4 operand: 3 matmuls instead of 9, each at the full
            # int8 rate.  Bit-exact vs the 9-matmul form (int32 sums
            # reassociate).  The earlier rejected K=384 attempt stacked
            # ROW windows, which are free slices — stacking them only
            # added copies (NOTES.md); columns are the right axis.
            x3 = jnp.concatenate([x_m1, slab, x_p1], axis=-1)
            for dr in range(3):
                acc += jax.lax.dot_general(
                    x3[dr:dr + BR].reshape(BR * W, 3 * C4), k_ref[dr],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        else:
            for dc, sl in ((0, x_m1), (1, slab), (2, x_p1)):
                for dr in range(3):
                    window = sl[dr:dr + BR]
                    acc += jax.lax.dot_general(
                        window.reshape(BR * W, C4), k_ref[dr, dc],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)

        if TIMING_STUB:
            # measurement-only path (numerically WRONG): replaces the
            # ~10-op f32 epilogue with a 2-op cast to bound the
            # epilogue's share of the step on-chip. Never enabled in
            # product code — tools/hw runners flip it around a timing
            # run only.
            if with_stats:
                z = jnp.zeros((1, 1, k_ref.shape[-1]), jnp.float32)
                s1_ref[...] = z
                s2_ref[...] = z
            if out_int8:
                o_ref[0] = (acc >> 7).astype(jnp.int8).reshape(
                    BR, W, k_ref.shape[-1])
            else:
                o_ref[0] = acc.astype(o_ref.dtype).reshape(
                    BR, W, k_ref.shape[-1])
            return

        # epilogue: dequant (x_scale * w_scale per lane) + bias + lrelu
        deq = scale_ref[0]   # (c4o,) f32: x_scale * w_scale
        bias = scale_ref[1]  # (c4o,) f32
        y = acc.astype(jnp.float32) * deq + bias
        y = jnp.where(y >= 0, y, 0.2 * y)
        if with_stats:
            # per-image post-activation channel sums, accumulated across
            # the row blocks into revisited (1, c4o) outputs — the AdaIN
            # statistics come out of the conv for free instead of a
            # separate full-feature reduction pass (measured ~22% of the
            # q8 stylize step at b8)
            bs1 = jnp.sum(y, axis=0, keepdims=True)[None]  # (1, 1, c4o)
            bs2 = jnp.sum(y * y, axis=0, keepdims=True)[None]

            @pl.when(i == 0)
            def _():
                s1_ref[...] = bs1
                s2_ref[...] = bs2

            @pl.when(i > 0)
            def _():
                s1_ref[...] += bs1
                s2_ref[...] += bs2
        if out_int8:
            inv_out = scale_ref[2]  # (c4o,) f32: broadcast 1/out_scale
            q = jnp.clip(jnp.round(y * inv_out), -127, 127)
            o_ref[0] = q.reshape(BR, W, c4o).astype(jnp.int8)
        else:
            o_ref[0] = y.reshape(BR, W, c4o).astype(o_ref.dtype)

    return kernel


# Module default for the wide-K (K=3*C4) contraction. Measured on-chip
# (tools/hw/hw_flagship_ab.py, 2026-08-18, paired A/B, bit-exact): b8
# 556.4 -> 573.3 img/s (+3%), b1 261.9 -> 242.9 (-7%) — so "auto"
# engages it at batch >= 4 only. The +3% also FALSIFIES the K>=256
# int8-rate hypothesis on v5e: had K=128 halved the int8 MXU rate, the
# win would have been ~40%; the folded q8 b8 residual is epilogue/VPU
# cost, not matmul rate (BASELINE.md round-3 addendum).
WIDE_K_DEFAULT: str | bool = "auto"


def fused_folded_conv_q8(x_q: jnp.ndarray, w_q: jnp.ndarray,
                         scales: jnp.ndarray, out_int8: bool,
                         block_rows: int = 16,
                         with_stats: bool = False,
                         interpret: bool = False,
                         wide_k: bool | None = None,
                         dma_depth: int | None = None,
                         ring_dma: bool | None = None):
    """Quantized lrelu(folded_reflect_conv(x) + bias).

    x_q: (N, H, W, 4C) int8; w_q: (3, 3, 4C, 4Co) int8;
    scales: (3, 4Co) f32 rows = [x_scale*w_scale, bias, 1/out_scale]
    (row 2 ignored when ``out_int8=False``). Returns int8 (requantized
    with out_scale) or bf16; with ``with_stats`` returns
    ``(out, s1, s2)`` where s1/s2 are the (N, 4Co) f32 per-image
    post-activation channel sums / squared sums (the exact f32 values,
    pre-requantization — feeding AdaIN stats without a re-read pass)."""
    from ..folded import _row_ring

    n, h, w, c4 = x_q.shape
    c4o = w_q.shape[-1]
    if wide_k is None:
        wide_k = WIDE_K_DEFAULT
    if wide_k == "auto":
        from ...policy import WIDE_K_MIN_BATCH
        wide_k = n >= WIDE_K_MIN_BATCH
    if dma_depth is None:
        dma_depth = DMA_DEPTH_DEFAULT
    if ring_dma is None:
        ring_dma = RING_DMA_DEFAULT
    block_rows = _shrink_block_rows(h, w, c4, c4o, 1, block_rows,
                                    out_isz=1 if out_int8 else 2,
                                    extra_slabs=(3 if wide_k else 0)
                                    + (dma_depth - 2))
    num_blocks = h // block_rows

    rings = jnp.concatenate([_row_ring(x_q, True), _row_ring(x_q, False)],
                            axis=1)  # (N, 2, W, C4) int8
    if wide_k:
        # (3, 3*C4, c4o): K3[dr] = [k[dr,0]; k[dr,1]; k[dr,2]], matching
        # the kernel's lane-stacked [x_m1 | slab | x_p1] operand order
        w_kernel = jnp.concatenate([w_q[:, 0], w_q[:, 1], w_q[:, 2]],
                                   axis=1)
        k_spec = pl.BlockSpec((3, 3 * c4, c4o), lambda n_, i_: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_kernel = w_q
        k_spec = pl.BlockSpec((3, 3, c4, c4o), lambda n_, i_: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    kernel = _make_kernel(block_rows, num_blocks, n, h, w, c4, out_int8,
                          with_stats, wide_k=wide_k, dma_depth=dma_depth,
                          ring_dma=ring_dma)
    out_dtype = jnp.int8 if out_int8 else jnp.bfloat16
    out_specs = pl.BlockSpec((1, block_rows, w, c4o),
                             lambda n_, i_: (n_, i_, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, h, w, c4o), out_dtype)
    if with_stats:
        # (N, 1, c4o) so the (1, 1, c4o) block's last-two dims equal the
        # array dims (the /8 sublane tiling rule exempts exact matches)
        stat_spec = pl.BlockSpec((1, 1, c4o), lambda n_, i_: (n_, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n, 1, c4o), jnp.float32),
                     jax.ShapeDtypeStruct((n, 1, c4o), jnp.float32))
    rings_spec = (pl.BlockSpec(memory_space=pl.ANY) if ring_dma
                  else pl.BlockSpec((1, 2, w, c4),
                                    lambda n_, i_: (n_, 0, 0, 0),
                                    memory_space=pltpu.VMEM))
    scratch_shapes = [
        pltpu.VMEM((dma_depth, block_rows + 2, w, c4), jnp.int8),
        pltpu.SemaphoreType.DMA((dma_depth,)),
    ]
    if ring_dma:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((dma_depth,)))
    res = pl.pallas_call(
        kernel,
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            rings_spec,
            k_spec,
            pl.BlockSpec((3, c4o), lambda n_, i_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x_q, rings, w_kernel, scales)
    if with_stats:
        out, s1, s2 = res
        return out, s1[:, 0], s2[:, 0]
    return res
