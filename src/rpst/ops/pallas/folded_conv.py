"""Fused Pallas kernel: reflect-ring pad + 3x3 folded conv + bias + lrelu.

The XLA folded path (``rpst.ops.folded``) materializes a ring-padded copy
of every activation (~70 MB of HBM traffic per layer at 512px/b1-folded);
this kernel reads x once and writes y once:

  * x stays in HBM; row slabs (block + 1-row halo) are DMA'd into VMEM
    with cross-grid-step double buffering — while block t is being
    convolved, block t+1's slab is already in flight;
  * the reflect ring *rows* arrive as a tiny precomputed (N, 2, W, 4C)
    VMEM input (``ops.folded._row_ring`` — two rows, negligible) and are
    spliced into the boundary blocks' windows **in the value domain**;
    nothing is ever stored into the DMA'd scratch buffer;
  * the reflect ring *columns* are built with full-width lane selects —
    folding turns reflection into channel-block selects;
  * the 3x3 conv runs as 9 MXU matmuls (BR·W, 4C)·(4C, 4Co) accumulated
    in f32 over three column-shifted slabs, bias + LeakyReLU fused into
    the epilogue.

History (2026-08-17): the round-1 version stored the ring rows into the
DMA'd scratch under ``pl.when`` — it passed every interpret-mode test but
**mis-lowered on real hardware** (the top ring select produced wrong
values for one sub-row block across the full width; caught by on-device
diffing — ``tools/hw_kernel_check.py``). An Element-halo reformulation
(caller pre-pads ring rows, Mosaic streams overlapping windows) was exact
but cost ~11% at batch 8: the XLA concat materializes a full padded copy
per layer (``allow_input_fusion`` did not elide it). This version keeps
the zero-copy DMA and moves the ring splice into values. Never trust
interpret mode alone for kernels with manual DMA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(block_rows: int, num_blocks: int, N: int, H: int, W: int,
                 C4: int):
    C = C4 // 4
    BR = block_rows
    total = N * num_blocks

    def kernel(x_hbm, rings_ref, k_ref, b_ref, o_ref, scratch, sem):
        n = pl.program_id(0)
        i = pl.program_id(1)
        t = n * num_blocks + i

        # ---- double-buffered slab DMA: scratch row s of slot holds folded
        # row r0 - 1 + s; boundary blocks fetch one fewer halo row (the
        # ring rows come from rings_ref instead). ----
        def slab_dma(slot, n2, i2, action):
            r0 = i2 * BR

            def cp(src_row, dst_row, rows):
                c = pltpu.make_async_copy(
                    x_hbm.at[n2, pl.ds(src_row, rows)],
                    scratch.at[slot, pl.ds(dst_row, rows)],
                    sem.at[slot])
                c.start() if action == "start" else c.wait()

            if num_blocks == 1:
                cp(0, 1, BR)
                return

            @pl.when(i2 == 0)
            def _():
                cp(0, 1, BR + 1)

            @pl.when(i2 == num_blocks - 1)
            def _():
                cp(r0 - 1, 0, BR + 1)

            @pl.when(jnp.logical_and(i2 > 0, i2 < num_blocks - 1))
            def _():
                cp(r0 - 1, 0, BR + 2)

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _():  # warm-up: first slab fetched synchronously
            slab_dma(0, 0, 0, "start")

        n_next = n + (i + 1) // num_blocks
        i_next = jax.lax.rem(i + 1, num_blocks)

        @pl.when(t + 1 < total)
        def _():  # prefetch next block's slab into the other slot
            slab_dma(jax.lax.rem(t + 1, 2), n_next, i_next, "start")

        slab_dma(slot, n, i, "wait")

        slab = scratch[slot]  # (BR+2, W, C4); boundary halo rows unset

        # ---- splice the precomputed ring rows in the value domain:
        # row 0 of the first block / row BR+1 of the last block come from
        # rings_ref; every other row from the DMA'd slab. (No stores into
        # scratch — see module history.) ----
        row = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, 1), 0)
        top = jnp.where(jnp.logical_and(i == 0, row == 0),
                        rings_ref[0, 0][None], slab)
        slab = jnp.where(jnp.logical_and(i == num_blocks - 1, row == BR + 1),
                         rings_ref[0, 1][None], top)

        # ---- column-shifted slabs with reflect ring columns ----
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, C4), 2)
        subcol0 = ((lane1 // C) % 2) == 0  # sub-col-0 channel blocks
        left_ring = jnp.where(subcol0, slab[:, 1:2], slab[:, 0:1])
        x_m1 = jnp.concatenate([left_ring, slab[:, :W - 1]], axis=1)
        right_ring = jnp.where(subcol0, slab[:, W - 1:W], slab[:, W - 2:W - 1])
        x_p1 = jnp.concatenate([slab[:, 1:], right_ring], axis=1)

        # ---- 9-tap conv as MXU matmuls, f32 accumulation ----
        c4o = k_ref.shape[-1]
        acc = jnp.zeros((BR * W, c4o), jnp.float32)
        for dc, sl in ((0, x_m1), (1, slab), (2, x_p1)):
            for dr in range(3):
                window = sl[dr:dr + BR]  # static row slice (untiled dim)
                acc += jax.lax.dot_general(
                    window.reshape(BR * W, C4), k_ref[dr, dc],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        y = acc + b_ref[0].astype(jnp.float32)
        y = jnp.where(y >= 0, y, 0.2 * y)
        o_ref[0] = y.reshape(BR, W, c4o).astype(o_ref.dtype)

    return kernel


def _shrink_block_rows(h, w, c4, c4o, isz, block_rows, out_isz=None):
    out_isz = isz if out_isz is None else out_isz

    def vmem_bytes(br):
        slab = (br + 2) * w * c4 * isz
        return (2 * slab          # double-buffered DMA scratch
                + 2 * slab        # x_m1/x_p1 shifted copies
                + slab            # ring-spliced slab
                + 4 * br * w * c4o            # f32/i32 accumulator
                + 2 * br * w * c4o * out_isz)  # double-buffered out block

    while h % block_rows or (block_rows > 8
                             and vmem_bytes(block_rows) > 11 * 2**20):
        block_rows //= 2
    return max(block_rows, 1)


def fused_folded_conv(x_f: jnp.ndarray, folded_kernel: jnp.ndarray,
                      folded_bias: jnp.ndarray, block_rows: int = 16,
                      interpret: bool = False) -> jnp.ndarray:
    """lrelu(folded_reflect_conv(x_f) + bias) for NHWC folded tensors.

    x_f: (N, H, W, 4C); folded_kernel: (3, 3, 4C, 4Co) (see
    ``ops.folded.fold_conv_kernel``); folded_bias: (4Co,). block_rows is
    shrunk to a divisor of H automatically."""
    from ..folded import _row_ring

    n, h, w, c4 = x_f.shape
    c4o = folded_kernel.shape[-1]
    block_rows = _shrink_block_rows(h, w, c4, c4o, x_f.dtype.itemsize,
                                    block_rows)
    num_blocks = h // block_rows

    rings = jnp.concatenate([_row_ring(x_f, True), _row_ring(x_f, False)],
                            axis=1)  # (N, 2, W, C4)
    kernel = _make_kernel(block_rows, num_blocks, n, h, w, c4)
    return pl.pallas_call(
        kernel,
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, 2, w, c4), lambda n_, i_: (n_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c4, c4o), lambda n_, i_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4o), lambda n_, i_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, w, c4o),
                               lambda n_, i_: (n_, i_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c4o), x_f.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows + 2, w, c4), x_f.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x_f, rings, folded_kernel, folded_bias.reshape(1, -1))

