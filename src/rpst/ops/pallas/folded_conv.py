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
                 C4: int, alpha: float = 0.2):
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
        y = jnp.where(y >= 0, y, alpha * y)
        o_ref[0] = y.reshape(BR, W, c4o).astype(o_ref.dtype)

    return kernel


def _shrink_block_rows(h, w, c4, c4o, isz, block_rows, out_isz=None,
                       min_rows=8, extra_slabs=0):
    """Largest block_rows dividing h whose working set fits scoped VMEM.

    ``min_rows`` floors the VMEM-driven shrink (divisibility still shrinks
    below it).  The bf16 folded kernels and the wide-channel
    standard-layout callers pass 1 — at 2048px (folded W=1024) or 512
    lanes at 512 width even 4-8 row blocks exceed the 16 MB scoped limit,
    and a floored block that doesn't fit fails Mosaic compilation
    outright (observed 2026-08-19: bf16 folded conv at (1, 512, 1024,
    128)).  The int8 folded kernel keeps the historical floor of 8: its
    estimate is marginally pessimistic there (w=1024 estimates 11.8 MB
    yet compiles and runs at BR=8).
    ``extra_slabs`` budgets additional slab-sized values (e.g. the wide-K
    int8 kernel's lane-stacked x3 operand = 3 slabs)."""
    out_isz = isz if out_isz is None else out_isz

    def vmem_bytes(br):
        slab = (br + 2) * w * c4 * isz
        return (2 * slab          # double-buffered DMA scratch
                + 2 * slab        # x_m1/x_p1 shifted copies
                + slab            # ring-spliced slab
                + extra_slabs * slab
                + 4 * br * w * c4o            # f32/i32 accumulator
                + 2 * br * w * c4o * out_isz)  # double-buffered out block

    while h % block_rows or (block_rows > min_rows
                             and vmem_bytes(block_rows) > 11 * 2**20):
        block_rows //= 2
    return max(block_rows, 1)


def _make_bwd_input_kernel(block_rows: int, num_blocks: int, N: int, H: int,
                           W: int, C4: int, row_rings: bool = True):
    """dL/dx of the fused reflect-pad folded conv (no bias/activation —
    the lrelu mask is applied by the caller).

    Interior: SAME-zero conv of gz with the rotated/transposed kernel
    ``khat[r, c] = Kf[2-r, 2-c]^T``.  The reflect-pad transpose then adds
    the ring gradients back onto the interior cells they were read from
    (``ops.folded.folded_reflect_pad`` structure):

      * ring COLUMNS (every block): G[:,  -1] = 1-col conv of gz col 0
        with khat[:, 2]; scatter onto cols 1 (sub-col-0 blocks) and 0
        (sub-col-1 blocks); mirrored on the right;
      * ring ROWS (first/last block): G[-1, :] = 1-row conv of gz row 0
        with khat[2, :] (incl. its corner col entries); scatter onto rows
        1 (sub-row-0 blocks) and 0 (sub-row-1 blocks); mirrored at the
        bottom.

    All corrections are value-domain adds gated by scalar ``jnp.where`` —
    no stores into the DMA scratch (see module history)."""
    BR = block_rows
    total = N * num_blocks

    def kernel(gz_hbm, k_ref, o_ref, scratch, sem):
        n = pl.program_id(0)
        i = pl.program_id(1)
        t = n * num_blocks + i

        def slab_dma(slot, n2, i2, action):
            r0 = i2 * BR

            def cp(src_row, dst_row, rows):
                c = pltpu.make_async_copy(
                    gz_hbm.at[n2, pl.ds(src_row, rows)],
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
        def _():
            slab_dma(0, 0, 0, "start")

        n_next = n + (i + 1) // num_blocks
        i_next = jax.lax.rem(i + 1, num_blocks)

        @pl.when(t + 1 < total)
        def _():
            slab_dma(jax.lax.rem(t + 1, 2), n_next, i_next, "start")

        slab_dma(slot, n, i, "wait")

        slab = scratch[slot]  # (BR+2, W, C4o); boundary halo rows unset
        c4o = slab.shape[-1]
        C = C4 // 4

        # zero halo splice (G is a zero-padded full conv of gz)
        row = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, 1), 0)
        zero = jnp.zeros_like(slab)
        slab = jnp.where(jnp.logical_and(i == 0, row == 0), zero, slab)
        slab = jnp.where(jnp.logical_and(i == num_blocks - 1, row == BR + 1),
                         zero, slab)

        zcol = jnp.zeros_like(slab[:, :1])
        gz_m1 = jnp.concatenate([zcol, slab[:, :W - 1]], axis=1)
        gz_p1 = jnp.concatenate([slab[:, 1:], zcol], axis=1)

        # interior: 9-tap SAME-zero conv with khat
        acc = jnp.zeros((BR * W, C4), jnp.float32)
        for dc, sl in ((0, gz_m1), (1, slab), (2, gz_p1)):
            for dr in range(3):
                window = sl[dr:dr + BR]
                acc += jax.lax.dot_general(
                    window.reshape(BR * W, c4o), k_ref[dr, dc],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = acc.reshape(BR, W, C4)

        # channel-block masks over the OUTPUT (C4) lanes
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C4), 2)
        blk = (lane // C) % 4
        blk_sj0 = (blk % 2) == 0   # sub-col-0 blocks {0, 2}
        blk_sj1 = jnp.logical_not(blk_sj0)
        blk_si0 = (blk // 2) == 0  # sub-row-0 blocks {0, 1}
        blk_si1 = jnp.logical_not(blk_si0)

        # --- ring-column transpose (every block, rows a = i+1) ---
        colL = jnp.zeros((BR, C4), jnp.float32)
        colR = jnp.zeros((BR, C4), jnp.float32)
        for dr in range(3):
            win = slab[dr:dr + BR]
            colL += jax.lax.dot_general(
                win[:, 0], k_ref[dr, 2], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            colR += jax.lax.dot_general(
                win[:, W - 1], k_ref[dr, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
        acc = acc + jnp.where((col == 1) & blk_sj0, colL[:, None, :], 0.0)
        acc = acc + jnp.where((col == 0) & blk_sj1, colL[:, None, :], 0.0)
        acc = acc + jnp.where((col == W - 1) & blk_sj0, colR[:, None, :], 0.0)
        acc = acc + jnp.where((col == W - 2) & blk_sj1, colR[:, None, :], 0.0)

        # --- ring-row transpose (first/last block) ---
        def ring_row(gz_row, krow):
            """(W+2)-wide 1-row conv of one gz row folded back to width W
            with its own corner-column scatter; returns (W, C4) f32."""
            g_m1 = jnp.concatenate([jnp.zeros_like(gz_row[:1]),
                                    gz_row[:W - 1]], axis=0)
            g_p1 = jnp.concatenate([gz_row[1:],
                                    jnp.zeros_like(gz_row[:1])], axis=0)
            mid = jnp.zeros((W, C4), jnp.float32)
            for dc, g in ((0, g_m1), (1, gz_row), (2, g_p1)):
                mid += jax.lax.dot_general(
                    g, k_ref[krow, dc], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            corner0 = jax.lax.dot_general(
                gz_row[0:1], k_ref[krow, 2], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cornerW = jax.lax.dot_general(
                gz_row[W - 1:W], k_ref[krow, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m2 = blk_sj0[0], blk_sj1[0]  # (1, C4) masks
            colv = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
            mid = mid + jnp.where((colv == 1) & m2[0], corner0, 0.0)
            mid = mid + jnp.where((colv == 0) & m2[1], corner0, 0.0)
            mid = mid + jnp.where((colv == W - 1) & m2[0], cornerW, 0.0)
            mid = mid + jnp.where((colv == W - 2) & m2[1], cornerW, 0.0)
            return mid

        if row_rings:
            # top: G[-1] from gz row 0 (slab row 1 on the first block)
            top_ring = ring_row(slab[1], 2)[None]  # (1, W, C4)
            rloc = jax.lax.broadcasted_iota(jnp.int32, (BR, 1, 1), 0)
            first = i == 0
            acc = acc + jnp.where(first & (rloc == 1) & blk_si0,
                                  top_ring, 0.0)
            acc = acc + jnp.where(first & (rloc == 0) & blk_si1,
                                  top_ring, 0.0)
            # bottom: G[H] from gz row H-1 (slab row BR on the last block)
            bot_ring = ring_row(slab[BR], 0)[None]
            last = i == num_blocks - 1
            acc = acc + jnp.where(last & (rloc == BR - 1) & blk_si0,
                                  bot_ring, 0.0)
            acc = acc + jnp.where(last & (rloc == BR - 2) & blk_si1,
                                  bot_ring, 0.0)
        # row_rings=False (spatially sharded caller): the gradients w.r.t.
        # the two virtual boundary rows are returned separately by
        # ``fused_folded_conv_ring_grads`` and routed by the caller —
        # reflect-scatter locally only at the GLOBAL image boundary,
        # ppermute to the neighbor shard's edge rows otherwise.

        o_ref[0] = acc.astype(o_ref.dtype)

    return kernel


def fused_folded_conv_grad_input(gz: jnp.ndarray, khat: jnp.ndarray,
                                 block_rows: int = 16,
                                 interpret: bool = False,
                                 row_rings: bool = True) -> jnp.ndarray:
    """dL/dx_f for ``fused_folded_conv`` given gz = dL/d(pre-activation).

    gz: (N, H, W, 4Co); khat: (3, 3, 4Co, 4C) =
    ``transpose(kf[::-1, ::-1], (0, 1, 3, 2))``. Returns (N, H, W, 4C).

    ``row_rings=False`` skips the top/bottom reflect-row adjoint scatter
    (the ring-COLUMN adjoint still applies — columns are never sharded);
    spatially sharded callers recover the virtual-row gradients via
    ``fused_folded_conv_ring_grads`` and route them through the halo
    exchange's transpose instead."""
    n, h, w, c4o = gz.shape
    c4 = khat.shape[-1]
    block_rows = _shrink_block_rows(h, w, c4o, c4, gz.dtype.itemsize,
                                    block_rows, min_rows=1)
    num_blocks = h // block_rows
    kernel = _make_bwd_input_kernel(block_rows, num_blocks, n, h, w, c4,
                                    row_rings=row_rings)
    return pl.pallas_call(
        kernel,
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # gz stays in HBM
            pl.BlockSpec((3, 3, c4o, c4), lambda n_, i_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, w, c4),
                               lambda n_, i_: (n_, i_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c4), gz.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows + 2, w, c4o), gz.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(gz, khat)


def _make_bwd_weight_kernel(block_rows: int, num_blocks: int, N: int, H: int,
                            W: int, C4: int):
    """dL/dKf and dL/db: the folded correlation.  Reuses the forward's
    ring-spliced slab structure for x (identical windows = Px), pairing
    each of the 9 taps with the gz block via a transposed MXU matmul
    accumulated into a single revisited (3, 3, 4C, 4Co) f32 output."""
    C = C4 // 4
    BR = block_rows
    total = N * num_blocks

    def kernel(x_hbm, rings_ref, gz_ref, dk_ref, db_ref, scratch, sem):
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
        def _():
            slab_dma(0, 0, 0, "start")
            dk_ref[...] = jnp.zeros_like(dk_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        n_next = n + (i + 1) // num_blocks
        i_next = jax.lax.rem(i + 1, num_blocks)

        @pl.when(t + 1 < total)
        def _():
            slab_dma(jax.lax.rem(t + 1, 2), n_next, i_next, "start")

        slab_dma(slot, n, i, "wait")

        slab = scratch[slot]  # (BR+2, W, C4)

        # ring splice — identical to the forward kernel
        row = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, 1), 0)
        top = jnp.where(jnp.logical_and(i == 0, row == 0),
                        rings_ref[0, 0][None], slab)
        slab = jnp.where(jnp.logical_and(i == num_blocks - 1, row == BR + 1),
                         rings_ref[0, 1][None], top)

        lane1 = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, C4), 2)
        subcol0 = ((lane1 // C) % 2) == 0
        left_ring = jnp.where(subcol0, slab[:, 1:2], slab[:, 0:1])
        x_m1 = jnp.concatenate([left_ring, slab[:, :W - 1]], axis=1)
        right_ring = jnp.where(subcol0, slab[:, W - 1:W], slab[:, W - 2:W - 1])
        x_p1 = jnp.concatenate([slab[:, 1:], right_ring], axis=1)

        gz = gz_ref[0].reshape(BR * W, -1)  # (BR*W, C4o)
        for dc, sl in ((0, x_m1), (1, slab), (2, x_p1)):
            for dr in range(3):
                window = sl[dr:dr + BR].reshape(BR * W, C4)
                dk_ref[dr, dc] += jax.lax.dot_general(
                    window, gz, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        db_ref[...] += jnp.sum(gz.astype(jnp.float32), axis=0, keepdims=True)

    return kernel


def fused_folded_conv_grad_weight(x_f: jnp.ndarray, gz: jnp.ndarray,
                                  block_rows: int = 16,
                                  interpret: bool = False,
                                  rings: jnp.ndarray | None = None):
    """(dL/dKf (3,3,4C,4Co) f32, dL/db (4Co,) f32) for the fused conv.

    ``rings`` must be the SAME virtual boundary rows the forward used —
    defaults to the reflect ring; a spatially sharded caller passes the
    neighbor-shard halo rows it convolved with."""
    from ..folded import _row_ring

    n, h, w, c4 = x_f.shape
    c4o = gz.shape[-1]
    block_rows = _shrink_block_rows(h, w, c4, c4o, x_f.dtype.itemsize,
                                    block_rows, min_rows=1)
    num_blocks = h // block_rows
    if rings is None:
        rings = jnp.concatenate([_row_ring(x_f, True),
                                 _row_ring(x_f, False)], axis=1)
    rings = rings.astype(x_f.dtype)
    kernel = _make_bwd_weight_kernel(block_rows, num_blocks, n, h, w, c4)
    dk, db = pl.pallas_call(
        kernel,
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, 2, w, c4), lambda n_, i_: (n_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, w, c4o),
                         lambda n_, i_: (n_, i_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, 3, c4, c4o), lambda n_, i_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4o), lambda n_, i_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((3, 3, c4, c4o), jnp.float32),
                   jax.ShapeDtypeStruct((1, c4o), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows + 2, w, c4), x_f.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x_f, rings, gz)
    return dk, db[0]


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def folded_conv_act(alpha, x_f, folded_kernel, folded_bias):
    """Differentiable fused reflect-pad + folded conv + bias + leaky-relu
    (``alpha`` = negative slope; 0.0 gives plain ReLU for the VGG path).

    Forward is ``fused_folded_conv``; backward runs the Pallas kernel
    pair above (one HBM read + one write per tensor per direction —
    the XLA ring path materializes a padded copy each way).  The
    activation mask is recovered from the saved OUTPUT (leaky-relu with
    slope >= 0 is sign-preserving; for alpha == 0 the masked-off lanes
    are exactly zero and g*alpha kills them either way), so residuals
    are just (x, kernel, y)."""
    return fused_folded_conv(x_f, folded_kernel, folded_bias, alpha=alpha)


def _folded_conv_act_fwd(alpha, x_f, folded_kernel, folded_bias):
    y = fused_folded_conv(x_f, folded_kernel, folded_bias, alpha=alpha)
    return y, (x_f, folded_kernel, y)


def _folded_conv_act_bwd(alpha, res, g):
    x_f, kf, y = res
    gz = jnp.where(y > 0, g, g * alpha)  # one fused XLA elementwise pass
    khat = jnp.transpose(kf[::-1, ::-1], (0, 1, 3, 2))
    dx = fused_folded_conv_grad_input(gz, khat)
    dk, db = fused_folded_conv_grad_weight(x_f, gz)
    return dx, dk.astype(kf.dtype), db.astype(kf.dtype)


folded_conv_act.defvjp(_folded_conv_act_fwd, _folded_conv_act_bwd)


def folded_conv_lrelu(x_f, folded_kernel, folded_bias):
    return folded_conv_act(0.2, x_f, folded_kernel, folded_bias)


def folded_conv_relu(x_f, folded_kernel, folded_bias):
    return folded_conv_act(0.0, x_f, folded_kernel, folded_bias)


def fused_folded_conv_ring_grads(gz: jnp.ndarray, khat: jnp.ndarray):
    """Gradients w.r.t. the two virtual boundary rows of
    ``fused_folded_conv`` (its ``rings`` input): (d_above, d_below), each
    (N, 1, W, 4C) f32.

    Plain-XLA replication of the bwd kernel's ``ring_row`` math: the
    virtual row above contributes to output row 0 through the khat[2]
    taps (after rotation), including the corner sub-column scatter —
    the virtual row's own reflect ring COLUMNS were derived from it in
    the forward's value-domain column shifts.  Cost: 2 rows × 3 matmuls
    per image — negligible next to the slab conv."""
    n, h, w, c4o = gz.shape
    c4 = khat.shape[-1]
    c = c4 // 4
    lane = jnp.arange(c4)
    subcol0 = (((lane // c) % 2) == 0)[None, None]        # (1, 1, C4)
    col = jnp.arange(w)[None, :, None]                     # (1, W, 1)

    def ring_grad(gz_row, krow):
        """gz_row (N, W, C4o), khat row index krow -> (N, W, C4) f32."""
        g = gz_row.astype(jnp.float32)
        kr = khat[krow].astype(jnp.float32)                # (3, C4o, C4)
        zero = jnp.zeros_like(g[:, :1])
        g_m1 = jnp.concatenate([zero, g[:, :w - 1]], axis=1)
        g_p1 = jnp.concatenate([g[:, 1:], zero], axis=1)
        mid = (jnp.einsum("nwc,ck->nwk", g_m1, kr[0])
               + jnp.einsum("nwc,ck->nwk", g, kr[1])
               + jnp.einsum("nwc,ck->nwk", g_p1, kr[2]))
        corner0 = jnp.einsum("nwc,ck->nwk", g[:, 0:1], kr[2])  # (N,1,C4)
        cornerW = jnp.einsum("nwc,ck->nwk", g[:, w - 1:w], kr[0])
        mid = mid + jnp.where((col == 1) & subcol0, corner0, 0.0)
        mid = mid + jnp.where((col == 0) & ~subcol0, corner0, 0.0)
        mid = mid + jnp.where((col == w - 1) & subcol0, cornerW, 0.0)
        mid = mid + jnp.where((col == w - 2) & ~subcol0, cornerW, 0.0)
        return mid

    d_above = ring_grad(gz[:, 0], 2)[:, None]
    d_below = ring_grad(gz[:, h - 1], 0)[:, None]
    return d_above, d_below


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def folded_conv_act_halo(alpha, interpret, x_f, folded_kernel, folded_bias,
                         above, below):
    """Differentiable fused folded conv for an H-SHARD: the two virtual
    boundary rows come in as explicit ``above``/``below`` inputs (each
    (N, 1, W, 4C)) instead of the implicit reflect ring, and the VJP
    returns their gradients.

    This is the trainable core of spatially sharded folded execution
    (models/fast_path_spatial.py): the caller builds above/below with
    ``_halo_rows`` (ppermute from neighbors; reflect ring at the global
    edges) — all differentiable primitives — so autodiff of the enclosing
    shard_map routes these cotangents through the ppermute transpose to
    the neighbor's edge rows, and through ``_row_ring``'s transpose into
    the reflect-pad adjoint at the global boundary.  The dx returned here
    therefore carries NO row-ring scatter (``row_rings=False``); the
    column-ring adjoint stays in-kernel (columns are never sharded)."""
    rings = jnp.concatenate([above, below], axis=1).astype(x_f.dtype)
    return fused_folded_conv(x_f, folded_kernel, folded_bias, alpha=alpha,
                             interpret=interpret, rings=rings)


def _folded_conv_act_halo_fwd(alpha, interpret, x_f, folded_kernel,
                              folded_bias, above, below):
    y = folded_conv_act_halo(alpha, interpret, x_f, folded_kernel,
                             folded_bias, above, below)
    return y, (x_f, folded_kernel, y, above, below)


def _folded_conv_act_halo_bwd(alpha, interpret, res, g):
    x_f, kf, y, above, below = res
    gz = jnp.where(y > 0, g, g * alpha)
    khat = jnp.transpose(kf[::-1, ::-1], (0, 1, 3, 2))
    dx = fused_folded_conv_grad_input(gz, khat, interpret=interpret,
                                      row_rings=False)
    d_above, d_below = fused_folded_conv_ring_grads(gz, khat)
    rings = jnp.concatenate([above, below], axis=1).astype(x_f.dtype)
    dk, db = fused_folded_conv_grad_weight(x_f, gz, interpret=interpret,
                                           rings=rings)
    return (dx, dk.astype(kf.dtype), db.astype(kf.dtype),
            d_above.astype(above.dtype), d_below.astype(below.dtype))


folded_conv_act_halo.defvjp(_folded_conv_act_halo_fwd,
                            _folded_conv_act_halo_bwd)


def fused_folded_conv(x_f: jnp.ndarray, folded_kernel: jnp.ndarray,
                      folded_bias: jnp.ndarray, block_rows: int = 16,
                      interpret: bool = False,
                      alpha: float = 0.2,
                      rings: jnp.ndarray | None = None) -> jnp.ndarray:
    """lrelu(folded_reflect_conv(x_f) + bias) for NHWC folded tensors.

    x_f: (N, H, W, 4C); folded_kernel: (3, 3, 4C, 4Co) (see
    ``ops.folded.fold_conv_kernel``); folded_bias: (4Co,). block_rows is
    shrunk to a divisor of H automatically.

    ``rings`` overrides the two virtual boundary rows (N, 2, W, 4C) —
    row 0 is read as the row ABOVE x_f, row 1 as the row BELOW.  The
    default is the reflect ring (``ops.folded._row_ring``); a spatially
    sharded caller (models/fast_path_spatial.py) passes neighbor-shard
    edge rows here instead, which makes the same kernel exact on an
    H-shard: interior halos via ppermute, reflect only at the global
    image boundary."""
    from ..folded import _row_ring

    n, h, w, c4 = x_f.shape
    c4o = folded_kernel.shape[-1]
    block_rows = _shrink_block_rows(h, w, c4, c4o, x_f.dtype.itemsize,
                                    block_rows, min_rows=1)
    num_blocks = h // block_rows

    if rings is None:
        rings = jnp.concatenate([_row_ring(x_f, True),
                                 _row_ring(x_f, False)],
                                axis=1)  # (N, 2, W, C4)
    rings = rings.astype(x_f.dtype)
    kernel = _make_kernel(block_rows, num_blocks, n, h, w, c4, alpha)
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

