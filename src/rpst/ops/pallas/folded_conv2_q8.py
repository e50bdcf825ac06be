"""Two-layer fused int8 folded conv: conv → lrelu → requant → conv in
ONE Pallas program (round-4 VERDICT item 4).

The r4 bound hunt measured ~85% of the single-layer q8 kernel's time
outside the MXU matmuls — per-invocation DMA traffic and VPU epilogue —
and concluded only fusing whole kernel invocations away was left on the
table (+10-20% estimated).  This kernel executes a PAIR of chained
folded 3x3 reflect convs per row block: layer 1's intermediate rows
live only in VMEM, so the pair costs one input read + two output writes
instead of the unfused read/write/read/write — the intermediate's HBM
READ disappears (both layers' outputs still stream out because the
multiscale decoder consumes every encoder scale, reference
adain_rp.py:286-302).

Exactness: layer 1 computes the same int32 matmuls + f32 epilogue +
requantization as ``fused_folded_conv_q8(out_int8=True)``; layer 2
consumes exactly those int8 rows.  Block-boundary intermediate rows are
recomputed (2 extra rows of layer-1 matmuls per block, +2/BR MXU work —
the MXU is the idle unit) rather than exchanged, so the fused pair is
bit-exact vs two single-layer calls (gated on-chip in
tools/hw_kernel_check.py).

Row-index convention per (n, i) grid step producing BR output rows
(r0 = i*BR):
  * input slab slot k  = padded input row  r0 - 2 + k   (k = 0..BR+3)
  * y1 scratch slot j  = padded y1 row     r0 - 1 + j   (j = 0..BR+1)
where padded row -1 / H are the folded reflect ring rows: layer 1's
come precomputed from the host (``_row_ring``), layer 2's are BUILT
IN-KERNEL from y1 rows 0/1 (H-1/H-2) by the half-lane select that
defines the folded ring (ops/folded.py:143-151) — they cannot come
from the host because y1 never exists there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_select_half(row_a, row_b):
    """Folded ring row: first 2C lanes from ``row_a``, last 2C from
    ``row_b`` ((W, C4) each) — ops/folded.py::_row_ring semantics."""
    c4 = row_a.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, row_a.shape, 1)
    return jnp.where(lane < c4 // 2, row_a, row_b)


def _col_shifts(slab, W, C4):
    """Value-domain reflect ring columns + the three column shifts of a
    (R, W, C4) slab (same construction as folded_conv_q8._make_kernel)."""
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (slab.shape[0], 1, C4), 2)
    subcol0 = ((lane1 // (C4 // 4)) % 2) == 0
    left_ring = jnp.where(subcol0, slab[:, 1:2], slab[:, 0:1])
    x_m1 = jnp.concatenate([left_ring, slab[:, :W - 1]], axis=1)
    right_ring = jnp.where(subcol0, slab[:, W - 1:W], slab[:, W - 2:W - 1])
    x_p1 = jnp.concatenate([slab[:, 1:], right_ring], axis=1)
    return x_m1, slab, x_p1


def _conv9(shifts, rows, off, k_ref, C4):
    """9-matmul 3x3 folded conv over ``rows`` output rows starting at
    window offset ``off`` in the shift arrays; returns (rows*W, c4o)
    int32."""
    W = shifts[1].shape[1]
    c4o = k_ref.shape[-1]
    acc = jnp.zeros((rows * W, c4o), jnp.int32)
    for dc, sl in ((0, shifts[0]), (1, shifts[1]), (2, shifts[2])):
        for dr in range(3):
            window = sl[off + dr:off + dr + rows]
            acc += jax.lax.dot_general(
                window.reshape(rows * W, C4), k_ref[dr, dc],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    return acc


def _make_kernel2(block_rows: int, num_blocks: int, N: int, H: int, W: int,
                  C4: int, C4m: int, out_int8: bool, with_stats: bool,
                  dma_depth: int):
    BR = block_rows
    total = N * num_blocks
    D = dma_depth

    def kernel(x_hbm, rings_ref, k1_ref, s1_ref_in, k2_ref, s2_ref_in,
               o1_ref, o2_ref, *rest):
        if with_stats:
            (st11_ref, st12_ref, st21_ref, st22_ref, y1_scratch, scratch,
             sem) = rest
        else:
            y1_scratch, scratch, sem = rest
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
                cp(0, 2, BR)
                return

            @pl.when(i2 == 0)
            def _():
                cp(0, 2, BR + 2)

            @pl.when(i2 == num_blocks - 1)
            def _():
                cp(r0 - 2, 0, BR + 2)

            @pl.when(jnp.logical_and(i2 > 0, i2 < num_blocks - 1))
            def _():
                cp(r0 - 2, 0, BR + 4)

        slot = jax.lax.rem(t, D)

        @pl.when(t == 0)
        def _():  # warm-up (bounded by total — ADVICE r4 item 2)
            for j in range(min(D - 1, total)):
                slab_dma(j, j // num_blocks, jnp.int32(j % num_blocks),
                         "start")

        t_pre = t + D - 1

        @pl.when(t_pre < total)
        def _():
            slab_dma(jax.lax.rem(t_pre, D), t_pre // num_blocks,
                     jax.lax.rem(t_pre, num_blocks), "start")

        slab_dma(slot, n, i, "wait")

        slab = scratch[slot]  # (BR+4, W, C4); layer-1 ring rows unset

        # layer-1 reflect ring rows (precomputed on host) live at padded
        # input rows -1 (slab slot 1 when i == 0) and H (slot BR+2 when
        # i == last); spliced in the value domain like the 1-layer kernel
        row = jax.lax.broadcasted_iota(jnp.int32, (BR + 4, 1, 1), 0)
        slab = jnp.where(jnp.logical_and(i == 0, row == 1),
                         rings_ref[0, 0][None], slab)
        slab = jnp.where(
            jnp.logical_and(i == num_blocks - 1, row == BR + 2),
            rings_ref[0, 1][None], slab)

        # ---- layer 1: BR+2 intermediate rows (slots j = padded y1 row
        # r0-1+j; boundary slots hold garbage until the ring overwrite) --
        shifts1 = _col_shifts(slab, W, C4)
        acc1 = _conv9(shifts1, BR + 2, 0, k1_ref, C4)
        deq1 = s1_ref_in[0]
        bias1 = s1_ref_in[1]
        y1 = acc1.astype(jnp.float32) * deq1 + bias1
        y1 = jnp.where(y1 >= 0, y1, 0.2 * y1)
        inv1 = s1_ref_in[2]
        y1q = jnp.clip(jnp.round(y1 * inv1), -127, 127).astype(jnp.int8)
        y1q = y1q.reshape(BR + 2, W, C4m)

        # layer-1 output rows owned by this block are slots 1..BR
        o1_ref[0] = y1q[1:BR + 1]

        if with_stats:
            # f32 post-activation sums over the OWNED rows only
            yo = y1.reshape(BR + 2, W, C4m)[1:BR + 1].reshape(BR * W, C4m)
            b11 = jnp.sum(yo, axis=0, keepdims=True)[None]
            b12 = jnp.sum(yo * yo, axis=0, keepdims=True)[None]

            @pl.when(i == 0)
            def _():
                st11_ref[...] = b11
                st12_ref[...] = b12

            @pl.when(i > 0)
            def _():
                st11_ref[...] += b11
                st12_ref[...] += b12

        # ---- layer 2: BR output rows from y1 slots 0..BR+1 ------------
        # reflect ring rows for layer 2, built from y1 itself: top ring =
        # [row1 first-half-lanes | row0 second-half], bottom ring =
        # [row H-1 | row H-2] (ops/folded.py::_row_ring; at i==0 slots
        # 1/2 hold y1 rows 0/1, at i==last slots BR/BR-1 hold rows
        # H-1/H-2).  Composed as a row concat in the value domain and
        # staged through a VMEM scratch ref before layer 2 reads it.
        # History: this in-kernel construction initially "failed" the
        # on-chip diff vs the chained single-layer kernels — the
        # investigation proved THIS kernel correct and found the
        # 2026-08-20 XLA:TPU half-lane-concat miscompilation in the
        # host-side ``_row_ring`` every OTHER folded path consumed
        # (fixed in ops/folded.py::_lane_halves_select; gated by
        # tools/hw/hw_folded_semantics_check.py).
        ring_top = _lane_select_half(y1q[2], y1q[1])
        ring_bot = _lane_select_half(y1q[BR], y1q[BR - 1])
        row0 = jnp.where(i == 0, ring_top, y1q[0])
        rown = jnp.where(i == num_blocks - 1, ring_bot, y1q[BR + 1])
        y1_scratch[...] = jnp.concatenate(
            [row0[None], y1q[1:BR + 1], rown[None]], axis=0)

        shifts2 = _col_shifts(y1_scratch[...], W, C4m)
        acc2 = _conv9(shifts2, BR, 0, k2_ref, C4m)
        deq2 = s2_ref_in[0]
        bias2 = s2_ref_in[1]
        y2 = acc2.astype(jnp.float32) * deq2 + bias2
        y2 = jnp.where(y2 >= 0, y2, 0.2 * y2)
        if with_stats:
            b21 = jnp.sum(y2, axis=0, keepdims=True)[None]
            b22 = jnp.sum(y2 * y2, axis=0, keepdims=True)[None]

            @pl.when(i == 0)
            def _():
                st21_ref[...] = b21
                st22_ref[...] = b22

            @pl.when(i > 0)
            def _():
                st21_ref[...] += b21
                st22_ref[...] += b22
        c4o = k2_ref.shape[-1]
        if out_int8:
            inv2 = s2_ref_in[2]
            q2 = jnp.clip(jnp.round(y2 * inv2), -127, 127)
            o2_ref[0] = q2.reshape(BR, W, c4o).astype(jnp.int8)
        else:
            o2_ref[0] = y2.reshape(BR, W, c4o).astype(o2_ref.dtype)

    return kernel


def _pick_block_rows2(h, w, c4, c4m, c4o, out_int8, dma_depth,
                      block_rows, vmem_budget=None):
    """Largest block_rows dividing h whose working set fits VMEM."""
    if vmem_budget is None:
        vmem_budget = 13 * 1024 * 1024
    br = min(block_rows, h)
    while br > 1:
        if h % br == 0:
            slab = dma_depth * (br + 4) * w * c4
            y1 = 2 * (br + 2) * w * c4m          # int8 scratch + value copy
            acc1 = (br + 2) * w * c4m * 4 * 2    # int32 acc + f32 epilogue
            acc2 = br * w * c4o * 4 * 2
            outs = 2 * br * w * (c4m + (1 if out_int8 else 2) * c4o)
            k = 9 * (c4 * c4m + c4m * c4o)
            if slab + y1 + acc1 + acc2 + outs + k <= vmem_budget:
                return br
        br -= 1
    return 1


def fused_folded_conv2_q8(x_q, w1_q, scales1, w2_q, scales2,
                          out_int8: bool = True, block_rows: int = 16,
                          with_stats: bool = False,
                          interpret: bool = False,
                          dma_depth: int = 2):
    """Chained lrelu(conv(lrelu(conv(x)))) with int8 requantization
    between the layers, one Pallas program.

    x_q: (N, H, W, C4) int8; w1_q: (3, 3, C4, C4m); w2_q: (3, 3, C4m,
    C4o) int8.  scales1/scales2: (3, C4m)/(3, C4o) f32 rows =
    [x_scale*w_scale, bias, 1/out_scale] (scales1 row 2 is REQUIRED —
    layer 2 consumes the requantized rows; scales2 row 2 ignored when
    ``out_int8=False``).

    Returns ``(y1_q, y2)`` — both layers' outputs (the multiscale
    decoder consumes every scale) — or with ``with_stats``
    ``(y1_q, y2, s11, s12, s21, s22)`` where sXY are the (N, C4x) f32
    per-image post-activation channel sums / squared sums of each layer
    (same convention as ``fused_folded_conv_q8(with_stats=True)``).
    """
    from ..folded import _row_ring

    n, h, w, c4 = x_q.shape
    c4m = w1_q.shape[-1]
    c4o = w2_q.shape[-1]
    block_rows = _pick_block_rows2(h, w, c4, c4m, c4o, out_int8, dma_depth,
                                   block_rows)
    num_blocks = h // block_rows

    rings = jnp.concatenate([_row_ring(x_q, True), _row_ring(x_q, False)],
                            axis=1)  # (N, 2, W, C4) int8

    kernel = _make_kernel2(block_rows, num_blocks, n, h, w, c4, c4m,
                           out_int8, with_stats, dma_depth)
    o1_spec = pl.BlockSpec((1, block_rows, w, c4m),
                           lambda n_, i_: (n_, i_, 0, 0),
                           memory_space=pltpu.VMEM)
    o2_spec = pl.BlockSpec((1, block_rows, w, c4o),
                           lambda n_, i_: (n_, i_, 0, 0),
                           memory_space=pltpu.VMEM)
    out_dtype2 = jnp.int8 if out_int8 else jnp.bfloat16
    out_specs = [o1_spec, o2_spec]
    out_shape = [jax.ShapeDtypeStruct((n, h, w, c4m), jnp.int8),
                 jax.ShapeDtypeStruct((n, h, w, c4o), out_dtype2)]
    if with_stats:
        stat1 = pl.BlockSpec((1, 1, c4m), lambda n_, i_: (n_, 0, 0),
                             memory_space=pltpu.VMEM)
        stat2 = pl.BlockSpec((1, 1, c4o), lambda n_, i_: (n_, 0, 0),
                             memory_space=pltpu.VMEM)
        out_specs += [stat1, stat1, stat2, stat2]
        out_shape += [jax.ShapeDtypeStruct((n, 1, c4m), jnp.float32),
                      jax.ShapeDtypeStruct((n, 1, c4m), jnp.float32),
                      jax.ShapeDtypeStruct((n, 1, c4o), jnp.float32),
                      jax.ShapeDtypeStruct((n, 1, c4o), jnp.float32)]
    res = pl.pallas_call(
        kernel,
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, w, c4), lambda n_, i_: (n_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c4, c4m), lambda n_, i_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c4m), lambda n_, i_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c4m, c4o), lambda n_, i_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c4o), lambda n_, i_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2, w, c4m), jnp.int8),
            pltpu.VMEM((dma_depth, block_rows + 4, w, c4), jnp.int8),
            pltpu.SemaphoreType.DMA((dma_depth,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x_q, rings, w1_q, scales1, w2_q, scales2)
    if with_stats:
        y1, y2, s11, s12, s21, s22 = res
        return y1, y2, s11[:, 0], s12[:, 0], s21[:, 0], s22[:, 0]
    return res[0], res[1]
