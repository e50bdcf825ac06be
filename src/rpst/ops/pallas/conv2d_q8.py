"""Int8 standard-layout (unfolded NHWC) fused reflect conv kernel.

The wide-channel families (adain's increasing stack reaches 512 channels
at full 512px resolution — reference ``network/base.py:201-263``; wct's
deeper stacks similarly) are MXU-compute-bound, and XLA's int8
``conv_general_dilated`` was measured at only 1.1-1.2x bf16 on v5e — it
never engages the 2x int8 MXU rate (394 vs 197 TOPS; BASELINE.md
"measured, rejected").  The folded int8 Pallas kernel can't help here
either: folding quadruples a conv's FLOPs (4C·4Co at quarter area), a
win only for narrow HBM-bound stacks.

This kernel is the im2col-free dot formulation of a stride-1 3x3
reflect-pad SAME conv in the STANDARD layout: row slabs (block + 1-row
halo) are DMA'd HBM->VMEM with cross-step double buffering, the reflect
halo is spliced in the value domain (top halo row = row 1, bottom = row
H-2; left halo col = col 1, right = col W-2 — plain reflection, none of
the folded layout's channel-block selects), and the 9 taps run as MXU
``dot_general``s (BR·W, C)·(C, Co) with int32 accumulation — the patch
matrix is never materialized, so there is no im2col gather cost.  The
dequantize -> bias -> leaky-relu -> (requantize) epilogue is fused.

Quantization recipe matches ``folded_conv_q8``: symmetric per-tensor
activations x per-channel weights, static post-training calibration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .folded_conv import _shrink_block_rows


def _make_kernel(block_rows: int, num_blocks: int, N: int, H: int, W: int,
                 C: int, out_int8: bool, alpha: float, pad_mode: str,
                 quantized: bool = True, wide_k: bool = False):
    BR = block_rows
    total = N * num_blocks

    def kernel(x_hbm, rings_ref, k_ref, scale_ref, o_ref, scratch, sem):
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

        n_next = n + (i + 1) // num_blocks
        i_next = jax.lax.rem(i + 1, num_blocks)

        @pl.when(t + 1 < total)
        def _():
            slab_dma(jax.lax.rem(t + 1, 2), n_next, i_next, "start")

        slab_dma(slot, n, i, "wait")

        slab = scratch[slot]  # (BR+2, W, C); boundary halo rows unset

        # halo rows spliced in the value domain (never stored to the
        # DMA'd scratch — folded_conv.py module history): reflect rows
        # come in via rings_ref; zero pad splices zeros
        row = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, 1), 0)
        if pad_mode == "reflect":
            top_v, bot_v = rings_ref[0, 0][None], rings_ref[0, 1][None]
        else:
            top_v = bot_v = jnp.zeros_like(slab[:1])
        top = jnp.where(jnp.logical_and(i == 0, row == 0), top_v, slab)
        slab = jnp.where(jnp.logical_and(i == num_blocks - 1, row == BR + 1),
                         bot_v, top)

        # halo columns: reflect (col -1 = col 1, col W = col W-2) or zero
        if pad_mode == "reflect":
            lcol, rcol = slab[:, 1:2], slab[:, W - 2:W - 1]
        else:
            lcol = rcol = jnp.zeros_like(slab[:, :1])
        x_m1 = jnp.concatenate([lcol, slab[:, :W - 1]], axis=1)
        x_p1 = jnp.concatenate([slab[:, 1:], rcol], axis=1)

        co = k_ref.shape[-1]
        acc_t = jnp.int32 if quantized else jnp.float32
        acc = jnp.zeros((BR * W, co), acc_t)
        if wide_k:
            # K=3*C lane-stacked contraction — v5e's 2x int8 MXU rate
            # needs K >= 256, so C=128 layers leave half the int8
            # throughput idle in the 9-matmul form (see folded_conv_q8;
            # bit-exact: int32 tap sums reassociate)
            x3 = jnp.concatenate([x_m1, slab, x_p1], axis=-1)
            for dr in range(3):
                acc += jax.lax.dot_general(
                    x3[dr:dr + BR].reshape(BR * W, 3 * C), k_ref[dr],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t)
        else:
            for dc, sl in ((0, x_m1), (1, slab), (2, x_p1)):
                for dr in range(3):
                    window = sl[dr:dr + BR]  # static row slice (untiled)
                    acc += jax.lax.dot_general(
                        window.reshape(BR * W, C), k_ref[dr, dc],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_t)

        if not quantized:
            y = acc + scale_ref[1]  # f32 accumulate + bias
            y = jnp.where(y >= 0, y, alpha * y)
            o_ref[0] = y.reshape(BR, W, co).astype(o_ref.dtype)
            return

        # epilogue: dequant (x_scale * w_scale per lane) + bias + lrelu
        deq = scale_ref[0]   # (co,) f32: x_scale * w_scale
        bias = scale_ref[1]  # (co,) f32
        y = acc.astype(jnp.float32) * deq + bias
        y = jnp.where(y >= 0, y, alpha * y)
        if out_int8:
            inv_out = scale_ref[2]  # (co,) f32: broadcast 1/out_scale
            q = jnp.clip(jnp.round(y * inv_out), -127, 127)
            o_ref[0] = q.reshape(BR, W, co).astype(jnp.int8)
        else:
            o_ref[0] = y.reshape(BR, W, co).astype(o_ref.dtype)

    return kernel


def fused_conv2d_bf16(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      alpha: float = 0.0, pad_mode: str = "reflect",
                      block_rows: int = 16,
                      interpret: bool = False) -> jnp.ndarray:
    """bf16 act(pad_conv3x3(x) + bias), standard layout, f32 accumulate.

    Same slab-DMA 9-tap dot kernel as the int8 variant.  Built as a
    candidate for the frozen-VGG perceptual-loss forwards (reflect-pad
    3x3 + relu at 128-512 channels, reference ``network/base.py:57-111``)
    — but MEASURED A WASH there (2026-08-17, v5e, b8: 1.00x/0.94x/1.13x
    vs the XLA reflect conv at 256px·c128 / 128px·c256 / 64px·c512; both
    ~40 TF/s): at these smaller spatial extents XLA's pad+conv is not
    reflect-copy-bound the way the 512px wide stacks are, and bf16 has
    no 2x MXU rate to claim.  Kept as a verified utility; the int8
    variant is where the wins are (BASELINE.md).  x: (N, H, W, C) (cast
    to bf16); w: (3, 3, C, Co); b: (Co,).  Returns bf16."""
    if pad_mode not in ("reflect", "zero"):
        raise ValueError(f"unknown pad_mode {pad_mode!r}")
    x = x.astype(jnp.bfloat16)
    w = w.astype(jnp.bfloat16)
    n, h, wd, c = x.shape
    co = w.shape[-1]
    block_rows = _shrink_block_rows(h, wd, c, co, 2, block_rows,
                                    min_rows=1)
    num_blocks = h // block_rows

    if pad_mode == "reflect":
        rings = jnp.stack([x[:, 1], x[:, h - 2]], axis=1)
    else:
        rings = jnp.zeros((n, 2, wd, c), x.dtype)
    scales = jnp.stack([jnp.zeros((co,), jnp.float32),
                        b.astype(jnp.float32)])
    kernel = _make_kernel(block_rows, num_blocks, n, h, wd, c, False,
                          alpha, pad_mode, quantized=False)
    return pl.pallas_call(
        kernel,
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, wd, c), lambda n_, i_: (n_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, co), lambda n_, i_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda n_, i_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, wd, co),
                               lambda n_, i_: (n_, i_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, co), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows + 2, wd, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, rings, w, scales)


# Module default for the wide-K (K=3*C) contraction on sub-256-channel
# layers; None = off, "auto" = engage when C < 256 (where the 9-matmul
# form misses the 2x int8 MXU rate). Flipped by measurement.
WIDE_K_DEFAULT: str | bool = False


def fused_conv2d_q8(x_q: jnp.ndarray, w_q: jnp.ndarray,
                    scales: jnp.ndarray, out_int8: bool,
                    alpha: float = 0.2, pad_mode: str = "reflect",
                    block_rows: int = 16,
                    interpret: bool = False,
                    wide_k: bool | str | None = None) -> jnp.ndarray:
    """Quantized act(pad_conv3x3(x) + bias) in the standard layout.

    x_q: (N, H, W, C) int8; w_q: (3, 3, C, Co) int8 (HWIO);
    scales: (3, Co) f32 rows = [x_scale*w_scale, bias, 1/out_scale]
    (row 2 ignored when ``out_int8=False``); ``alpha`` = leaky-relu
    negative slope (0.0 = relu, 1.0 = no activation); ``pad_mode`` =
    "reflect" (Conv2dBlock stacks, wct/deeper) or "zero" (RPSequence
    stacks, adain increase/decrease).  Requires H >= 2, W >= 2 and
    C, Co lane-aligned (multiples of 128 for peak int8 MXU rate).
    Returns int8 (requantized) or bf16."""
    if pad_mode not in ("reflect", "zero"):
        raise ValueError(f"unknown pad_mode {pad_mode!r}")
    n, h, w, c = x_q.shape
    co = w_q.shape[-1]
    if wide_k is None:
        wide_k = WIDE_K_DEFAULT
    if wide_k == "auto":
        wide_k = c < 256
    block_rows = _shrink_block_rows(h, w, c, co, 1, block_rows,
                                    out_isz=1 if out_int8 else 2,
                                    min_rows=1,
                                    extra_slabs=3 if wide_k else 0)
    num_blocks = h // block_rows

    if pad_mode == "reflect":
        # reflect ring rows: above row 0 sits row 1, below H-1 row H-2
        rings = jnp.stack([x_q[:, 1], x_q[:, h - 2]], axis=1)
    else:
        rings = jnp.zeros((n, 2, w, c), x_q.dtype)  # unread placeholder
    kernel = _make_kernel(block_rows, num_blocks, n, h, w, c, out_int8,
                          alpha, pad_mode, wide_k=wide_k)
    if wide_k:
        w_kernel = jnp.concatenate([w_q[:, 0], w_q[:, 1], w_q[:, 2]],
                                   axis=1)  # (3, 3*C, Co)
        k_spec = pl.BlockSpec((3, 3 * c, co), lambda n_, i_: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_kernel = w_q
        k_spec = pl.BlockSpec((3, 3, c, co), lambda n_, i_: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_dtype = jnp.int8 if out_int8 else jnp.bfloat16
    return pl.pallas_call(
        kernel,
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, 2, w, c), lambda n_, i_: (n_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            k_spec,
            pl.BlockSpec((3, co), lambda n_, i_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, w, co),
                               lambda n_, i_: (n_, i_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows + 2, w, c), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x_q, rings, w_kernel, scales)
