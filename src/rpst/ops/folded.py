"""Space-to-depth ("folded") execution of stride-1 RP conv stacks.

Why: the RP family's hidden width is 16-32 channels, but the TPU vector
lane width is 128 — in NHWC every activation is physically padded 4-8x in
the channel (lane) dimension, making the flagship purely HBM-bound (XLA
cost analysis: ~8.9 GB accessed for 64 GFLOP at 512px).  Folding 2x2
spatial blocks into channels (H, W, C) → (H/2, W/2, 4C) fills the lanes
and cuts real memory traffic ~4x.

Everything here is **exact**, not an approximation:

  * a stride-1 3x3 conv on the image equals a stride-1 3x3 conv on the
    folded tensor with a structurally-sparse (3, 3, 4C_in, 4C_out) kernel
    (``fold_conv_kernel``): output sub-position (oi, oj) tap (di, dj)
    reads folded offset floor((oi+di)/2) at input sub-position
    ((oi+di) mod 2, ...) — 9 distinct taps per output block, the rest
    zeros.  4x the MACs of the unfolded conv, but the model is
    bandwidth-bound, so trading FLOPs for lane fill wins.
  * 1-pixel reflection padding equals a channel-block-permuted slice
    concat in the folded domain (``folded_reflect_pad``): the reflected
    original rows/cols are existing sub-position blocks of interior folded
    pixels.
  * AdaIN statistics combine exactly across the 4 sub-position blocks of
    each original channel (``folded_calc_mean_std``), and the affine
    normalization applies blockwise.

Channel layout: folded channel (2*si + sj)*C + c holds original pixel
(2i+si, 2j+sj, c).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def fold(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) → (N, H/2, W/2, 4C). H, W must be even."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (N, H/2, W/2, si, sj, C)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def unfold(x_f: jnp.ndarray) -> jnp.ndarray:
    """(N, H/2, W/2, 4C) → (N, H, W, C)."""
    n, hh, ww, c4 = x_f.shape
    c = c4 // 4
    x = x_f.reshape(n, hh, ww, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hh * 2, ww * 2, c)


def fold_conv_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) → (3, 3, 4Cin, 4Cout) folded-equivalent kernel."""
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3, "folded path supports 3x3 kernels"
    kf = jnp.zeros((3, 3, 4 * cin, 4 * cout), kernel.dtype)
    for oi in range(2):
        for oj in range(2):
            s_out = 2 * oi + oj
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    fr, si = divmod(oi + di, 2)
                    fc, sj = divmod(oj + dj, 2)
                    s_in = 2 * si + sj
                    kf = kf.at[fr + 1, fc + 1,
                               s_in * cin:(s_in + 1) * cin,
                               s_out * cout:(s_out + 1) * cout].set(
                                   kernel[di + 1, dj + 1])
    return kf


def fold_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """(C,) → (4C,): each sub-position block shares the original bias."""
    return jnp.tile(bias, 4)


def _row_blocks(x_f, si: int):
    """Channels of sub-row si: layout blocks {0,1} (si=0) or {2,3} (si=1)
    are contiguous: first/last 2C."""
    c4 = x_f.shape[-1]
    half = c4 // 2
    return x_f[..., :half] if si == 0 else x_f[..., half:]


def _col_blocks(x_f, sj: int):
    """Channels of sub-col sj: blocks {0,2} (sj=0) / {1,3} (sj=1) —
    interleaved; select via a (4, C) view."""
    n, h, w, c4 = x_f.shape
    c = c4 // 4
    v = x_f.reshape(n, h, w, 4, c)
    idx = (0, 2) if sj == 0 else (1, 3)
    return v[..., idx, :]  # (N, H, W, 2, C)


def _lane_halves_select(src_first, src_second):
    """[src_first's first-2C lanes | src_second's last-2C lanes].

    Built as a lane-iota ``where`` instead of the natural
    ``concat([a[..., :half], b[..., half:]], -1)``: the current XLA:TPU
    backend MISCOMPILES that concat — both halves read ``a``'s rows
    (found 2026-08-20 via tools/hw/hw_fused2_debug.py; eager and CPU
    compile it correctly, so only on-TPU jit paths were affected —
    tools/hw/hw_folded_semantics_check.py gates every helper here)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, src_first.shape,
                                    src_first.ndim - 1)
    return jnp.where(lane < src_first.shape[-1] // 2, src_first,
                     src_second)


def _sub_col_select(src_even, src_odd):
    """Lane blocks {0,2} (sub-col 0) from ``src_even``, blocks {1,3}
    from ``src_odd`` — the column analogue of
    :func:`_lane_halves_select`, same miscompile workaround."""
    c = src_even.shape[-1] // 4
    lane = jax.lax.broadcasted_iota(jnp.int32, src_even.shape,
                                    src_even.ndim - 1)
    return jnp.where((lane // c) % 2 == 0, src_even, src_odd)


def folded_reflect_pad(x_f: jnp.ndarray) -> jnp.ndarray:
    """1-original-pixel ReflectionPad2d in the folded domain → +1 folded
    ring on each side, built from channel-permuted interior slices.

    Ring content (rows; cols analogous): folded row -1 holds original rows
    (-2, -1) = reflected rows (2, 1) = (row 1's sub-row-0 block, row 0's
    sub-row-1 block). Only the original ±1 row/col is ever read by the
    folded kernel's non-zero taps; the ±2 entries carry true reflect
    values anyway."""
    n, h, w, c4 = x_f.shape
    c = c4 // 4
    half = c4 // 2

    # --- rows ---
    top = _lane_halves_select(x_f[:, 1:2], x_f[:, 0:1])
    bottom = _lane_halves_select(x_f[:, h - 1:h], x_f[:, h - 2:h - 1])
    x_f = jnp.concatenate([top, x_f, bottom], axis=1)  # (N, H+2, W, 4C)

    # --- cols (on the row-padded tensor; corners fall out automatically) ---
    left = _sub_col_select(x_f[:, :, 1:2], x_f[:, :, 0:1])
    right = _sub_col_select(x_f[:, :, w - 1:w], x_f[:, :, w - 2:w - 1])
    return jnp.concatenate([left, x_f, right], axis=2)


def _conv(x, k, padding):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _row_ring(x_f, top: bool):
    """The folded ring row above (top) / below the tensor; see
    folded_reflect_pad (lane-select form — see _lane_halves_select)."""
    h = x_f.shape[1]
    if top:
        return _lane_halves_select(x_f[:, 1:2], x_f[:, 0:1])
    return _lane_halves_select(x_f[:, h - 1:h], x_f[:, h - 2:h - 1])


def _col_ring(x_f, left: bool):
    w = x_f.shape[2]
    if left:
        return _sub_col_select(x_f[:, :, 1:2], x_f[:, :, 0:1])
    return _sub_col_select(x_f[:, :, w - 1:w], x_f[:, :, w - 2:w - 1])


def _pad_cols_ring(x_f):
    """Column rings only (reflect in W)."""
    return jnp.concatenate([_col_ring(x_f, True), x_f,
                            _col_ring(x_f, False)], axis=2)


def _pad_rows_ring(x_f):
    return jnp.concatenate([_row_ring(x_f, True), x_f,
                            _row_ring(x_f, False)], axis=1)


def folded_conv(x_f: jnp.ndarray, folded_kernel: jnp.ndarray,
                folded_bias: jnp.ndarray, impl: str = "ring") -> jnp.ndarray:
    """Reflect-pad + 3x3 VALID conv + bias in the folded domain.

    impl='ring' (default) materializes the padded tensor and convolves
    VALID. impl='bc' runs a SAME conv and overwrites the 1-folded-pixel
    border with exact thin-slab convolutions — it looked like a ~20%
    bandwidth win on paper, but measured **slower** (513 → 338 img/s b8):
    XLA materializes a full-tensor copy for every border
    dynamic-update-slice, quadrupling traffic. Kept for reference and
    tested equal; a Pallas kernel with in-place border stores is the way
    to actually claim this win."""
    if impl == "ring":
        y = _conv(folded_reflect_pad(x_f), folded_kernel, "VALID")
        return y + folded_bias

    n, h, w, c4 = x_f.shape
    y = _conv(x_f, folded_kernel, "SAME") + folded_bias

    # row borders: slab = [ring, first/last two rows], reflect-padded in W
    top_slab = jnp.concatenate([_row_ring(x_f, True), x_f[:, 0:2]], axis=1)
    y_top = _conv(_pad_cols_ring(top_slab), folded_kernel, "VALID")
    y = y.at[:, 0:1].set(y_top + folded_bias)
    bot_slab = jnp.concatenate([x_f[:, h - 2:h], _row_ring(x_f, False)], axis=1)
    y_bot = _conv(_pad_cols_ring(bot_slab), folded_kernel, "VALID")
    y = y.at[:, h - 1:h].set(y_bot + folded_bias)

    # column borders (incl. corners): slab reflect-padded in H
    left_slab = jnp.concatenate([_col_ring(x_f, True), x_f[:, :, 0:2]], axis=2)
    y_left = _conv(_pad_rows_ring(left_slab), folded_kernel, "VALID")
    y = y.at[:, :, 0:1].set(y_left + folded_bias)
    right_slab = jnp.concatenate([x_f[:, :, w - 2:w], _col_ring(x_f, False)],
                                 axis=2)
    y_right = _conv(_pad_rows_ring(right_slab), folded_kernel, "VALID")
    y = y.at[:, :, w - 1:w].set(y_right + folded_bias)
    return y


def folded_calc_mean_std(x_f: jnp.ndarray, eps: float = 1e-5):
    """Per-original-channel instance stats from the folded tensor.

    Returns mean, std of shape (N, 1, 1, 4C) (already block-tiled for
    direct application). Matches ``ops.stats.calc_mean_std`` exactly
    (unbiased variance over the original H*W, eps inside sqrt)."""
    n, hh, ww, c4 = x_f.shape
    c = c4 // 4
    m = hh * ww * 4  # original pixel count per channel
    v = x_f.astype(jnp.float32).reshape(n, hh * ww, 4, c)
    s1 = jnp.sum(v, axis=(1, 2))       # (N, C)
    s2 = jnp.sum(v * v, axis=(1, 2))   # (N, C)
    mean = s1 / m
    var = (s2 - m * mean * mean) / max(m - 1, 1)
    std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
    mean4 = jnp.tile(mean, (1, 4))[:, None, None, :].astype(x_f.dtype)
    std4 = jnp.tile(std, (1, 4))[:, None, None, :].astype(x_f.dtype)
    return mean4, std4


def folded_adain(content_f: jnp.ndarray, style_f: jnp.ndarray,
                 eps: float = 1e-5) -> jnp.ndarray:
    cm, cs = folded_calc_mean_std(content_f, eps)
    sm, ss = folded_calc_mean_std(style_f, eps)
    return (content_f - cm) / cs * ss + sm


def fold_conv1x1_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, Cin, Cout) → (1, 1, 4Cin, 4Cout): a 1x1 conv acts on each
    sub-position block independently, so the folded kernel is the
    block-diagonal kron(I4, W)."""
    _, _, cin, cout = kernel.shape
    kf = jnp.zeros((1, 1, 4 * cin, 4 * cout), kernel.dtype)
    for g in range(4):
        kf = kf.at[0, 0, g * cin:(g + 1) * cin,
                   g * cout:(g + 1) * cout].set(kernel[0, 0])
    return kf


def folded_zero_conv(x_f: jnp.ndarray, folded_kernel: jnp.ndarray) -> \
        jnp.ndarray:
    """3x3 conv with 1-px ZERO padding in the folded domain.

    An original-domain zero ring folds to an all-zero folded ring (the
    folded kernel's taps into the ring's outer sub-rows are structurally
    zero), so SAME zero padding on the folded tensor is exact."""
    return _conv(x_f, folded_kernel, "SAME")


def folded_channel_pool(x_f: jnp.ndarray) -> jnp.ndarray:
    """Exact per-original-channel global average pool: (N, Hf, Wf, 4C) →
    (N, C). The 4 sub-position blocks of a channel have equal pixel
    counts, so the original-domain mean is the mean over (Hf, Wf, group)."""
    n, hh, ww, c4 = x_f.shape
    c = c4 // 4
    return jnp.mean(x_f.reshape(n, hh * ww, 4, c), axis=(1, 2))


def folded_channel_affine(x_f: jnp.ndarray, scale: jnp.ndarray,
                          shift=None) -> jnp.ndarray:
    """Apply a per-original-channel affine (shapes (C,) or (N, C)) to a
    folded tensor by tiling over the 4 sub-position blocks."""
    s4 = jnp.tile(scale, (1, 4) if scale.ndim == 2 else 4)
    if scale.ndim == 2:
        s4 = s4[:, None, None, :]
    y = x_f * s4
    if shift is not None:
        b4 = jnp.tile(shift, (1, 4) if shift.ndim == 2 else 4)
        if shift.ndim == 2:
            b4 = b4[:, None, None, :]
        y = y + b4
    return y
