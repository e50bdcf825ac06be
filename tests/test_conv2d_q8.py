"""Standard-layout int8 fused conv kernel == exact int32 XLA oracle.

``ops/pallas/conv2d_q8`` must reproduce, bit-for-bit at the int32
accumulator, a reflect-pad 3x3 SAME conv over int8 inputs (the oracle
runs the same integer math through ``lax.conv_general_dilated``), with
the dequant+bias+lrelu(+requant) epilogue applied identically.
Interpret mode only here — Mosaic lowering is validated on the real
chip by ``tools/hw_kernel_check.py`` (see NOTES.md: interpret mode
alone is not sufficient for manual-DMA kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.ops.pallas.conv2d_q8 import fused_conv2d_q8


def _oracle(x_q, w_q, scales, out_int8, alpha, pad_mode="reflect"):
    jmode = "reflect" if pad_mode == "reflect" else "constant"
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=jmode)
    acc = jax.lax.conv_general_dilated(
        xp.astype(jnp.int32), w_q.astype(jnp.int32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scales[0] + scales[1]
    y = jnp.where(y >= 0, y, alpha * y)
    if out_int8:
        return jnp.clip(jnp.round(y * scales[2]), -127, 127).astype(jnp.int8)
    return y.astype(jnp.bfloat16)


@pytest.mark.parametrize("out_int8", [False, True])
@pytest.mark.parametrize("alpha", [0.2, 0.0, 1.0])
def test_matches_int_oracle(out_int8, alpha):
    rng = np.random.default_rng(0)
    n, h, w, c, co = 2, 12, 16, 256, 128
    x_q = jnp.asarray(rng.integers(-127, 128, (n, h, w, c), np.int8))
    w_q = jnp.asarray(rng.integers(-127, 128, (3, 3, c, co), np.int8))
    scales = jnp.asarray(np.stack([
        rng.uniform(1e-4, 1e-3, co), rng.normal(0, 0.5, co),
        rng.uniform(20.0, 80.0, co)]).astype(np.float32))
    got = fused_conv2d_q8(x_q, w_q, scales, out_int8, alpha=alpha,
                          block_rows=4, interpret=True)
    ref = _oracle(x_q, w_q, scales, out_int8, alpha)
    if out_int8:
        # round-to-nearest ties can differ by 1 ulp at exact .5 boundaries
        assert int(jnp.max(jnp.abs(got.astype(jnp.int32)
                                   - ref.astype(jnp.int32)))) <= 1
    else:
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("out_int8", [False, True])
def test_zero_pad_matches_int_oracle(out_int8):
    rng = np.random.default_rng(2)
    n, h, w, c, co = 1, 8, 12, 128, 128
    x_q = jnp.asarray(rng.integers(-127, 128, (n, h, w, c), np.int8))
    w_q = jnp.asarray(rng.integers(-127, 128, (3, 3, c, co), np.int8))
    scales = jnp.asarray(np.stack([
        rng.uniform(1e-4, 1e-3, co), rng.normal(0, 0.5, co),
        rng.uniform(20.0, 80.0, co)]).astype(np.float32))
    got = fused_conv2d_q8(x_q, w_q, scales, out_int8, alpha=0.0,
                          pad_mode="zero", block_rows=4, interpret=True)
    ref = _oracle(x_q, w_q, scales, out_int8, 0.0, pad_mode="zero")
    if out_int8:
        assert int(jnp.max(jnp.abs(got.astype(jnp.int32)
                                   - ref.astype(jnp.int32)))) <= 1
    else:
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_single_block_and_uneven_blocks():
    rng = np.random.default_rng(1)
    n, h, w, c, co = 1, 6, 8, 128, 128
    x_q = jnp.asarray(rng.integers(-5, 6, (n, h, w, c), np.int8))
    w_q = jnp.asarray(rng.integers(-5, 6, (3, 3, c, co), np.int8))
    scales = jnp.asarray(np.stack([np.full(co, 1e-3), np.zeros(co),
                                   np.full(co, 50.0)]).astype(np.float32))
    ref = _oracle(x_q, w_q, scales, False, 0.2)
    for br in (6, 3, 2, 1):
        got = fused_conv2d_q8(x_q, w_q, scales, False, block_rows=br,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("pad_mode", ["reflect", "zero"])
def test_bf16_variant_matches_xla(pad_mode):
    from rpst.ops.pallas.conv2d_q8 import fused_conv2d_bf16

    rng = np.random.default_rng(3)
    n, h, w, c, co = 1, 8, 12, 128, 128
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, c, co)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))

    jmode = "reflect" if pad_mode == "reflect" else "constant"
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)),
                 mode=jmode)
    ref = jax.lax.conv_general_dilated(
        xp, k.astype(jnp.bfloat16), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    ref = jnp.maximum(ref, 0)
    got = fused_conv2d_bf16(x, k, b, alpha=0.0, pad_mode=pad_mode,
                            block_rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=1e-1)


@pytest.mark.parametrize("pad_mode", ["reflect", "zero"])
def test_wide_k_bit_exact(pad_mode):
    """The wide-K (K=3*C lane-stacked) form must match the 9-matmul
    form bit-for-bit — int32 tap sums reassociate exactly."""
    rng = np.random.default_rng(5)
    n, h, w, c, co = 2, 8, 12, 128, 128
    x_q = jnp.asarray(rng.integers(-127, 128, (n, h, w, c), np.int8))
    w_q = jnp.asarray(rng.integers(-127, 128, (3, 3, c, co), np.int8))
    scales = jnp.asarray(np.stack([
        rng.uniform(1e-4, 1e-3, co), rng.normal(0, 0.5, co),
        rng.uniform(20.0, 80.0, co)]).astype(np.float32))
    for out_int8 in (False, True):
        ref = fused_conv2d_q8(x_q, w_q, scales, out_int8, alpha=0.2,
                              pad_mode=pad_mode, block_rows=4,
                              interpret=True, wide_k=False)
        got = fused_conv2d_q8(x_q, w_q, scales, out_int8, alpha=0.2,
                              pad_mode=pad_mode, block_rows=4,
                              interpret=True, wide_k=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # "auto" engages below 256 channels and stays exact
    auto = fused_conv2d_q8(x_q, w_q, scales, True, alpha=0.2,
                           pad_mode=pad_mode, block_rows=4,
                           interpret=True, wide_k="auto")
    ref = fused_conv2d_q8(x_q, w_q, scales, True, alpha=0.2,
                          pad_mode=pad_mode, block_rows=4,
                          interpret=True, wide_k=False)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(ref))
