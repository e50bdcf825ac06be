"""Two-layer fused int8 folded conv (ops/pallas/folded_conv2_q8) vs two
single-layer ``fused_folded_conv_q8`` calls — must be BIT-exact: same
int32 matmuls, same f32 epilogue, same requantization; block-boundary
intermediate rows are recomputed, not approximated.  Runs in interpret
mode on CPU; the on-chip gate lives in tools/hw_kernel_check.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.ops.pallas.folded_conv_q8 import (fused_folded_conv_q8,
                                            quantize_weights)
from rpst.ops.pallas.folded_conv2_q8 import fused_folded_conv2_q8

pytestmark = pytest.mark.slow


def _mk(rng, n=2, h=8, w=8, c4=128, c4m=128, c4o=128):
    x_q = jnp.asarray(rng.integers(-127, 128, (n, h, w, c4)).astype(np.int8))
    k1 = jnp.asarray(rng.normal(size=(3, 3, c4, c4m)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(3, 3, c4m, c4o)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(c4m,)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(c4o,)).astype(np.float32))
    w1_q, w1_s = quantize_weights(k1)
    w2_q, w2_s = quantize_weights(k2)
    xs, o1s, o2s = 0.11, 0.37, 0.53
    sc1 = jnp.stack([xs * w1_s, b1, jnp.broadcast_to(
        jnp.float32(1.0 / o1s), b1.shape)])
    sc2 = jnp.stack([o1s * w2_s, b2, jnp.broadcast_to(
        jnp.float32(1.0 / o2s), b2.shape)])
    return x_q, w1_q, sc1, w2_q, sc2


@pytest.mark.parametrize("h,block_rows", [(8, 4), (8, 8), (16, 4)])
@pytest.mark.parametrize("out_int8", [True, False])
def test_fused2_bit_exact(h, block_rows, out_int8, rng):
    x_q, w1_q, sc1, w2_q, sc2 = _mk(rng, h=h)
    y1_ref = fused_folded_conv_q8(x_q, w1_q, sc1, out_int8=True,
                                  block_rows=block_rows, interpret=True)
    y2_ref = fused_folded_conv_q8(y1_ref, w2_q, sc2, out_int8=out_int8,
                                  block_rows=block_rows, interpret=True)
    y1, y2 = fused_folded_conv2_q8(x_q, w1_q, sc1, w2_q, sc2,
                                   out_int8=out_int8,
                                   block_rows=block_rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1_ref))
    np.testing.assert_array_equal(
        np.asarray(y2, np.float32), np.asarray(y2_ref, np.float32))


def test_fused2_flagship_stylize_bit_exact(rng):
    """stylize_multi_adain_folded_q8 with encoder pair fusion must equal
    the unfused chain exactly (same kernels, same scale order)."""
    import jax
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.models.fast_path_q8 import (calibrate_multi_adain_q8,
                                          stylize_multi_adain_folded_q8)

    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=4, hidden_dim=32, inception_num=0,
                           attention="none", img_size=32,
                           exec_strategy="folded"))
    bundle = build_model(cfg)
    c = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    variables = bundle.model.init(jax.random.PRNGKey(0), c, s, train=False)
    params = variables["params"]
    scales = calibrate_multi_adain_q8(params, c, s)
    ref = stylize_multi_adain_folded_q8(params, scales, c, s,
                                        interpret=True, fuse_pairs=False)
    got = stylize_multi_adain_folded_q8(params, scales, c, s,
                                        interpret=True, fuse_pairs=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_fused2_stats_match(rng):
    x_q, w1_q, sc1, w2_q, sc2 = _mk(rng, h=8)
    y1_ref, s11_ref, s12_ref = fused_folded_conv_q8(
        x_q, w1_q, sc1, out_int8=True, block_rows=4, with_stats=True,
        interpret=True)
    y2_ref, s21_ref, s22_ref = fused_folded_conv_q8(
        y1_ref, w2_q, sc2, out_int8=True, block_rows=4, with_stats=True,
        interpret=True)
    y1, y2, s11, s12, s21, s22 = fused_folded_conv2_q8(
        x_q, w1_q, sc1, w2_q, sc2, out_int8=True, block_rows=4,
        with_stats=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1_ref))
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y2_ref))
    for got, ref in ((s11, s11_ref), (s12, s12_ref), (s21, s21_ref),
                     (s22, s22_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-4)
