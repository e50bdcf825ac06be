"""Folded (space-to-depth) execution of the VGG perceptual-loss path.

Training profile (BASELINE.md): the frozen-VGG loss forwards + backward
are the largest slice of the flagship train step, and the cost is NOT
FLOPs — stages 1-2 run 64/128-channel activations at 512²/256², which
fill only half/quarter of the TPU's 128-wide vector lanes, so the big
shallow tensors are read and written with 2-4x physical padding in both
the forward and the backward sweep.

Fix: run stages 1-2 in the folded (H/2, W/2, 4C) domain using the exact
transformations of ``rpst.ops.folded`` (reflect-pad ring, folded kernels)
— the same trick the RP conv stacks use.  Two extra exact identities make
the whole loss computable without ever materializing the unfolded
activations:

  * ceil-mode 2x2/2 max pool on the original image == max over the 4
    sub-position channel blocks of the folded tensor (and the result is
    already in standard layout at the pooled resolution);
  * per-channel instance mean/std == ``folded_calc_mean_std`` (sums
    combine exactly across sub-position blocks).

Stages 3+ (256/512 channels) already fill the lanes and stay standard.
Everything is ordinary differentiable XLA, so the backward sweep gets the
same lane-fill win.  Numerics are identical to ``VGG19Encoder`` up to
float reassociation (tested in tests/test_folded.py).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.folded import (fold, fold_bias, fold_conv_kernel,
                          folded_calc_mean_std, folded_conv)
from ..ops.stats import calc_mean_std


def _folded_conv_relu(x_f, kf, bf):
    """relu(folded reflect conv + bias): fused Pallas kernel (one HBM
    read + one write, differentiable via the custom-VJP backward pair)
    when the folded channels fill 128-wide lanes; XLA ring path
    otherwise (conv1_1's folded input is 12-wide) and on CPU.

    Gated to batch <= 4: measured 512px train step (v5e) b4
    42.0 -> 52.1 img/s with the fused kernels but b8 60.4 -> 57.2 —
    at b8 the XLA ring conv already fills the chip, so the gate keeps
    the per-batch winner (thresh sweep over {4, 8, 16})."""
    from ..ops.engine import mosaic_ok
    if (x_f.shape[0] <= 4 and kf.shape[2] % 128 == 0
            and kf.shape[3] % 128 == 0 and mosaic_ok()):
        from ..ops.pallas.folded_conv import folded_conv_relu
        return folded_conv_relu(x_f, kf, bf)
    return jax.nn.relu(folded_conv(x_f, kf, bf))


def _group_max_pool(x_f: jnp.ndarray) -> jnp.ndarray:
    """Folded (N, H, W, 4C) -> pooled standard (N, H, W, C): ceil-mode
    2x2/2 max pool of the unfolded tensor (exact for even H, W — always
    true here since the tensor was foldable)."""
    n, h, w, c4 = x_f.shape
    return jnp.max(x_f.reshape(n, h, w, 4, c4 // 4), axis=3)


def _conv3x3_reflect(x, kernel, bias):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def _maxpool_ceil(x):
    from flax import linen as nn
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")


def vgg_perceptual_stats(vgg_vars, x, dtype: Any = jnp.bfloat16
                         ) -> Tuple[List[Tuple[jnp.ndarray, jnp.ndarray]],
                                    jnp.ndarray]:
    """relu{1..4}_1 per-channel instance (mean, std) pairs + relu4_1
    features — everything ``perceptual_rp_losses`` consumes — with stages
    1-2 executed folded.

    vgg_vars: the ``VGG19Encoder`` variables (conv_0..conv_9 for 4 stages).
    Returns ([(mean, std) x4] each (N, C_stage), relu4_1 (N, H/8, W/8, 512)).
    """
    p = vgg_vars["params"]

    def kb(i):
        conv = p[f"conv_{i}"]["Conv_0"]
        return conv["kernel"].astype(dtype), conv["bias"].astype(dtype)

    def fkb(i):
        k, b = kb(i)
        return fold_conv_kernel(k), fold_bias(b)

    x = x.astype(dtype)
    # conv_0: the 1x1 normalization head (3->3), standard (cheap)
    k0, b0 = kb(0)
    x = jax.lax.conv_general_dilated(
        x, k0, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b0

    stats = []

    def folded_stats(x_f):
        m4, s4 = folded_calc_mean_std(x_f)  # (N,1,1,4C) block-tiled
        c = x_f.shape[-1] // 4
        return (m4[:, 0, 0, :c].astype(jnp.float32),
                s4[:, 0, 0, :c].astype(jnp.float32))

    # --- stage 1 (folded): relu1_1, relu1_2, pool ---
    f = fold(x)
    f = jax.nn.relu(folded_conv(f, *fkb(1)))   # relu1_1 (H/2, W/2, 256;
    #                                    12 folded in-ch -> XLA ring path)
    stats.append(folded_stats(f))
    f = _folded_conv_relu(f, *fkb(2))          # relu1_2 (fused kernel)
    x = _group_max_pool(f)                     # pool1 -> (H/2, W/2, 64)

    # --- stage 2 (folded): relu2_1, relu2_2, pool ---
    f = fold(x)
    f = _folded_conv_relu(f, *fkb(3))          # relu2_1 (H/4, W/4, 512)
    stats.append(folded_stats(f))
    f = _folded_conv_relu(f, *fkb(4))          # relu2_2
    x = _group_max_pool(f)                     # pool2 -> (H/4, W/4, 128)

    # --- stages 3-4 (standard: 256/512 channels fill the lanes) ---
    x = jax.nn.relu(_conv3x3_reflect(x, *kb(5)))   # relu3_1
    m, s = calc_mean_std(x.astype(jnp.float32))
    stats.append((m[:, 0, 0, :], s[:, 0, 0, :]))
    for i in (6, 7, 8):
        x = jax.nn.relu(_conv3x3_reflect(x, *kb(i)))  # relu3_2..3_4
    x = _maxpool_ceil(x)
    x = jax.nn.relu(_conv3x3_reflect(x, *kb(9)))   # relu4_1
    m, s = calc_mean_std(x.astype(jnp.float32))
    stats.append((m[:, 0, 0, :], s[:, 0, 0, :]))
    return stats, x


def perceptual_rp_losses_folded(vgg_vars, stylized, style, content,
                                content_weight: float, style_weight: float,
                                dtype: Any = jnp.bfloat16):
    """``rpst.models.base.perceptual_rp_losses`` computed through the
    folded VGG path — identical math (style-stat MSE over relu1..4_1 +
    relu4_1 content MSE, reference adain_rp.py:321-345), less HBM traffic
    in both sweeps."""
    from ..models.base import mse

    g_stats, g_relu4 = vgg_perceptual_stats(vgg_vars, stylized, dtype)
    n = style.shape[0]
    sc = jax.lax.stop_gradient(jnp.concatenate([style, content], axis=0))
    t_stats, t_relu4 = vgg_perceptual_stats(vgg_vars, sc, dtype)
    t_stats = [(m[:n], s[:n]) for m, s in t_stats]

    loss_s = sum(mse(gm, jax.lax.stop_gradient(tm))
                 + mse(gs, jax.lax.stop_gradient(ts))
                 for (gm, gs), (tm, ts) in zip(g_stats, t_stats))
    loss_c = mse(g_relu4.astype(jnp.float32),
                 jax.lax.stop_gradient(t_relu4[n:]).astype(jnp.float32))
    total = content_weight * loss_c + style_weight * loss_s
    return {"style_loss": loss_s, "content_loss": loss_c}, total


def perceptual_rp_losses_folded_pretargets(vgg_vars, stylized, t_stats,
                                           t_relu4, content_weight: float,
                                           style_weight: float,
                                           dtype: Any = jnp.bfloat16):
    """``perceptual_rp_losses_folded`` with the style/content loss TARGETS
    supplied precomputed instead of re-encoded through VGG every step.

    The targets (style per-scale (mean, std) pairs + the content relu4_1
    feature map — reference adain_rp.py:327-329) depend only on the raw
    images and the FROZEN encoder, never on trainable parameters, so
    recomputing them per iteration (as the reference's loop does for every
    revisit of an image across epochs) is pure waste.  With targets cached
    (``rpst.train.target_cache``), the step keeps exactly one VGG loss
    sweep — the gradient-carrying stylized pass.  Identical loss/grads to
    the recompute path: targets enter under ``stop_gradient`` either way,
    and bf16/f32 cache storage round-trips the computed values exactly
    (pinned in tests/test_target_cache.py)."""
    from ..models.base import mse

    g_stats, g_relu4 = vgg_perceptual_stats(vgg_vars, stylized, dtype)
    loss_s = sum(mse(gm, jax.lax.stop_gradient(tm))
                 + mse(gs, jax.lax.stop_gradient(ts))
                 for (gm, gs), (tm, ts) in zip(g_stats, t_stats))
    loss_c = mse(g_relu4.astype(jnp.float32),
                 jax.lax.stop_gradient(t_relu4).astype(jnp.float32))
    total = content_weight * loss_c + style_weight * loss_s
    return {"style_loss": loss_s, "content_loss": loss_c}, total


def perceptual_rp_losses_q8targets(vgg_vars, scales, stylized, style,
                                   content, content_weight: float,
                                   style_weight: float,
                                   dtype: Any = jnp.bfloat16,
                                   interpret: bool = False):
    """``perceptual_rp_losses_folded`` with the two NO-GRAD target
    forwards (style + content — reference adain_rp.py:327-329) through
    the chained-int8 VGG encoder (round-4 VERDICT item 2).

    Only the stylized image's VGG pass needs gradients; the style/content
    passes merely produce loss TARGETS (stat pairs + relu4_1), so int8
    there perturbs target values by quantization noise and the backward
    sweep's structure not at all.  The stylized pass stays on the folded
    bf16 path (fused Pallas fwd+bwd).  Quality gate: gradient cosine vs
    the bf16-target path, pinned in tests/test_q8_targets.py; the on-hw
    loss-curve A/B is recorded in BASELINE.md."""
    from ..models.base import mse
    from ..models.fast_path_q8 import vgg_target_taps_q8

    g_stats, g_relu4 = vgg_perceptual_stats(vgg_vars, stylized, dtype)
    n = style.shape[0]
    sc = jax.lax.stop_gradient(jnp.concatenate([style, content], axis=0))
    taps = vgg_target_taps_q8(vgg_vars, scales, sc, dtype,
                              interpret=interpret)
    t_stats = []
    for t in taps:
        m, s = calc_mean_std(t[:n].astype(jnp.float32))
        t_stats.append((m[:, 0, 0, :], s[:, 0, 0, :]))
    t_relu4 = taps[-1][n:]

    loss_s = sum(mse(gm, jax.lax.stop_gradient(tm))
                 + mse(gs, jax.lax.stop_gradient(ts))
                 for (gm, gs), (tm, ts) in zip(g_stats, t_stats))
    loss_c = mse(g_relu4.astype(jnp.float32),
                 jax.lax.stop_gradient(t_relu4).astype(jnp.float32))
    total = content_weight * loss_c + style_weight * loss_s
    return {"style_loss": loss_s, "content_loss": loss_c}, total
