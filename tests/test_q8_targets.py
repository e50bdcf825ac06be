"""Int8 no-grad VGG loss targets for training (round-4 VERDICT item 2).

The style/content VGG forwards in the RP loss are loss TARGETS only
(reference adain_rp.py:327-329 — no gradients flow through them), so the
chained-int8 VGG encoder can compute them.  These tests gate the feature
on evidence: target-stat fidelity, gradient direction (cosine vs the
bf16-target path), and the ModelBundle/train-step wiring.  The on-hw
throughput + loss-curve A/B is recorded in BASELINE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.config import load_config
from rpst.models import build_model
from rpst.models.fast_path_q8 import (calibrate_vgg_targets_q8,
                                      vgg_target_taps_q8)
from rpst.nn.vgg import init_vgg_params
from rpst.nn.vgg_folded import (perceptual_rp_losses_folded,
                                perceptual_rp_losses_q8targets)

pytestmark = pytest.mark.slow


def _setup(rng, batch=4, img=32):
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=3, hidden_dim=16, img_size=img,
                           inception_num=0, attention="none",
                           exec_strategy="folded",
                           compute_dtype="float32",
                           train_q8_targets=True))
    bundle = build_model(cfg)
    content = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    style = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    key = jax.random.PRNGKey(0)
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    params = bundle.model.init(key, content, style, train=False)["params"]
    return bundle, vgg_vars, params, content, style


def test_target_taps_close_to_bf16(rng):
    """The int8 target taps match the f32 VGG taps to quantization
    noise (relative error of the per-tap instance stats < 5%)."""
    from rpst.ops.stats import calc_mean_std

    _, vgg_vars, _, content, style = _setup(rng)
    scales = calibrate_vgg_targets_q8(vgg_vars, content, style)
    sc = jnp.concatenate([style, content], axis=0)
    taps_q = vgg_target_taps_q8(vgg_vars, scales, sc, jnp.float32,
                                interpret=True)
    from rpst.models.fast_path_q8 import _vgg_q8_layers
    # f32 reference taps through the plain encoder
    from rpst.nn.vgg import VGG19Encoder
    enc = VGG19Encoder(num_stages=4)
    taps_f = enc.apply(vgg_vars, sc)
    for i, (q, f) in enumerate(zip(taps_q, taps_f)):
        mq, sq = calc_mean_std(q.astype(jnp.float32))
        mf, sf = calc_mean_std(f.astype(jnp.float32))
        rel = float(jnp.max(jnp.abs(mq - mf))
                    / (jnp.max(jnp.abs(mf)) + 1e-8))
        rel_s = float(jnp.max(jnp.abs(sq - sf))
                      / (jnp.max(jnp.abs(sf)) + 1e-8))
        assert rel < 0.05 and rel_s < 0.05, (i, rel, rel_s)


def test_gradient_cosine_vs_bf16_targets(rng):
    """Gradients with int8 targets stay aligned with the bf16-target
    gradients (cosine > 0.98 over the flattened tree) — the quality gate
    the VERDICT asks for."""
    bundle, vgg_vars, params, content, style = _setup(rng)
    scales = calibrate_vgg_targets_q8(vgg_vars, content, style)
    from rpst.models.fast_path import stylize_multi_adain_folded

    def loss_bf16(p):
        stylized = stylize_multi_adain_folded(p, content, style,
                                              dtype=jnp.float32,
                                              use_pallas=False)
        _, total = perceptual_rp_losses_folded(
            vgg_vars, stylized, style, content, 1.0, 2.0,
            dtype=jnp.float32)
        return total

    def loss_q8(p):
        stylized = stylize_multi_adain_folded(p, content, style,
                                              dtype=jnp.float32,
                                              use_pallas=False)
        _, total = perceptual_rp_losses_q8targets(
            vgg_vars, scales, stylized, style, content, 1.0, 2.0,
            dtype=jnp.float32, interpret=True)
        return total

    g_ref = jax.grad(loss_bf16)(params)
    g_q8 = jax.grad(loss_q8)(params)
    a = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_ref)])
    b = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_q8)])
    cos = float(jnp.vdot(a, b)
                / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-12))
    assert cos > 0.98, cos
    # loss values also stay within quantization noise
    l_ref, l_q8 = float(loss_bf16(params)), float(loss_q8(params))
    assert abs(l_ref - l_q8) / (abs(l_ref) + 1e-8) < 0.05, (l_ref, l_q8)


def test_bundle_loss_dispatches_q8_targets(rng):
    """ModelBundle.loss routes through the int8-target loss when the
    knob is on AND scales are set; a few optimizer steps reduce it."""
    import optax

    bundle, vgg_vars, params, content, style = _setup(rng)
    bundle.q8_target_scales = calibrate_vgg_targets_q8(vgg_vars, content,
                                                       style)
    total, (parts, _) = bundle.loss({"params": params}, vgg_vars,
                                    content, style, train=True)
    assert np.isfinite(float(total))

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o):
        (t, _), g = jax.value_and_grad(
            lambda pp: bundle.loss({"params": pp}, vgg_vars, content,
                                   style, train=True), has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, t

    losses = []
    for _ in range(3):
        params, opt_state, t = step(params, opt_state)
        losses.append(float(t))
    assert losses[-1] < losses[0]


def test_small_batch_stays_bf16(rng):
    """batch < TRAIN_Q8_TARGETS_MIN_BATCH keeps bf16 targets (the
    measured b1 regression — policy gate)."""
    bundle, vgg_vars, params, content, style = _setup(rng, batch=2)
    bundle.q8_target_scales = calibrate_vgg_targets_q8(vgg_vars, content,
                                                       style)
    t_gated, _ = bundle.loss({"params": params}, vgg_vars, content,
                             style, train=True)
    cfg_off = bundle.cfg.replace(train_q8_targets=False)
    bundle_off = build_model(cfg_off)
    t_off, _ = bundle_off.loss({"params": params}, vgg_vars, content,
                               style, train=True)
    np.testing.assert_allclose(float(t_gated), float(t_off), rtol=1e-6)


def test_bundle_loss_without_scales_stays_bf16(rng):
    """Knob on but no scales calibrated -> the bf16-target path (no
    crash, same value as knob off)."""
    bundle, vgg_vars, params, content, style = _setup(rng)
    t_on, _ = bundle.loss({"params": params}, vgg_vars, content, style,
                          train=True)
    cfg_off = bundle.cfg.replace(train_q8_targets=False)
    bundle_off = build_model(cfg_off)
    t_off, _ = bundle_off.loss({"params": params}, vgg_vars, content,
                               style, train=True)
    np.testing.assert_allclose(float(t_on), float(t_off), rtol=1e-6)


def test_xla_engine_taps_match_pallas(rng):
    """conv_impl='xla' (the one-engine small-batch route, VERDICT r5
    item 3) must produce the same integer-math taps as the Pallas
    kernel path — both compute int8 matmuls + the identical f32
    epilogue, so taps agree to epilogue reassociation noise."""
    _, vgg_vars, _, content, style = _setup(rng, batch=2)
    imgs = jnp.concatenate([style, content], axis=0)
    scales = calibrate_vgg_targets_q8(vgg_vars, content, style)
    taps_p = vgg_target_taps_q8(vgg_vars, scales, imgs,
                                dtype=jnp.float32, interpret=True,
                                conv_impl="pallas")
    taps_x = vgg_target_taps_q8(vgg_vars, scales, imgs,
                                dtype=jnp.float32, conv_impl="xla")
    assert len(taps_p) == len(taps_x)
    for a, b in zip(taps_p, taps_x):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-3, atol=5e-2)


def test_auto_engine_resolves_by_batch():
    """'auto' picks one XLA engine below the LD 2N crossover and the
    Pallas kernel at/above it (policy.LD_MIXED_ENGINE_MIN_2N)."""
    import rpst.models.fast_path_q8 as q8
    calls = []
    orig = q8._make_conv_q_std

    def spy(*a, **k):
        calls.append("pallas")
        return orig(*a, **k)

    gen = np.random.default_rng(0)
    _, vgg_vars, _, c, s = _setup(gen, batch=1)
    scales = calibrate_vgg_targets_q8(vgg_vars, c, s)
    try:
        q8._make_conv_q_std = spy
        # 2N = 2 < 8 -> xla (no _make_conv_q_std call)
        vgg_target_taps_q8(vgg_vars, scales,
                           jnp.concatenate([s, c], axis=0),
                           dtype=jnp.float32, conv_impl="auto")
        assert calls == []
        # 2N = 8 -> pallas
        big = jnp.tile(jnp.concatenate([s, c], axis=0), (4, 1, 1, 1))
        try:
            vgg_target_taps_q8(vgg_vars, scales, big,
                               dtype=jnp.float32, conv_impl="auto")
        except Exception:
            pass  # the Pallas kernel needs interpret on CPU; the spy
            # firing is the assertion, not the numerics
        assert calls == ["pallas"]
    finally:
        q8._make_conv_q_std = orig
