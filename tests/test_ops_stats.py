"""Oracle tests for the AdaIN statistics family.

Each op is validated two ways:
  1. closed-form property oracles (e.g. AdaIN output stats == style stats),
  2. an independent torch (CPU) implementation of the reference math
     (same formulas as network/base.py:399-418, sanet.py:20-24,
     utils/mst.py:18-30 — written from the math, not copied).
"""

import numpy as np
import pytest
import torch

from rpst.ops import (adaptive_instance_normalization, calc_mean_std,
                      groupwise_adain, mean_variance_norm)


def _torch_calc_mean_std(feat_nchw, eps=1e-5):
    n, c = feat_nchw.shape[:2]
    var = feat_nchw.reshape(n, c, -1).var(dim=2) + eps
    std = var.sqrt().reshape(n, c, 1, 1)
    mean = feat_nchw.reshape(n, c, -1).mean(dim=2).reshape(n, c, 1, 1)
    return mean, std


def _torch_adain(content, style):
    smean, sstd = _torch_calc_mean_std(style)
    cmean, cstd = _torch_calc_mean_std(content)
    return (content - cmean) / cstd * sstd + smean


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_calc_mean_std_matches_torch(rng):
    x = rng.normal(size=(2, 8, 6, 7)).astype(np.float32)  # NCHW for torch
    tm, ts = _torch_calc_mean_std(torch.from_numpy(x))
    jm, js = calc_mean_std(np.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(jm)[:, 0, 0, :], tm.numpy()[:, :, 0, 0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(js)[:, 0, 0, :], ts.numpy()[:, :, 0, 0],
                               rtol=1e-5, atol=1e-6)


def test_adain_matches_torch(rng):
    c = rng.normal(size=(2, 8, 16, 16)).astype(np.float32) * 3 + 1
    s = rng.normal(size=(2, 8, 16, 16)).astype(np.float32) * 0.5 - 2
    expected = _torch_adain(torch.from_numpy(c), torch.from_numpy(s)).numpy()
    got = np.asarray(adaptive_instance_normalization(_nhwc(c), _nhwc(s)))
    np.testing.assert_allclose(got, _nhwc(expected), rtol=1e-4, atol=1e-5)


def test_adain_output_has_style_stats(rng):
    """Property oracle: AdaIN output mean/std == style mean/std."""
    c = rng.normal(size=(1, 32, 32, 16)).astype(np.float32) * 5
    s = rng.normal(size=(1, 32, 32, 16)).astype(np.float32) * 2 + 3
    out = np.asarray(adaptive_instance_normalization(c, s))
    np.testing.assert_allclose(out.mean(axis=(1, 2)), s.mean(axis=(1, 2)),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out.std(axis=(1, 2)), s.std(axis=(1, 2)),
                               rtol=1e-2, atol=1e-2)


def test_mean_variance_norm_zero_mean_unit_std(rng):
    x = rng.normal(size=(3, 10, 12, 5)).astype(np.float32) * 7 + 2
    out = np.asarray(mean_variance_norm(x))
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=(1, 2)), 1.0, atol=1e-2)


def test_groupwise_adain_prototype(rng):
    """Every output channel gets the channel-averaged style stats."""
    c = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    s = rng.normal(size=(1, 8, 8, 4)).astype(np.float32) * 2 + 1
    out = np.asarray(groupwise_adain(c, s))
    # torch oracle of utils/mst.py:18-30
    ct, st = torch.from_numpy(np.transpose(c, (0, 3, 1, 2))), torch.from_numpy(
        np.transpose(s, (0, 3, 1, 2)))
    cm, cs = _torch_calc_mean_std(ct)
    sm, ss = _torch_calc_mean_std(st)
    proto_m = sm.mean(dim=1, keepdim=True)
    proto_s = ss.mean(dim=1, keepdim=True)
    expected = ((ct - cm) / cs * proto_s + proto_m).numpy()
    np.testing.assert_allclose(out, _nhwc(expected), rtol=1e-4, atol=1e-5)


def test_adain_bfloat16_stats_stable(rng):
    """bf16 activations: statistics computed in f32 stay accurate."""
    import jax.numpy as jnp
    c = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
    s = rng.normal(size=(1, 16, 16, 8)).astype(np.float32) * 2
    out_f32 = np.asarray(adaptive_instance_normalization(c, s))
    out_bf16 = np.asarray(adaptive_instance_normalization(
        jnp.asarray(c, jnp.bfloat16), jnp.asarray(s, jnp.bfloat16)).astype(jnp.float32))
    np.testing.assert_allclose(out_bf16, out_f32, rtol=0.1, atol=0.1)
