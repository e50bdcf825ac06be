"""WCT oracle tests: eigh-based TPU math vs float64 torch-SVD reference math.

The torch oracle re-implements the whiten/color formulas of
network/wct_rp.py:7-114 from the math (SVD of regularized covariances,
spectrum cutoff 1e-5, content covariance +I) in float64.
"""

import numpy as np
import torch

from rpst.ops import whiten_and_color
from rpst.ops.wct import matrix_inv_sqrt, matrix_sqrt, wct_fuse


def _torch_mat_pow(A, power):
    A = A.clone()
    A += torch.eye(A.shape[0], dtype=A.dtype) * 1e-4
    u, e, v = torch.svd(A, some=False)
    k = A.shape[-1]
    for i in range(k):
        if e[i] < 1e-5:
            k = i
            break
    d = e[:k].pow(power)
    return v[:, :k] @ torch.diag(d) @ v[:, :k].t()


def _torch_wct(cF, sF, method):
    cF, sF = cF.double(), sF.double()
    c_mean = cF.mean(1, keepdim=True)
    cFc = cF - c_mean
    c_conv = cFc @ cFc.t() / (cF.shape[1] - 1) + torch.eye(cF.shape[0]).double()
    s_mean = sF.mean(1, keepdim=True)
    sFc = sF - s_mean
    s_conv = sFc @ sFc.t() / (sF.shape[1] - 1)
    if method == "original":
        target = _torch_mat_pow(s_conv, 0.5) @ (_torch_mat_pow(c_conv, -0.5) @ cFc)
    else:
        c_sqrt = _torch_mat_pow(c_conv, 0.5)
        c_inv = _torch_mat_pow(c_conv, -0.5)
        mid = _torch_mat_pow(c_sqrt @ s_conv @ c_sqrt, 0.5)
        target = c_inv @ mid @ c_inv @ cFc
    return (target + s_mean).numpy()


def test_matrix_sqrt_roundtrip(rng):
    x = rng.normal(size=(16, 100)).astype(np.float32)
    cov = x @ x.T / 99
    s = np.asarray(matrix_sqrt(cov))
    np.testing.assert_allclose(s @ s, cov + 1e-4 * np.eye(16), rtol=1e-3, atol=1e-3)


def test_matrix_inv_sqrt_whitens(rng):
    x = rng.normal(size=(8, 400)).astype(np.float32)
    x = x - x.mean(axis=1, keepdims=True)
    cov = x @ x.T / 399 + np.eye(8, dtype=np.float32)
    w = np.asarray(matrix_inv_sqrt(cov))
    white = w @ x
    wcov = white @ white.T / 399
    # whitened covariance ~ identity (up to the +I and +1e-4 regularizers)
    np.testing.assert_allclose(wcov, np.eye(8) * wcov.diagonal().mean(),
                               rtol=0.2, atol=0.15)


def test_wct_matches_torch_oracle(rng):
    for method in ("original", "closed-form"):
        c = rng.normal(size=(12, 256)).astype(np.float32) * 2 + 1
        s = rng.normal(size=(12, 300)).astype(np.float32) * 0.5 - 1
        expected = _torch_wct(torch.from_numpy(c), torch.from_numpy(s), method)
        got = np.asarray(whiten_and_color(c, s, method))
        np.testing.assert_allclose(got, expected, rtol=5e-3, atol=5e-3)


def test_wct_output_covariance_matches_style(rng):
    """Property oracle: closed-form WCT output covariance == style covariance.

    Note the reference adds +I to the content covariance (wct_rp.py:89),
    which biases the transform when content variance is O(1); scale the
    content up so the regularizer is negligible and the property is exact.
    """
    c = rng.normal(size=(6, 500)).astype(np.float32) * 30.0
    A = rng.normal(size=(6, 6)).astype(np.float32)
    s = (A @ rng.normal(size=(6, 500)).astype(np.float32))
    out = np.asarray(whiten_and_color(c, s, "closed-form"))
    out_c = out - out.mean(axis=1, keepdims=True)
    s_c = s - s.mean(axis=1, keepdims=True)
    cov_out = out_c @ out_c.T / 499
    cov_s = s_c @ s_c.T / 499
    np.testing.assert_allclose(cov_out, cov_s, rtol=0.15, atol=0.3)
    np.testing.assert_allclose(out.mean(axis=1), s.mean(axis=1), atol=0.05)


def test_wct_fuse_batched_and_detached(rng):
    import jax
    c = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
    s = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
    out = wct_fuse(c, s)
    assert out.shape == c.shape
    # gradient is stopped: d(sum(fuse))/d(content) == 0
    g = jax.grad(lambda x: float(0) + wct_fuse(x, s).sum())(c)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=0)


def _torch_labeled_wct(f_c, f_s, alpha, label):
    """Float64 torch oracle of reference utils/mst.py:62-111 (written from
    the math: full-rank SVD whiten/color over a spatially masked feature,
    mean over all pixels incl. zeros, covariance normalized by
    sum(label)/c - 1)."""
    f_c = f_c.double()  # (c, h, w)
    f_s = f_s.double()  # (k, c)
    label = label.double()  # (c, h, w) expanded mask
    c, h, w = f_c.shape
    cf = (f_c * label).reshape(c, -1)
    c_mean = torch.mean(cf, 1).reshape(c, 1, 1) * label
    cf = (cf.reshape(c, h, w) - c_mean).reshape(c, -1)
    c_cov = (cf @ cf.t()) / (label.sum().item() / c - 1)
    _, c_e, c_v = torch.svd(c_cov)
    w2 = c_v @ torch.diag(c_e.pow(-0.5)) @ c_v.t()
    whitened = w2 @ cf
    sf = f_s.t()
    k = sf.shape[1]
    s_mean = torch.mean(sf, 1, keepdim=True)
    sfc = sf - s_mean
    s_cov = (sfc @ sfc.t()) / (k - 1)
    _, s_e, s_v = torch.svd(s_cov)
    c2 = s_v @ torch.diag(s_e.pow(0.5)) @ s_v.t()
    colored = (c2 @ whitened).reshape(c, h, w) + s_mean.reshape(c, 1, 1) * label
    return (alpha * colored + (1 - alpha) * (f_c * label)).numpy()


def test_labeled_whiten_and_color_matches_torch(rng):
    from rpst.ops.mst import labeled_whiten_and_color
    c_ch, h, w, k = 8, 12, 10, 200
    f_c = rng.normal(size=(h, w, c_ch)).astype(np.float32) * 2.0 + 0.5
    f_s = rng.normal(size=(k, c_ch)).astype(np.float32) * 1.5 - 0.2
    mask = (rng.uniform(size=(h, w)) > 0.4).astype(np.float32)
    out = np.asarray(labeled_whiten_and_color(f_c, f_s, 0.7, mask))
    ref = _torch_labeled_wct(
        torch.from_numpy(f_c).permute(2, 0, 1),
        torch.from_numpy(f_s),
        0.7,
        torch.from_numpy(mask)[None].expand(c_ch, h, w),
    )
    np.testing.assert_allclose(out, np.transpose(ref, (1, 2, 0)),
                               rtol=1e-2, atol=2e-2)


def test_labeled_wct_failure_fallback(rng):
    """A rank-deficient masked covariance blows up |e|^-0.5 exactly like the
    reference's MAGMA SVD failure; the fallback returns f_c * label
    (utils/mst.py:106-109)."""
    from rpst.ops.mst import labeled_whiten_and_color
    h, w, c = 6, 6, 8
    f_c = np.zeros((h, w, c), dtype=np.float32)  # zero covariance
    f_s = rng.normal(size=(50, c)).astype(np.float32)
    mask = np.ones((h, w), dtype=np.float32)
    out = np.asarray(labeled_whiten_and_color(f_c, f_s, 1.0, mask))
    np.testing.assert_allclose(out, f_c * mask[..., None], atol=0)
