"""Affinity/top-k op oracles vs independent torch implementations."""

import numpy as np
import torch
import torch.nn.functional as F

from rpst.ops import cal_affinity_map, cal_affinity_matrix, cal_dist
import pytest


def test_cal_dist_matches_torch(rng):
    A = rng.normal(size=(5, 7)).astype(np.float32)
    B = rng.normal(size=(5, 9)).astype(np.float32)
    ta, tb = torch.from_numpy(A), torch.from_numpy(B)
    expected = (ta.pow(2).sum(0).reshape(-1, 1) + tb.pow(2).sum(0).reshape(1, -1)
                - 2 * ta.t() @ tb).numpy()
    got = np.asarray(cal_dist(A, B))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def _torch_affinity_map(content_nchw, style_nchw, k):
    """Independent implementation of base.py:317-346 semantics (CPU)."""
    c = content_nchw.squeeze(0)
    s = style_nchw.squeeze(0)
    C, H, W = c.shape
    nc = F.normalize(c, dim=0).reshape(C, -1)
    ns = F.normalize(s, dim=0).reshape(C, -1)
    att = nc.t() @ ns
    aff = torch.zeros(H * W, H * W)
    idx0 = torch.topk(att, k, 0)[1]
    aff.scatter_(0, idx0, torch.ones(k, H * W))
    idx1 = torch.topk(att, k, 1)[1]
    aff.scatter_(1, idx1, torch.ones(H * W, k))
    return aff.numpy()


def test_cal_affinity_map_matches_torch(rng):
    c = rng.normal(size=(1, 6, 8, 8)).astype(np.float32)
    s = rng.normal(size=(1, 6, 8, 8)).astype(np.float32)
    expected = _torch_affinity_map(torch.from_numpy(c), torch.from_numpy(s), k=3)
    got = np.asarray(cal_affinity_map(
        np.transpose(c[0], (1, 2, 0)), np.transpose(s[0], (1, 2, 0)), k=3))
    # f32 matmul rounding differs between XLA and torch, which can flip a
    # top-k boundary entry; require >=99.9% exact agreement.
    assert (got == expected).mean() >= 0.999


def test_affinity_map_counts(rng):
    """Each row and column has at least k ones (union of two top-k scatters)."""
    c = rng.normal(size=(8, 8, 4)).astype(np.float32)
    s = rng.normal(size=(8, 8, 4)).astype(np.float32)
    aff = np.asarray(cal_affinity_map(c, s, k=3))
    assert (aff.sum(axis=0) >= 3).all()
    assert (aff.sum(axis=1) >= 3).all()
    assert set(np.unique(aff)) <= {0.0, 1.0}


def test_cal_affinity_matrix_cosine(rng):
    c = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    s = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    got = np.asarray(cal_affinity_matrix(c, s))
    assert got.shape == (2, 16, 16)
    assert np.abs(got).max() <= 1.0 + 1e-5
    # torch oracle (sanet.py:12-18 semantics)
    tc = torch.from_numpy(np.transpose(c, (0, 3, 1, 2)))
    ts = torch.from_numpy(np.transpose(s, (0, 3, 1, 2)))
    b, ch = 2, 8
    ncf = F.normalize(tc.reshape(b, ch, -1), dim=1)
    nsf = F.normalize(ts.reshape(b, ch, -1), dim=1)
    expected = torch.bmm(ncf.permute(0, 2, 1), nsf).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_mrf_chunked_matches_dense(rng):
    """Streamed top-k masked distance sum == dense affinity*dist sum,
    including non-divisible chunk sizes (padding path)."""
    import jax.numpy as jnp
    from rpst.ops.affinity import (cal_affinity_map, cal_dist,
                                   mrf_topk_masked_dist_sum)

    h, w, c = 6, 7, 5
    cf = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    sf = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    for k in (1, 3):
        dense = float(jnp.sum(
            cal_affinity_map(cf, sf, k)
            * cal_dist(cf.reshape(-1, c).T, sf.reshape(-1, c).T)))
        for chunk in (8, 16, h * w, 1024):
            got = float(mrf_topk_masked_dist_sum(cf, sf, k, chunk))
            np.testing.assert_allclose(got, dense, rtol=1e-4), (k, chunk)


def test_mrf_loss_chunked_matches_dense_batched(rng):
    import jax.numpy as jnp
    from rpst.models.mrf_rp import mrf_loss

    cf = jnp.asarray(rng.normal(size=(2, 6, 6, 4)).astype(np.float32))
    sf = jnp.asarray(rng.normal(size=(2, 6, 6, 4)).astype(np.float32))
    dense = float(mrf_loss(cf, sf, k=3))
    got = float(mrf_loss(cf, sf, k=3, chunk=16))
    np.testing.assert_allclose(got, dense, rtol=1e-4)
