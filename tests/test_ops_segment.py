"""Masked (segment-guided) AdaIN oracle tests.

Torch oracle mirrors the reference's ragged per-label path
(base.py:458-530): per-label index_select, unbiased stats, index_copy_.
"""

import numpy as np
import torch

from rpst.ops.segment import masked_adain, masked_adain_batch


def _torch_masked_adain(cf_chw, sf_chw, c_seg, s_seg):
    C = cf_chw.shape[0]
    cf = cf_chw.reshape(C, -1).clone()
    sf = sf_chw.reshape(C, -1)
    target = cf.clone()
    labels = np.unique(c_seg)
    for l in labels:
        c_idx = np.where(c_seg.reshape(-1) == l)[0]
        s_idx = np.where(s_seg.reshape(-1) == l)[0]
        cs, ss = c_idx.size, s_idx.size
        if not (cs > 10 and ss > 10 and cs / max(ss, 1) < 100 and ss / max(cs, 1) < 100):
            continue
        mc = cf[:, c_idx]
        ms = sf[:, s_idx]
        cm, cv = mc.mean(1, keepdim=True), mc.var(1, keepdim=True) + 1e-5
        sm, sv = ms.mean(1, keepdim=True), ms.var(1, keepdim=True) + 1e-5
        norm = (mc - cm) / cv.sqrt() * sv.sqrt() + sm
        target[:, torch.from_numpy(c_idx)] = norm
    return target.reshape(cf_chw.shape).numpy()


def test_masked_adain_matches_torch(rng):
    H = W = 16
    C, L = 6, 4
    cf = rng.normal(size=(H, W, C)).astype(np.float32)
    sf = rng.normal(size=(H, W, C)).astype(np.float32) * 2 + 1
    c_seg = rng.integers(0, L, size=(H, W)).astype(np.int32)
    s_seg = rng.integers(0, L, size=(H, W)).astype(np.int32)
    expected = _torch_masked_adain(
        torch.from_numpy(np.transpose(cf, (2, 0, 1))),
        torch.from_numpy(np.transpose(sf, (2, 0, 1))), c_seg, s_seg)
    got = np.asarray(masked_adain(cf, sf, c_seg, s_seg, num_labels=L))
    np.testing.assert_allclose(got, np.transpose(expected, (1, 2, 0)),
                               rtol=1e-4, atol=1e-4)


def test_masked_adain_small_labels_untouched(rng):
    """Labels with <=10 px on either side are left as content (invalid)."""
    H = W = 8
    cf = rng.normal(size=(H, W, 3)).astype(np.float32)
    sf = rng.normal(size=(H, W, 3)).astype(np.float32)
    c_seg = np.zeros((H, W), np.int32)
    c_seg[0, :4] = 1  # 4 px of label 1 -> invalid
    s_seg = np.zeros((H, W), np.int32)
    s_seg[0, :4] = 1
    out = np.asarray(masked_adain(cf, sf, c_seg, s_seg, num_labels=2))
    np.testing.assert_allclose(out[0, :4], cf[0, :4], atol=1e-6)
    assert not np.allclose(out[2:], cf[2:], atol=1e-3)  # label 0 got stylized


def test_masked_adain_batch_shapes(rng):
    cf = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    sf = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    seg = np.zeros((2, 8, 8), np.int32)
    out = masked_adain_batch(cf, sf, seg, seg, num_labels=4)
    assert out.shape == cf.shape
