"""Infinite reshuffling sampler; reference ``sampler.py:5-26``."""

from __future__ import annotations

import numpy as np


def InfiniteSampler(n: int, seed=None, shard_index: int = 0,
                    shard_count: int = 1):
    """Endless stream of indices: a fresh permutation each epoch.

    The reference starts at ``i = n - 1`` of the first permutation (so the
    very first epoch yields one element before reshuffling) — kept.

    ``shard_index``/``shard_count`` give each host of a multi-host slice a
    disjoint strided view of the SAME shuffled stream (seed must match
    across hosts): host k yields stream positions ≡ k (mod count), so the
    union over hosts in lockstep is exactly the single-host stream — the
    per-host feeder the reference's single-process DataLoader never
    needed (train.py:160-170)."""
    assert 0 <= shard_index < shard_count, (shard_index, shard_count)
    rng = np.random.default_rng(seed)
    i = n - 1
    pos = 0  # global stream position
    order = rng.permutation(n)
    while True:
        if pos % shard_count == shard_index:
            yield int(order[i])
        pos += 1
        i += 1
        if i >= n:
            order = rng.permutation(n)
            i = 0
