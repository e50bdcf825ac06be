"""Infinite reshuffling sampler; reference ``sampler.py:5-26``."""

from __future__ import annotations

import numpy as np


def InfiniteSampler(n: int, seed=None):
    """Endless stream of indices: a fresh permutation each epoch.

    The reference starts at ``i = n - 1`` of the first permutation (so the
    very first epoch yields one element before reshuffling) — kept."""
    rng = np.random.default_rng(seed)
    i = n - 1
    order = rng.permutation(n)
    while True:
        yield int(order[i])
        i += 1
        if i >= n:
            order = rng.permutation(n)
            i = 0
