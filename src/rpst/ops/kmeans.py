"""Jit-compiled k-means (Lloyd's algorithm) for MST style clustering.

The reference ships style features to the host and runs
``sklearn.cluster.KMeans`` on CPU (``utils/mst.py:117, 136``).  On TPU we
keep the features on device: k-means++-style farthest-point seeding and a
fixed number of Lloyd iterations under ``lax.scan`` (static shapes, no
data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pairwise_sq_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x: (n, d), y: (m, d) -> (n, m) squared distances."""
    x2 = jnp.sum(x * x, axis=1)[:, None]
    y2 = jnp.sum(y * y, axis=1)[None, :]
    return jnp.maximum(x2 + y2 - 2.0 * (x @ y.T), 0.0)


def _seed_centers(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Deterministic farthest-point seeding (k-means++ without randomness)."""
    n = x.shape[0]

    def body(carry, _):
        centers, mind, i = carry
        nxt = jnp.argmax(mind)
        centers = centers.at[i].set(x[nxt])
        d = jnp.sum((x - x[nxt]) ** 2, axis=1)
        return (centers, jnp.minimum(mind, d), i + 1), None

    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[0])
    mind0 = jnp.sum((x - x[0]) ** 2, axis=1)
    (centers, _, _), _ = jax.lax.scan(body, (centers0, mind0, 1), None, length=k - 1)
    return centers


def kmeans(x: jnp.ndarray, k: int, iters: int = 25):
    """Cluster rows of x (n, d) into k groups.

    Returns (labels (n,), centers (k, d)).  Empty clusters keep their
    previous center (sklearn reassigns; with farthest-point init on the
    feature sets involved this is rare and benign for MST grouping).
    """
    x = jnp.asarray(x, jnp.float32)
    centers = _seed_centers(x, k)

    def step(centers, _):
        d = _pairwise_sq_dist(x, centers)  # (n, k)
        labels = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (n, k)
        count = jnp.sum(onehot, axis=0)  # (k,)
        sums = onehot.T @ x  # (k, d)
        new = jnp.where(count[:, None] > 0, sums / jnp.maximum(count, 1.0)[:, None],
                        centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    labels = jnp.argmin(_pairwise_sq_dist(x, centers), axis=1)
    return labels, centers
