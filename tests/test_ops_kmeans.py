"""K-means sanity tests (on-device replacement for sklearn in MST)."""

import numpy as np

from rpst.ops.kmeans import kmeans


def test_kmeans_recovers_separated_clusters(rng):
    centers = np.array([[0, 0], [10, 10], [-10, 10]], np.float32)
    pts = np.concatenate([
        centers[i] + rng.normal(scale=0.3, size=(50, 2)).astype(np.float32)
        for i in range(3)])
    labels, found = kmeans(pts, k=3, iters=20)
    labels = np.asarray(labels)
    # each true cluster maps to exactly one predicted label
    for i in range(3):
        block = labels[i * 50:(i + 1) * 50]
        assert (block == block[0]).all()
    assert len(set(labels[::50].tolist())) == 3
    # found centers close to the true ones (order-free)
    found = np.asarray(found)
    d = np.linalg.norm(found[:, None, :] - centers[None], axis=-1).min(axis=0)
    assert (d < 0.5).all()


def test_kmeans_jits(rng):
    import jax
    pts = rng.normal(size=(64, 8)).astype(np.float32)
    labels, centers = jax.jit(kmeans, static_argnums=(1, 2))(pts, 4, 10)
    assert labels.shape == (64,)
    assert centers.shape == (4, 8)
