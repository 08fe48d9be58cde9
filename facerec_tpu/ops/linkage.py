"""Complete-linkage agglomerative clustering on device.

The reference calls scipy's C implementation
(/root/reference/facerec/cluster.py:41-42: ``linkage(method="complete")``
+ ``fcluster(criterion="maxclust")``).  Here the O(N²) distance matrix
is one MXU matmul and the greedy merge loop runs as a ``lax.fori_loop``
over that matrix — N is ~10³ trajectories per film, so the whole
clustering is a single small device program.

Cut semantics: exactly ``N - n_clusters`` merges, which equals
``fcluster(..., t=n_clusters, criterion="maxclust")`` whenever merge
heights are strictly increasing (ties are measure-zero for real
embeddings).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = 3.0e38  # plain float: avoids backend init at import time


def pairwise_distances(x: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix via one matmul (MXU-friendly)."""
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] - 2.0 * (x @ x.T) + sq[None, :]
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def complete_linkage(dist: jnp.ndarray, n_clusters: int) -> jnp.ndarray:
    """Cluster labels from complete-linkage agglomeration.

    Args:
        dist: (N, N) symmetric distance matrix.
        n_clusters: target cluster count (static; clamped to [1, N]).

    Returns:
        (N,) int32 labels in [0, N): each point labeled by the lowest
        point index in its cluster.
    """
    n = dist.shape[0]
    n_clusters = max(1, min(int(n_clusters), n))
    n_merges = n - n_clusters

    d = jnp.where(jnp.eye(n, dtype=bool), _INF, dist.astype(jnp.float32))
    labels0 = jnp.arange(n, dtype=jnp.int32)

    def body(_, carry):
        d, labels = carry
        flat = jnp.argmin(d)
        a = (flat // n).astype(jnp.int32)
        b = (flat % n).astype(jnp.int32)
        i = jnp.minimum(a, b)
        j = jnp.maximum(a, b)
        # complete linkage: new cluster's distance is the max
        row = jnp.maximum(d[i], d[j])
        row = row.at[i].set(_INF).at[j].set(_INF)
        d = d.at[i, :].set(row).at[:, i].set(row)
        d = d.at[j, :].set(_INF).at[:, j].set(_INF)
        labels = jnp.where(labels == j, i, labels)
        return d, labels

    _, labels = jax.lax.fori_loop(0, n_merges, body, (d, labels0))
    return labels


def cluster_vectors(vectors: np.ndarray, n_clusters: int) -> np.ndarray:
    """Host wrapper: embeddings → contiguous labels 0..k-1 (first-seen
    order, like relabeling via np.unique on root labels)."""
    n = len(vectors)
    if n == 0:
        return np.zeros((0,), np.int32)
    if n == 1:
        return np.zeros((1,), np.int32)
    dist = pairwise_distances(jnp.asarray(vectors, jnp.float32))
    roots = np.asarray(complete_linkage(dist, n_clusters))
    _, labels = np.unique(roots, return_inverse=True)
    return labels.astype(np.int32)
