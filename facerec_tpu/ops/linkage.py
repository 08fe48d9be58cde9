"""Complete-linkage agglomerative clustering on device.

The reference calls scipy's C implementation
(/root/reference/facerec/cluster.py:41-42: ``linkage(method="complete")``
+ ``fcluster(criterion="maxclust")``).  Here the O(N²) distance matrix
is one MXU matmul and the greedy merge loop runs as a ``lax.scan``
over that matrix — N is ~10³ trajectories per film, so the whole
clustering is a single small device program.

Label semantics match scipy exactly (validated byte-for-byte in
tests/test_reference_parity.py): the device records the full merge
sequence (complete linkage is monotone, so greedy global-min order is
scipy's height-sorted row order), and the host reproduces fcluster's
1-based numbering — a preorder depth-first walk of the dendrogram from
the root, smaller-id child first, incrementing the label on each
cluster-root entry.  The downstream reference pipeline is sensitive to
the label VALUES (split ordering, equal-size tie-breaks), not just the
partition, so this numbering is part of the contract.

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


def complete_linkage_merges(dist: jnp.ndarray) -> jnp.ndarray:
    """Full agglomeration sequence from a distance matrix.

    Returns (N-1, 2) int32: per merge step (ascending height for the
    monotone complete-linkage criterion), the two merged clusters
    identified by their row index = lowest member point index; the
    merged cluster continues under the smaller row index.
    """
    n = dist.shape[0]
    d = jnp.where(jnp.eye(n, dtype=bool), _INF, dist.astype(jnp.float32))

    def body(d, _):
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
        return d, jnp.stack([i, j])

    _, merges = jax.lax.scan(body, d, None, length=n - 1)
    return merges


def fcluster_from_merges(merges: np.ndarray, n: int,
                         n_clusters: int) -> np.ndarray:
    """scipy ``fcluster(..., criterion="maxclust")`` labels from a
    recorded merge sequence.

    Reproduces scipy's numbering (scipy/cluster/_hierarchy.pyx
    ``cluster_monocrit`` + ``label``): linkage rows get cluster ids
    n+row with children ordered smaller-id first; the tree walk
    descends into unvisited internal children (left then right) before
    labeling a node's leaf children, a below-cutoff internal node
    claims the next label for its whole subtree on first entry, and a
    leaf outside any such subtree is a singleton claiming the next
    label where the walk assigns it.
    """
    n_clusters = int(n_clusters)
    if n == 1 or n_clusters >= n:
        # t >= n: scipy returns identity labels, skipping the tree walk
        return np.arange(1, n + 1, dtype=np.int32)
    id_of = list(range(n))          # root point index → scipy cluster id
    children = {}                   # scipy id → (left_id, right_id)
    for k, (i, j) in enumerate(np.asarray(merges)):
        a, b = id_of[i], id_of[j]
        children[n + k] = (a, b) if a < b else (b, a)
        id_of[i] = n + k

    # Internal nodes that are maximal below the maxclust cut (= merged
    # within the first n - n_clusters height-ordered rows).  t <= 0:
    # scipy's bisection ends below the smallest merge height — no node
    # qualifies and every point becomes a traversal-order singleton.
    active = set()
    for k in range(n - n_clusters if n_clusters > 0 else 0):
        active.discard(children[n + k][0])
        active.discard(children[n + k][1])
        active.add(n + k)

    labels = np.zeros(n, np.int32)
    nc = 0
    leader = -1
    visited = set()
    stack = [2 * n - 2]
    while stack:
        node = stack[-1]
        left, right = children[node]
        if leader == -1 and node in active:
            leader = node
            nc += 1
        if left >= n and left not in visited:
            visited.add(left)
            stack.append(left)
            continue
        if right >= n and right not in visited:
            visited.add(right)
            stack.append(right)
            continue
        if left < n:
            if leader == -1:
                nc += 1
            labels[left] = nc
        if right < n:
            if leader == -1:
                nc += 1
            labels[right] = nc
        if leader == node:
            leader = -1
        stack.pop()
    return labels


def cluster_vectors(vectors: np.ndarray, n_clusters: int) -> np.ndarray:
    """Embeddings → scipy-fcluster-identical labels (1-based).

    Drop-in for ``fcluster(linkage(vectors, "complete"), t=n_clusters,
    criterion="maxclust")`` (cluster.py:41-44) with the merge loop on
    device.
    """
    n = len(vectors)
    if n == 0:
        return np.zeros((0,), np.int32)
    if n == 1:
        return np.ones((1,), np.int32)
    dist = pairwise_distances(jnp.asarray(vectors, jnp.float32))
    merges = np.asarray(complete_linkage_merges(dist))
    return fcluster_from_merges(merges, n, n_clusters)
