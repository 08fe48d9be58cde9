"""K-nearest-neighbour probability voting on device.

Replaces ``sklearn.KNeighborsClassifier(weights="uniform")``
(/root/reference/facerec/classify_knn.py:212,227): one distance matmul,
``lax.top_k``, and a one-hot mean — all MXU/VPU work.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _knn_votes(train_x, class_idx, query, neg_k_mask):
    sq_t = jnp.sum(train_x * train_x, axis=-1)
    sq_q = jnp.sum(query * query, axis=-1)
    d2 = sq_q[:, None] - 2.0 * (query @ train_x.T) + sq_t[None, :]
    _, nbr = jax.lax.top_k(-d2, neg_k_mask.shape[0])
    votes = class_idx[nbr]                          # (Q, k)
    n_classes = neg_k_mask.shape[1]
    onehot = jax.nn.one_hot(votes, n_classes)       # (Q, k, C)
    return onehot.mean(axis=1)


def knn_predict_proba(train_x: np.ndarray, train_y: np.ndarray,
                      query: np.ndarray, k: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform-weight KNN class probabilities.

    Args:
        train_x: (M, dim) float32 training vectors.
        train_y: (M,) int class ids (arbitrary values).
        query: (Q, dim) float32 queries.
        k: neighbour count.

    Returns:
        (proba (Q, C) float32, classes (C,) sorted unique class ids) —
        matching sklearn's ``predict_proba`` / ``classes_`` contract.

    Edge semantics vs sklearn: ``k > len(train_x)`` raises, as sklearn
    does.  Exact distance ties resolve to the lower training index in
    both (``lax.top_k`` and sklearn's stable sort agree); near-ties can
    differ because the matmul distance form rounds differently from
    sklearn's pairwise euclidean — irrelevant for real embeddings,
    validated against sklearn byte-for-byte in
    tests/test_reference_parity.py.
    """
    classes, class_idx = np.unique(train_y, return_inverse=True)
    if len(query) == 0:
        return np.zeros((0, len(classes)), np.float32), classes
    if k > len(train_x):
        raise ValueError(
            f"Expected n_neighbors <= n_samples_fit, but "
            f"n_neighbors = {k}, n_samples_fit = {len(train_x)}")
    mask = jnp.zeros((k, len(classes)))  # shape carrier for (k, C)
    proba = _knn_votes(jnp.asarray(train_x, jnp.float32),
                       jnp.asarray(class_idx, jnp.int32),
                       jnp.asarray(query, jnp.float32), mask)
    return np.asarray(proba), classes
