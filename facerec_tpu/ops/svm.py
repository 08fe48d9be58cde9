"""Linear SVM (one-vs-rest, squared hinge) trained on device.

Replaces the sklearn ``LinearSVC`` used by the reference's offline
label-propagation tool (/root/reference/facerec/classify.py:3,55): a
full-batch gradient descent on the L2-regularized squared-hinge loss —
a few hundred matmul steps on the MXU.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def train_linear_svm(x: np.ndarray, y: np.ndarray, c: float = 1.0,
                     steps: int = 500, lr: float = 0.1
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit one-vs-rest linear SVMs.

    Args:
        x: (N, D) float32 features.
        y: (N,) int labels (arbitrary values).
    Returns:
        (W (D, C), b (C,), classes (C,)) — decision_function is
        ``x @ W + b`` with columns ordered by sorted class value.
    """
    classes, y_idx = np.unique(y, return_inverse=True)
    n, d = x.shape
    c_n = len(classes)
    targets = np.full((n, c_n), -1.0, np.float32)
    targets[np.arange(n), y_idx] = 1.0

    xj = jnp.asarray(x, jnp.float32)
    tj = jnp.asarray(targets)

    def loss(params):
        w, b = params
        margin = tj * (xj @ w + b)
        hinge = jnp.maximum(0.0, 1.0 - margin)
        return (0.5 * jnp.sum(w * w) / c
                + jnp.sum(hinge * hinge)) / n

    @jax.jit
    def fit(w, b):
        def step(i, params):
            g = jax.grad(loss)(params)
            return (params[0] - lr * g[0], params[1] - lr * g[1])

        return jax.lax.fori_loop(0, steps, step, (w, b))

    w0 = jnp.zeros((d, c_n), jnp.float32)
    b0 = jnp.zeros((c_n,), jnp.float32)
    w, b = fit(w0, b0)
    return np.asarray(w), np.asarray(b), classes


def decision_function(x: np.ndarray, w: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    return np.asarray(jnp.asarray(x, jnp.float32) @ jnp.asarray(w)
                      + jnp.asarray(b))
