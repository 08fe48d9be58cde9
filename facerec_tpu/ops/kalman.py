"""Batched constant-velocity Kalman filtering for box tracking.

The tracker state per track is the 8-vector
``[cx, cy, area, aspect, d cx, d cy, d area, d aspect]`` with observation
``[cx, cy, area, aspect]`` — the same model the reference builds one
filterpy.KalmanFilter per track for (/root/reference/facerec/sort.py:96-121).

Here the whole fixed-capacity track table predicts and updates at once:
everything is (T, 8) / (T, 8, 8) einsums, which XLA fuses into a handful
of small matmuls per frame inside the tracker scan.  The covariance
update uses the Joseph stabilized form.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

DIM_X = 8
DIM_Z = 4

# Transition: position block += velocity block (sort.py:97-106)
F = np.eye(DIM_X, dtype=np.float32) + np.eye(DIM_X, k=4, dtype=np.float32)
H = np.eye(DIM_Z, DIM_X, dtype=np.float32)  # observe first 4 states

# Noise/covariance priors (sort.py:114-119)
R = np.diag(np.array([1.0, 1.0, 10.0, 10.0], np.float32))
Q = np.eye(DIM_X, dtype=np.float32)
Q[4:, 4:] *= 0.01
Q[7, 7] *= 0.01
P0 = np.eye(DIM_X, dtype=np.float32)
P0[4:, 4:] *= 1000.0
P0 *= 10.0


class KalmanState(NamedTuple):
    x: jnp.ndarray  # (T, 8) state means
    p: jnp.ndarray  # (T, 8, 8) state covariances


def init_state(num_tracks: int) -> KalmanState:
    return KalmanState(
        x=jnp.zeros((num_tracks, DIM_X), jnp.float32),
        p=jnp.broadcast_to(jnp.asarray(P0), (num_tracks, DIM_X, DIM_X)).copy(),
    )


def reset_tracks(state: KalmanState, mask: jnp.ndarray,
                 z: jnp.ndarray) -> KalmanState:
    """Re-initialize the masked tracks from measurements ``z`` (T, 4):
    state = [z, 0,0,0,0], covariance = P0 (sort.py:114-121)."""
    x_new = jnp.concatenate([z, jnp.zeros_like(z)], axis=-1)
    p_new = jnp.broadcast_to(jnp.asarray(P0), state.p.shape)
    m = mask[:, None]
    return KalmanState(
        x=jnp.where(m, x_new, state.x),
        p=jnp.where(m[..., None], p_new, state.p),
    )


def predict(state: KalmanState) -> KalmanState:
    """Advance all tracks one frame.

    Applies the same positivity guard as the reference: if predicted
    area or aspect would go non-positive, zero its velocity first
    (sort.py:148-152).
    """
    x, p = state
    f = jnp.asarray(F)
    q = jnp.asarray(Q)

    vel_area = jnp.where(x[:, 6] + x[:, 2] < 1e-3, 0.0, x[:, 6])
    vel_aspect = jnp.where(x[:, 7] + x[:, 3] < 1e-3, 0.0, x[:, 7])
    x = x.at[:, 6].set(vel_area).at[:, 7].set(vel_aspect)

    x = jnp.einsum("ij,tj->ti", f, x)
    p = jnp.einsum("ij,tjk,lk->til", f, p, f) + q
    return KalmanState(x, p)


def _inv2(m: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 2×2 inverse."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    adj = jnp.stack([jnp.stack([d, -b], -1),
                     jnp.stack([-c, a], -1)], -2)
    return adj / det[..., None, None]


def inv4(s: jnp.ndarray) -> jnp.ndarray:
    """Batched 4×4 inverse via 2×2 block Schur complement.

    ``jnp.linalg.inv``'s LU lowering costs ~80 µs per tracker-scan step
    on TPU; for the well-conditioned innovation covariance S = P₄₄ + R
    the closed form is ~2× cheaper and elementwise-only.
    """
    a = s[..., :2, :2]
    b = s[..., :2, 2:]
    c = s[..., 2:, :2]
    d = s[..., 2:, 2:]
    ai = _inv2(a)
    aib = ai @ b
    si = _inv2(d - c @ aib)
    tl = ai + aib @ si @ (c @ ai)
    tr = -aib @ si
    bl = -si @ (c @ ai)
    return jnp.concatenate([jnp.concatenate([tl, tr], -1),
                            jnp.concatenate([bl, si], -1)], -2)


def update(state: KalmanState, z: jnp.ndarray,
           mask: jnp.ndarray) -> KalmanState:
    """Measurement update for tracks where ``mask`` is True.

    Args:
        state: predicted state.
        z: (T, 4) measurements (garbage where mask is False).
        mask: (T,) bool — which tracks received a detection.
    """
    x, p = state
    h = jnp.asarray(H)
    r = jnp.asarray(R)
    eye = jnp.eye(DIM_X, dtype=jnp.float32)

    y = z - jnp.einsum("ij,tj->ti", h, x)                       # innovation
    s = jnp.einsum("ij,tjk,lk->til", h, p, h) + r               # (T,4,4)
    k = jnp.einsum("tij,kj,tkl->til", p, h, inv4(s))            # (T,8,4)

    x_post = x + jnp.einsum("tij,tj->ti", k, y)
    ikh = eye - jnp.einsum("tij,jk->tik", k, h)
    p_post = (
        jnp.einsum("tij,tjk,tlk->til", ikh, p, ikh)
        + jnp.einsum("tij,jk,tlk->til", k, r, k)
    )

    m = mask[:, None]
    return KalmanState(
        x=jnp.where(m, x_post, x),
        p=jnp.where(m[..., None], p_post, p),
    )


def predict_and_update(
    state: KalmanState, z: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[KalmanState, KalmanState]:
    """Convenience: predict all, update masked.  Returns (prior, posterior)."""
    prior = predict(state)
    return prior, update(prior, z, mask)
