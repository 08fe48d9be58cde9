"""Face pose heuristics from 5-point landmarks.

Counterpart of the reference's (unused) ``judge_side_face``
(/root/reference/facerec/utils/face_utils.py:4): classify a face as
frontal vs profile from the eye/nose/mouth layout.  Vectorized over a
batch so it can gate embedding quality on device (e.g. prefer frontal
faces when averaging trajectory embeddings — the TODO at
cluster.py:28).
"""
from __future__ import annotations

import jax.numpy as jnp


def frontalness(landmarks: jnp.ndarray) -> jnp.ndarray:
    """Frontalness score in [0, 1] per face.

    Args:
        landmarks: (..., 5, 2) points ordered
            (left_eye, right_eye, nose, mouth_left, mouth_right).

    Returns:
        (...,) float32 — 1 for a symmetric frontal layout, → 0 as the
        nose shifts toward either eye (yaw) or the eye line degenerates.
    """
    left_eye = landmarks[..., 0, :]
    right_eye = landmarks[..., 1, :]
    nose = landmarks[..., 2, :]

    eye_vec = right_eye - left_eye
    eye_dist = jnp.linalg.norm(eye_vec, axis=-1)
    safe = jnp.maximum(eye_dist, 1e-6)

    # signed position of the nose along the eye line, 0.5 = centered
    t = jnp.einsum("...d,...d->...", nose - left_eye, eye_vec) / (safe * safe)
    symmetry = 1.0 - jnp.clip(jnp.abs(t - 0.5) * 2.0, 0.0, 1.0)
    return jnp.where(eye_dist > 1e-3, symmetry, 0.0)


def is_frontal(landmarks: jnp.ndarray,
               threshold: float = 0.5) -> jnp.ndarray:
    """Boolean frontal/profile decision per face."""
    return frontalness(landmarks) >= threshold
