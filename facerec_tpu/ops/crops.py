"""Batched on-device crop + bilinear resize.

Replaces the per-face host round trips of the reference
(``cropBox`` + PIL resize, /root/reference/facerec/extract.py:160-172):
all face crops of a frame block are gathered and resampled in one
vectorized device op feeding the embedder batch.

Sampling uses half-pixel centers (OpenCV/PIL bilinear convention) with
edge clamping.  Bilinear resampling is linear in the pixels, so instead
of per-pixel 2D gathers (which serialize on TPU — ~141 ms for 32 crops
from a 64-frame block) each crop is computed as two small dense
matmuls with per-crop interpolation matrices:

    out[n] = Ry[n] @ frame[n] @ Rx[n]^T

where Ry (S, H) / Rx (S, W) hold the two nonzero bilinear weights per
output row/column.  Building Ry/Rx is a pure broadcast-compare (no
gather), and the contractions ride the MXU (<1 ms for the same batch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(src: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, S) source coords → (N, S, size) bilinear weight matrix with
    edge clamping (two nonzero entries per row; one at the edges)."""
    f0 = jnp.floor(src)
    t = src - f0
    i0 = jnp.clip(f0.astype(jnp.int32), 0, size - 1)
    i1 = jnp.clip(i0 + 1, 0, size - 1)
    idx = jnp.arange(size, dtype=jnp.int32)
    w0 = jnp.where(idx == i0[..., None], (1.0 - t)[..., None], 0.0)
    w1 = jnp.where(idx == i1[..., None], t[..., None], 0.0)
    return w0 + w1


def crop_resize(frames: jnp.ndarray, frame_idx: jnp.ndarray,
                crop_boxes: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Crop boxes out of a frame block and resize bilinearly.

    Args:
        frames: (B, H, W, C) uint8 or float.
        frame_idx: (N,) int32 — source frame per crop.
        crop_boxes: (N, 4) float32 [x1, y1, x2, y2] in pixel coords
            (x2/y2 exclusive, i.e. width = x2-x1).
        out_size: output side length S.

    Returns:
        (N, S, S, C) float32 crops.
    """
    h, w = frames.shape[1:3]
    s = out_size

    x1, y1, x2, y2 = [crop_boxes[:, i] for i in range(4)]
    grid = jnp.arange(s, dtype=jnp.float32) + 0.5
    # source coordinates with half-pixel centers
    src_x = x1[:, None] + grid[None, :] * ((x2 - x1) / s)[:, None] - 0.5
    src_y = y1[:, None] + grid[None, :] * ((y2 - y1) / s)[:, None] - 0.5

    rx = _axis_weights(src_x, w)                      # (N, S, W)
    ry = _axis_weights(src_y, h)                      # (N, S, H)

    # whole-frame gather per crop (contiguous, cheap), then two MXU
    # contractions; HIGHEST precision keeps f32 pixel accuracy.
    g = jnp.take(frames, frame_idx, axis=0).astype(jnp.float32)
    cols = jnp.einsum("ntw,nhwc->nhtc", rx, g,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("nsh,nhtc->nstc", ry, cols,
                      precision=jax.lax.Precision.HIGHEST)


import jax as _jax

_crop_resize_jit = _jax.jit(crop_resize, static_argnames=("out_size",))


def crop_resize_dispatch(frames, frame_idx, crop_boxes, out_size):
    """Single-dispatch crop_resize (falls through inside traces)."""
    import jax.core

    if isinstance(frames, jax.core.Tracer):
        return crop_resize(frames, frame_idx, crop_boxes, out_size)
    return _crop_resize_jit(frames, frame_idx, crop_boxes, out_size)
