"""Batched on-device crop + bilinear resize.

Replaces the per-face host round trips of the reference
(``cropBox`` + PIL resize, /root/reference/facerec/extract.py:160-172):
all face crops of a frame block are gathered and resampled in one
vectorized device op feeding the embedder batch.

Sampling uses half-pixel centers (OpenCV/PIL bilinear convention) with
edge clamping.
"""
from __future__ import annotations

import jax.numpy as jnp


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
    n = crop_boxes.shape[0]
    h, w = frames.shape[1:3]
    s = out_size

    x1, y1, x2, y2 = [crop_boxes[:, i] for i in range(4)]
    scale_x = (x2 - x1) / s
    scale_y = (y2 - y1) / s

    grid = jnp.arange(s, dtype=jnp.float32) + 0.5
    # source coordinates with half-pixel centers
    src_x = x1[:, None] + grid[None, :] * scale_x[:, None] - 0.5  # (N, S)
    src_y = y1[:, None] + grid[None, :] * scale_y[:, None] - 0.5

    def axis_weights(src, size):
        f0 = jnp.floor(src)
        t = src - f0
        i0 = jnp.clip(f0.astype(jnp.int32), 0, size - 1)
        i1 = jnp.clip(i0 + 1, 0, size - 1)
        return i0, i1, t

    x0, x1i, tx = axis_weights(src_x, w)
    y0, y1i, ty = axis_weights(src_y, h)

    f = frames.astype(jnp.float32)
    fi = frame_idx[:, None, None]

    def gather(yi, xi):
        # (N,S,1) rows × (N,1,S) cols → (N,S,S,C)
        return f[fi, yi[:, :, None], xi[:, None, :]]

    top = (gather(y0, x0) * (1 - tx)[:, None, :, None]
           + gather(y0, x1i) * tx[:, None, :, None])
    bot = (gather(y1i, x0) * (1 - tx)[:, None, :, None]
           + gather(y1i, x1i) * tx[:, None, :, None])
    return top * (1 - ty)[:, :, None, None] + bot * ty[:, :, None, None]


import jax as _jax

_crop_resize_jit = _jax.jit(crop_resize, static_argnames=("out_size",))


def crop_resize_dispatch(frames, frame_idx, crop_boxes, out_size):
    """Single-dispatch crop_resize (falls through inside traces)."""
    import jax.core

    if isinstance(frames, jax.core.Tracer):
        return crop_resize(frames, frame_idx, crop_boxes, out_size)
    return _crop_resize_jit(frames, frame_idx, crop_boxes, out_size)
