"""Device-side decode of the delta-I420 wire format.

Streaming extract on remote-tunneled hosts is wire-bound: raw RGB is
3 B/px while the video codec's own storage is 4:2:0 YUV (1.5 B/px),
and consecutive frames inside a scene differ in few pixels.  The
``yuv420-delta`` wire format therefore ships each block as I420 planes
with frames 1..B-1 stored as modular (uint8 wraparound) differences
from the previous frame — the relay's wire compressor then collapses
the near-zero deltas, so a block ships at the link's floor rate
(measured ~2.5x faster than raw I420 and ~5x faster than raw RGB for
film content; docs/DESIGN.md "Group-batched fetches").

The device undoes both transforms as the first (fused) ops of the
block program: a cumulative sum mod 256 restores the planes exactly,
then BT.601 limited-range conversion (the same coefficients OpenCV's
I420↔RGB conversions use) reconstructs RGB.  Host-side encode is
:func:`encode_block` (cv2) — together they reproduce the host-decoded
RGB within the 4:2:0 chroma re-quantization error (a few LSB on film
content), which is why the format is an opt-in performance mode
(``--wire-format yuv420-delta``) rather than the parity default; cf.
the reference's host-only decode (/root/reference/facerec/extract.py:281-300),
which never pays a wire at all.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def i420_rows(height: int) -> int:
    """Rows of one frame's I420 image: Y plane (H rows) + U and V
    planes each packed as H/4 rows of full width."""
    if height % 2:
        raise ValueError(f"I420 needs even height, got {height}")
    return height + height // 2


def delta_decode(delta: jnp.ndarray) -> jnp.ndarray:
    """Undo per-block temporal delta: (B, ...) uint8 where frames
    1..B-1 are modular differences from the previous frame → absolute
    frames.  Works on I420 planes (B, R, W) and RGB (B, H, W, 3) alike.

    Exact: the cumulative sum in int32 (B·255 < 2^31) taken mod 256
    reproduces uint8 wraparound addition bit for bit."""
    return (jnp.cumsum(delta.astype(jnp.int32), axis=0) % 256).astype(
        jnp.uint8)


def i420_to_rgb(yuv: jnp.ndarray, height: int) -> jnp.ndarray:
    """(B, H*3/2, W) uint8 I420 frames → (B, H, W, 3) uint8 RGB.

    BT.601 limited-range (Y: 16..235) with 2×2 nearest chroma
    upsampling — the inverse of OpenCV's COLOR_RGB2YUV_I420 to within
    1 LSB (test_yuv_ops.py pins it against cv2)."""
    b, rows, w = yuv.shape
    if rows != i420_rows(height) or w % 2:
        raise ValueError(f"bad I420 shape {yuv.shape} for height "
                         f"{height}")
    h2, w2 = height // 2, w // 2
    y = yuv[:, :height, :].astype(jnp.float32)
    u = yuv[:, height:height + height // 4, :].reshape(
        b, h2, w2).astype(jnp.float32) - 128.0
    v = yuv[:, height + height // 4:, :].reshape(
        b, h2, w2).astype(jnp.float32) - 128.0
    # 2×2 nearest upsample via broadcast-reshape (no gather)
    u = jnp.broadcast_to(u[:, :, None, :, None], (b, h2, 2, w2, 2)
                         ).reshape(b, height, w)
    v = jnp.broadcast_to(v[:, :, None, :, None], (b, h2, 2, w2, 2)
                         ).reshape(b, height, w)
    # cv2 clamps the luma excursion at zero before scaling
    # (max(0, Y-16) in its fixed-point kernel); match it so sub-range
    # Y converts identically
    yl = 1.164 * jnp.maximum(y - 16.0, 0.0)
    r = yl + 1.596 * v
    g = yl - 0.813 * v - 0.391 * u
    bl = yl + 2.018 * u
    rgb = jnp.stack([r, g, bl], axis=-1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)


def delta_i420_to_rgb(delta: jnp.ndarray, height: int) -> jnp.ndarray:
    """Full wire decode: delta-I420 block → uint8 RGB frames."""
    return i420_to_rgb(delta_decode(delta), height)


def encode_delta(block: np.ndarray) -> np.ndarray:
    """Host-side temporal delta over an absolute block (I420 planes or
    RGB frames): the first frame stays absolute, frames 1..B-1 become
    uint8 wraparound differences (what :func:`delta_decode` undoes).
    Runs GIL-free and multithreaded in the native runtime when built
    (native/decode.cpp frd_delta_u8 — the numpy subtraction was the
    single largest host cost of the rgb-delta parity loop, ~21 s per
    1024 frames at 576x768); numpy fallback otherwise."""
    block = np.ascontiguousarray(block)
    if block.dtype == np.uint8:
        from facerec_tpu.runtime import native as native_mod

        delta = np.empty_like(block)
        if native_mod.delta_u8(block, delta):
            return delta
    delta = block.copy()
    delta[1:] -= block[:-1]
    return delta


def encode_block(frames_rgb: np.ndarray) -> np.ndarray:
    """Host-side wire encode from RGB: (B, H, W, 3) uint8 →
    (B, H*3/2, W) delta-I420 (cv2 conversion + :func:`encode_delta`).
    The production loop reads I420 straight from the decoder and only
    runs the delta; this full path serves tests and RGB-only
    sources."""
    import cv2

    return encode_delta(np.stack([
        cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in frames_rgb]))


def i420_frame_to_rgb(frame_i420: np.ndarray) -> np.ndarray:
    """Host-side decode of ONE absolute I420 frame (JPEG-save path)."""
    import cv2

    return cv2.cvtColor(frame_i420, cv2.COLOR_YUV2RGB_I420)
