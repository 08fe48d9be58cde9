"""Shot-boundary detection as a vectorized frame-block program.

Implements "Fast Pixel-Based Video Scene Change Detection" with the same
statistics and fixed thresholds as the reference's sequential per-frame
detector (/root/reference/facerec/scene.py), but restructured for TPU:
a whole block of frames is processed at once — luminance, per-frame
histogram equalization and inter-frame statistics are all batched VPU
work — and only four scalars plus the last frame's luminance/equalized
planes carry across blocks.

The carried state makes frame-axis sharding exact: a shard needs only a
2-frame halo from its left neighbour (SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SceneState(NamedTuple):
    """Cross-block carry.  ``n_seen`` counts frames consumed so far;
    statistics need 3 frames of history before decisions are valid."""

    prev_y: jnp.ndarray        # (H', W') float32 luminance of last frame
    prev_eq: jnp.ndarray       # (H', W') float32 equalized last frame
    prev_mafd_eq: jnp.ndarray  # () float32
    prev_fv_eq: jnp.ndarray    # () float32
    n_seen: jnp.ndarray        # () int32


def initial_state(height: int, width: int, crop: bool = True) -> SceneState:
    """Fresh carry for frames of the given *full* dimensions; the stored
    planes use the post-crop height."""
    lo, hi = crop_bounds(height, width, crop)
    return SceneState(
        prev_y=jnp.zeros((hi - lo, width), jnp.float32),
        prev_eq=jnp.zeros((hi - lo, width), jnp.float32),
        prev_mafd_eq=jnp.zeros((), jnp.float32),
        prev_fv_eq=jnp.zeros((), jnp.float32),
        n_seen=jnp.zeros((), jnp.int32),
    )


def crop_bounds(height: int, width: int, crop: bool) -> Tuple[int, int]:
    """Static center 2:1 crop bounds (scene.py:102-106): rows
    [inset, H-inset).  Width is never cropped."""
    if crop and width / height < 2.0:
        inset = int((height - 0.5 * width) / 2)
        return inset, height - inset
    return 0, height


def luminance(frames: jnp.ndarray) -> jnp.ndarray:
    """RGB uint8 (..., H, W, 3) → float32 luminance Y (scene.py:42-50)."""
    f = frames.astype(jnp.float32)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


def equalize(y: jnp.ndarray) -> jnp.ndarray:
    """Histogram equalization of a batch of luminance planes.

    Mirrors scene.py:52-63: a 256-bin density histogram over values cast
    to uint8, cdf lookup scaled by 255.  On TPU this dispatches to the
    Pallas kernel (:mod:`facerec_tpu.ops.pallas.equalize`) — the XLA
    scatter/gather lowering of bincount + take serializes there; both
    paths are bit-identical.

    Args:
        y: (B, H, W) float32.
    Returns:
        (B, H, W) float32 equalized planes.
    """
    if jax.default_backend() == "tpu":
        from facerec_tpu.ops.pallas import equalize_tpu_v2

        return equalize_tpu_v2(y)
    b, h, w = y.shape
    idx = y.astype(jnp.uint8).astype(jnp.int32)
    counts = jax.vmap(lambda im: jnp.bincount(im.ravel(), length=256))(idx)
    cdf = jnp.cumsum(counts.astype(jnp.float32), axis=-1) / (h * w)
    return jnp.take_along_axis(
        cdf, idx.reshape(b, -1), axis=-1
    ).reshape(b, h, w) * 255.0


def decide(mafd, mafd_eq, sdmafd_eq, adfv_eq) -> jnp.ndarray:
    """The fixed-threshold decision rule, elementwise over a block.

    Bit-exact port of the rule cascade in scene.py:65-79; expressed as a
    reverse ``where`` chain so earlier rules take precedence.
    """
    r4 = (mafd_eq > 50) & (mafd > 35) & (sdmafd_eq > 50) & (adfv_eq > 50)
    r3 = (adfv_eq < 2) | (sdmafd_eq < 5)          # → False
    r2 = (mafd_eq < 85) & (mafd > 170)            # → True
    r1 = (mafd_eq < 100) & (mafd_eq > 58) & (mafd < 100) & (adfv_eq > 23)
    r0 = (mafd < 14) | (mafd_eq < 40)             # → False
    out = r4
    out = jnp.where(r3, False, out)
    out = jnp.where(r2, True, out)
    out = jnp.where(r1, True, out)
    out = jnp.where(r0, False, out)
    return out


def detect_block(
    frames: jnp.ndarray, state: SceneState, crop: bool = True,
    grayscale: bool = False,
) -> Tuple[jnp.ndarray, SceneState]:
    """Jit-dispatching wrapper around :func:`_detect_block_impl` (one
    device call per block; falls through when already tracing)."""
    import jax.core

    if isinstance(frames, jax.core.Tracer):
        return _detect_block_impl(frames, state, crop, grayscale)
    return _detect_block_jit(frames, state, crop, grayscale)


def _detect_block_impl(
    frames: jnp.ndarray, state: SceneState, crop: bool = True,
    grayscale: bool = False,
) -> Tuple[jnp.ndarray, SceneState]:
    """Scene-change flags for a block of frames.

    Args:
        frames: (B, H, W, 3) uint8 RGB frames, consecutive in time.
        state: carry from the previous block (or :func:`initial_state`).
        crop: apply the center 2:1 crop (static decision from H/W).
        grayscale: treat channel 0 as luminance (scene.py:97-98).

    Returns:
        (flags, new_state) where flags is (B,) bool — True where a scene
        change was detected at that frame.
    """
    b, height, width, _ = frames.shape
    lo, hi = crop_bounds(height, width, crop)

    if grayscale:
        y = frames[:, lo:hi, :, 0].astype(jnp.float32)
    else:
        y = luminance(frames[:, lo:hi])   # crop first: 1/3 less traffic
    eq = equalize(y)

    # Stack the carried last frame in front: diffs are then aligned so that
    # row i compares frame i with frame i-1.
    y_prev = jnp.concatenate([state.prev_y[None], y[:-1]], axis=0)
    eq_prev = jnp.concatenate([state.prev_eq[None], eq[:-1]], axis=0)

    mafd = jnp.abs(y - y_prev).mean(axis=(1, 2))
    mafd_eq = jnp.abs(eq - eq_prev).mean(axis=(1, 2))
    fv_eq = jnp.abs(eq - mafd_eq[:, None, None]).mean(axis=(1, 2))

    mafd_eq_prev = jnp.concatenate([state.prev_mafd_eq[None], mafd_eq[:-1]])
    fv_eq_prev = jnp.concatenate([state.prev_fv_eq[None], fv_eq[:-1]])
    sdmafd_eq = mafd_eq - mafd_eq_prev
    adfv_eq = jnp.abs(fv_eq - fv_eq_prev)

    # Frame i (global index state.n_seen + i) has valid statistics only
    # once two predecessors exist (scene.py:111-136: prev_img and
    # prev_mafd_eq/prev_fv_eq must both be set).
    global_idx = state.n_seen + jnp.arange(b, dtype=jnp.int32)
    valid = global_idx >= 2

    flags = decide(mafd, mafd_eq, sdmafd_eq, adfv_eq) & valid

    new_state = SceneState(
        prev_y=y[-1],
        prev_eq=eq[-1],
        prev_mafd_eq=mafd_eq[-1],
        prev_fv_eq=fv_eq[-1],
        n_seen=state.n_seen + b,
    )
    return flags, new_state


_detect_block_jit = jax.jit(_detect_block_impl,
                            static_argnames=("crop", "grayscale"))
