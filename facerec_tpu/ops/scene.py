"""Shot-boundary detection as a vectorized frame-block program.

Implements "Fast Pixel-Based Video Scene Change Detection" with the same
statistics and fixed thresholds as the reference's sequential per-frame
detector (/root/reference/facerec/scene.py), but restructured for TPU:
a whole block of frames is processed at once — luminance, per-frame
histogram equalization and inter-frame statistics are all batched
device work — and only the last frame's planes plus four scalars carry
across blocks.

TPU shape of the computation (one pass each over the block):

  1. luminance at native width (rows padded to the kernel's sublane
     multiple — no relayout)
  2. Pallas radix-16 kernel: per-frame raw equalization + 256-bin
     cumulative histogram (ops/pallas/equalize.py)
  3. inter-frame diffs |y_i - y_{i-1}| and |eq_i - eq_{i-1}|
  4. the frame-variation statistic from the HISTOGRAM: ``fv =
     mean|eq - mafd_eq|`` is an expectation over ≤256 distinct
     equalized values, so it needs no third pass over pixels.

The carried state makes frame-axis sharding exact: a shard needs only a
2-frame halo from its left neighbour (SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from facerec_tpu.ops.pallas.equalize import pack_planes


class SceneState(NamedTuple):
    """Cross-block carry.  Planes are native-width (R, W) with rows
    padded to a multiple of 8 by -1 (equalize.pack_planes).
    ``n_seen`` counts frames consumed so far; statistics need 3 frames
    of history before decisions are valid."""

    prev_y: jnp.ndarray        # (R, W) f32 luminance of last frame
    prev_eq: jnp.ndarray       # (R, W) f32 RAW equalization of last frame
    prev_mafd_eq: jnp.ndarray  # () float32
    prev_fv_eq: jnp.ndarray    # () float32
    n_seen: jnp.ndarray        # () int32


def initial_state(height: int, width: int, crop: bool = True) -> SceneState:
    """Fresh carry for frames of the given *full* dimensions; the stored
    planes use the post-crop height."""
    lo, hi = crop_bounds(height, width, crop)
    zero_packed = pack_planes(jnp.zeros((1, hi - lo, width), jnp.float32))[0]
    return SceneState(
        prev_y=zero_packed,
        prev_eq=zero_packed,
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
    """RGB uint8 (..., H, W, 3) → float32 luminance Y (scene.py:42-50).

    Written as a dot over the channel axis: XLA fuses the u8→f32
    convert into the contraction's input read, where the elementwise
    formulation materialized a full f32 RGB copy first (measured
    2.49 → 1.44 ms per 128-frame block, bit-identical output)."""
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    return jnp.einsum("...c,c->...", frames.astype(jnp.float32), w)


def _equalize_raw(y_packed: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, R, W) row-padded luminance → (raw per-pixel cumulative
    counts, (B, 256) cumulative histogram).  Pallas kernel on TPU; the
    same math as bincount+cumsum+take elsewhere (bit-identical integer
    counts)."""
    if jax.default_backend() == "tpu":
        from facerec_tpu.ops.pallas.equalize import equalize_stats_tpu

        return equalize_stats_tpu(y_packed)
    b = y_packed.shape[0]
    flat = y_packed.reshape(b, -1)
    idx = jnp.where(flat < 0.0, 256,
                    jnp.clip(flat.astype(jnp.int32), 0, 255))
    counts = jax.vmap(
        lambda im: jnp.bincount(im, length=257))(idx)[:, :256]
    cum = jnp.cumsum(counts.astype(jnp.float32), axis=-1)
    eq_raw = jnp.where(
        idx == 256, 0.0,
        jnp.take_along_axis(cum, jnp.minimum(idx, 255), axis=-1))
    return eq_raw.reshape(y_packed.shape), cum


def equalize(y: jnp.ndarray) -> jnp.ndarray:
    """Histogram equalization of a batch of (B, H, W) luminance planes.

    Mirrors scene.py:52-63: a 256-bin density histogram over values cast
    to uint8, cdf lookup scaled by 255.  (The block program uses the raw
    kernel outputs directly; this wrapper is for the sharded halo path
    and tests.)
    """
    b, h, w = y.shape
    p = h * w
    eq_raw, _ = _equalize_raw(pack_planes(y))
    return (eq_raw.reshape(b, -1)[:, :p] / p * 255.0).reshape(b, h, w)


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
    p = (hi - lo) * width

    if grayscale:
        y_plane = frames[:, lo:hi, :, 0].astype(jnp.float32)
    else:
        y_plane = luminance(frames[:, lo:hi])   # crop first: 1/3 less traffic
    y = pack_planes(y_plane)
    eq, cum = _equalize_raw(y)

    # Inter-frame diffs: in-block pairs read two offset slices of the
    # same buffer (no shifted full-plane copy is materialized, unlike a
    # concat-with-carry formulation); the carry pair is one extra small
    # op.  Padding rows hold -1 in y and 0 in eq for every frame, so
    # they contribute 0 to the diffs; the explicit /p keeps the means
    # over real pixels only.
    scale = 255.0 / p

    def diffs(cur, prev_plane, s=1.0):
        inb = jnp.abs(cur[1:] * s - cur[:-1] * s).sum(axis=(1, 2))
        carry = jnp.abs(cur[0] * s - prev_plane * s).sum()
        return jnp.concatenate([carry[None], inb]) / p

    mafd = diffs(y, state.prev_y)
    mafd_eq = diffs(eq, state.prev_eq, scale)

    # fv = mean|eq - mafd_eq| is an expectation over the ≤256 distinct
    # equalized values: compute it from the histogram, not the pixels.
    hist = jnp.diff(cum, axis=-1, prepend=0.0)            # (B, 256)
    eqval = cum * scale                                   # (B, 256)
    fv_eq = jnp.sum(
        hist * jnp.abs(eqval - mafd_eq[:, None]), axis=-1) / p

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
