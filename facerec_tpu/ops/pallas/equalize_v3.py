"""Histogram equalization + statistics feed, radix-16 (Pallas TPU).

Production kernel for the scene detector.  Same radix-16 MXU
formulation as :mod:`.equalize_v2` with two changes that remove three
full-block XLA passes around it:

- **Bin indices are computed in-register.**  The kernel consumes the
  f32 luminance plane directly; v2 required the caller to materialize
  an s32 index copy of the whole block (a 75 MB write + read per
  64-frame block at film resolution) just to feed the kernel.
- **The 256-bin cumulative histogram is a second output.**  The scene
  detector's frame-variation statistic ``fv = mean|eq - mafd_eq|`` is
  an expectation over at most 256 distinct equalized values, so it can
  be computed exactly from the histogram in O(256) instead of another
  pass over the full equalized plane (ops/scene.py uses it this way).

Luminance values are binned as the reference does (uint8 truncation of
a value in [0, 256); /root/reference/facerec/scene.py:58) — here
``clip(int32(y), 0, 255)``, identical for in-range values.  Negative
inputs mark padding and are excluded from the histogram; their eq
output is 0.

Returns RAW cumulative counts (the caller applies the ``/p * 255``
scaling so the division stays in one fused consumer pass).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NIB = 16
_ROWS = 8           # rows per sweep step (sublane-aligned loads)


def _prefix16(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the 16-wide lane axis of (16, 16)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for k in (1, 2, 4, 8):
        x = x + jnp.where(lane >= k, pltpu.roll(x, k, 1), 0.0)
    return x


def _kernel(y_ref, eq_ref, cum_ref):
    """One frame: y_ref (1, R, W) f32 luminance (padding < 0);
    eq_ref (1, R, W) f32 raw cumulative count per pixel;
    cum_ref (1, 16, 16) f32 cumulative histogram (row-major 256).

    W is the plane's native width — the kernel runs on whatever lane
    count the luminance pass produced, so no relayout to a fixed
    2048-lane packing sits between them."""
    _, r, w = y_ref.shape
    n_steps = r // _ROWS
    iot = jax.lax.broadcasted_iota(jnp.int32, (_NIB, w), 0)

    def load_idx(g):
        y = y_ref[0, pl.ds(pl.multiple_of(g * _ROWS, _ROWS), _ROWS), :]
        idx = jnp.clip(y.astype(jnp.int32), 0, 255)
        return jnp.where(y < 0.0, 256, idx)

    def nibbles(tile, i):
        row = jax.lax.slice(tile, (i, 0), (i + 1, w))       # (1, W)
        hi = jnp.broadcast_to(row // _NIB, (_NIB, w))
        lo = jnp.broadcast_to(row % _NIB, (_NIB, w))
        return (hi == iot), (lo == iot), hi

    def hist_body(g, carry):
        hist2d, lt = carry
        tile = load_idx(g)
        for i in range(_ROWS):
            a, b, hi = nibbles(tile, i)
            # 0/1 one-hots are exact in bf16: single-pass MXU is exact
            hist2d = hist2d + jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            lt = lt + (hi < iot).astype(jnp.float32)
        return hist2d, lt

    hist2d, lt_part = jax.lax.fori_loop(
        0, n_steps, hist_body,
        (jnp.zeros((_NIB, _NIB), jnp.float32),
         jnp.zeros((_NIB, w), jnp.float32)))
    lt = jnp.sum(lt_part, axis=1, keepdims=True)            # (16, 1)
    cdf2d = lt + _prefix16(hist2d)                          # (16, 16)
    cum_ref[0] = cdf2d

    # Byte-plane split (see equalize_v2): each plane < 256 is exact in
    # bf16, the one-hot lookup dots are single-pass MXU, recombination
    # in f32 picks exactly one value — the lookup is exact.
    c0 = cdf2d % 256.0
    c12 = (cdf2d - c0) / 256.0
    c1 = c12 % 256.0
    c2 = (c12 - c1) / 256.0
    planes = [(c0.astype(jnp.bfloat16), 1.0),
              (c1.astype(jnp.bfloat16), 256.0),
              (c2.astype(jnp.bfloat16), 65536.0)]

    def eq_body(g, _):
        tile = load_idx(g)
        rows = []
        for i in range(_ROWS):
            a, b, _hi = nibbles(tile, i)
            bb = b.astype(jnp.bfloat16)
            tmp = sum(
                scale * jax.lax.dot_general(
                    plane, bb,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for plane, scale in planes)
            rows.append(jnp.sum(jnp.where(a, tmp, 0.0), axis=0,
                                keepdims=True))
        eq_ref[0, pl.ds(pl.multiple_of(g * _ROWS, _ROWS), _ROWS), :] = (
            jnp.concatenate(rows, axis=0))
        return 0

    jax.lax.fori_loop(0, n_steps, eq_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def equalize_stats_tpu(y: jnp.ndarray, interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw equalization of packed luminance planes.

    Args:
        y: (B, R, W) f32 luminance planes at native width, rows padded
            to a multiple of 8 with values < 0.

    Returns:
        (eq_raw, cum): (B, R, W) f32 per-pixel cumulative counts
        (0 at padding) and (B, 256) f32 cumulative histograms counting
        real pixels only.
    """
    b, r, w = y.shape
    assert r % _ROWS == 0, (r, w)
    # One frame's plane lives in VMEM twice (input + output block).
    # SD/HD film planes are ≤ ~4 MB; ~8 MB/plane is the practical
    # ceiling on v5e (16 MB VMEM).  Guard with a clear error instead
    # of an opaque Mosaic allocation failure.
    plane_bytes = r * w * 4
    if plane_bytes > 8 * 1024 * 1024:
        raise ValueError(
            f"luminance plane {r}x{w} f32 ({plane_bytes/1e6:.0f} MB) "
            "exceeds the single-frame VMEM budget of the equalize "
            "kernel; process such films at a reduced display "
            "resolution (aspect_ratios.csv override)")

    eq_raw, cum2d = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, r, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, r, w), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, _NIB, _NIB), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, r, w), jnp.float32),
                   jax.ShapeDtypeStruct((b, _NIB, _NIB), jnp.float32)],
        interpret=interpret,
    )(y)
    return eq_raw, cum2d.reshape(b, 256)


def pack_planes(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) f32 → (B, R, W): rows padded to a multiple of 8 with
    -1 (kernel padding sentinel).  Width stays native — no relayout."""
    b, h, w = y.shape
    hp = ((h + _ROWS - 1) // _ROWS) * _ROWS
    if hp != h:
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, 0)), constant_values=-1.0)
    return y
