"""Histogram equalization + statistics feed, radix-16 (Pallas TPU).

Production kernel for the scene detector (ops/scene.py), replacing the
reference's numpy histogram/cumsum/lookup per frame
(/root/reference/facerec/scene.py:52-63).  Two formulations share the
same in-register radix-16 math:

- **Fused single-pass** (plane resident in VMEM): histogram build and
  equalize lookup in one kernel invocation per frame.  Used when a
  plane fits the VMEM budget — with input + output blocks and Pallas'
  grid double-buffering the real requirement is ~4× plane bytes, so
  the fast path takes planes up to 3 MB (every SD/HD film after the
  2:1 crop).
- **Row-tiled two-pass** (any resolution): a histogram kernel
  accumulates per-frame 256-bin counts over row tiles, XLA does the
  O(256) cumsum, and an equalize kernel maps tiles through the cdf.
  VMEM holds only one ~1 MB tile (+ double buffering) regardless of
  plane size — this removes the 4K/8K ceiling at the cost of one extra
  HBM read of the plane.

Shared math: bin indices are computed in-register from the f32
luminance plane exactly as the reference bins (uint8 truncation of a
value in [0, 256); scene.py:58) — ``clip(int32(y), 0, 255)``.
Negative inputs mark padding: excluded from the histogram, eq output
0.  Histograms ride the MXU as one-hot nibble dot products; 0/1
one-hots are exact in bf16 and counts stay exact integers in f32 up to
2^24 pixels per bin (an 8K plane per frame — far above any film).

The cumulative histogram is also returned because the scene detector's
frame-variation statistic ``fv = mean|eq - mafd_eq|`` is an
expectation over ≤256 distinct equalized values — O(256) from the
histogram instead of a third pass over pixels.

Returns RAW cumulative counts (the caller applies the ``/p * 255``
scaling so the division stays in one fused consumer pass).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NIB = 16
_ROWS = 8           # rows per sweep step (sublane-aligned loads)
# Rows folded into the lane axis per kernel row (FACEREC_EQ_FOLD,
# default 1 = off).  Folding cuts the kernel's dot issues fold× and the
# kernel itself measured 3.29 → 2.46 ms/128-frame block at fold=8 on
# v5e — but the fold reshape is NOT free on TPU: arrays are physically
# (8,128)-tiled, so (B,R,W)→(B,R/8,8W) crosses tile boundaries and XLA
# materialized three full-plane relayouts around it (pack + two unpack
# rematerializations, ~0.46 ms each), a measured net LOSS of ~0.5
# ms/block in the fused extract program (docs/DESIGN.md "Equalize
# lane-fold").  Kept as an A/B knob for future compilers/hardware.
_PACK = int(os.environ.get("FACEREC_EQ_FOLD", "1"))
_MAX_LANES = 16384  # packed-width cap: bounds (16, lanes) transients
# fused path: input + output plane resident, double-buffered → ~4×
# plane bytes of VMEM; 3 MB planes ≈ 12 MB of 16 MB v5e VMEM
_FUSED_PLANE_BYTES = 3 * 1024 * 1024
# tiled path: target tile size (×4 with in+out and double buffering)
_TILE_BYTES = 1024 * 1024


def _prefix16(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the 16-wide lane axis of (16, 16)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for k in (1, 2, 4, 8):
        x = x + jnp.where(lane >= k, pltpu.roll(x, k, 1), 0.0)
    return x


def _lt_from_hist(hist2d: jnp.ndarray) -> jnp.ndarray:
    """(16, 16) counts → (16, 16) LT(hi) = pixels with smaller hi
    nibble, broadcast over lanes.

    O(256) arithmetic on the finished histogram — replaces a per-pixel
    ``hi < iota`` compare+accumulate pass over the whole plane (the
    counts are exact integers in f32, so this is bit-identical)."""
    rsb = jnp.broadcast_to(jnp.sum(hist2d, axis=1, keepdims=True),
                           (_NIB, _NIB))
    sub = jax.lax.broadcasted_iota(jnp.int32, (_NIB, _NIB), 0)
    x = rsb
    for k in (1, 2, 4, 8):
        x = x + jnp.where(sub >= k, pltpu.roll(x, k, 0), 0.0)
    return x - rsb                       # exclusive prefix over hi


def _load_idx(y_ref, g, w):
    """Rows [8g, 8g+8) as int bin indices; padding (y<0) → 256."""
    y = y_ref[0, pl.ds(pl.multiple_of(g * _ROWS, _ROWS), _ROWS), :]
    idx = jnp.clip(y.astype(jnp.int32), 0, 255)
    return jnp.where(y < 0.0, 256, idx)


def _nibbles(tile, i, iot, w):
    """Row i of a tile → (hi one-hot, lo one-hot, hi) over (16, W)."""
    row = jax.lax.slice(tile, (i, 0), (i + 1, w))       # (1, W)
    hi = jnp.broadcast_to(row // _NIB, (_NIB, w))
    lo = jnp.broadcast_to(row % _NIB, (_NIB, w))
    return (hi == iot), (lo == iot), hi


def _tile_hist(y_ref, n_steps, w, iot):
    """Radix-16 histogram of a resident tile: (16, 16) counts
    [hi, lo]."""
    def body(g, hist2d):
        tile = _load_idx(y_ref, g, w)
        for i in range(_ROWS):
            a, b, _hi = _nibbles(tile, i, iot, w)
            # 0/1 one-hots are exact in bf16: single-pass MXU is exact
            hist2d = hist2d + jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return hist2d

    return jax.lax.fori_loop(
        0, n_steps, body, jnp.zeros((_NIB, _NIB), jnp.float32))


def _byte_planes(cdf2d):
    """(16, 16) f32 cdf → three PRE-SCALED bf16 byte planes for exact
    lookup.

    Each plane holds a byte value times its place weight (1, 256,
    65536) — a pure exponent shift of an integer < 256, exact in bf16.
    The one-hot lookup dots are single-pass MXU and recombination is
    two f32 adds of integers < 2^24 — the lookup is exact, with no
    per-pixel scale multiplies."""
    c0 = cdf2d % 256.0
    c12 = (cdf2d - c0) / 256.0
    c1 = c12 % 256.0
    c2 = (c12 - c1) / 256.0
    return [c0.astype(jnp.bfloat16),
            (c1 * 256.0).astype(jnp.bfloat16),
            (c2 * 65536.0).astype(jnp.bfloat16)]


def _tile_equalize(y_ref, eq_ref, planes, n_steps, w, iot):
    """Map a resident tile through the byte-plane cdf lookup.

    The three byte planes ride ONE dot per row: ``[P0|P1|P2] (16, 48)
    @ [b;b;b] (48, W)`` accumulates all three place values in the
    MXU's f32 accumulator — the same exact sum as three separate dots,
    at a third of the dot issues (measured 2.3 → 0.8 ms per 128-frame
    block; dot issues, not FLOPs, bound this kernel)."""
    lut = jnp.concatenate(planes, axis=1)               # (16, 48)

    def body(g, _):
        tile = _load_idx(y_ref, g, w)
        rows = []
        for i in range(_ROWS):
            a, b, _hi = _nibbles(tile, i, iot, w)
            bb = b.astype(jnp.bfloat16)
            bb3 = jnp.concatenate([bb, bb, bb], axis=0)  # (48, W)
            tmp = jax.lax.dot_general(
                lut, bb3,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rows.append(jnp.sum(jnp.where(a, tmp, 0.0), axis=0,
                                keepdims=True))
        eq_ref[0, pl.ds(pl.multiple_of(g * _ROWS, _ROWS), _ROWS), :] = (
            jnp.concatenate(rows, axis=0))
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)


# ---------------------------------------------------------------------------
# fused single-pass kernel (plane-resident)


def _fused_kernel(y_ref, eq_ref, cum_ref):
    """One frame: y_ref (1, R, W) f32 luminance (padding < 0);
    eq_ref (1, R, W) f32 raw cumulative count per pixel;
    cum_ref (1, 16, 16) f32 cumulative histogram (row-major 256).

    W is the plane's native width — the kernel runs on whatever lane
    count the luminance pass produced, so no relayout to a fixed
    2048-lane packing sits between them."""
    _, r, w = y_ref.shape
    n_steps = r // _ROWS
    iot = jax.lax.broadcasted_iota(jnp.int32, (_NIB, w), 0)

    hist2d = _tile_hist(y_ref, n_steps, w, iot)
    cdf2d = _lt_from_hist(hist2d) + _prefix16(hist2d)       # (16, 16)
    cum_ref[0] = cdf2d

    _tile_equalize(y_ref, eq_ref, _byte_planes(cdf2d), n_steps, w, iot)


# ---------------------------------------------------------------------------
# row-tiled two-pass kernels (any plane size)


def _hist_kernel(y_ref, hist_ref):
    """Accumulate one row tile's histogram into the frame's (16, 16)
    counts; the output block stays resident across the row-tile grid
    axis (same index), so accumulation is in-VMEM."""
    _, rt, w = y_ref.shape
    iot = jax.lax.broadcasted_iota(jnp.int32, (_NIB, w), 0)
    hist2d = _tile_hist(y_ref, rt // _ROWS, w, iot)

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        hist_ref[0] = hist2d

    @pl.when(t != 0)
    def _acc():
        hist_ref[0] += hist2d


def _eq_kernel(y_ref, cdf_ref, eq_ref):
    """Equalize one row tile against the frame's full cdf."""
    _, rt, w = y_ref.shape
    iot = jax.lax.broadcasted_iota(jnp.int32, (_NIB, w), 0)
    _tile_equalize(y_ref, eq_ref, _byte_planes(cdf_ref[0]),
                   rt // _ROWS, w, iot)


def _tile_rows(r: int, w: int) -> int:
    """Rows per tile: ≤ _TILE_BYTES, a multiple of _ROWS, ≥ _ROWS."""
    per_row = w * 4
    rows = max(_ROWS, _TILE_BYTES // per_row // _ROWS * _ROWS)
    return min(rows, r)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _equalize_fused(y, interpret=False):
    b, r, w = y.shape
    eq_raw, cum2d = pl.pallas_call(
        _fused_kernel,
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def _equalize_tiled(y, interpret=False):
    b, r, w = y.shape
    rt = _tile_rows(r, w)
    rp = (r + rt - 1) // rt * rt
    if rp != r:
        # extra sentinel rows: ignored by the histogram, eq rows sliced
        # off below
        y = jnp.pad(y, ((0, 0), (0, rp - r), (0, 0)),
                    constant_values=-1.0)
    nt = rp // rt

    hist2d = pl.pallas_call(
        _hist_kernel,
        grid=(b, nt),
        in_specs=[pl.BlockSpec((1, rt, w), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _NIB, _NIB), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, _NIB, _NIB), jnp.float32),
        interpret=interpret,
    )(y)

    # bin value v = hi*16 + lo is exactly the row-major order: the full
    # cumulative histogram is one O(256) cumsum (exact: integer counts)
    cum = jnp.cumsum(hist2d.reshape(b, 256), axis=-1)

    eq_raw = pl.pallas_call(
        _eq_kernel,
        grid=(b, nt),
        in_specs=[pl.BlockSpec((1, rt, w), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _NIB, _NIB), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rt, w), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rp, w), jnp.float32),
        interpret=interpret,
    )(y, cum.reshape(b, _NIB, _NIB))
    return eq_raw[:, :r], cum


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

    Both paths produce bit-identical outputs (the arithmetic is exact
    integer counting either way); the dispatch is purely a VMEM
    residency decision.

    Lane packing (off by default, see ``_PACK``): the kernels are
    issue-bound (one small one-hot dot per 1-row slice), so folding
    _PACK consecutive rows into the lane axis — ``(B, R, W) →
    (B, R/_PACK, _PACK·W)`` — cuts the dot issue count _PACK× at
    identical arithmetic (the histogram and the cdf lookup are both
    position-independent sums over pixels, so the results are
    bit-identical).  On TPU the fold reshape is a physical relayout
    (tiled memory), which on-chip measurement showed costs more than
    the kernel saves — hence fold=1 default.  Rows are padded to a
    multiple of 8·_PACK with the -1 sentinel, which both passes
    already ignore.
    """
    b, r, w = y.shape
    assert r % _ROWS == 0, (r, w)
    # cap the packed lane count so the kernels' (16, lanes) transients
    # stay a small fraction of VMEM even on 4K-wide planes
    pack = max(1, min(_PACK, _MAX_LANES // w))
    span = _ROWS * pack
    rp = (r + span - 1) // span * span
    if rp != r:
        y = jnp.pad(y, ((0, 0), (0, rp - r), (0, 0)),
                    constant_values=-1.0)
    yp = y.reshape(b, rp // pack, pack * w)
    if rp * w * 4 <= _FUSED_PLANE_BYTES:
        eq_raw, cum = _equalize_fused(yp, interpret=interpret)
    else:
        eq_raw, cum = _equalize_tiled(yp, interpret=interpret)
    return eq_raw.reshape(b, rp, w)[:, :r], cum


def pack_planes(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) f32 → (B, R, W): rows padded to a multiple of 8 with
    -1 (kernel padding sentinel).  Width stays native — no relayout."""
    b, h, w = y.shape
    hp = ((h + _ROWS - 1) // _ROWS) * _ROWS
    if hp != h:
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, 0)), constant_values=-1.0)
    return y
