"""Histogram equalization as a Pallas TPU kernel.

The scene detector equalizes every frame's luminance plane
(/root/reference/facerec/scene.py:52-63): 256-bin histogram → cdf →
per-pixel lookup.  In plain XLA that is a scatter-add (``bincount``)
plus a per-pixel gather (``cdf[idx]``) — both serialize on TPU and
dominated the whole extract block (~394 ms for 64 frames of 576×768,
with a multi-minute compile).

The kernel keeps everything in the native (sublane, lane) layout: the
plane is flattened to rows of 512 pixels, pixels ride the lane axis,
the 256 bins ride the sublane axis, and both passes are broadcast
compares — no transposes, gathers or scatters anywhere:

  pass 1:  part[v, l] += [idx(l) ≤ v]            (compare + add)
  cum[v]   = Σ_l part[v, l]                       (one lane reduce — this
                                                   IS the cumulative
                                                   histogram, no cumsum)
  pass 2:  eq(l)  = Σ_v [idx(l) == v]·cdf[v]      (compare + select + sublane reduce)

Counts and cumulative counts stay < 2²⁴, so all kernel arithmetic is
exact integer f32; the only inexact op is the final cdf division, done
outside the kernel.  XLA strength-reduces division by a constant into
a reciprocal multiply (on every backend, with per-lowering rounding),
so the output matches the jnp reference path
(:func:`facerec_tpu.ops.scene.equalize`, the CPU fallback) to 1 ulp —
~1e-7 relative on statistics averaged over ~3·10⁵ pixels, far below
the integer scene-decision thresholds.  One grid program per frame.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BINS = 256
_LANES = 512        # pixels per row of the flattened plane
_ROWS = 8           # rows per sweep step (sublane tile)
_STEP = _LANES * _ROWS


def _equalize_kernel(idx_ref, eq_ref):
    """One frame: idx_ref (1, R, 512) int32 bin indices (padding holds
    256 and matches no bin); eq_ref (1, R, 512) f32 receives the RAW
    cumulative count per pixel — exact f32 integers.  The cdf division
    and ×255 happen outside the kernel."""
    _, r, _ = idx_ref.shape
    n_steps = r // _ROWS
    bins = jax.lax.broadcasted_iota(jnp.int32, (_BINS, _LANES), 0)

    def row_vs_bins(tile, i):
        row = jax.lax.slice(tile, (i, 0), (i + 1, _LANES))
        return jnp.broadcast_to(row, (_BINS, _LANES))

    def load(g):
        return idx_ref[0, pl.ds(pl.multiple_of(g * _ROWS, _ROWS), _ROWS), :]

    # Cumulative histogram directly: count idx ≤ v instead of idx == v,
    # so no cumsum/matmul is needed and every add is an exact integer
    # in f32.  (Padding holds 256 and is ≤ no bin.)
    def hist_body(g, part):
        tile = load(g)
        for i in range(_ROWS):
            part = part + (row_vs_bins(tile, i) <= bins).astype(jnp.float32)
        return part

    part = jax.lax.fori_loop(
        0, n_steps, hist_body, jnp.zeros((_BINS, _LANES), jnp.float32))
    cum = jnp.sum(part, axis=1, keepdims=True)            # (BINS, 1)
    cum_b = jnp.broadcast_to(cum, (_BINS, _LANES))

    def eq_body(g, _):
        tile = load(g)
        rows = []
        for i in range(_ROWS):
            picked = jnp.where(row_vs_bins(tile, i) == bins, cum_b, 0.0)
            rows.append(jnp.sum(picked, axis=0, keepdims=True))
        eq_ref[0, pl.ds(pl.multiple_of(g * _ROWS, _ROWS), _ROWS), :] = (
            jnp.concatenate(rows, axis=0))
        return 0

    jax.lax.fori_loop(0, n_steps, eq_body, 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def equalize_tpu(y: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batch histogram equalization; matches the jnp path to 1 ulp
    (see module docstring).

    Args:
        y: (B, H, W) float32 luminance planes, values in [0, 256).
        interpret: run the kernel in interpreter mode (CPU testing).
    Returns:
        (B, H, W) float32 equalized planes.
    """
    b, h, w = y.shape
    p = h * w
    idx = y.astype(jnp.uint8).astype(jnp.int32).reshape(b, p)
    pp = _round_up(p, _STEP)
    if pp != p:
        idx = jnp.pad(idx, ((0, 0), (0, pp - p)), constant_values=_BINS)
    r = pp // _LANES
    idx = idx.reshape(b, r, _LANES)

    cum = pl.pallas_call(
        _equalize_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, r, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32),
        interpret=interpret,
    )(idx)
    cum = cum.reshape(b, pp)[:, :p].reshape(b, h, w)
    return (cum / p) * 255.0
