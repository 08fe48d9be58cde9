"""Histogram equalization, radix-16 formulation (Pallas TPU kernel).

The first kernel (:mod:`facerec_tpu.ops.pallas.equalize`) sweeps a
256-lane one-hot compare per pixel — ~300M VPU ops per frame, ~12 ms
per 64-frame block.  This version decomposes each 8-bit bin index into
two nibbles ``v = 16·hi + lo`` so the histogram becomes an outer
product of two 16-wide one-hots — one tiny MXU matmul per chunk:

  pass 1:  A[h,p] = [hi(p) == h]   B[l,p] = [lo(p) == l]   (16×LANES each)
           hist2d += A @ Bᵀ                                (16×16 MXU)
           lt[h]   += Σ_p [hi(p) < h]                      (VPU)
  cdf2d[h,l] = lt[h] + prefix_l(hist2d[h])                 (4 roll+add steps)
  pass 2:  tmp = cdf2dᵢ @ B per byte plane                 (16×LANES MXU)
           eq(p) = Σ_h A[h,p] · tmp[h,p]                   (sublane reduce)

~19M VPU ops + ~300 MFLOP MXU per frame instead of ~300M VPU ops.
Everything runs single-pass bf16 on the MXU and stays exact: 0/1
one-hots are exact in bf16, counts stay < 2²⁴ in the f32 accumulators,
and cdf2d (up to 19 bits) is split into byte planes < 256 (each exact
in bf16) whose one-hot lookups pick exactly one value before the f32
recombination.  The final cdf division happens outside (same 1-ulp
story as v1).  Padding pixels hold 256 → hi = 16 matches no bin and is
< no bin.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NIB = 16
_LANES = 2048       # pixels per chunk


def _prefix16(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the 16-wide lane axis of (16, 16)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for k in (1, 2, 4, 8):
        x = x + jnp.where(lane >= k, pltpu.roll(x, k, 1), 0.0)
    return x


_ROWS = 8           # rows per sweep step (sublane-aligned loads)


def _equalize_kernel(idx_ref, eq_ref):
    """One frame: idx_ref (1, R, 512) int32 bin indices (padding 256);
    eq_ref (1, R, 512) f32 receives the raw cumulative count."""
    _, r, _ = idx_ref.shape
    n_steps = r // _ROWS
    iot = jax.lax.broadcasted_iota(jnp.int32, (_NIB, _LANES), 0)

    def load(g):
        return idx_ref[0, pl.ds(pl.multiple_of(g * _ROWS, _ROWS), _ROWS), :]

    def nibbles(tile, i):
        row = jax.lax.slice(tile, (i, 0), (i + 1, _LANES))  # (1, LANES)
        hi = jnp.broadcast_to(row // _NIB, (_NIB, _LANES))
        lo = jnp.broadcast_to(row % _NIB, (_NIB, _LANES))
        return (hi == iot), (lo == iot), hi

    def hist_body(g, carry):
        hist2d, lt = carry
        tile = load(g)
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
         jnp.zeros((_NIB, _LANES), jnp.float32)))
    lt = jnp.sum(lt_part, axis=1, keepdims=True)            # (16, 1)
    cdf2d = lt + _prefix16(hist2d)                          # (16, 16)

    # Byte-plane split: cdf2d = c2·65536 + c1·256 + c0 with each plane
    # an integer < 256, exact in bf16 — the lookup dots then run
    # single-pass on the MXU and each output picks exactly one plane
    # value through the one-hot, so the recombination is exact f32.
    c0 = cdf2d % 256.0
    c12 = (cdf2d - c0) / 256.0
    c1 = c12 % 256.0
    c2 = (c12 - c1) / 256.0
    planes = [(c0.astype(jnp.bfloat16), 1.0),
              (c1.astype(jnp.bfloat16), 256.0),
              (c2.astype(jnp.bfloat16), 65536.0)]

    def eq_body(g, _):
        tile = load(g)
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def equalize_tpu_v2(y: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batch histogram equalization (radix-16 kernel); same contract as
    :func:`facerec_tpu.ops.pallas.equalize.equalize_tpu`."""
    b, h, w = y.shape
    p = h * w
    idx = y.astype(jnp.uint8).astype(jnp.int32).reshape(b, p)
    pp = _round_up(p, _LANES * _ROWS)
    if pp != p:
        idx = jnp.pad(idx, ((0, 0), (0, pp - p)), constant_values=256)
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
