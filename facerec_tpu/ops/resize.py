"""Letterbox downscale as periodic strided-slice combinations.

``jax.image.resize``'s antialiased bilinear downscale builds a dense
(out, in) weight matrix per axis and contracts it — at film resolution
that moves ~900 MB of transposed intermediates per 128-frame block
(docs/DESIGN.md "Where the time goes").  For the rational scales
``fit_input_size`` produces (576→384 and 768→512 are both exactly 2/3)
the weight matrix is BANDED and PERIODIC: with gi = in/gcd and
go = out/gcd, output row ``q·go + o`` applies the same ``K`` tap
weights as row ``o``, shifted by ``q·gi``.  Each of the ``go`` output
phases is then a fixed linear combination of ``K`` statically-strided
slices of the input — pure elementwise work XLA fuses into one pass:
no gathers, no MXU matmuls, no transposed intermediates.

Weights are extracted from ``jax.image.resize`` itself (by resizing an
identity matrix), so the taps match its antialiased kernel exactly;
the first and last output groups (edge-clamped weights) are computed
from the dense rows directly.  Axes whose sizes don't reduce to a
small periodic pattern fall back to ``jax.image.resize``.

On-chip A/B verdict (scripts/resize_ab.py, v5e, fused extract block
at 576×768→384×512): detections bit-identical to jax.image.resize,
but 42.4 vs 30.3 ms/block — the go×K strided-slice terms lose to the
dense banded contraction once fused into the block program (the same
fusion behaviour that made a separable-MATMUL resize 17× slower).
``FACEREC_RESIZE=periodic`` stays as an opt-in for re-measuring on
future compiler versions; ``xla`` is the production default.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# periodic-pattern limits: beyond these the slice count outgrows the
# dense contraction's cost
_MAX_PHASE = 6     # go: output rows per group
_MAX_TAPS = 8      # K: input taps per output row
_MIN_GROUPS = 8    # g: need enough interior groups to be worth it


class _AxisPlan:
    def __init__(self, n_in, n_out, gi, go, base, weights, r_first,
                 r_last, first_cols, last_cols):
        self.n_in, self.n_out = n_in, n_out
        self.gi, self.go = gi, go
        self.base = base              # (go,) int — first tap offset
        self.weights = weights        # (go, K) f32 interior pattern
        self.r_first = r_first        # (go, first_cols) exact edge rows
        self.r_last = r_last          # (go, last_cols)
        self.first_cols = first_cols
        self.last_cols = last_cols


@functools.lru_cache(maxsize=None)
def _axis_plan(n_in: int, n_out: int) -> Optional[_AxisPlan]:
    """Extract the periodic tap pattern of jax.image.resize's bilinear
    (antialiased) downscale along one axis; None when absent/too wide."""
    if n_out >= n_in or n_out < 2:
        return None
    g = math.gcd(n_in, n_out)
    gi, go = n_in // g, n_out // g
    if g < _MIN_GROUPS or go > _MAX_PHASE:
        return None
    # ensure_compile_time_eval: the plan is static host-side data; when
    # _axis_plan is first reached INSIDE a jit trace (e.g. the fused
    # extract block program), eye/resize must run eagerly, not stage
    # tracers into the outer computation.
    with jax.ensure_compile_time_eval(), \
            jax.default_device(jax.local_devices(backend="cpu")[0]):
        eye = jnp.eye(n_in, dtype=jnp.float32)
        R = np.asarray(jax.image.resize(eye, (n_out, n_in), "bilinear"))

    # interior pattern from a middle group
    q0 = g // 2
    rows = R[q0 * go:(q0 + 1) * go]
    nz = [np.nonzero(r)[0] for r in rows]
    if any(len(n) == 0 for n in nz):
        return None
    lo = min(int(n[0]) for n in nz) - q0 * gi
    hi = max(int(n[-1]) for n in nz) - q0 * gi
    K = hi - lo + 1
    if K > _MAX_TAPS:
        return None
    base = np.full(go, lo, np.int64)
    weights = np.zeros((go, K), np.float32)
    for o in range(go):
        weights[o] = R[q0 * go + o, q0 * gi + lo:q0 * gi + hi + 1]

    # verify periodicity over every interior group
    for q in range(1, g - 1):
        s = q * gi + lo
        if s < 0 or s + K > n_in:
            return None
        block = R[q * go:(q + 1) * go, s:s + K]
        if not np.allclose(block, weights, atol=1e-6):
            return None
        other = R[q * go:(q + 1) * go].copy()
        other[:, s:s + K] = 0
        if np.abs(other).max() > 1e-6:
            return None

    # exact edge rows (clamped kernels differ from the pattern)
    first_cols = max(int(np.nonzero(r)[0][-1]) for r in R[:go]) + 1
    last_cols = n_in - min(int(np.nonzero(r)[0][0]) for r in R[-go:])
    return _AxisPlan(n_in, n_out, gi, go, base, weights,
                     R[:go, :first_cols].copy(),
                     R[-go:, n_in - last_cols:].copy(),
                     first_cols, last_cols)


def _resize_axis(x: jnp.ndarray, axis: int, plan: _AxisPlan) -> jnp.ndarray:
    """Apply one axis's periodic plan; x float, any leading/trailing dims."""
    dtype = x.dtype
    gi, go, K = plan.gi, plan.go, plan.weights.shape[1]
    g = plan.n_in // gi
    lo = int(plan.base[0])

    # pad so every interior-group slice is in bounds (edge groups are
    # overwritten with exact rows, so pad values never surface)
    pad_lo = max(0, -lo)
    pad_hi = max(0, (g - 1) * gi + lo + K - plan.n_in)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (pad_lo, pad_hi)
    xp = jnp.pad(x, pad) if (pad_lo or pad_hi) else x

    w = plan.weights.astype(np.float32)
    phases = []
    for o in range(go):
        acc = None
        for k in range(K):
            start = pad_lo + lo + k
            sl = jax.lax.slice_in_dim(
                xp, start, start + (g - 1) * gi + 1, stride=gi, axis=axis)
            term = sl.astype(jnp.float32) * w[o, k]
            acc = term if acc is None else acc + term
        phases.append(acc)                       # (..., g, ...)
    y = jnp.stack(phases, axis=axis + 1)         # (..., g, go, ...)
    shape = list(x.shape)
    shape[axis] = plan.n_out
    y = y.reshape(shape).astype(dtype)

    # exact edge groups
    def take(arr, sl):
        idx = [slice(None)] * arr.ndim
        idx[axis] = sl
        return arr[tuple(idx)]

    first = jnp.tensordot(
        plan.r_first.astype(np.float32),
        take(x, slice(0, plan.first_cols)).astype(jnp.float32),
        axes=([1], [axis]))
    last = jnp.tensordot(
        plan.r_last.astype(np.float32),
        take(x, slice(plan.n_in - plan.last_cols, plan.n_in)
             ).astype(jnp.float32),
        axes=([1], [axis]))
    # tensordot puts the contracted axis's replacement first
    perm = list(range(1, axis + 1)) + [0] + list(range(axis + 1, x.ndim))
    first = jnp.transpose(first, perm).astype(dtype)
    last = jnp.transpose(last, perm).astype(dtype)
    y = jnp.concatenate(
        [first, take(y, slice(go, plan.n_out - go)), last], axis=axis)
    return y


def letterbox_resize(x: jnp.ndarray, out_hw, method: str = "auto"
                     ) -> jnp.ndarray:
    """(B, H, W, C) float → (B, sh, sw, C), numerically matching
    ``jax.image.resize(..., "bilinear")``.

    method: "auto" uses the periodic path per axis when its pattern
    exists, "xla" forces jax.image.resize, "periodic" asserts the
    pattern exists (tests).
    """
    b, h, w, c = x.shape
    sh, sw = out_hw
    if method == "xla":
        return jax.image.resize(x, (b, sh, sw, 3), "bilinear")
    ph = _axis_plan(h, sh) if sh != h else "id"
    pw = _axis_plan(w, sw) if sw != w else "id"
    if method == "periodic":
        assert ph is not None and pw is not None, (h, sh, w, sw)
    if ph is None or pw is None:
        return jax.image.resize(x, (b, sh, sw, 3), "bilinear")
    y = x
    if pw != "id":
        y = _resize_axis(y, 2, pw)
    if ph != "id":
        y = _resize_axis(y, 1, ph)
    return y
