"""Post-training BatchNorm running-statistics recalibration.

Short-budget training leaves BN running statistics stale: with ConvBN's
momentum 0.995, a 200-step probe still carries 0.995^200 ≈ 37% of the
INITIALIZATION statistics (mean 0, var 1) in every running average.
Normalizing with those at deploy time compounds the error through the
~20 γ-free BN layers of the detector — measured on a w=128 probe the
eval-mode score logits reached 4.4e4 against a sane train-mode max of
6.1, collapsing detection outright while the training loss looked
healthy (docs/DESIGN.md "BN recalibration").

The fix is the standard BN re-estimation pass, made exact for EMAs:
run K calibration batches forward in train mode (which folds their
batch statistics into the running average at the module's own
momentum), then UNWIND the EMA so the result contains only the
calibration batches' statistics:

    ra_K = m^K · ra_0 + (1 − m^K) · S      (flax BN update, unrolled)
    S    = (ra_K − m^K · ra_0) / (1 − m^K)

S is a geometrically-weighted average of the K calibration batches'
statistics — unbiased for i.i.d. batches — and the stale ra_0
component is removed EXACTLY, so K ≈ 16–64 batches suffice at any
momentum.  (Without the unwind, momentum 0.995 would need thousands of
passes to wash the stale component out.)

The reference trains nothing, so it has no analogue; this protects the
rebuild's own trainers (selfcheck, distill) whose probe budgets are
exactly the short-run regime where EMAs stay stale.
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax


def recalibrate_batch_stats(variables: dict, batches: Iterable,
                            apply_batch: Callable,
                            momentum: float = 0.995) -> dict:
    """Replace the ``batch_stats`` collection with fresh statistics
    estimated from ``batches``.

    ``apply_batch(variables, batch) -> new_batch_stats`` must run the
    model forward in train mode with ``mutable=["batch_stats"]`` and
    return the mutated collection (typically a thin jitted wrapper
    around ``model.apply``).  ``momentum`` must match the BN modules'
    momentum (ConvBN uses 0.995).

    Returns a new variables dict; params are untouched.
    """
    ra0 = variables["batch_stats"]
    v = dict(variables)
    n = 0
    for x in batches:
        v["batch_stats"] = apply_batch(v, x)
        n += 1
    if n == 0:
        raise ValueError("recalibration needs at least one batch")
    ra_k = v["batch_stats"]
    w = momentum ** n
    unwound = jax.tree_util.tree_map(
        lambda a, b: (a - w * b) / (1.0 - w), ra_k, ra0)
    # Exact algebra keeps variances positive (S is a convex combination
    # of per-batch variances); guard the float roundoff anyway so a
    # degenerate channel can never produce a negative variance.
    import jax.numpy as jnp

    def _clamp(path, leaf):
        if path and getattr(path[-1], "key", None) == "var":
            return jnp.maximum(leaf, 1e-6)
        return leaf

    v["batch_stats"] = jax.tree_util.tree_map_with_path(_clamp, unwound)
    return v
