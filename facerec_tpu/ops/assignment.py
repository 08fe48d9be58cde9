"""Linear assignment on device.

A fixed-shape Jonker–Volgenant shortest-augmenting-path solver (the same
algorithm behind ``scipy.optimize.linear_sum_assignment``) expressed
with ``lax`` loops so the whole tracker association step stays inside
the per-frame scan.  Matrices here are tiny (≤ max_tracks²), so the
O(K³) scalar-ish loops are negligible next to the detector/embedder
matmuls; what matters is avoiding a host round-trip per frame.

Replaces the reference's scipy Hungarian call in
/root/reference/facerec/sort.py:26-32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INF = 3.0e38  # plain float: avoids backend init at import time


def solve_lap_min(cost: jnp.ndarray) -> jnp.ndarray:
    """Minimum-cost perfect assignment of a square cost matrix.

    Args:
        cost: (K, K) float32, finite everywhere.
    Returns:
        (K,) int32 ``col_for_row``: column assigned to each row.
    """
    k = cost.shape[0]
    assert cost.shape == (k, k)
    cost = cost.astype(jnp.float32)
    arange = jnp.arange(k, dtype=jnp.int32)

    def solve_row(cur_row, carry):
        u, v, col4row, row4col = carry

        def search_cond(s):
            sink = s[0]
            return sink < 0

        def search_body(s):
            _, i, min_cur, min_val, path, scanned_rows, scanned_cols = s
            scanned_rows = scanned_rows.at[i].set(True)
            remaining = ~scanned_cols
            reduced = min_cur + cost[i] - u[i] - v
            better = remaining & (reduced < min_val)
            min_val = jnp.where(better, reduced, min_val)
            path = jnp.where(better, i, path)
            masked = jnp.where(remaining, min_val, _INF)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_cur = masked[j]
            scanned_cols = scanned_cols.at[j].set(True)
            unassigned = row4col[j] < 0
            sink = jnp.where(unassigned, j, jnp.int32(-1))
            i = jnp.where(unassigned, i, row4col[j])
            return (sink, i, min_cur, min_val, path, scanned_rows, scanned_cols)

        init = (
            jnp.int32(-1),
            jnp.int32(cur_row),
            jnp.float32(0.0),
            jnp.full((k,), _INF, jnp.float32),
            jnp.full((k,), -1, jnp.int32),
            jnp.zeros((k,), jnp.bool_),
            jnp.zeros((k,), jnp.bool_),
        )
        sink, _, min_cur, min_val, path, scanned_rows, scanned_cols = (
            lax.while_loop(search_cond, search_body, init)
        )

        # Dual variable updates (keep reduced costs non-negative).
        u = u.at[cur_row].add(min_cur)
        other_rows = scanned_rows & (arange != cur_row)
        assigned_cols = jnp.clip(col4row, 0, k - 1)
        u = jnp.where(other_rows, u + min_cur - min_val[assigned_cols], u)
        v = jnp.where(scanned_cols, v - (min_cur - min_val), v)

        # Augment along the alternating path ending at `sink`.
        def aug_cond(s):
            return ~s[0]

        def aug_body(s):
            _, j, col4row, row4col = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            j_next = col4row[i]
            col4row = col4row.at[i].set(j)
            return (i == cur_row, j_next, col4row, row4col)

        _, _, col4row, row4col = lax.while_loop(
            aug_cond, aug_body, (jnp.bool_(False), sink, col4row, row4col)
        )
        return u, v, col4row, row4col

    u = jnp.zeros((k,), jnp.float32)
    v = jnp.zeros((k,), jnp.float32)
    col4row = jnp.full((k,), -1, jnp.int32)
    row4col = jnp.full((k,), -1, jnp.int32)
    u, v, col4row, row4col = lax.fori_loop(
        0, k, solve_row, (u, v, col4row, row4col)
    )
    return col4row


def solve_lap_max(utility: jnp.ndarray) -> jnp.ndarray:
    """Maximum-utility perfect assignment (``maximize=True`` semantics)."""
    return solve_lap_min(-utility)


def associate(
    iou: jnp.ndarray,
    det_valid: jnp.ndarray,
    trk_valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Associate padded detections with padded tracks by IoU.

    Mirrors the reference association (sort.py:172-199): sub-threshold
    entries are demoted to -1 utility before the optimal assignment, and
    matches below the threshold are discarded afterwards.

    Args:
        iou: (D, T) IoU between detection and track boxes.
        det_valid: (D,) bool — real detections.
        trk_valid: (T,) bool — live tracks.
        iou_threshold: minimum overlap for a match.

    Returns:
        (D,) int32 ``track_for_det``: matched track slot per detection,
        or -1 for unmatched / invalid detections.
    """
    d, t = iou.shape
    k = max(d, t)
    pair_ok = det_valid[:, None] & trk_valid[None, :] & (iou >= iou_threshold)
    utility = jnp.where(pair_ok, iou, -1.0)

    def solve(_):
        padded = jnp.full((k, k), -2.0, jnp.float32)
        padded = lax.dynamic_update_slice(padded, utility, (0, 0))
        col4row = solve_lap_max(padded)[:d]

        in_range = col4row < t
        col_clipped = jnp.clip(col4row, 0, t - 1)
        good = (
            in_range
            & det_valid
            & jnp.take_along_axis(pair_ok, col_clipped[:, None], axis=1)[:, 0]
        )
        return jnp.where(good, col4row, -1)

    if d > t:
        # With more rows than real columns the -1/-2 padding economy can
        # move the optimum away from row argmaxes; always solve exactly.
        return solve(None)

    # Fast path: when every "active" detection (one with at least one
    # above-threshold pair) has a strictly unique row maximum and the
    # argmax columns are distinct, assigning each active row its argmax
    # attains the sum-of-row-maxima upper bound, so it is THE optimal
    # assignment restricted to active rows.  With d ≤ t every row gets a
    # real column, so inactive/padding rows contribute a constant and
    # cannot perturb it.  In tracking this covers almost every frame —
    # the serial O(K³) solver only runs on genuine conflicts.
    active = pair_ok.any(axis=1)
    best = jnp.argmax(utility, axis=1).astype(jnp.int32)
    best_val = jnp.max(utility, axis=1)
    tied = jnp.sum(utility == best_val[:, None], axis=1) > 1
    # Column-collision count as a compare matrix, not a scatter-add
    # (scatters serialize on TPU and this runs once per scanned frame).
    taken = jnp.sum(
        active[:, None] & (best[:, None] == jnp.arange(t)[None, :]),
        axis=0)
    fast_ok = ~jnp.any(taken > 1) & ~jnp.any(tied & active)
    fast = jnp.where(active, best, -1)
    return lax.cond(fast_ok, lambda _: fast, solve, None)
