"""LAP solver vs scipy's Hungarian (same JV algorithm → same optima)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from facerec_tpu.ops import assignment


@pytest.mark.parametrize("k", [1, 2, 5, 16, 32])
def test_lap_min_matches_scipy(rng, k):
    for _ in range(5):
        cost = rng.normal(size=(k, k)).astype(np.float32) * 10
        got = np.asarray(assignment.solve_lap_min(jnp.asarray(cost)))
        rows, cols = linear_sum_assignment(cost)
        want_total = cost[rows, cols].sum()
        got_total = cost[np.arange(k), got].sum()
        # optimal objective must match; permutation may differ on ties
        assert sorted(got.tolist()) == list(range(k))
        np.testing.assert_allclose(got_total, want_total, rtol=1e-5)


def test_lap_max(rng):
    util = rng.uniform(size=(8, 8)).astype(np.float32)
    got = np.asarray(assignment.solve_lap_max(jnp.asarray(util)))
    rows, cols = linear_sum_assignment(util, maximize=True)
    np.testing.assert_allclose(
        util[np.arange(8), got].sum(), util[rows, cols].sum(), rtol=1e-5)


def test_associate_basic():
    # 2 dets, 3 track slots; det0 overlaps trk1 strongly, det1 nothing
    iou = jnp.asarray([
        [0.1, 0.9, 0.0],
        [0.2, 0.3, 0.0],
    ], jnp.float32)
    out = assignment.associate(
        iou,
        det_valid=jnp.asarray([True, True]),
        trk_valid=jnp.asarray([True, True, False]),
        iou_threshold=0.5,
    )
    assert out.tolist() == [1, -1]


def test_associate_respects_validity():
    iou = jnp.full((2, 2), 0.9, jnp.float32)
    out = assignment.associate(
        iou,
        det_valid=jnp.asarray([True, False]),
        trk_valid=jnp.asarray([False, True]),
        iou_threshold=0.5,
    )
    # only det0↔trk1 is a valid pair
    assert out.tolist() == [1, -1]


def test_associate_optimal_swap():
    # Greedy would give det0→trk0 (0.8); optimal total prefers the swap
    iou = jnp.asarray([
        [0.8, 0.7],
        [0.75, 0.0],
    ], jnp.float32)
    out = assignment.associate(
        iou,
        det_valid=jnp.asarray([True, True]),
        trk_valid=jnp.asarray([True, True]),
        iou_threshold=0.5,
    )
    assert out.tolist() == [1, 0]


@pytest.mark.slow
def test_associate_random_matches_scipy(rng):
    """Fast path and JV fallback must agree with a scipy-based oracle on
    the reference semantics (threshold demotion + post-filter)."""
    for trial in range(30):
        d, t = rng.integers(1, 9), rng.integers(1, 9)
        iou = rng.uniform(0, 1, (d, t)).astype(np.float32)
        det_valid = rng.uniform(size=d) > 0.2
        trk_valid = rng.uniform(size=t) > 0.2
        thr = 0.3

        got = np.asarray(assignment.associate(
            jnp.asarray(iou), jnp.asarray(det_valid),
            jnp.asarray(trk_valid), thr))

        pair_ok = det_valid[:, None] & trk_valid[None, :] & (iou >= thr)
        util = np.where(pair_ok, iou, -1.0)
        k = max(d, t)
        padded = np.full((k, k), -2.0, np.float32)
        padded[:d, :t] = util
        rows, cols = linear_sum_assignment(padded, maximize=True)
        want = np.full(d, -1, np.int64)
        for r, c in zip(rows, cols):
            if r < d and c < t and pair_ok[r, c]:
                want[r] = c
        assert got.tolist() == want.tolist(), (trial, iou, det_valid,
                                               trk_valid)
