"""SORT as a fixed-capacity batched scan.

The reference keeps a Python list of per-track filterpy Kalman objects
and updates them one frame at a time (/root/reference/facerec/sort.py).
Here the whole tracker is a fixed-capacity *track table* — (T,) state
vectors plus a batched Kalman state — advanced by one fused device step
per frame inside ``lax.scan``.  Association runs the on-device LAP
solver, so an entire frame block (detections in, trajectory emissions
out) is a single XLA computation with no host round-trips.

Lifecycle parity with the reference:
  - scene-change kill before the frame's predict (sort.py:333-336,
    extract.py:312-316)
  - ``min_hits`` starting rule via ``initial_hits`` (sort.py:127,139-140,
    279-281)
  - ``max_age`` expiry (sort.py:279)
  - posterior-vs-prior history entries (sort.py:124,135,159)

Differences by design: track/detection capacity is static (config), and
degenerate Kalman states are clamped to empty boxes instead of NaN-purged
(sort.py:246-252) — a clamped track can never match and expires the
same way.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from facerec_tpu.ops import assignment, boxes, kalman


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    max_tracks: int = 32
    max_detections: int = 16
    max_age: int = 5
    min_hits: int = 3
    iou_threshold: float = 0.5


class TrackerState(NamedTuple):
    kf: kalman.KalmanState
    active: jnp.ndarray        # (T,) bool — currently followed
    uid: jnp.ndarray           # (T,) int32 — global track id
    first_frame: jnp.ndarray   # (T,) int32
    hist_len: jnp.ndarray      # (T,) int32 — history entries so far
    tsu: jnp.ndarray           # (T,) int32 — time since last update
    hits: jnp.ndarray          # (T,) int32
    initial_hits: jnp.ndarray  # (T,) int32
    next_uid: jnp.ndarray      # () int32


class TrackEmit(NamedTuple):
    """Per-frame outputs of one tracker step (leading axis = frames)."""

    box: jnp.ndarray        # (T, 4) float32 state box (posterior if detected)
    emit: jnp.ndarray       # (T,) bool — slot produced a history entry
    detected: jnp.ndarray   # (T,) bool — entry is a posterior
    uid: jnp.ndarray        # (T,) int32
    first_frame: jnp.ndarray  # (T,) int32
    det_slot: jnp.ndarray   # (D,) int32 — track slot per detection, -1 if none
    overflow: jnp.ndarray   # () int32 — detections dropped for lack of slots


def init_tracker(cfg: TrackerConfig) -> TrackerState:
    t = cfg.max_tracks
    zeros = jnp.zeros((t,), jnp.int32)
    return TrackerState(
        kf=kalman.init_state(t),
        active=jnp.zeros((t,), jnp.bool_),
        uid=jnp.full((t,), -1, jnp.int32),
        first_frame=zeros,
        hist_len=zeros,
        tsu=zeros,
        hits=zeros,
        initial_hits=zeros,
        next_uid=jnp.zeros((), jnp.int32),
    )


def step(
    cfg: TrackerConfig,
    state: TrackerState,
    det_boxes: jnp.ndarray,
    det_valid: jnp.ndarray,
    scene_change: jnp.ndarray,
    frame: jnp.ndarray,
) -> Tuple[TrackerState, TrackEmit]:
    """Advance the tracker by one frame.

    Args:
        cfg: static configuration.
        state: track table carry.
        det_boxes: (D, 4) float32 detections [x1,y1,x2,y2].
        det_valid: (D,) bool.
        scene_change: () bool — kill all live tracks before this frame.
        frame: () int32 global frame index.
    """
    # Detection capacity comes from the data so a detector padded to a
    # different width than cfg.max_detections still works.
    t, d = cfg.max_tracks, det_boxes.shape[0]
    arange_t = jnp.arange(t, dtype=jnp.int32)
    arange_d = jnp.arange(d, dtype=jnp.int32)

    # 1. Scene-change kill: stop following, slots become reusable now.
    was_active = state.active & ~scene_change

    # 2. Predict all, keep only followed slots' results.
    kf_prior = kalman.predict(state.kf)
    kf = kalman.KalmanState(
        x=jnp.where(was_active[:, None], kf_prior.x, state.kf.x),
        p=jnp.where(was_active[:, None, None], kf_prior.p, state.kf.p),
    )
    tsu = jnp.where(was_active, state.tsu + 1, state.tsu)
    hist_len = jnp.where(was_active, state.hist_len + 1, state.hist_len)

    # 3. Associate detections with prior boxes.
    prior_boxes = boxes.z_to_box(kf.x[:, :4])
    iou = boxes.iou_matrix(det_boxes, prior_boxes)
    det_slot = assignment.associate(iou, det_valid, was_active,
                                    cfg.iou_threshold)

    # 4. Invert the detection→slot assignment and update the Kalman
    # posteriors.  The inversion is a (T, D) one-hot compare matrix
    # instead of scatter/gather: scatters serialize on TPU (~µs each)
    # and this runs inside a 64-step scan.
    # Invalid padding boxes are degenerate (0/0 aspect → NaN); zero them
    # so the one-hot selection matmuls below stay NaN-free (NaN·0 = NaN).
    zd = boxes.box_to_z(det_boxes)                       # (D, 4)
    zd = jnp.where(jnp.isfinite(zd), zd, 0.0)
    match_eq = (det_slot[None, :] == arange_t[:, None]) & (
        det_slot[None, :] >= 0)                          # (T, D), ≤1 per row
    matched = match_eq.any(axis=1)
    slot_det = jnp.where(
        matched, jnp.argmax(match_eq, axis=1).astype(jnp.int32), -1)
    z = match_eq.astype(zd.dtype) @ zd                   # rows 0 if unmatched
    kf = kalman.update(kf, z, matched)
    hits = jnp.where(matched, state.hits + 1, state.hits)
    tsu = jnp.where(matched, 0, tsu)
    initial_hits = jnp.where(matched & (hist_len == hits),
                             state.initial_hits + 1, state.initial_hits)

    # 5. Unfollow rules (sort.py:277-282), evaluated on followed slots.
    expired = was_active & (tsu > cfg.max_age) & (hist_len >= cfg.min_hits)
    not_started = was_active & (hist_len <= cfg.min_hits) & (
        initial_hits < hist_len)
    still_active = was_active & ~(expired | not_started)

    # 6. Spawn new tracks for unmatched detections into slots that are
    # not emitting this frame (never-active or scene-killed).
    unmatched = det_valid & (det_slot < 0)
    free = ~was_active
    n_free = jnp.sum(free.astype(jnp.int32))
    spawn_rank = jnp.cumsum(unmatched.astype(jnp.int32)) - 1
    will_spawn = unmatched & (spawn_rank < n_free)
    overflow = jnp.sum((unmatched & ~will_spawn).astype(jnp.int32))

    # Pair the r-th spawning detection with the r-th free slot, again as
    # a (T, D) one-hot compare (scatter-free): slot t takes detection d
    # iff both sit at the same free/spawn rank.
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    spawn_eq = (free[:, None] & will_spawn[None, :] &
                (free_rank[:, None] == spawn_rank[None, :]))  # (T, D)
    spawned = spawn_eq.any(axis=1)
    spawn_det = jnp.where(
        spawned, jnp.argmax(spawn_eq, axis=1).astype(jnp.int32), -1)
    slot_for_det = jnp.sum(
        spawn_eq.astype(jnp.int32) * arange_t[:, None], axis=0)  # (D,)

    z_new = spawn_eq.astype(zd.dtype) @ zd
    kf = kalman.reset_tracks(kf, spawned, z_new)
    uid = jnp.where(
        spawned,
        state.next_uid + jnp.sum(
            spawn_eq.astype(jnp.int32) * spawn_rank[None, :], axis=1),
        state.uid,
    )
    first_frame = jnp.where(spawned, frame, state.first_frame)
    hist_len = jnp.where(spawned, 1, hist_len)
    hits = jnp.where(spawned, 1, hits)
    initial_hits = jnp.where(spawned, 1, initial_hits)
    tsu = jnp.where(spawned, 0, tsu)
    det_slot = jnp.where(will_spawn, slot_for_det, det_slot)

    new_state = TrackerState(
        kf=kf,
        active=still_active | spawned,
        uid=uid,
        first_frame=first_frame,
        hist_len=hist_len,
        tsu=tsu,
        hits=hits,
        initial_hits=initial_hits,
        next_uid=state.next_uid + jnp.sum(will_spawn.astype(jnp.int32)),
    )
    emit = TrackEmit(
        box=boxes.z_to_box(kf.x[:, :4]),
        emit=was_active | spawned,
        detected=matched | spawned,
        uid=uid,
        first_frame=first_frame,
        det_slot=det_slot,
        overflow=overflow,
    )
    return new_state, emit


# lax.scan unroll factor for the per-frame tracker step.  The step's
# tensors are tiny (a (T,8) Kalman table and a (T,D) IoU matrix), so
# per-iteration loop overhead is a real fraction of the scan's device
# time; unrolling trades a longer program for fewer loop trips.
# Bit-identical output at any factor (same ops, same order) —
# overridable for A/B measurement via FACEREC_TRACKER_UNROLL.
# Measured on-chip (v5e, fused 128-frame block, scripts/
# profile_block.py): unroll=1 → 3.77 ms/block, 8 → 3.50, 32 → 3.50 —
# the win saturates at 8 (the per-step association NMS while-loop is
# the remaining floor), so 8 is the default: same speed as 32 with a
# quarter of the program growth.
import os as _os

SCAN_UNROLL = int(_os.environ.get("FACEREC_TRACKER_UNROLL", "8"))


def _run_block_impl(cfg, state, det_boxes, det_valid, scene_changes,
                    frame0):
    b = det_boxes.shape[0]

    def body(carry, inp):
        det_b, det_v, sc, off = inp
        new_carry, emit = step(cfg, carry, det_b, det_v, sc, frame0 + off)
        return new_carry, emit

    offsets = jnp.arange(b, dtype=jnp.int32)
    return jax.lax.scan(body, state, (det_boxes, det_valid, scene_changes,
                                      offsets),
                        unroll=min(SCAN_UNROLL, b))


_run_block_jit = jax.jit(_run_block_impl, static_argnums=0)


def run_block(
    cfg: TrackerConfig,
    state: TrackerState,
    det_boxes: jnp.ndarray,
    det_valid: jnp.ndarray,
    scene_changes: jnp.ndarray,
    frame0: jnp.ndarray,
) -> Tuple[TrackerState, TrackEmit]:
    """Scan the tracker over a block of frames (one jitted dispatch).

    Args:
        state: carry from the previous block.
        det_boxes: (B, D, 4) float32.
        det_valid: (B, D) bool.
        scene_changes: (B,) bool.
        frame0: () int32 — global index of the block's first frame.

    Returns:
        (new_state, emissions) with a leading (B,) axis on every
        :class:`TrackEmit` field.
    """
    import jax.core

    if isinstance(det_boxes, jax.core.Tracer):
        # already inside a surrounding jit/shard_map trace
        return _run_block_impl(cfg, state, det_boxes, det_valid,
                               scene_changes, jnp.asarray(frame0))
    return _run_block_jit(cfg, state, det_boxes, det_valid,
                          scene_changes, jnp.asarray(frame0, jnp.int32))
