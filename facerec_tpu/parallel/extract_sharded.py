"""Frame-axis sharded extract step (multi-chip).

One device block step sharded over a 1-D mesh with ``shard_map``:

  - scene statistics: each device computes luminance/equalized planes
    for its local frames and receives a 2-frame plane halo from its
    left neighbour over ICI (``ppermute``) — the exact state the
    sequential detector carries (ops/scene.py), so sharded == serial.
  - detection: embarrassingly parallel per frame.
  - tracking: per-device tracker over the local sub-range with a
    device-unique uid base; sub-range trajectories are stitched by the
    merge stage exactly like the reference's file shards
    (SURVEY.md §2.4, §5.7).

This is the reference's 100-way SLURM temporal sharding collapsed into
one XLA program per block.  It demonstrates the ICI halo-exchange
formulation (sub-block spans within ONE block); the production
multi-chip path is :mod:`facerec_tpu.parallel.extract_mesh`, which
gives each device a contiguous film span with carried state and needs
no collectives.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerec_tpu.models.detector import Detections
from facerec_tpu.ops import scene as scene_ops
from facerec_tpu.track import TrackerConfig, init_tracker, run_block
from facerec_tpu.track.tracker import TrackEmit, TrackerState
from facerec_tpu.parallel.mesh import FRAME_AXIS

UID_STRIDE = 1 << 20  # per-device uid namespace


class ShardedBlockOut(NamedTuple):
    flags: jnp.ndarray       # (B,) bool scene changes
    detections: Detections   # (B, D, ...) padded
    emit: TrackEmit          # (B, T, ...) tracker emissions


def _scene_flags_with_halo(frames, frame0, crop: bool):
    """Per-frame scene flags for a local sub-block given a left halo.

    Args:
        frames: (L, H, W, 3) local frames.
        frame0: () int32 — global index of the first local frame.
    Returns (L,) bool flags.
    """
    from facerec_tpu.ops.pallas.equalize import pack_planes

    l, h, w, _ = frames.shape
    lo, hi = scene_ops.crop_bounds(h, w, crop)
    p = (hi - lo) * w
    scale = 255.0 / p
    y = pack_planes(scene_ops.luminance(frames)[:, lo:hi, :])
    # same raw-equalization + histogram helpers as the serial path
    # (ops/scene.py:_detect_block_impl) so halo statistics share the
    # serial path's exact f32 reduction order — sharded == serial
    eq, cum = scene_ops._equalize_raw(y)

    # Right-shift halo: device i sends its last 2 frames' planes +
    # histograms to i+1 over ICI.
    n = jax.lax.axis_size(FRAME_AXIS)
    perm = [(i, i + 1) for i in range(n - 1)]
    halo_y = jax.lax.ppermute(y[-2:], FRAME_AXIS, perm)
    halo_eq = jax.lax.ppermute(eq[-2:], FRAME_AXIS, perm)
    halo_cum = jax.lax.ppermute(cum[-2:], FRAME_AXIS, perm)

    y_ext = jnp.concatenate([halo_y, y], axis=0)      # (L+2, ...)
    eq_ext = jnp.concatenate([halo_eq, eq], axis=0)
    cum_ext = jnp.concatenate([halo_cum, cum], axis=0)

    # Stats for extended indices 1..L+1 (frame i vs i-1); formulas are
    # the serial path's verbatim: sums over packed planes (padding rows
    # contribute 0) divided by the real pixel count, fv from the
    # histogram.
    mafd_ext = jnp.abs(y_ext[1:] - y_ext[:-1]).sum(axis=(1, 2)) / p
    mafd_eq_ext = jnp.abs(eq_ext[1:] * scale
                          - eq_ext[:-1] * scale).sum(axis=(1, 2)) / p
    hist_ext = jnp.diff(cum_ext, axis=-1, prepend=0.0)
    eqval_ext = cum_ext * scale
    fv_ext = jnp.sum(
        hist_ext[1:] * jnp.abs(eqval_ext[1:] - mafd_eq_ext[:, None]),
        axis=-1) / p

    mafd = mafd_ext[1:]
    mafd_eq = mafd_eq_ext[1:]
    sdmafd_eq = mafd_eq_ext[1:] - mafd_eq_ext[:-1]
    adfv_eq = jnp.abs(fv_ext[1:] - fv_ext[:-1])

    # Device 0 has no left neighbour: its first two local frames carry
    # garbage halo statistics and must warm up locally — the same
    # 2-frame warm-up every reference shard pays (scene.py:111-136).
    # For the film's first block that coincides with global_idx >= 2.
    global_idx = frame0 + jnp.arange(l, dtype=jnp.int32)
    local_idx = jnp.arange(l, dtype=jnp.int32)
    dev = jax.lax.axis_index(FRAME_AXIS)
    valid = (global_idx >= 2) & ((dev > 0) | (local_idx >= 2))
    return scene_ops.decide(mafd, mafd_eq, sdmafd_eq, adfv_eq) & valid


def sharded_extract_step(
    mesh: Mesh,
    detector,
    tracker_cfg: TrackerConfig,
    frames: jnp.ndarray,
    block_frame0: int = 0,
    crop: bool = True,
) -> ShardedBlockOut:
    """Run one frame block sharded over the mesh.

    Args:
        mesh: 1-D mesh over :data:`FRAME_AXIS`.
        detector: callable (L, H, W, 3) → :class:`Detections`
            (closed-over params are replicated).
        frames: (B, H, W, 3) uint8, B divisible by mesh size.
        block_frame0: global index of the block's first frame.
    """
    n = mesh.devices.size
    b = frames.shape[0]
    assert b % n == 0, (b, n)
    local = b // n

    def step(frames_local):
        idx = jax.lax.axis_index(FRAME_AXIS)
        frame0 = block_frame0 + idx * local
        flags = _scene_flags_with_halo(frames_local, frame0, crop)

        det = detector(frames_local)

        state = init_tracker(tracker_cfg)._replace(
            next_uid=(idx * UID_STRIDE).astype(jnp.int32))
        _, emit = run_block(tracker_cfg, state, det.boxes, det.valid,
                            flags, frame0)
        return flags, det, emit

    shardmapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=P(FRAME_AXIS),
        out_specs=(P(FRAME_AXIS),
                   Detections(P(FRAME_AXIS), P(FRAME_AXIS),
                              P(FRAME_AXIS), P(FRAME_AXIS)),
                   TrackEmit(*([P(FRAME_AXIS)] * 7))),
        check_vma=False,
    )
    flags, det, emit = shardmapped(frames)
    return ShardedBlockOut(flags, det, emit)
