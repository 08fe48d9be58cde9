"""Extract stage: decode → scene → detect → track → embed → contract files.

The reference's hot path is a per-frame Python loop with per-face TF
calls (/root/reference/facerec/extract.py:281-342, SURVEY.md §3.1).
Here the film streams through the device in fixed-size frame blocks:

  host   decode block (B, H, W, 3)                [OpenCV / native C++]
  device scene statistics for the whole block     (ops.scene)
  device detector forward + decode + NMS          (models.detector)
  device tracker scan over the block              (track.tracker)
  device crop + resize + 4× FaceNet embed         (ops.crops, models.facenet)
  host   trajectory/feature/scene-change writers  (contract)

Cross-block carry = scene state + tracker table; face saving is
deferred ``min_trajectory - 1`` frames until the track's validity is
decided, mirroring the reference's frame buffer (extract.py:304-342).
Output files are byte-compatible shard files, so the merge stage (ours
or the reference's) consumes them unchanged.

The host-side per-shard state lives in :class:`ShardConsumer` so the
serial path here and the multi-chip path
(:mod:`facerec_tpu.parallel.extract_mesh`) share it — a mesh run is n
of these consumers fed from n device-resident shard spans.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from facerec_tpu.config import FACENET_DIMS, FACENET_MODELS, FACE_IMAGE_SIZE, ExtractConfig
from facerec_tpu.contract import MovieDirs, records
from facerec_tpu.contract.naming import (box_tag, movie_id_from_filename,
                                         shard_file_name)
from facerec_tpu.ops.boxes import round_clip_box
from facerec_tpu.pipeline import faces as faces_mod
from facerec_tpu.track import TrackerConfig, TrajectoryAssembler, init_tracker, run_block
from facerec_tpu.video.reader import (load_aspect_ratio_csv,
                                      open_block_reader, probe_video)


@dataclasses.dataclass
class PendingEmbed:
    """A dispatched (not yet fetched) crop+embed batch for one flush.

    ``dev_packed`` is the uint8 device buffer from
    :meth:`EmbedderBank.dispatch_packed`; the driver concatenates it
    into the next group fetch and calls
    :meth:`ShardConsumer.complete_flush` with the fetched bytes.  Host
    embedder banks (test stubs) fill ``host_embeddings`` instead and
    complete immediately.
    """

    ready: List["faces_mod.PendingFace"]
    tight_boxes: List[np.ndarray]
    dev_packed: Optional[object] = None
    nbytes: int = 0
    host_embeddings: Optional[Dict[str, np.ndarray]] = None


@dataclasses.dataclass
class FlushPlan:
    """One block-flush's face selection, before any device work.

    Selection (and JPEG writing) happens per block watermark — exactly
    the reference's deferred-validity semantics — but the crop+embed
    dispatch of many plans is batched into ONE device call per fetch
    group (:meth:`ShardConsumer.dispatch_flush_plans`), because on
    high-latency links every host↔device interaction costs a round
    trip regardless of size (docs/DESIGN.md "End-to-end host loop").
    """

    ready: List["faces_mod.PendingFace"]
    tight_boxes: List[np.ndarray]
    crop_boxes: np.ndarray


@dataclasses.dataclass
class ExtractCounters:
    saved_boxes: int = 0
    saved_frames: int = 0
    saved_trajectories: int = 0
    frames_processed: int = 0
    overflow: int = 0


class FusedBlockStep:
    """Scene statistics + detector forward + tracker scan as ONE XLA
    computation per frame block — a single device dispatch where the
    reference pays a Python/TF round trip per frame (extract.py:281-342).

    The host-consumed payload (flags, tracker emissions, detection
    validity + landmarks) comes back as ONE packed uint8 buffer
    (runtime/transfer.py) so the block costs a single device→host
    transfer; :meth:`unpack` restores the pytree.

    Only usable with a pure-function detector (``_forward`` or
    ``forward_indexed`` + ``variables``); host-side detectors fall back
    to the multi-dispatch path in :func:`run_extract`.

    With ``wire_format="yuv420-delta"`` the program's frame input is
    the delta-I420 wire block (:mod:`facerec_tpu.ops.yuv`, half the
    bytes of RGB and wire-compressor friendly); the step reconstructs
    RGB on device as its first fused ops and ALSO returns the
    reconstructed frames, which the caller keeps device-resident for
    the crop+embed dispatch (:meth:`call_wire`).

    ``wire_format="rgb-delta"`` ships RGB as uint8-wraparound temporal
    deltas instead: the device undoes them EXACTLY (modular cumsum,
    ops/yuv.delta_decode), so every output byte matches the plain rgb
    wire while the mostly-zero deltas ride the link compressed — the
    parity-preserving answer to transfer-bound hosts (measured 3x
    e2e on the reference harness tunnel; docs/DESIGN.md).
    """

    def __init__(self, detector, tracker_cfg: TrackerConfig,
                 wire_format: str = "rgb", display_h: int = 0):
        import jax
        import jax.numpy as jnp

        from facerec_tpu.ops import scene as scene_ops
        from facerec_tpu.runtime.transfer import pack_tree

        self.detector = detector
        self.tracker_cfg = tracker_cfg
        self.wire_format = wire_format

        def step(det_vars, frames, scene_state, tracker_state, frame0):
            # named scopes → XLA op metadata → per-subsystem device-ms
            # attribution in profiler traces (scripts/profile_block.py)
            with jax.named_scope("scene"):
                flags, scene_state = scene_ops._detect_block_impl(
                    frames, scene_state)
            with jax.named_scope("detector"):
                if hasattr(detector, "forward_indexed"):
                    det = detector.forward_indexed(det_vars, frames,
                                                   frame0)
                else:
                    det = detector._forward(det_vars, frames)
            with jax.named_scope("tracker"):
                tracker_state, emit = run_block(
                    tracker_cfg, tracker_state, det.boxes, det.valid,
                    flags, frame0)
            return (flags, emit, det.valid, det.landmarks), \
                scene_state, tracker_state

        def packed_step(*args):
            payload, scene_state, tracker_state = step(*args)
            return pack_tree(payload), scene_state, tracker_state

        self._step = step
        self._jitted = jax.jit(packed_step)
        self._jnp = jnp
        self._jax = jax
        self._spec = None

        if wire_format in ("yuv420-delta", "rgb-delta"):
            from facerec_tpu.ops import yuv as yuv_ops

            if wire_format == "yuv420-delta":
                wire_decode = lambda wire: yuv_ops.delta_i420_to_rgb(
                    wire, display_h)
            else:
                wire_decode = yuv_ops.delta_decode   # exact

            def wire_step(det_vars, wire, scene_state, tracker_state,
                          frame0):
                with jax.named_scope("wire_decode"):
                    rgb = wire_decode(wire)
                payload, scene_state, tracker_state = step(
                    det_vars, rgb, scene_state, tracker_state, frame0)
                return pack_tree(payload), rgb, scene_state, \
                    tracker_state

            def wire_payload(det_vars, wire, scene_state,
                             tracker_state, frame0):
                rgb = wire_decode(wire)
                return step(det_vars, rgb, scene_state, tracker_state,
                            frame0)[0]

            self._jitted_wire = jax.jit(wire_step)
            self._wire_payload = wire_payload
        elif wire_format != "rgb":
            raise ValueError(f"unknown wire_format {wire_format!r}")

    def __call__(self, frames, scene_state, tracker_state, frame0: int):
        """→ (packed payload (uint8, device), scene_state,
        tracker_state)."""
        args = (self.detector.variables, frames, scene_state,
                tracker_state, self._jnp.int32(frame0))
        if self._spec is None:
            from facerec_tpu.runtime.transfer import tree_spec

            payload_shape, _, _ = self._jax.eval_shape(self._step, *args)
            self._spec = tree_spec(payload_shape)
        return self._jitted(*args)

    def call_wire(self, wire, scene_state, tracker_state, frame0: int):
        """yuv420-delta dispatch → (packed payload, reconstructed RGB
        frames (device-resident, for the crop+embed path),
        scene_state, tracker_state)."""
        args = (self.detector.variables, wire, scene_state,
                tracker_state, self._jnp.int32(frame0))
        if self._spec is None:
            from facerec_tpu.runtime.transfer import tree_spec

            payload_shape = self._jax.eval_shape(self._wire_payload,
                                                 *args)
            self._spec = tree_spec(payload_shape)
        return self._jitted_wire(*args)

    def unpack(self, packed_host):
        """Fetched uint8 buffer → (flags, emit, det_valid, landmarks)."""
        from facerec_tpu.runtime.transfer import unpack_tree

        return unpack_tree(packed_host, *self._spec)


class EmbedderBank:
    """All FaceNet checkpoints over one crop batch.

    The reference embeds one crop at a time per model
    (extract.py:166-167); here ALL FOUR checkpoints run as one program:
    a single vmapped backbone (the architecture is identical across
    checkpoints) plus per-checkpoint bottlenecks — one device dispatch
    with 4× the effective conv batch.
    """

    # Real banks support deferred fetches (dispatch_packed/split);
    # host-side test stubs override __call__ only.
    supports_deferred = False

    def __init__(self, embedders: Dict[str, "object"]):
        import jax
        import jax.numpy as jnp

        from facerec_tpu.models.facenet import PooledStackedEmbedders
        from facerec_tpu.runtime.transfer import pack_tree

        self.embedders = embedders
        self.pooled = PooledStackedEmbedders(list(embedders.values()))
        self.dims = [int(e.embedding_dim) for e in embedders.values()]
        self.total_dim = sum(self.dims)
        self.supports_deferred = True

        def packed_embed(backbone, bottlenecks, crops):
            outs = self.pooled._embed(backbone, bottlenecks, crops)
            # f32 is exact for every float compute dtype we run (bf16
            # upcasts losslessly), and fixes the host view dtype
            return pack_tree(
                jnp.concatenate(outs, axis=-1).astype(jnp.float32))

        self._packed_embed = jax.jit(packed_embed)

        from facerec_tpu.ops.crops import crop_resize

        def packed_crop_embed(backbone, bottlenecks, stack, meta):
            # meta packs [frame_idx | x1 y1 x2 y2] as one (N, 5) f32
            # upload — two separate small uploads would each pay a
            # link round trip (frame indices are < 2^24, f32-exact)
            frame_idx = meta[:, 0].astype(jnp.int32)
            crops = crop_resize(stack, frame_idx, meta[:, 1:],
                                FACE_IMAGE_SIZE)
            return packed_embed(backbone, bottlenecks, crops)

        self._packed_crop_embed = jax.jit(packed_crop_embed)

    @classmethod
    def create_default(cls, dtype=None) -> "EmbedderBank":
        import jax.numpy as jnp

        from facerec_tpu.models import FaceNetEmbedder

        d = dtype or jnp.float32
        return cls({
            name: FaceNetEmbedder(name, FACENET_DIMS[name], dtype=d,
                                  rng_seed=i)
            for i, name in enumerate(FACENET_MODELS)
        })

    @classmethod
    def from_weights(cls, weights_dir: str, dtype=None) -> "EmbedderBank":
        """All four reference checkpoints imported from ``weights_dir``
        (facenet-pytorch .pt / keras .h5 / orbax; models/load.py)."""
        from facerec_tpu.models.load import load_facenet_embedders

        return cls(load_facenet_embedders(weights_dir, dtype=dtype))

    def dispatch_packed(self, crops):
        """Enqueue all-checkpoint embedding of a crop batch; returns
        the (N·total_dim·4,) uint8 device buffer WITHOUT fetching.  The
        caller fetches it (alone or concatenated into a group fetch)
        and restores values with :meth:`unpack`."""
        return self._packed_embed(self.pooled.backbone_stack,
                                  self.pooled.bottlenecks, crops)

    def dispatch_crop_embed(self, stack, frame_idx, crop_boxes):
        """Fused crop + all-checkpoint embed as ONE device dispatch
        with ONE metadata upload (crops never reach the host — JPEGs
        come from the host pixel window).  ``frame_idx``/``crop_boxes``
        are host numpy arrays.  Subclasses without the fused program
        fall back to crop dispatch + :meth:`dispatch_packed`."""
        import jax.numpy as jnp

        fused = getattr(self, "_packed_crop_embed", None)
        if fused is not None:
            meta = np.concatenate(
                [np.asarray(frame_idx, np.float32)[:, None],
                 np.asarray(crop_boxes, np.float32)], axis=1)
            return fused(self.pooled.backbone_stack,
                         self.pooled.bottlenecks, stack,
                         jnp.asarray(meta))
        from facerec_tpu.ops.crops import crop_resize_dispatch

        crops = crop_resize_dispatch(stack, jnp.asarray(
            np.asarray(frame_idx, np.int32)),
            jnp.asarray(np.asarray(crop_boxes, np.float32)),
            FACE_IMAGE_SIZE)
        return self.dispatch_packed(crops)

    def unpack(self, buf: np.ndarray, n: int) -> Dict[str, np.ndarray]:
        """Fetched uint8 buffer → {checkpoint: (n, dim) float32}."""
        flat = np.asarray(buf).view(np.float32).reshape(-1, self.total_dim)
        split = np.split(flat[:n], np.cumsum(self.dims)[:-1], axis=-1)
        return dict(zip(self.pooled.names, split))

    def __call__(self, crops) -> Dict[str, np.ndarray]:
        # concatenate on device → ONE device→host transfer for all
        # four checkpoints (per-buffer fetch overhead dominates small
        # transfers; see runtime/transfer.py)
        return self.unpack(np.asarray(self.dispatch_packed(crops)),
                           int(crops.shape[0]))


class ShardConsumer:
    """Host-side state and writers of ONE extract shard.

    Consumes per-block device outputs (scene flags, tracker emissions,
    detections) and produces the shard's contract files: trajectory
    assembly, the deferred face buffer with its validity watermark, the
    two-block pixel window for crops, batched crop+embed dispatch, and
    feature/image/scene-change writing.  Both the serial extract and
    the mesh extract (one consumer per device span) drive this class,
    so sharded output is byte-identical to a serial ``--n-shards n``
    run by construction.
    """

    def __init__(self, dirs: MovieDirs, movie_id: int, cfg: ExtractConfig,
                 beg: int, end: int, d_w: int, d_h: int,
                 embedders: EmbedderBank, jpeg_writer=None,
                 resume_state: Optional[dict] = None):
        self.dirs = dirs
        self.movie_id = movie_id
        self.cfg = cfg
        self.beg, self.end = beg, end
        self.d_w, self.d_h = d_w, d_h
        self.embedders = embedders
        self.jpeg_writer = jpeg_writer

        self.features_path = os.path.join(
            dirs.features, shard_file_name("features", movie_id, beg, end))
        self.traj_path = os.path.join(
            dirs.trajectories,
            shard_file_name("trajectories", movie_id, beg, end))
        self.sc_path = os.path.join(
            dirs.scene_changes,
            shard_file_name("scene_changes", movie_id, beg, end))

        if resume_state is None:
            self.features_file = open(self.features_path, "w")
            self.traj_file = open(self.traj_path, "w")
            self.assembler = TrajectoryAssembler(
                d_w, d_h, min_hits=cfg.min_trajectory,
                expiry_age=2 * cfg.min_trajectory)
            self.pending: List[faces_mod.PendingFace] = []
            self.pixel_window: Dict[int, np.ndarray] = {}
            self.counters = ExtractCounters()
            self.scene_changes: List[int] = []
        else:
            self.features_file = open(self.features_path, "r+")
            self.features_file.truncate(resume_state["feat_offset"])
            self.features_file.seek(resume_state["feat_offset"])
            self.traj_file = open(self.traj_path, "r+")
            self.traj_file.truncate(resume_state["traj_offset"])
            self.traj_file.seek(resume_state["traj_offset"])
            self.assembler = resume_state["assembler"]
            self.pending = resume_state["pending"]
            self.pixel_window = resume_state["pixel_window"]
            self.counters = resume_state["counters"]
            self.scene_changes = resume_state["scene_changes"]
        # Device-resident mirror of the pixel window: the block step
        # already uploaded the frames, so crops read them from HBM
        # instead of re-uploading the whole window per flush (not
        # checkpointed — a resumed run falls back to host upload for
        # its first flush).
        self.dev_window: Dict[int, object] = {}
        # flush plans selected but not yet dispatched (group batching)
        self._plans: List[FlushPlan] = []

    def feed_block(self, frame0: int, frames: np.ndarray,
                   flags: np.ndarray, emit_host, det_valid: np.ndarray,
                   landmarks: np.ndarray, dev_frames=None,
                   flush: bool = True) -> None:
        """Consume one block's device outputs (already truncated to the
        block's real frame count).  ``dev_frames`` optionally passes the
        block's device-resident pixels (same real-row contents) so the
        crop dispatch avoids a host→device re-upload.  With
        ``flush=False`` the caller runs :meth:`begin_flush` itself (to
        defer the embedding fetch into a batched group transfer)."""
        cfg = self.cfg
        det_slot, slot_uid, slot_box = (emit_host.det_slot,
                                        emit_host.uid, emit_host.box)
        self.scene_changes.extend(
            (frame0 + np.nonzero(flags)[0]).tolist())

        for rec in self.assembler.feed(emit_host, frame0):
            records.write_trajectory(self.traj_file, rec)
            self.counters.saved_trajectories += 1
        # bulk-extract the (frame, detection) pairs that joined a track
        # this block — the dense python scan over B×D slots costs more
        # than the faces it finds (row-major nonzero keeps frame order,
        # then detection order, matching the scalar loop)
        rows, dets = np.nonzero(np.asarray(det_valid[:len(frames)])
                                & (np.asarray(det_slot) >= 0))
        slots = np.asarray(det_slot)[rows, dets]
        for i, d, s in zip(rows.tolist(), dets.tolist(), slots.tolist()):
            self.pending.append(faces_mod.PendingFace(
                frame=frame0 + i, uid=int(slot_uid[i, s]),
                posterior_box=slot_box[i, s].copy(),
                landmarks=landmarks[i, d]))

        # pixel window for deferred crops (trimmed after each flush)
        self.pixel_window[frame0] = frames
        if dev_frames is not None:
            self.dev_window[frame0] = dev_frames
        if flush:
            self.flush_faces(self.block_watermark(frame0, len(frames)))
        self.counters.frames_processed += len(frames)

    def block_watermark(self, frame0: int, n_frames: int) -> int:
        """Faces at frames ≤ this are flushed after the block — the
        deferred-validity horizon (min_trajectory - 1 frames, mirroring
        the reference's frame buffer, extract.py:304-342)."""
        return frame0 + n_frames - 1 - (self.cfg.min_trajectory - 1)

    def flush_faces(self, watermark: Optional[int]) -> None:
        """Emit features/images for pending faces with frame ≤ watermark
        (None = all), in frame order — synchronous (begin + fetch +
        complete in one call)."""
        pe = self.begin_flush(watermark)
        if pe is not None:
            self.complete_flush(pe)

    def begin_flush(self, watermark: Optional[int]) -> Optional[PendingEmbed]:
        """Select ready faces, dispatch their batched crop+embed on
        device, and write their JPEG images — WITHOUT fetching the
        embeddings.  Returns a :class:`PendingEmbed` the caller later
        passes to :meth:`complete_flush` (with the fetched bytes, or
        alone for a standalone fetch); None when nothing is ready.

        Equivalent to :meth:`plan_flush` + :meth:`dispatch_flush_plans`
        (which group-fetch drivers call separately to batch many
        blocks' device work into one dispatch)."""
        self.plan_flush(watermark)
        return self.dispatch_flush_plans()

    def plan_flush(self, watermark: Optional[int]) -> Optional[FlushPlan]:
        """Select the faces ready at ``watermark`` and write their JPEG
        images — no device work.  The plan queues until
        :meth:`dispatch_flush_plans`; selection and file order are
        identical at any batching, so output bytes don't depend on the
        fetch group size."""
        cfg = self.cfg
        due = [p for p in self.pending
               if watermark is None or p.frame <= watermark]
        later = [p for p in self.pending
                 if not (watermark is None or p.frame <= watermark)]
        # keep not-yet-decided tracks pending (defensive: validity is
        # decidable within min_hits frames of any detection, so due
        # faces are normally always decided); re-queue them AHEAD of
        # later blocks' faces so pending stays frame-sorted and
        # features.jsonl records stay monotone in frame like the
        # reference's, which writes per processed frame in order
        # (/root/reference/facerec/extract.py:186-195)
        undecided = [p for p in due
                     if self.assembler.track_valid(p.uid) is None]
        self.pending = (undecided if watermark is not None else []) + later
        ready = [p for p in due
                 if p.frame % cfg.save_every == 0
                 and self.assembler.track_valid(p.uid)]
        if not ready:
            self._trim_window()
            return None

        d_w, d_h = self.d_w, self.d_h
        tight_boxes = [round_clip_box(p.posterior_box, d_w, d_h)
                       for p in ready]
        crop_boxes = np.stack([
            faces_mod.embed_crop_box(tb, d_w, d_h) for tb in tight_boxes])

        if cfg.save_images:
            rgb_memo: Dict[int, np.ndarray] = {}
            for i, p in enumerate(ready):
                frame_px = self.pixel_window[self._block_of(p.frame)][
                    p.frame - self._block_of(p.frame)]
                if frame_px.ndim == 2:
                    # delta-I420 wire mode: the window holds absolute
                    # I420 planes; convert only frames that actually
                    # save a face (exact cv2 conversion — JPEG images
                    # don't inherit the device path's requantization)
                    if p.frame not in rgb_memo:
                        from facerec_tpu.ops.yuv import i420_frame_to_rgb

                        rgb_memo[p.frame] = i420_frame_to_rgb(frame_px)
                    frame_px = rgb_memo[p.frame]
                faces_mod.save_face_image(
                    frame_px,
                    p.posterior_box, d_w, d_h, self.dirs.images,
                    box_tag(self.movie_id, p.frame, tight_boxes[i]),
                    jpeg_writer=self.jpeg_writer)

        plan = FlushPlan(ready, tight_boxes, crop_boxes)
        self._plans.append(plan)
        self._trim_window()
        return plan

    def dispatch_flush_plans(self) -> Optional[PendingEmbed]:
        """Dispatch ONE batched crop+embed covering every queued flush
        plan.  The returned :class:`PendingEmbed` concatenates the
        plans in selection order, so :meth:`complete_flush` writes the
        same feature records in the same order as per-plan dispatches
        would — one device interaction per fetch group instead of
        several per block (the round-trip count, not bytes, bounds
        throughput on high-latency hosts)."""
        import jax.numpy as jnp

        plans, self._plans = self._plans, []
        if not plans:
            return None
        ready = [p for plan in plans for p in plan.ready]
        tight_boxes = [tb for plan in plans for tb in plan.tight_boxes]
        crop_boxes = np.concatenate([plan.crop_boxes for plan in plans])

        # device stack of exactly the blocks the crops reference; the
        # blocks are already in HBM (dev_window) unless resuming
        needed = sorted({self._block_of(p.frame) for p in ready})
        dev_stack = [self.dev_window[b] if b in self.dev_window
                     else jnp.asarray(self.pixel_window[b])
                     for b in needed]
        lens = [int(d.shape[0]) for d in dev_stack]
        dev_stack = (dev_stack[0] if len(dev_stack) == 1
                     else jnp.concatenate(dev_stack))
        offsets = {b: sum(lens[:i]) for i, b in enumerate(needed)}
        frame_idx = np.array(
            [offsets[self._block_of(p.frame)]
             + (p.frame - self._block_of(p.frame)) for p in ready],
            np.int32)

        # pad the crop batch to a power of two (min 16) so the
        # crop/embed programs compile for a bounded set of shapes
        n_real = len(ready)
        bucket = max(16, 1 << (n_real - 1).bit_length())
        if bucket != n_real:
            crop_boxes = np.concatenate(
                [crop_boxes,
                 np.tile(crop_boxes[-1:], (bucket - n_real, 1))])
            frame_idx = np.concatenate(
                [frame_idx,
                 np.full(bucket - n_real, frame_idx[-1], np.int32)])

        if getattr(self.embedders, "supports_deferred", False):
            buf = self.embedders.dispatch_crop_embed(
                dev_stack, frame_idx, crop_boxes)
            pe = PendingEmbed(ready, tight_boxes, dev_packed=buf,
                              nbytes=int(buf.shape[0]))
        else:
            from facerec_tpu.ops.crops import crop_resize_dispatch

            crops = crop_resize_dispatch(
                dev_stack, jnp.asarray(frame_idx),
                jnp.asarray(crop_boxes), FACE_IMAGE_SIZE)
            all_emb = {name: vecs[:n_real]
                       for name, vecs in self.embedders(crops).items()}
            pe = PendingEmbed(ready, tight_boxes, host_embeddings=all_emb)
        self._trim_window()
        return pe

    def complete_flush(self, pe: PendingEmbed,
                       buf: Optional[np.ndarray] = None) -> None:
        """Write the feature records of a dispatched flush.  ``buf`` is
        the fetched uint8 embedding bytes (a slice of a group fetch);
        None fetches ``pe.dev_packed`` standalone."""
        if pe.host_embeddings is not None:
            all_embeddings = pe.host_embeddings
        else:
            if buf is None:
                buf = np.asarray(pe.dev_packed)
            all_embeddings = self.embedders.unpack(buf, len(pe.ready))

        frames_seen = set()
        for i, p in enumerate(pe.ready):
            emb = {name: vecs[i].tolist()
                   for name, vecs in all_embeddings.items()}
            rec = faces_mod.feature_record_for(
                self.movie_id, p.frame, pe.tight_boxes[i], emb,
                p.landmarks, self.d_w, self.d_h)
            records.write_feature(self.features_file, rec)
            self.counters.saved_boxes += 1
            frames_seen.add(p.frame)
        self.counters.saved_frames += len(frames_seen)

    def _block_of(self, frame: int) -> int:
        for b in sorted(self.pixel_window, reverse=True):
            if frame >= b:
                return b
        raise KeyError(f"frame {frame} left the pixel window")

    def _trim_window(self) -> None:
        """Drop pixel-window blocks that no pending face and no queued
        flush plan can reference any more (always keeping the newest
        block — the next block's flush may crop from it)."""
        if not self.pixel_window:
            return
        last = max(self.pixel_window)
        refs = [p.frame for p in self.pending]
        refs.extend(p.frame for plan in self._plans for p in plan.ready)
        min_keep = min(refs, default=last)
        for b in sorted(self.pixel_window):
            if b >= last:
                break
            if b + len(self.pixel_window[b]) <= min_keep:
                del self.pixel_window[b]
                self.dev_window.pop(b, None)
            else:
                break

    def finish(self) -> ExtractCounters:
        """Final trajectories + faces, scene-change file, close files,
        mark the shard done.  Returns the shard counters."""
        for rec in self.assembler.finish():
            records.write_trajectory(self.traj_file, rec)
            self.counters.saved_trajectories += 1
        self.flush_faces(None)
        self.counters.overflow = self.assembler.overflow

        # Divergence from the reference (extract.py:362 clips to
        # [beg, end)): we keep cuts found in the overlap window too, so
        # the merge union recovers cuts that land in the next shard's
        # 2-frame statistics warm-up — keeps sharded == unsharded scene
        # output.
        records.write_shard_scene_changes(
            self.sc_path, [f for f in self.scene_changes if f >= self.beg])

        self.features_file.close()
        self.traj_file.close()

        from facerec_tpu.runtime import checkpoint as ckpt

        ckpt.mark_shard_done(self.dirs.root, "extract", self.movie_id,
                             self.beg, self.end)
        return self.counters

    def snapshot(self) -> dict:
        """Checkpointable host state (file offsets after a flush)."""
        self.features_file.flush()
        self.traj_file.flush()
        return dict(assembler=self.assembler, pending=self.pending,
                    counters=self.counters,
                    scene_changes=self.scene_changes,
                    pixel_window=self.pixel_window,
                    feat_offset=self.features_file.tell(),
                    traj_offset=self.traj_file.tell())


def make_jpeg_writer(cfg: ExtractConfig):
    if not cfg.save_images:
        return None
    try:
        from facerec_tpu.runtime.native import NativeJpegWriter

        return NativeJpegWriter(n_threads=2, quality=65)
    except (RuntimeError, OSError):
        return None


def build_detector(cfg: ExtractConfig, d_h: int, d_w: int,
                   detector_weights: Optional[str]):
    from facerec_tpu.models.detector import fit_input_size

    # None = native display resolution (parity-first; the reference
    # detects at display scale, detector.py:20) — pass an explicit
    # long side to trade recall on small faces for detector compute
    long_side = cfg.detector_long_side or max(d_h, d_w)
    harness_kwargs = dict(
        input_size=(cfg.detector_size
                    or fit_input_size(d_h, d_w, long_side=long_side)),
        max_detections=cfg.max_detections,
        score_threshold=cfg.face_threshold,
        min_face_size=cfg.min_face_size)
    if detector_weights is not None:
        # checkpoints carry their own width (inferred from the stem)
        from facerec_tpu.models.load import load_detector_harness

        return load_detector_harness(detector_weights, **harness_kwargs)
    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.models.load import warn_random_init

    warn_random_init("The face detector", "--detector-weights")
    return DetectorHarness.create(backbone_width=cfg.backbone_width,
                                  **harness_kwargs)


def build_embedders(facenet_weights: Optional[str]) -> EmbedderBank:
    if facenet_weights is not None:
        return EmbedderBank.from_weights(facenet_weights)
    from facerec_tpu.models.load import warn_random_init

    warn_random_init("The FaceNet embedder bank", "--facenet-weights")
    return EmbedderBank.create_default()


def run_extract(
    file: str,
    cfg: ExtractConfig,
    out_path: str,
    detector: Optional[Callable] = None,
    embedders: Optional[EmbedderBank] = None,
    aspect_csv: str = "aspect_ratios.csv",
    detector_weights: Optional[str] = None,
    facenet_weights: Optional[str] = None,
) -> ExtractCounters:
    """Process one shard of a film (the whole film when n_shards=1)."""
    import jax
    import jax.numpy as jnp

    from facerec_tpu.ops import scene as scene_ops

    assert 0 <= cfg.shard_i < cfg.n_shards, "Bad shard index."

    display = load_aspect_ratio_csv(aspect_csv, os.path.basename(file))
    if cfg.display_width is not None and cfg.display_height is not None:
        display = (cfg.display_width, cfg.display_height)
    info = probe_video(file, display)
    d_w, d_h = info.display_width, info.display_height

    movie_id = movie_id_from_filename(file)
    dirs = MovieDirs.create(out_path, movie_id)

    shard_len = (info.n_frames + cfg.n_shards - 1) // cfg.n_shards
    beg = shard_len * cfg.shard_i
    end = min(beg + shard_len, info.n_frames)
    end_overlap = min(end + cfg.max_trajectory_age, info.n_frames)

    print(f"Movie file: {os.path.basename(file)}")
    print(f"Total length: {(info.n_frames / info.fps / 3600):.1f}h "
          f"({info.fps} fps)")
    print(f"Storage resolution for film: "
          f"{info.storage_width}x{info.storage_height}")
    print(f"Used display resolution for film: {d_w}x{d_h}")
    print(f"Shard {cfg.shard_i + 1} / {cfg.n_shards}, len: {shard_len} "
          f"frames")
    print(f"Processing frames: {beg} - {end} (max: {info.n_frames}) "
          f"saving every 1/{cfg.save_every} frames")

    if detector is None:
        detector = build_detector(cfg, d_h, d_w, detector_weights)
    if embedders is None:
        embedders = build_embedders(facenet_weights)

    tracker_cfg = TrackerConfig(
        max_tracks=cfg.max_tracks, max_detections=cfg.max_detections,
        max_age=cfg.max_trajectory_age, min_hits=cfg.min_trajectory,
        iou_threshold=cfg.iou_threshold)
    tracker_state = init_tracker(tracker_cfg)
    scene_state = scene_ops.initial_state(d_h, d_w, crop=True)

    from facerec_tpu.runtime import checkpoint as ckpt
    from facerec_tpu.runtime.metrics import StageReport

    report = StageReport(f"extract_{beg}-{end}")
    ckpt_path = os.path.join(
        dirs.root, f".extract_{movie_id}_{beg}-{end}.ckpt")

    if cfg.resume and ckpt.is_shard_done(dirs.root, "extract", movie_id,
                                         beg, end):
        print(f"Shard {beg}-{end} already complete; skipping.")
        return ExtractCounters()

    resume_state = ckpt.load_checkpoint(ckpt_path) if (
        cfg.resume and cfg.checkpoint_every_blocks > 0) else None

    start_frame = beg
    if resume_state is not None:
        start_frame = resume_state["next_frame"]
        scene_state = resume_state["scene_state"]
        tracker_state = resume_state["tracker_state"]
        print(f"Resuming shard {beg}-{end} at frame {start_frame}")

    group = max(1, cfg.fetch_every_blocks)
    if cfg.checkpoint_every_blocks > 0:
        # checkpoints need a drained pipeline; bound their lag
        group = min(group, cfg.checkpoint_every_blocks)
    # never larger than the shard itself
    n_blocks = -(-(end_overlap - start_frame) // cfg.block_frames)
    group = max(1, min(group, n_blocks))
    # HBM guard: the pipeline keeps ~2 group-sized frame buffers alive
    # (in-flight + dispatching) plus the crop window; cap the group so
    # frame buffers stay within ~6 GB of device memory at any film
    # resolution (a 4K block alone is ~3.2 GB)
    block_bytes = cfg.block_frames * d_h * d_w * 3
    group = max(1, min(group, (3 << 30) // max(1, block_bytes)))

    wire_fmt = cfg.wire_format
    fused_ok = hasattr(detector, "variables") and (
        hasattr(detector, "_forward")
        or hasattr(detector, "forward_indexed"))
    if wire_fmt in ("yuv420-delta", "rgb-delta") and not fused_ok:
        print(f"wire_format={wire_fmt} needs a fused-compatible "
              f"detector; falling back to rgb", file=sys.stderr)
        wire_fmt = "rgb"
    if wire_fmt == "yuv420-delta" and (d_h % 2 or d_w % 2):
        print(f"wire_format=yuv420-delta needs even display dims, "
              f"got {d_w}x{d_h}; falling back to rgb", file=sys.stderr)
        wire_fmt = "rgb"
    if wire_fmt != "rgb":
        from facerec_tpu.ops import yuv as yuv_ops

    from facerec_tpu.video.reader import fetch_ring_blocks

    # in the delta-I420 wire mode the reader emits planar 4:2:0
    # blocks: the color conversion runs in its (GIL-free) worker
    # threads, and the host pixel window holds absolute I420 frames
    # (half the memory; JPEG saves convert per saved frame)
    reader = open_block_reader(
        file, info, cfg.block_frames, decode_workers=cfg.decode_workers,
        ring_blocks=fetch_ring_blocks(group, cfg.block_frames, d_h, d_w),
        pixel_format="i420" if wire_fmt == "yuv420-delta" else "rgb")
    jpeg_writer = make_jpeg_writer(cfg)
    consumer = ShardConsumer(dirs, movie_id, cfg, beg, end, d_w, d_h,
                             embedders, jpeg_writer,
                             resume_state=resume_state)

    fused = None
    if fused_ok:
        fused = FusedBlockStep(detector, tracker_cfg,
                               wire_format=wire_fmt, display_h=d_h)

    # per-phase wall time: where an underperforming e2e run spends it
    phase = {"decode": 0.0, "dispatch": 0.0, "upload": 0.0,
             "encode": 0.0, "fetch": 0.0, "consume": 0.0,
             "flush_dispatch": 0.0}
    phase_log = os.environ.get("FACEREC_PHASE_LOG", "") not in ("", "0")
    block_iter = reader.blocks(start_frame, end_overlap,
                               cfg.block_frames)

    from facerec_tpu.runtime.transfer import (pack_tree, tree_spec,
                                              unpack_tree)

    pack_jit = None
    host_spec = None

    def dispatch_block(nxt):
        """Upload + enqueue one block's device work; nothing waits."""
        nonlocal scene_state, tracker_state, pack_jit, host_spec
        frame0, frames = nxt
        # Pad a short tail block to the compiled block shape (repeat
        # the last frame) so no second program is ever compiled;
        # consumers read only the first `real` rows, and the carried
        # state is never used again after the tail block.
        real = len(frames)
        if real < cfg.block_frames:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], cfg.block_frames - real,
                                   axis=0)])
        if wire_fmt in ("yuv420-delta", "rgb-delta"):
            # yuv: frames arrive as absolute I420 planes (the reader's
            # worker threads did the color conversion).  rgb-delta:
            # frames are plain RGB.  Either way the wire encode left
            # on the loop is one temporal-delta memory pass, which
            # buys back multiples of its cost in wire time on
            # transfer-bound links (deltas compress)
            t_enc = time.perf_counter()
            wire = yuv_ops.encode_delta(frames)
            phase["encode"] += time.perf_counter() - t_enc
            t_up = time.perf_counter()
            dev_wire = jnp.asarray(wire)
            phase["upload"] += time.perf_counter() - t_up
            t_call = time.perf_counter()
            packed, dev_frames, scene_state, tracker_state = \
                fused.call_wire(dev_wire, scene_state, tracker_state,
                                frame0)
            phase["dispatch"] += time.perf_counter() - t_call
            if phase_log:
                print(f"[phase] block f0={frame0} "
                      f"encode={t_up - t_enc:.3f}s "
                      f"upload={t_call - t_up:.3f}s "
                      f"enqueue={time.perf_counter() - t_call:.3f}s",
                      file=sys.stderr, flush=True)
            return {"frame0": frame0, "frames": frames, "real": real,
                    "packed": packed, "dev": dev_frames,
                    "unpack": fused.unpack,
                    "scene_state": scene_state,
                    "tracker_state": tracker_state}
        t_up = time.perf_counter()
        dev_frames = jnp.asarray(frames)
        phase["upload"] += time.perf_counter() - t_up
        if phase_log:
            print(f"[phase] block upload "
                  f"{time.perf_counter() - t_up:.3f}s f0={frame0}",
                  file=sys.stderr, flush=True)
        t_call = time.perf_counter()
        if fused is not None:
            packed, scene_state, tracker_state = fused(
                dev_frames, scene_state, tracker_state, frame0)
            unpack = fused.unpack
        else:
            flags, scene_state = scene_ops.detect_block(dev_frames,
                                                        scene_state)
            if hasattr(detector, "set_block_start"):
                detector.set_block_start(frame0)
            det = detector(dev_frames)
            tracker_state, emit = run_block(
                tracker_cfg, tracker_state, det.boxes, det.valid, flags,
                jnp.int32(frame0))
            payload = (flags, emit, det.valid, det.landmarks)
            if pack_jit is None:
                pack_jit = jax.jit(pack_tree)
                host_spec = tree_spec(payload)
            packed = pack_jit(payload)
            unpack = lambda buf: unpack_tree(buf, *host_spec)
        phase["dispatch"] += time.perf_counter() - t_call
        return {"frame0": frame0, "frames": frames, "real": real,
                "packed": packed, "dev": dev_frames, "unpack": unpack,
                # post-block device state, for checkpoints: dispatch
                # runs a group ahead of consumption, so the carried
                # nonlocals are ahead of the files written so far
                "scene_state": scene_state,
                "tracker_state": tracker_state}

    def consume_block(blk, buf):
        """Feed one block's fetched payload bytes to the shard consumer
        and dispatch its (deferred) face flush."""
        nonlocal blocks_done, consumed_through, consumed_state
        flags_np, emit_host, det_valid, landmarks = blk["unpack"](buf)
        real, frames, dev = blk["real"], blk["frames"], blk["dev"]
        if real < cfg.block_frames:
            frames = frames[:real]
            flags_np = flags_np[:real]
            det_valid, landmarks = det_valid[:real], landmarks[:real]
            emit_host = type(emit_host)(*(f[:real] for f in emit_host))
            dev = dev[:real]
        consumer.feed_block(blk["frame0"], frames, flags_np, emit_host,
                            det_valid, landmarks, dev_frames=dev,
                            flush=False)
        consumer.plan_flush(
            consumer.block_watermark(blk["frame0"], real))
        blocks_done += 1
        consumed_through = blk["frame0"] + real
        consumed_state = (blk["scene_state"], blk["tracker_state"])

    # Batched-fetch software pipeline: blocks are decoded + dispatched
    # continuously; every `group` blocks the accumulated per-block
    # payloads AND the previous blocks' deferred embedding buffers
    # concatenate on device into ONE device→host transfer
    # (cfg.fetch_every_blocks).  The transfer of group g is started
    # asynchronously and collected only when group g+1 is full, so it
    # overlaps the next group's decode, upload, and device compute.
    # Flush semantics stay per-block — files are byte-identical to the
    # unbatched loop at any group size.
    staged: List[dict] = []      # dispatched blocks awaiting fetch
    deferred: List = []          # PendingEmbeds awaiting fetch
    inflight = None              # {"joined", "deferred", "blocks"}
    blocks_done = 0
    consumed_through = start_frame
    consumed_state = (scene_state, tracker_state)

    def start_fetch():
        """Concatenate the staged payloads + deferred embed buffers on
        device and start their (single) async device→host copy."""
        nonlocal inflight, staged, deferred
        bufs = [pe.dev_packed for pe in deferred]
        bufs.extend(blk["packed"] for blk in staged)
        if not bufs:
            return
        joined = bufs[0] if len(bufs) == 1 else jnp.concatenate(bufs)
        try:
            joined.copy_to_host_async()
        except AttributeError:
            pass
        if phase_log:
            print(f"[phase] start_fetch nbytes={joined.size} "
                  f"n_bufs={len(bufs)} t={time.perf_counter():.3f}",
                  file=sys.stderr, flush=True)
        inflight = {"joined": joined, "deferred": deferred,
                    "blocks": staged}
        staged, deferred = [], []

    def collect_fetch():
        """Wait for the in-flight group transfer, write the previous
        blocks' features, consume the new blocks' payloads."""
        nonlocal inflight
        t0 = time.perf_counter()
        if phase_log:
            inflight["joined"].block_until_ready()
            t_ready = time.perf_counter()
        buf = np.asarray(inflight["joined"])
        phase["fetch"] += time.perf_counter() - t0
        if phase_log:
            print(f"[phase] collect_fetch compute_wait="
                  f"{t_ready - t0:.3f}s transfer="
                  f"{time.perf_counter() - t_ready:.3f}s"
                  f" nbytes={buf.size}", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        off = 0
        for pe in inflight["deferred"]:
            consumer.complete_flush(pe, buf[off:off + pe.nbytes])
            off += pe.nbytes
        for blk in inflight["blocks"]:
            n = int(blk["packed"].shape[0])
            consume_block(blk, buf[off:off + n])
            off += n
        assert off == buf.size, (off, buf.size)
        inflight = None
        # ONE crop+embed dispatch for every consumed block's flush —
        # per-block device calls would each pay the link round trip
        t_fd = time.perf_counter()
        pe = consumer.dispatch_flush_plans()
        phase["flush_dispatch"] += time.perf_counter() - t_fd
        if pe is not None:
            if pe.host_embeddings is not None:
                consumer.complete_flush(pe)
            else:
                deferred.append(pe)
        phase["consume"] += time.perf_counter() - t0

    def maybe_checkpoint():
        nonlocal last_ckpt_blocks, deferred
        if (cfg.checkpoint_every_blocks <= 0
                or blocks_done - last_ckpt_blocks
                < cfg.checkpoint_every_blocks):
            return
        # the checkpointed state must match the files written so far:
        # complete every dispatched flush before snapshotting
        for pe in deferred:
            consumer.complete_flush(pe)
        deferred = []
        ckpt.save_checkpoint(
            ckpt_path, next_frame=consumed_through,
            scene_state=consumed_state[0],
            tracker_state=consumed_state[1],
            **consumer.snapshot())
        last_ckpt_blocks = blocks_done

    last_ckpt_blocks = 0
    # Per-block dispatch, group-batched fetch: each block's upload +
    # enqueue happens the moment it decodes, so the link carries its
    # frames while later blocks decode (on remote-tunnel backends the
    # frame bytes ride the wire lazily at execute time — an early
    # dispatch IS the transfer overlap); only the small packed payloads
    # batch into one device→host fetch per `group` blocks.  A scanned
    # one-dispatch-per-group variant (a lax.scan of the block step) was
    # measured 5× SLOWER end-to-end on the tunnel harness: its
    # group-sized jnp.concatenate re-ships every frame byte a second
    # time and defeats the per-block transfer overlap.
    while True:
        t0 = time.perf_counter()
        nxt = next(block_iter, None)
        phase["decode"] += time.perf_counter() - t0
        if phase_log:
            print(f"[phase] decode_wait {time.perf_counter() - t0:.3f}s",
                  file=sys.stderr, flush=True)
        if nxt is None:
            break
        # dispatch_block accumulates the encode/upload/dispatch
        # sub-phases itself, so the report's phases are disjoint and
        # sum (with decode/fetch/consume) to the loop's wall time
        staged.append(dispatch_block(nxt))
        if len(staged) >= group:
            if inflight is not None:
                collect_fetch()
                maybe_checkpoint()
            start_fetch()
    # drain: collect the in-flight group, then fetch the remainder
    # (tail blocks and/or the last blocks' deferred flushes)
    while inflight is not None or staged or deferred:
        if inflight is not None:
            collect_fetch()
            maybe_checkpoint()
        start_fetch()

    counters = consumer.finish()
    reader.close()
    if jpeg_writer is not None:
        jpeg_writer.close()   # drains the async write queue

    if os.path.exists(ckpt_path):
        os.remove(ckpt_path)
    for name, value in dataclasses.asdict(counters).items():
        report.set(name, value)
    for name, value in phase.items():
        report.set(f"{name}_seconds", round(value, 3))
    report.write(dirs.root)

    print(f"Saved {counters.saved_boxes} boxes from "
          f"{counters.saved_frames} different frames")
    print(f"and {counters.saved_trajectories} trajectories.")
    if counters.overflow:
        print(f"WARNING: {counters.overflow} detections dropped at "
              f"track-capacity limit.")
    return counters


def main(argv=None):
    from facerec_tpu.runtime import ensure_platform

    ensure_platform()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--n-shards", type=int, default=1,
                        help="number of shards (1 = whole film on chip)")
    parser.add_argument("--shard-i", type=int, default=0)
    parser.add_argument("--save-every", type=int, default=5)
    parser.add_argument("--iou-threshold", type=float, default=0.5)
    parser.add_argument("--min-trajectory", type=int, default=3)
    parser.add_argument("--max-trajectory-age", type=int, default=5)
    parser.add_argument("--min-face-size", type=int, default=20)
    parser.add_argument("--face-threshold", type=float, default=0.95)
    parser.add_argument("--out-path", type=str, default="./data")
    parser.add_argument("--no-images", action="store_true")
    parser.add_argument("--block-frames", type=int,
                        default=ExtractConfig.block_frames)
    parser.add_argument("--decode-workers", type=int, default=0,
                        help="parallel native decode workers "
                             "(0 = FACEREC_DECODE_WORKERS or sequential)")
    parser.add_argument("--fetch-every-blocks", type=int,
                        default=ExtractConfig.fetch_every_blocks,
                        help="batch the device→host payload fetch of N "
                             "blocks into one transfer (bytes are "
                             "identical at any setting; raise on "
                             "high-latency links)")
    parser.add_argument("--wire-format", type=str, default="rgb",
                        choices=["rgb", "rgb-delta", "yuv420-delta"],
                        help="host→device pixel format.  rgb-delta "
                             "ships uint8-wraparound temporal deltas, "
                             "undone EXACTLY on device — byte-"
                             "identical outputs to rgb with a wire-"
                             "compressor-friendly stream (use on "
                             "transfer-bound hosts).  yuv420-delta "
                             "additionally ships 4:2:0 planes (2x "
                             "fewer raw bytes) at a few LSB of chroma "
                             "requantization in device-side "
                             "crops/features")
    parser.add_argument("--mesh", type=int, default=0,
                        help="process N temporal shard spans "
                             "simultaneously on an N-device mesh "
                             "(0/1 = single device); outputs are "
                             "byte-identical --n-shards N shard files")
    parser.add_argument("--detector-long-side", type=int, default=0,
                        help="AR-fitted detector input long side; "
                             "0 (default) = native display resolution "
                             "(parity with the reference); 512 trades "
                             "~7%% recall on 28-44px faces for 2.25x "
                             "less detector compute (see README "
                             "defaults table)")
    parser.add_argument("--backbone-width", type=int, default=96,
                        help="detector backbone width for random-init "
                             "runs (checkpoints carry their own); 72 "
                             "is the measured speed knob, 128 costs "
                             "the same device time as 96 (MXU lane "
                             "padding) at 1.78x capacity")
    parser.add_argument("--facenet-weights", type=str, default=None,
                        help="directory with the four FaceNet "
                             "checkpoints (<name>.pt / <name>.h5 / "
                             "<name>/ orbax); random init + warning "
                             "if omitted")
    parser.add_argument("--detector-weights", type=str, default=None,
                        help="orbax checkpoint dir of detector weights; "
                             "random init + warning if omitted")
    parser.add_argument("file")
    args = parser.parse_args(argv)

    start = time.time()
    cfg = ExtractConfig(
        n_shards=args.n_shards, shard_i=args.shard_i,
        save_every=args.save_every, iou_threshold=args.iou_threshold,
        min_trajectory=args.min_trajectory,
        max_trajectory_age=args.max_trajectory_age,
        min_face_size=args.min_face_size,
        face_threshold=args.face_threshold,
        save_images=not args.no_images,
        block_frames=args.block_frames,
        decode_workers=args.decode_workers,
        fetch_every_blocks=args.fetch_every_blocks,
        wire_format=args.wire_format,
        detector_long_side=args.detector_long_side or None,
        backbone_width=args.backbone_width)
    if args.mesh > 1:
        from facerec_tpu.parallel.extract_mesh import run_extract_mesh

        run_extract_mesh(args.file, cfg, args.out_path.rstrip("/"),
                         mesh_size=args.mesh,
                         detector_weights=args.detector_weights,
                         facenet_weights=args.facenet_weights)
    else:
        run_extract(args.file, cfg, args.out_path.rstrip("/"),
                    detector_weights=args.detector_weights,
                    facenet_weights=args.facenet_weights)
    minutes, seconds = divmod(time.time() - start, 60)
    print(f"Completed in {int(minutes)} minutes, {int(seconds)} seconds.")


if __name__ == "__main__":
    main()
