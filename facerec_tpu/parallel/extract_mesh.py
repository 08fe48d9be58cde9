"""Multi-chip production extract: n temporal shard spans at once.

The reference scales extraction by running 100-256 SLURM array tasks,
each owning a contiguous frame range plus a ``max_trajectory_age``
overlap, rendezvousing through shard files
(/root/reference/scripts/extract.sh:41-47, SURVEY.md §2.4).  Here the
same decomposition maps onto a TPU mesh: device i owns span i of the
film and carries its own scene + tracker state across blocks, and ONE
``shard_map``-ped XLA program advances all spans per dispatch.  No
collectives are needed — the 5-frame tracker halo and the 2-frame
scene warm-up become the same per-span overlap decode the reference
shards pay, and the merge stage stitches span boundaries exactly as it
stitches file shards.

Because every span runs the identical block program over the identical
frames and the host-side :class:`~facerec_tpu.pipeline.extract.ShardConsumer`
is shared with the serial path, a mesh run writes shard files
byte-identical to a serial ``--n-shards n`` loop
(tests/test_parallel_mesh.py), and the merged output is byte-identical
to an unsharded run.

Host feed: one block reader per span (n concurrent decode streams);
crop+embed stays host-orchestrated per consumer so feature bytes match
the serial run's batch composition exactly.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, List, Optional

import numpy as np

from facerec_tpu.config import ExtractConfig
from facerec_tpu.contract import MovieDirs
from facerec_tpu.contract.naming import movie_id_from_filename
from facerec_tpu.parallel.mesh import FRAME_AXIS, frame_mesh
from facerec_tpu.pipeline.extract import (ExtractCounters, EmbedderBank,
                                          ShardConsumer, build_detector,
                                          build_embedders, make_jpeg_writer)
from facerec_tpu.track import TrackerConfig, init_tracker, run_block
from facerec_tpu.video.reader import (load_aspect_ratio_csv,
                                      open_block_reader, probe_video)


def _detector_forward(detector) -> Callable:
    """(variables, frames, frame0) → Detections, pure.

    DetectorHarness ignores frame0; scripted test detectors index
    their truth arrays with it (video/synth.PureScriptedDetector).
    """
    if hasattr(detector, "forward_indexed"):
        return detector.forward_indexed
    return lambda variables, frames, frame0: detector._forward(
        variables, frames)


class MeshBlockStep:
    """One jitted dispatch advancing every span by one block.

    Per device (leading mesh axis): scene statistics with carried
    2-frame state, detector forward, tracker scan with carried track
    table — the exact serial FusedBlockStep body under ``shard_map``.
    The host-consumed payload (flags, emissions, detection validity,
    landmarks — all spans) comes back as ONE packed uint8 buffer so
    the step costs a single device→host transfer regardless of mesh
    size; :meth:`unpack` restores the (n, ...) pytree.
    """

    def __init__(self, mesh, detector, tracker_cfg: TrackerConfig,
                 wire_format: str = "rgb", display_h: int = 0):
        import jax
        from jax.sharding import PartitionSpec as P

        from facerec_tpu.ops import scene as scene_ops
        from facerec_tpu.runtime.transfer import pack_tree

        fwd = _detector_forward(detector)
        wire = wire_format in ("yuv420-delta", "rgb-delta")
        if wire_format not in ("rgb", "yuv420-delta", "rgb-delta"):
            raise ValueError(f"unknown wire_format {wire_format!r}")
        if wire:
            from facerec_tpu.ops import yuv as yuv_ops

            if wire_format == "yuv420-delta":
                wire_decode = lambda w: yuv_ops.delta_i420_to_rgb(
                    w, display_h)
            else:
                wire_decode = yuv_ops.delta_decode   # exact
        self.wire = wire

        def per_device(det_vars, frames, scene_state, tracker_state,
                       frame0):
            frames, frame0 = frames[0], frame0[0]
            scene_state = jax.tree.map(lambda x: x[0], scene_state)
            tracker_state = jax.tree.map(lambda x: x[0], tracker_state)

            if wire:
                # frames is the span's delta wire block (delta-I420 or
                # delta-RGB); the reconstruction runs per device, fused
                # ahead of the scene/detector body (ops/yuv.py)
                frames = wire_decode(frames)
            flags, scene_state = scene_ops._detect_block_impl(
                frames, scene_state)
            det = fwd(det_vars, frames, frame0)
            tracker_state, emit = run_block(
                tracker_cfg, tracker_state, det.boxes, det.valid, flags,
                frame0)

            lead = lambda t: jax.tree.map(lambda x: x[None], t)
            outs = (flags[None], lead(det), lead(emit),
                    lead(scene_state), lead(tracker_state))
            if wire:
                # reconstructed RGB stays device-resident for crops
                outs += (frames[None],)
            return outs

        n_out = 6 if wire else 5
        sharded = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(FRAME_AXIS), P(FRAME_AXIS), P(FRAME_AXIS),
                      P(FRAME_AXIS)),
            out_specs=tuple(P(FRAME_AXIS) for _ in range(n_out)),
            check_vma=False,
        )

        def payload_fn(det_vars, frames, scene_state, tracker_state,
                       frame0):
            flags, det, emit = sharded(
                det_vars, frames, scene_state, tracker_state, frame0)[:3]
            return (flags, emit, det.valid, det.landmarks)

        def step(det_vars, frames, scene_state, tracker_state, frame0):
            out = sharded(det_vars, frames, scene_state, tracker_state,
                          frame0)
            flags, det, emit, scene_state, tracker_state = out[:5]
            payload = (flags, emit, det.valid, det.landmarks)
            if wire:
                return pack_tree(payload), out[5], scene_state, \
                    tracker_state
            return pack_tree(payload), scene_state, tracker_state

        self._payload_fn = payload_fn
        self._sharded = sharded
        self._jitted = jax.jit(step)
        self._jax = jax
        self._spec = None

    def __call__(self, det_vars, frames, scene_state, tracker_state,
                 frame0):
        """rgb wire → (packed, scene_state, tracker_state);
        yuv420-delta wire → (packed, reconstructed RGB (n, B, H, W, 3),
        scene_state, tracker_state)."""
        if self._spec is None:
            from facerec_tpu.runtime.transfer import tree_spec

            payload_shape = self._jax.eval_shape(
                self._payload_fn, det_vars, frames, scene_state,
                tracker_state, frame0)
            self._spec = tree_spec(payload_shape)
        return self._jitted(det_vars, frames, scene_state,
                            tracker_state, frame0)

    def unpack(self, packed_host):
        """Fetched uint8 buffer → (flags, emit, det_valid, landmarks),
        each with the (n, ...) span-leading axis."""
        from facerec_tpu.runtime.transfer import unpack_tree

        return unpack_tree(packed_host, *self._spec)

def build_mesh_step(mesh, detector, tracker_cfg: TrackerConfig,
                    wire_format: str = "rgb", display_h: int = 0
                    ) -> MeshBlockStep:
    return MeshBlockStep(mesh, detector, tracker_cfg,
                         wire_format=wire_format, display_h=display_h)


def run_extract_mesh(
    file: str,
    cfg: ExtractConfig,
    out_path: str,
    mesh_size: Optional[int] = None,
    mesh=None,
    detector=None,
    embedders: Optional[EmbedderBank] = None,
    aspect_csv: str = "aspect_ratios.csv",
    detector_weights: Optional[str] = None,
    facenet_weights: Optional[str] = None,
) -> List[ExtractCounters]:
    """Extract the whole film as n simultaneous spans on an n-device
    mesh.  Writes the same per-span shard files a serial
    ``--n-shards n`` loop writes; run the merge stage afterwards."""
    import jax
    import jax.numpy as jnp

    from facerec_tpu.ops import scene as scene_ops

    if mesh is None:
        devices = jax.devices()
        n = mesh_size or len(devices)
        if len(devices) < n:
            raise RuntimeError(
                f"--mesh {n} needs {n} devices; found {len(devices)}")
        mesh = frame_mesh(devices[:n])
    n = mesh.devices.size

    display = load_aspect_ratio_csv(aspect_csv, os.path.basename(file))
    if cfg.display_width is not None and cfg.display_height is not None:
        display = (cfg.display_width, cfg.display_height)
    info = probe_video(file, display)
    d_w, d_h = info.display_width, info.display_height

    movie_id = movie_id_from_filename(file)
    dirs = MovieDirs.create(out_path, movie_id)

    from facerec_tpu.runtime.metrics import StageReport

    report = StageReport(f"extract_mesh_{n}")

    span_len = (info.n_frames + n - 1) // n
    spans = []
    for i in range(n):
        # clamp: with n_frames < span_len·(n-1) (short film / many
        # devices) later spans are empty — beg must not exceed
        # n_frames or inverted shard files would be written
        beg = min(span_len * i, info.n_frames)
        end = min(beg + span_len, info.n_frames)
        stop = min(end + cfg.max_trajectory_age, info.n_frames)
        spans.append((beg, end, stop))

    print(f"Movie file: {os.path.basename(file)}")
    print(f"Mesh extract: {n} spans × {span_len} frames "
          f"(block {cfg.block_frames})")

    if detector is None:
        detector = build_detector(cfg, d_h, d_w, detector_weights)
    if embedders is None:
        embedders = build_embedders(facenet_weights)

    tracker_cfg = TrackerConfig(
        max_tracks=cfg.max_tracks, max_detections=cfg.max_detections,
        max_age=cfg.max_trajectory_age, min_hits=cfg.min_trajectory,
        iou_threshold=cfg.iou_threshold)

    from facerec_tpu.runtime import checkpoint as ckpt

    jpeg_writer = make_jpeg_writer(cfg)
    span_cfg = dataclasses.replace(cfg, n_shards=n)

    # Fault tolerance, same semantics as the serial loop and the
    # reference's re-runnable array shards (scripts/extract.sh:41-53):
    # finished spans are skipped via their .done marker, crashed spans
    # resume from their block-granular checkpoint.
    ckpt_paths = [os.path.join(dirs.root,
                               f".extract_{movie_id}_{beg}-{end}.ckpt")
                  for beg, end, _ in spans]
    active = [beg < end and not (
        cfg.resume and ckpt.is_shard_done(dirs.root, "extract",
                                          movie_id, beg, end))
        for beg, end, _ in spans]
    for i, (beg, end, _) in enumerate(spans):
        if beg < end and not active[i]:
            print(f"Span {beg}-{end} already complete; skipping.")
    resume_states = [
        ckpt.load_checkpoint(ckpt_paths[i])
        if (active[i] and cfg.resume and cfg.checkpoint_every_blocks > 0)
        else None
        for i in range(n)]
    start_frames = [
        rs["next_frame"] if rs is not None else beg
        for rs, (beg, _, _) in zip(resume_states, spans)]
    for i, rs in enumerate(resume_states):
        if rs is not None:
            print(f"Resuming span {spans[i][0]}-{spans[i][1]} at frame "
                  f"{start_frames[i]}")

    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    scene_state = stack([
        rs["scene_state"] if rs is not None
        else scene_ops.initial_state(d_h, d_w, crop=True)
        for rs in resume_states])
    tracker_state = stack([
        rs["tracker_state"] if rs is not None
        else init_tracker(tracker_cfg)
        for rs in resume_states])

    # empty/done spans get no consumer/reader — they only feed padded
    # blocks to keep the mesh program's shapes
    consumers: List[Optional[ShardConsumer]] = [
        ShardConsumer(dirs, movie_id, span_cfg, beg, end, d_w, d_h,
                      embedders, jpeg_writer,
                      resume_state=resume_states[i])
        if active[i] else None
        for i, (beg, end, _) in enumerate(spans)]

    group = max(1, cfg.fetch_every_blocks)
    if cfg.checkpoint_every_blocks > 0:
        group = min(group, cfg.checkpoint_every_blocks)
    # never larger than the longest span's block count (a short film
    # with a large fetch group would otherwise pad and compile a scan
    # program mostly made of repeated steps)
    max_steps = max(1, -(-(span_len + cfg.max_trajectory_age)
                         // cfg.block_frames))
    group = max(1, min(group, max_steps))
    # HBM guard: a mesh group buffer is (k, n, B, H, W, 3) and ~2 stay
    # alive (in-flight + dispatching); cap the group so frame buffers
    # stay within ~6 GB of device memory at any film resolution
    step_bytes = n * cfg.block_frames * d_h * d_w * 3
    group = max(1, min(group, (3 << 30) // max(1, step_bytes)))

    from facerec_tpu.video.reader import fetch_ring_blocks

    wire_fmt = cfg.wire_format
    if wire_fmt == "yuv420-delta" and (d_h % 2 or d_w % 2):
        print(f"wire_format=yuv420-delta needs even display dims, "
              f"got {d_w}x{d_h}; falling back to rgb")
        wire_fmt = "rgb"
    wire = wire_fmt in ("yuv420-delta", "rgb-delta")
    i420 = wire_fmt == "yuv420-delta"

    # n concurrent rings share the host-memory budget
    ring = fetch_ring_blocks(group, cfg.block_frames, d_h, d_w,
                             budget_bytes=(2 << 30) // max(1, n))
    readers = [open_block_reader(file, info, cfg.block_frames,
                                 decode_workers=cfg.decode_workers,
                                 ring_blocks=ring,
                                 pixel_format="i420" if i420 else "rgb")
               if active[i] else None
               for i, _ in enumerate(spans)]
    iters = [r.blocks(start_frames[i], stop, cfg.block_frames)
             if r is not None else iter(())
             for i, (r, (_, _, stop)) in enumerate(zip(readers, spans))]

    step = build_mesh_step(mesh, detector, tracker_cfg,
                           wire_format=wire_fmt, display_h=d_h)
    det_vars = getattr(detector, "variables", {})

    b = cfg.block_frames
    frame_shape = ((b, d_h * 3 // 2, d_w) if i420
                   else (b, d_h, d_w, 3))
    last_frames = [np.zeros(frame_shape, np.uint8) for _ in range(n)]
    exhausted = [not active[i] for i in range(n)]
    counters: List[ExtractCounters] = []

    # per-phase wall time, same keys as the serial loop (SURVEY §5.5):
    # where an underperforming mesh host spends it.  decode covers all
    # n span readers' waits; upload/dispatch/fetch are the mesh-wide
    # lockstep rows.
    phase = {"decode": 0.0, "dispatch": 0.0, "upload": 0.0,
             "encode": 0.0, "fetch": 0.0, "consume": 0.0,
             "flush_dispatch": 0.0}

    def finish_span(i: int) -> None:
        """Close a span once all its blocks are consumed and flushed
        (after the pipeline drain): its .done marker makes a crashed
        run's restart skip it (reference semantics — each array shard
        is individually re-runnable, scripts/extract.sh:41-53)."""
        counters.append(consumers[i].finish())
        consumers[i] = None
        if os.path.exists(ckpt_paths[i]):
            os.remove(ckpt_paths[i])

    # Batched-fetch pipeline, mirroring the serial loop: every `group`
    # steps the staged step payloads AND the previous group's deferred
    # embedding buffers concatenate on device into ONE device→host
    # transfer, started async and collected a group later; each span's
    # group of flush plans dispatches as ONE crop+embed call.  On
    # high-latency links every host↔device interaction pays the RPC
    # round trip, so the interaction count per group — not bytes —
    # bounds throughput (docs/DESIGN.md "Group-batched fetches").
    staged: List[dict] = []      # dispatched steps awaiting fetch
    deferred: List[tuple] = []   # (span_i, PendingEmbed) awaiting fetch
    inflight = None
    steps_done = 0               # dispatched
    steps_consumed = 0
    last_ckpt = 0
    last_consumed: Optional[dict] = None

    def _feed_span_blocks(blocks, frame0s, reals, flags_np, emit_host,
                          det_valid, landmarks, dev) -> None:
        for i in range(n):
            real = reals[i]
            if real == 0 or consumers[i] is None:
                continue
            emit_i = type(emit_host)(*(f[i][:real] for f in emit_host))
            consumers[i].feed_block(
                int(frame0s[i]), blocks[i][:real], flags_np[i][:real],
                emit_i, det_valid[i][:real], landmarks[i][:real],
                dev_frames=dev[i, :real], flush=False)
            consumers[i].plan_flush(consumers[i].block_watermark(
                int(frame0s[i]), real))

    def consume_step(st, buf) -> None:
        nonlocal steps_consumed, last_consumed
        flags_np, emit_host, det_valid, landmarks = step.unpack(buf)
        _feed_span_blocks(st["blocks"], st["frame0s"], st["reals"],
                          flags_np, emit_host, det_valid, landmarks,
                          st["dev"])
        steps_consumed += 1
        last_consumed = st

    def start_fetch() -> None:
        nonlocal inflight, staged, deferred
        bufs = [pe.dev_packed for _i, pe in deferred]
        bufs.extend(st["packed"] for st in staged)
        if not bufs:
            return
        joined = bufs[0] if len(bufs) == 1 else jnp.concatenate(bufs)
        try:
            joined.copy_to_host_async()
        except AttributeError:
            pass
        inflight = {"joined": joined, "deferred": deferred,
                    "steps": staged}
        staged, deferred = [], []

    def collect_fetch() -> None:
        nonlocal inflight
        t0 = time.perf_counter()
        buf = np.asarray(inflight["joined"])
        phase["fetch"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        off = 0
        for i, pe in inflight["deferred"]:
            consumers[i].complete_flush(pe, buf[off:off + pe.nbytes])
            off += pe.nbytes
        for st in inflight["steps"]:
            m = int(st["packed"].shape[0])
            consume_step(st, buf[off:off + m])
            off += m
        assert off == buf.size, (off, buf.size)
        inflight = None
        # one crop+embed dispatch PER SPAN for the whole group
        t_fd = time.perf_counter()
        for i in range(n):
            if consumers[i] is None:
                continue
            pe = consumers[i].dispatch_flush_plans()
            if pe is not None:
                if pe.host_embeddings is not None:
                    consumers[i].complete_flush(pe)
                else:
                    deferred.append((i, pe))
        phase["flush_dispatch"] += time.perf_counter() - t_fd
        phase["consume"] += time.perf_counter() - t0

    def maybe_checkpoint() -> None:
        nonlocal last_ckpt, deferred
        if (cfg.checkpoint_every_blocks <= 0 or last_consumed is None
                or steps_consumed - last_ckpt
                < cfg.checkpoint_every_blocks):
            return
        # per-span block-granular checkpoints with the same
        # drained-state semantics as the serial loop: complete every
        # dispatched flush, snapshot as of the last CONSUMED step
        # (dispatch runs a group ahead of consumption)
        for i, pe in deferred:
            if consumers[i] is not None:
                consumers[i].complete_flush(pe)
        deferred = []
        st = last_consumed
        for i in range(n):
            if consumers[i] is None or st["reals"][i] == 0:
                continue
            span_scene = jax.tree.map(lambda x: np.asarray(x[i]),
                                      st["scene_state"])
            span_tracker = jax.tree.map(lambda x: np.asarray(x[i]),
                                        st["tracker_state"])
            ckpt.save_checkpoint(
                ckpt_paths[i],
                next_frame=int(st["frame0s"][i]) + st["reals"][i],
                scene_state=span_scene, tracker_state=span_tracker,
                **consumers[i].snapshot())
        last_ckpt = steps_consumed

    while not all(exhausted):
        t_dec = time.perf_counter()
        reals = [0] * n
        frame0s = np.zeros(n, np.int32)
        blocks = []
        for i in range(n):
            nxt = None if exhausted[i] else next(iters[i], None)
            if nxt is None:
                # span ran out: keep feeding its last (padded) block;
                # the carried state for this span is never read again,
                # and its consumer finishes at the drain below (its
                # final blocks may still be staged or in flight)
                exhausted[i] = True
                blocks.append(last_frames[i])
                continue
            frame0, frames = nxt
            reals[i] = len(frames)
            if len(frames) < b:
                frames = np.concatenate(
                    [frames,
                     np.repeat(frames[-1:], b - len(frames), axis=0)])
            frame0s[i] = frame0
            last_frames[i] = frames
            blocks.append(frames)
        if all(exhausted) and not any(reals):
            break

        # Per-step dispatch (upload + enqueue the lockstep row as soon
        # as its blocks decode: the link carries the frame bytes while
        # later steps decode), group-batched fetch.  A scanned
        # one-dispatch-per-group variant was measured 5× slower on the
        # tunnel harness — its group-sized jnp.stack re-ships every
        # frame byte a second time (see pipeline/extract.py).
        phase["decode"] += time.perf_counter() - t_dec
        host_step = np.stack(blocks)
        if wire:
            # temporal delta per span block (first frame absolute);
            # the sharded step reconstructs RGB per device and returns
            # it for the crop path, mirroring the serial yuv loop
            t_enc = time.perf_counter()
            delta = host_step.copy()
            delta[:, 1:] -= host_step[:, :-1]
            phase["encode"] += time.perf_counter() - t_enc
            t_up = time.perf_counter()
            dev_wire = jnp.asarray(delta)
            phase["upload"] += time.perf_counter() - t_up
            t_disp = time.perf_counter()
            packed, dev_all, scene_state, tracker_state = step(
                det_vars, dev_wire, scene_state,
                tracker_state, jnp.asarray(frame0s))
            phase["dispatch"] += time.perf_counter() - t_disp
        else:
            t_up = time.perf_counter()
            dev_all = jnp.asarray(host_step)
            phase["upload"] += time.perf_counter() - t_up
            t_disp = time.perf_counter()
            packed, scene_state, tracker_state = step(
                det_vars, dev_all, scene_state, tracker_state,
                jnp.asarray(frame0s))
            phase["dispatch"] += time.perf_counter() - t_disp
        staged.append({"packed": packed, "blocks": blocks,
                       "frame0s": frame0s, "reals": reals,
                       "dev": dev_all, "scene_state": scene_state,
                       "tracker_state": tracker_state})
        steps_done += 1
        if len(staged) < group:
            continue
        if inflight is not None:
            collect_fetch()
            maybe_checkpoint()
        start_fetch()
        if cfg.checkpoint_every_blocks > 0 and inflight is not None:
            # checkpointed runs trade the fetch/compute overlap for
            # promptly-bounded loss: collect and snapshot every
            # cadence instead of lagging one group behind
            collect_fetch()
            maybe_checkpoint()

    # drain: collect the in-flight group, then fetch the remainder
    while inflight is not None or staged or deferred:
        if inflight is not None:
            collect_fetch()
            maybe_checkpoint()
        start_fetch()

    for i in range(n):
        if consumers[i] is not None:
            finish_span(i)
    for r in readers:
        if r is not None:
            r.close()
    if jpeg_writer is not None:
        jpeg_writer.close()

    total = ExtractCounters(
        saved_boxes=sum(c.saved_boxes for c in counters),
        saved_frames=sum(c.saved_frames for c in counters),
        saved_trajectories=sum(c.saved_trajectories for c in counters),
        frames_processed=sum(c.frames_processed for c in counters),
        overflow=sum(c.overflow for c in counters))
    if counters:
        for name, value in dataclasses.asdict(total).items():
            report.set(name, value)
        report.set("spans", n)
        report.set("steps", steps_done)
        for name, value in phase.items():
            report.set(f"{name}_seconds", round(value, 3))
        report.write(dirs.root)
    print(f"Saved {total.saved_boxes} boxes from "
          f"{total.saved_frames} different frames")
    print(f"and {total.saved_trajectories} trajectories "
          f"across {n} spans.")
    if total.overflow:
        print(f"WARNING: {total.overflow} detections dropped at "
              f"track-capacity limit.")
    return counters
