#!/usr/bin/env python3
"""Headline benchmark: extract-pipeline frames/sec on one chip.

Measures the device path of the extract stage — scene statistics
(Pallas histogram equalization) + single-stage detection (AR-fitted
384×512, bf16) + the SORT tracker scan + face crop + 4×FaceNet embedding — as
ONE fused XLA program per 128-frame block at film display resolution.
Blocks are dispatched back-to-back with device-to-device data
dependencies only; the host syncs once at the end, so the number is
pure device throughput (what a double-buffered production extract
sustains per chip).

The baseline is the effective cluster throughput the reference
provisions for the same work: 100 SLURM GPU shards × ~1800 frames
inside the 3 h walltime budget ⇒ ~16.7 frames/s for the whole cluster
(/root/reference/scripts/extract.sh:11-12, readme.txt:13; SURVEY.md §6).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 180_000 / (3 * 3600)   # reference cluster budget

BLOCK = 128                # frames per device block
HEIGHT, WIDTH = 576, 768   # film display resolution
CROPS_PER_BLOCK = 64       # faces embedded per block (≈2 per saved frame)
N_BLOCKS = 20
DETECTOR_SIZE = (384, 512)   # AR-fitted to 576x768 (models.detector.fit_input_size)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from facerec_tpu.runtime import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp

    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.ops import scene as scene_ops
    from facerec_tpu.ops.crops import crop_resize
    from facerec_tpu.pipeline.extract import EmbedderBank
    from facerec_tpu.track import TrackerConfig, init_tracker
    from facerec_tpu.track.tracker import _run_block_impl

    log(f"devices: {jax.devices()}")
    compute_dtype = jnp.bfloat16
    detector = DetectorHarness.create(
        input_size=DETECTOR_SIZE, max_detections=16,
        score_threshold=0.95, dtype=compute_dtype)
    bank = EmbedderBank.create_default(dtype=compute_dtype)
    tracker_cfg = TrackerConfig(max_tracks=32, max_detections=16)
    backbone_stack = bank.pooled.backbone_stack
    bottlenecks = bank.pooled.bottlenecks

    def block_step(det_vars, backbone_stack, bottlenecks, frames,
                   scene_state, tracker_state, crop_boxes, crop_frames):
        flags, scene_state = scene_ops._detect_block_impl(
            frames, scene_state)
        det = detector._forward(det_vars, frames)
        tracker_state, emit = _run_block_impl(
            tracker_cfg, tracker_state, det.boxes, det.valid, flags,
            jnp.int32(0))
        crops = crop_resize(frames, crop_frames, crop_boxes, 160)
        embs = bank.pooled._embed(backbone_stack, bottlenecks, crops)
        emb_sum = sum(e.sum().astype(jnp.float32) for e in embs)
        fp = flags.sum().astype(jnp.float32) + emit.box.sum() + emb_sum
        return fp, scene_state, tracker_state

    step = jax.jit(block_step)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (BLOCK, HEIGHT, WIDTH, 3)),
                         jnp.uint8)
    crop_boxes = jnp.asarray(
        np.stack([rng.uniform(0, 300, CROPS_PER_BLOCK),
                  rng.uniform(0, 300, CROPS_PER_BLOCK),
                  rng.uniform(360, 700, CROPS_PER_BLOCK),
                  rng.uniform(360, 560, CROPS_PER_BLOCK)], axis=1),
        jnp.float32)
    crop_frames = jnp.asarray(
        rng.integers(0, BLOCK, CROPS_PER_BLOCK), jnp.int32)
    scene_state = scene_ops.initial_state(HEIGHT, WIDTH)
    tracker_state = init_tracker(tracker_cfg)
    det_vars = detector.variables

    t0 = time.perf_counter()
    log("compiling fused block program...")
    fp, scene_s, tracker_s = step(det_vars, backbone_stack, bottlenecks,
                                  frames, scene_state, tracker_state,
                                  crop_boxes, crop_frames)
    _ = float(fp)
    log(f"  {time.perf_counter() - t0:.1f}s")

    start = time.perf_counter()
    fps_sink = []
    for _ in range(N_BLOCKS):
        fp, scene_s, tracker_s = step(det_vars, backbone_stack, bottlenecks,
                                      frames, scene_s, tracker_s,
                                      crop_boxes, crop_frames)
        fps_sink.append(fp)
    total = float(sum(fps_sink))   # one host fetch drains the pipeline
    assert np.isfinite(total)
    elapsed = time.perf_counter() - start

    fps = (N_BLOCKS * BLOCK) / elapsed
    print(json.dumps({
        "metric": "extract_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
