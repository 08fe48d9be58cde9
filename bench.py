#!/usr/bin/env python3
"""Headline benchmark: extract-pipeline frames/sec on one chip.

Measures the fused device path of the extract stage — scene statistics,
single-stage detection (512×512), the SORT tracker scan, and 4×FaceNet
embedding of the per-block face crops — on film-display-resolution
frames.  This is the work the reference spreads over a 100-way SLURM
GPU array (SURVEY.md §6); the baseline is the effective cluster
throughput the reference provisions for it: 100 shards × ~1800 frames
within the 3 h walltime budget ⇒ ~16.7 frames/s for the whole cluster
(/root/reference/scripts/extract.sh:11-12, readme.txt:13).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

# Reference: 180k frames (2 h film @ 25 fps) inside the provisioned
# 3 h × 100-GPU-shard budget → 16.7 frames/s effective.
BASELINE_FPS = 180_000 / (3 * 3600)

BLOCK = 32          # frames per device block
HEIGHT, WIDTH = 576, 768   # film display resolution (e.g. 757×574 DAR)
CROPS_PER_BLOCK = 16       # faces embedded per block (≈2 per saved frame)
N_BLOCKS = 8
DETECTOR_SIZE = (512, 512)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from facerec_tpu.config import FACENET_DIMS, FACENET_MODELS
    from facerec_tpu.models import DetectorHarness, FaceNetEmbedder
    from facerec_tpu.ops import scene as scene_ops
    from facerec_tpu.ops.crops import crop_resize
    from facerec_tpu.track import TrackerConfig, init_tracker, run_block

    compute_dtype = jnp.bfloat16
    detector = DetectorHarness.create(
        input_size=DETECTOR_SIZE, max_detections=16,
        score_threshold=0.95, dtype=compute_dtype)
    embedders = {
        name: FaceNetEmbedder(name, FACENET_DIMS[name],
                              dtype=compute_dtype, rng_seed=i)
        for i, name in enumerate(FACENET_MODELS)
    }
    tracker_cfg = TrackerConfig(max_tracks=32, max_detections=16)

    def block_step(frames, scene_state, tracker_state, crop_boxes,
                   crop_frames):
        flags, scene_state = scene_ops.detect_block(frames, scene_state)
        det = detector(frames)
        tracker_state, emit = run_block(
            tracker_cfg, tracker_state, det.boxes, det.valid, flags,
            jnp.int32(0))
        crops = crop_resize(frames, crop_frames, crop_boxes, 160)
        embs = [emb(crops) for emb in embedders.values()]
        return flags, det, emit, embs, scene_state, tracker_state

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

    # Warmup / compile
    out = step(frames, scene_state, tracker_state, crop_boxes, crop_frames)
    jax.block_until_ready(out)

    start = time.perf_counter()
    scene_s, tracker_s = out[4], out[5]
    for _ in range(N_BLOCKS):
        out = step(frames, scene_s, tracker_s, crop_boxes, crop_frames)
        scene_s, tracker_s = out[4], out[5]
    jax.block_until_ready(out)
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
