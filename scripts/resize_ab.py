"""On-chip A/B: letterbox resize formulation inside the fused block step.

Times the bench block program (scene + detect + track + crop + embed,
one XLA program per 128-frame block) with the detector's letterbox
resize in each formulation:

  xla       jax.image.resize bilinear (dense banded contraction)
  periodic  ops/resize.py gather-free strided-slice combination

and diffs the decoded detections between the two on the same frames
(the periodic taps match jax.image.resize's kernel to float tolerance,
so boxes should agree to sub-pixel).  This is the measurement the
FACEREC_RESIZE=periodic opt-in (models/detector.py) was waiting for;
run it on the real chip before flipping the default.

Usage: python scripts/resize_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

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


def log(m):
    print(m, file=sys.stderr, flush=True)


BLOCK, H, W = 128, 576, 768
CROPS = 64
N_BLOCKS = 20
dt = jnp.bfloat16

detector = DetectorHarness.create(input_size=(384, 512), max_detections=16,
                                  score_threshold=0.95, dtype=dt)
bank = EmbedderBank.create_default(dtype=dt)
tracker_cfg = TrackerConfig(max_tracks=32, max_detections=16)
bs, bn = bank.pooled.backbone_stack, bank.pooled.bottlenecks


def make_step():
    def block_step(det_vars, bs, bn, frames, scene_state, tracker_state,
                   crop_boxes, crop_frames):
        flags, scene_state = scene_ops._detect_block_impl(frames, scene_state)
        det = detector._forward(det_vars, frames)
        tracker_state, emit = _run_block_impl(
            tracker_cfg, tracker_state, det.boxes, det.valid, flags,
            jnp.int32(0))
        crops = crop_resize(frames, crop_frames, crop_boxes, 160)
        embs = bank.pooled._embed(bs, bn, crops)
        emb_sum = sum(e.sum().astype(jnp.float32) for e in embs)
        fp = flags.sum().astype(jnp.float32) + emit.box.sum() + emb_sum
        return fp, scene_state, tracker_state

    return jax.jit(block_step)


rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 255, (BLOCK, H, W, 3)), jnp.uint8)
crop_boxes = jnp.asarray(np.stack(
    [rng.uniform(0, 300, CROPS), rng.uniform(0, 300, CROPS),
     rng.uniform(360, 700, CROPS), rng.uniform(360, 560, CROPS)], axis=1),
    jnp.float32)
crop_frames = jnp.asarray(rng.integers(0, BLOCK, CROPS), jnp.int32)

results = {}
for mode in ("xla", "periodic"):
    os.environ["FACEREC_RESIZE"] = mode
    step = make_step()   # fresh jit: env read at trace time
    scene_s = scene_ops.initial_state(H, W)
    tracker_s = init_tracker(tracker_cfg)
    t0 = time.perf_counter()
    fp, ss, ts = step(detector.variables, bs, bn, frames, scene_s,
                      tracker_s, crop_boxes, crop_frames)
    _ = float(fp)
    log(f"[{mode}] compile {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _round in range(3):
        ss, ts = scene_s, tracker_s
        t0 = time.perf_counter()
        sink = []
        for _ in range(N_BLOCKS):
            fp, ss, ts = step(detector.variables, bs, bn, frames, ss, ts,
                              crop_boxes, crop_frames)
            sink.append(fp)
        _ = float(sum(sink))
        best = min(best, time.perf_counter() - t0)
    ms = best / N_BLOCKS * 1e3
    results[mode] = ms
    log(f"[{mode}] {ms:.2f} ms/block  ({BLOCK * N_BLOCKS / best:.0f} fps)")

# Detection diff between the two formulations.  Random-weight models
# at threshold 0.95 detect nothing on noise, which would make the
# comparison vacuous, so diff with the threshold dropped to 0 (every
# NMS survivor compared) and report how many detections were compared.
import dataclasses

probe = dataclasses.replace(detector, score_threshold=0.0,
                            min_face_size=0.0)
os.environ["FACEREC_RESIZE"] = "xla"
det_a = jax.jit(probe._forward)(probe.variables, frames)
os.environ["FACEREC_RESIZE"] = "periodic"
det_b = jax.jit(probe._forward)(probe.variables, frames)
va, vb = np.asarray(det_a.valid), np.asarray(det_b.valid)
n_shared = int((va & vb).sum())
box_diff = float(np.abs(np.asarray(det_a.boxes) - np.asarray(det_b.boxes))
                 [va & vb].max()) if n_shared else float("nan")
valid_agree = bool((va == vb).all())
log(f"valid agree: {valid_agree}  compared detections: {n_shared}  "
    f"max |box delta| on shared valid: {box_diff:.4f} px")

speedup = results["xla"] / results["periodic"]
delta = results["periodic"] - results["xla"]
log(f"speedup (xla_ms / periodic_ms): {speedup:.3f}x — periodic is "
    f"{delta:+.2f} ms/block vs xla (negative = periodic faster)")
if not valid_agree or n_shared == 0:
    log("FAIL: valid masks disagree or zero detections compared")
    sys.exit(1)
