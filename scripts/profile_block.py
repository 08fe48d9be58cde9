"""Device-op profile of the fused extract block step via jax.profiler.

Runs the bench block step (scene + detect + track + crop + embed as one
XLA program), writes a perfetto trace to /tmp/jprof, and aggregates
device-side op durations — the ground truth for any optimization work
(host-side timing of single dispatches is dominated by enqueue/tunnel
latency and lies).  Usage: python scripts/profile_block.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob, gzip, json, os, sys, time
import numpy as np
from facerec_tpu.runtime import ensure_platform
ensure_platform()
import jax, jax.numpy as jnp
from facerec_tpu.models import DetectorHarness
from facerec_tpu.ops import scene as scene_ops
from facerec_tpu.ops.crops import crop_resize
from facerec_tpu.pipeline.extract import EmbedderBank
from facerec_tpu.track import TrackerConfig, init_tracker
from facerec_tpu.track.tracker import _run_block_impl

def log(m): print(m, file=sys.stderr, flush=True)

BLOCK, H, W = 128, 576, 768
CROPS = 64
dt = jnp.bfloat16
detector = DetectorHarness.create(input_size=(384, 512), max_detections=16,
                                  score_threshold=0.95, dtype=dt)
bank = EmbedderBank.create_default(dtype=dt)
tracker_cfg = TrackerConfig(max_tracks=32, max_detections=16)
bs, bn = bank.pooled.backbone_stack, bank.pooled.bottlenecks

def block_step(det_vars, bs, bn, frames, scene_state, tracker_state,
               crop_boxes, crop_frames):
    flags, scene_state = scene_ops._detect_block_impl(frames, scene_state)
    det = detector._forward(det_vars, frames)
    tracker_state, emit = _run_block_impl(
        tracker_cfg, tracker_state, det.boxes, det.valid, flags, jnp.int32(0))
    crops = crop_resize(frames, crop_frames, crop_boxes, 160)
    embs = bank.pooled._embed(bs, bn, crops)
    emb_sum = sum(e.sum().astype(jnp.float32) for e in embs)
    fp = flags.sum().astype(jnp.float32) + emit.box.sum() + emb_sum
    return fp, scene_state, tracker_state

step = jax.jit(block_step)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 255, (BLOCK, H, W, 3)), jnp.uint8)
crop_boxes = jnp.asarray(np.stack(
    [rng.uniform(0, 300, CROPS), rng.uniform(0, 300, CROPS),
     rng.uniform(360, 700, CROPS), rng.uniform(360, 560, CROPS)], 1),
    jnp.float32)
crop_frames = jnp.asarray(rng.integers(0, BLOCK, CROPS), jnp.int32)
scene_state = scene_ops.initial_state(H, W)
tracker_state = init_tracker(tracker_cfg)
dv = detector.variables

t0 = time.perf_counter()
out = step(dv, bs, bn, frames, scene_state, tracker_state, crop_boxes,
           crop_frames)
_ = float(out[0])
log(f"compile {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
s = jnp.float32(0)
N = 10
for _ in range(N):
    o = step(dv, bs, bn, frames, scene_state, tracker_state, crop_boxes,
             crop_frames)
    s = s + o[0]
_ = float(s)
log(f"steady: {(time.perf_counter()-t0)/N*1e3:.2f} ms/block")

os.system("rm -rf /tmp/jprof")
with jax.profiler.trace("/tmp/jprof"):
    o1 = step(dv, bs, bn, frames, scene_state, tracker_state, crop_boxes,
              crop_frames)
    o2 = step(dv, bs, bn, frames, scene_state, tracker_state, crop_boxes,
              crop_frames)
    _ = float(o1[0]) + float(o2[0])

files = glob.glob("/tmp/jprof/**/*.trace.json.gz", recursive=True)
log(f"trace files: {files}")
ev_by_pid = {}
pids = {}
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "X":
            ev_by_pid.setdefault(ev["pid"], []).append(ev)

for pid, name in pids.items():
    if pid in ev_by_pid:
        tot = sum(e.get("dur", 0) for e in ev_by_pid[pid])
        log(f"pid {pid} [{name}]: {len(ev_by_pid[pid])} events, "
            f"{tot/1e3:.2f} ms total")

# Aggregate device ops (TPU pid names contain 'TPU' or 'XLA Op')
agg = {}
for pid, name in pids.items():
    if "TPU" not in name and "tpu" not in name:
        continue
    for e in ev_by_pid.get(pid, []):
        nm = e["name"]
        agg[nm] = agg.get(nm, 0) + e.get("dur", 0)
top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
for nm, us in top:
    print(f"{us/1e3:9.3f} ms  {nm}")
