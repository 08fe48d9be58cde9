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
# A/B knobs: FACEREC_PROFILE_WIDTH=72 (slim backbone),
# FACEREC_RESIZE=periodic (gather-free letterbox) — profile both
# against the default before changing production defaults
WIDTH = int(os.environ.get("FACEREC_PROFILE_WIDTH", "96"))
detector = DetectorHarness.create(input_size=(384, 512), max_detections=16,
                                  score_threshold=0.95, dtype=dt,
                                  backbone_width=WIDTH)
bank = EmbedderBank.create_default(dtype=dt)
tracker_cfg = TrackerConfig(max_tracks=32, max_detections=16)
bs, bn = bank.pooled.backbone_stack, bank.pooled.bottlenecks

def block_step(det_vars, bs, bn, frames, scene_state, tracker_state,
               crop_boxes, crop_frames):
    with jax.named_scope("scene"):
        flags, scene_state = scene_ops._detect_block_impl(frames, scene_state)
    with jax.named_scope("detector"):
        det = detector._forward(det_vars, frames)
    with jax.named_scope("tracker"):
        tracker_state, emit = _run_block_impl(
            tracker_cfg, tracker_state, det.boxes, det.valid, flags,
            jnp.int32(0))
    with jax.named_scope("cropembed"):
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
ev_args = {}
for pid, name in pids.items():
    if "TPU" not in name and "tpu" not in name:
        continue
    for e in ev_by_pid.get(pid, []):
        nm = e["name"]
        agg[nm] = agg.get(nm, 0) + e.get("dur", 0)
        a = e.get("args", {})
        if a and nm not in ev_args:
            ev_args[nm] = a
top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
for nm, us in top:
    print(f"{us/1e3:9.3f} ms  {nm}")

# Per-subsystem attribution: the named scopes in block_step land in
# each op's metadata (perfetto 'args' long_name/tf_op); fused ops are
# attributed to the first scope found in their combined metadata.
SUBSYSTEMS = ("scene", "detector", "tracker", "cropembed")


def classify(nm):
    blob = nm + " " + " ".join(
        str(v) for v in ev_args.get(nm, {}).values())
    for s in SUBSYSTEMS:
        if s in blob:
            return s
    return "other"


sub_us = {}
for nm, us in agg.items():
    if nm.startswith("jit_"):
        continue   # module-level event: wraps every op, double-counts
    sub_us[classify(nm)] = sub_us.get(classify(nm), 0) + us
total_us = sum(sub_us.values()) or 1
# the trace covers 2 block steps
per_block = {k: round(v / 2e3, 3) for k, v in sorted(
    sub_us.items(), key=lambda kv: -kv[1])}
print("per-subsystem device ms/block:", json.dumps(per_block))

if "--report" in sys.argv:
    out_dir = sys.argv[sys.argv.index("--report") + 1]
    from facerec_tpu.runtime.metrics import StageReport

    rep = StageReport("device_profile")
    for k, v in per_block.items():
        rep.set(f"{k}_ms_per_block", v)
    rep.set("block_frames", BLOCK)
    rep.write(out_dir)
    log(f"wrote device_profile into {out_dir}/run_report.json")
