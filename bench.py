#!/usr/bin/env python3
"""Headline benchmark: extract-pipeline frames/sec on one chip.

Budget-safe by construction: the whole run operates under a hard
wall-clock budget (``FACEREC_BENCH_BUDGET`` seconds, default 1500)
with a SIGALRM watchdog.  Every metric line is printed the moment it
is measured (the harness driver records the output tail even when an
outer timeout kills the process, so finishing late only risks the
return code — suiciding early guarantees an empty record, the round-3
post-mortem).  Legs that no longer fit the remaining budget are
skipped with a log line instead of starving the output, and the e2e
legs run with the extract stage's own stdout suppressed so the JSON
lines stay within the driver's short tail window.

All traced/jitted benchmark code lives in ``facerec_tpu/benchdev.py``:
the JAX compile cache keys cover source locations, so keeping traced
functions out of THIS file means editing budgets/logging/leg order
here never re-keys a cached executable (cold compile ~500-700 s on a
contended tunnel vs ~100 s warm load).

Five JSON lines, in print order:

1. ``extract_frames_per_sec_per_chip`` ``config=…detector=384x512`` —
   the fused device number at the long-side-512 speed detector: scene
   statistics (Pallas histogram equalization) + single-stage detection
   + the SORT tracker scan + face crop + 4×FaceNet embedding as ONE
   fused XLA program per 128-frame block, blocks dispatched
   back-to-back with device-to-device dependencies only.  Printed
   FIRST so it is on record even if a later leg dies, re-emitted
   before each e2e leg (tail insurance), and REPEATED as the final
   line so single-metric consumers of the tail record it.
2. Same metric, ``config=…detector=native-res`` — the SURVEY.md §6
   north star: frames/s/chip under PARITY semantics (the reference
   detects at display scale, /root/reference/facerec/detector.py:20),
   i.e. the same fused program with the native-display-resolution
   detector input.  Budget-gated (second compile).
3. ``extract_e2e_frames_per_sec_per_chip`` ``config=parity`` — the
   REAL production loop end to end in a BYTE-EXACT configuration
   (``wire_format=rgb-delta`` — losslessly undone on device,
   ops/yuv.delta_decode; every output byte identical to plain rgb —
   and the native-resolution detector): native C++ decode,
   host→device upload, fused device program (full detector FLOPs;
   detections overlaid from the synthetic clip's ground truth —
   ``detections=scripted`` in the config string — so the
   crop/embed/JPEG load is realistic without trained weights),
   group-batched fetches, JPEG face images and contract files.  This
   is the number to hold against BASELINE.md's budget: the reference
   provisions 100 SLURM GPU shards × ~1800 frames in 3 h ⇒ ~16.7
   frames/s for the whole cluster
   (/root/reference/scripts/extract.sh:11-12, readme.txt:13).
4. ``pipeline_frames_per_sec`` — the whole stage list (extract → merge
   → cluster → classify) on the parity leg's output, per-stage seconds
   in the config string (/root/reference/facerec-pipeline.py:244-261
   is the reference analog).
5. ``extract_e2e_frames_per_sec_per_chip`` ``config=speed`` — the
   documented speed opt-ins (``wire_format=yuv420-delta``, detector
   long side 512).

Each e2e leg uses a 1024-frame film (8 blocks = exactly one fetch
group), a full-run warmup (cheap at this length, and the only way to
pre-pay ALL compiles: block program, crop/embed buckets, group concat
shapes) and a single measured repeat.  ``--e2e`` runs a manual
worker-sweep mode with a decode-only baseline.
"""
from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import signal
import sys
import time

import numpy as np

T0 = time.perf_counter()
BUDGET = float(os.environ.get("FACEREC_BENCH_BUDGET", "1500"))

BASELINE_FPS = 180_000 / (3 * 3600)   # reference cluster budget

BLOCK = 128                # frames per device block
HEIGHT, WIDTH = 576, 768   # film display resolution
CROPS_PER_BLOCK = 64       # faces embedded per block (≈2 per saved frame)
N_BLOCKS = 20
DETECTOR_SIZE = (384, 512)   # AR-fitted long-side-512 (the speed opt-in)
NATIVE_SIZE = (576, 768)     # native display resolution (parity default)
FETCH_EVERY = 8            # blocks per device→host transfer (e2e mode)
E2E_FRAMES = 1024          # e2e film length (8 blocks = 1 fetch group)
E2E_LEG_MIN_BUDGET = 180.0  # skip an e2e leg with less than this left


def log(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def remaining() -> float:
    return BUDGET - (time.perf_counter() - T0)


class BenchTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise BenchTimeout()


def arm_watchdog() -> None:
    """Raise BenchTimeout shortly before the budget expires."""
    fire_in = max(1, int(remaining() - 10))
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(fire_in)


def make_bench_film(n_frames: int):
    """Synthesize (once, cached in /tmp) the bench film + truth."""
    import pickle

    from facerec_tpu.video.synth import make_clip

    film = f"/tmp/facerec_bench/125261-Bench{n_frames}.mp4"
    truth_path = film + ".truth.pkl"
    os.makedirs(os.path.dirname(film), exist_ok=True)
    if not (os.path.exists(film) and os.path.exists(truth_path)):
        log(f"synthesizing {n_frames}-frame {WIDTH}x{HEIGHT} film...")
        clip = make_clip(film + ".tmp.mp4", n_frames=n_frames,
                         width=WIDTH, height=HEIGHT,
                         cuts=tuple(range(200, n_frames, 200)), seed=5)
        os.replace(film + ".tmp.mp4", film)
        clip = clip.__class__(**{**clip.__dict__, "path": film})
        with open(truth_path, "wb") as f:
            pickle.dump(clip, f)
    with open(truth_path, "rb") as f:
        return film, pickle.load(f)


def _quiet_run_extract(*args, **kwargs):
    """run_extract with its stage prints captured off stdout.

    The driver records only a short tail of merged stdout+stderr; the
    extract stage's per-run film banner would push the emitted JSON
    lines out of that window if an outer timeout killed the process
    mid-leg.  On failure the captured output is replayed to stderr.
    """
    from facerec_tpu.pipeline.extract import run_extract

    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            return run_extract(*args, **kwargs)
    except BaseException:
        tail = buf.getvalue().strip().splitlines()[-8:]
        for line in tail:
            log(f"  extract| {line}")
        raise


def bench_e2e_config(label: str, n_frames: int, detector_size,
                     wire_format: str, workers: int = 2,
                     repeats: int = 1):
    """One labeled end-to-end measurement.

    Returns ``(line, extra)`` — the JSON line dict plus the output dir
    and measured extract seconds of the best run, so the pipeline leg
    can chain merge/cluster/classify onto the same extract output.
    """
    import jax.numpy as jnp

    from facerec_tpu.benchdev import HybridDetector
    from facerec_tpu.config import ExtractConfig
    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.pipeline.extract import EmbedderBank
    from facerec_tpu.video.synth import PureScriptedDetector

    os.environ.setdefault("FACEREC_ALLOW_RANDOM", "1")
    film, clip = make_bench_film(n_frames)

    compute_dtype = jnp.bfloat16
    harness = DetectorHarness.create(
        input_size=detector_size, max_detections=16,
        score_threshold=0.95, dtype=compute_dtype)
    bank = EmbedderBank.create_default(dtype=compute_dtype)
    detector = HybridDetector(
        harness, PureScriptedDetector(clip, max_detections=16))

    out = f"/tmp/facerec_bench/out_{label}"
    os.system(f"rm -rf {out} {out}_warm")
    cfg = ExtractConfig(block_frames=BLOCK, decode_workers=workers,
                        fetch_every_blocks=FETCH_EVERY, resume=False,
                        wire_format=wire_format)

    # warmup = the IDENTICAL full run (covers every compile the
    # measured run hits: block program, crop/embed buckets, group
    # concat shapes) — cheap at 1024 frames, and warm/measured runs
    # see the same blocks
    log(f"[{label}] warmup (full run, compiles; "
        f"{remaining():.0f}s budget left)...")
    t0 = time.perf_counter()
    _quiet_run_extract(film, cfg, out + "_warm", detector=detector,
                       embedders=bank)
    log(f"[{label}] warmup done in {time.perf_counter() - t0:.1f}s")

    best = 0.0
    best_dt = float("inf")
    for _rep in range(max(1, repeats)):
        os.system(f"rm -rf {out}")
        t0 = time.perf_counter()
        counters = _quiet_run_extract(film, cfg, out, detector=detector,
                                      embedders=bank)
        dt = time.perf_counter() - t0
        fps = counters.frames_processed / dt
        best = max(best, fps)
        best_dt = min(best_dt, dt)
        log(f"[{label}] e2e {fps:.1f} fps "
            f"({counters.frames_processed} frames, "
            f"{counters.saved_boxes} faces, {dt:.1f}s)")
        try:
            rep = json.load(open(f"{out}/125261-data/run_report.json"))
            (stage,) = [k for k in rep if k.startswith("extract_")]
            c = rep[stage]["counters"]
            log("  phases: " + " ".join(
                f"{p}={c.get(p + '_seconds', '?')}s"
                for p in ("decode", "encode", "dispatch", "upload",
                          "fetch", "consume", "flush_dispatch")))
        except (OSError, ValueError, KeyError):
            pass

    det_label = ("native-res" if detector_size == NATIVE_SIZE
                 else f"{detector_size[0]}x{detector_size[1]}")
    line = {
        "metric": "extract_e2e_frames_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "frames/s",
        "vs_baseline": round(best / BASELINE_FPS, 2),
        "config": f"{label}: wire={wire_format} detector={det_label} "
                  f"frames={n_frames} workers={workers} "
                  f"detections=scripted",
    }
    return line, {"out": out, "extract_seconds": best_dt,
                  "frames": n_frames}


def bench_device(label: str, detector_size, bank=None):
    """One fused-block device throughput headline; returns the line.

    ``label``/``detector_size`` select the config: the long-side-512
    speed detector or the native-display-resolution parity detector
    (the reference detects at display scale,
    /root/reference/facerec/detector.py:20 — frames/s/chip under parity
    semantics is the BASELINE.md north-star metric).  Pass ``bank`` to
    reuse the 4-checkpoint FaceNet init across configs.
    """
    from facerec_tpu.benchdev import make_device_step

    log(f"[device-{label}] building models + inputs...")
    step, args = make_device_step(detector_size, BLOCK, HEIGHT, WIDTH,
                                  CROPS_PER_BLOCK, bank=bank)
    (det_vars, backbone_stack, bottlenecks, frames,
     scene_s, tracker_s, crop_boxes, crop_frames) = args

    t0 = time.perf_counter()
    log(f"[device-{label}] compiling fused block program (warm-key "
        "load ~100s, cold ~500-700s on a contended tunnel)...")
    fp, scene_s, tracker_s = step(det_vars, backbone_stack, bottlenecks,
                                  frames, scene_s, tracker_s,
                                  crop_boxes, crop_frames)
    _ = float(fp)
    log(f"  program ready in {time.perf_counter() - t0:.1f}s")

    # best-of-3 rounds: per-dispatch RPC latency on the tunneled
    # backend varies several-fold between identical runs — the best
    # round measures the program, not the link's worst mood.  Rounds
    # are <1 s each; the compile above is the real cost.
    elapsed = float("inf")
    for _round in range(3):
        start = time.perf_counter()
        fps_sink = []
        for _ in range(N_BLOCKS):
            fp, scene_s, tracker_s = step(det_vars, backbone_stack,
                                          bottlenecks, frames, scene_s,
                                          tracker_s, crop_boxes,
                                          crop_frames)
            fps_sink.append(fp)
        total = float(sum(fps_sink))  # one host fetch drains the pipeline
        assert np.isfinite(total)
        elapsed = min(elapsed, time.perf_counter() - start)

    fps = (N_BLOCKS * BLOCK) / elapsed
    det_label = ("native-res" if detector_size == NATIVE_SIZE
                 else f"{detector_size[0]}x{detector_size[1]}")
    return {
        "metric": "extract_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "config": f"device-only block={BLOCK} "
                  f"detector={det_label} bf16",
    }


def emit(line: dict) -> None:
    print(json.dumps(line), flush=True)


def _make_actor_zip(adir: str, emb_dim: int = 128) -> None:
    """Synthetic actor-images.zip (3 actors) so classify has ≥3 classes."""
    import zipfile

    rng = np.random.default_rng(7)
    os.makedirs(adir, exist_ok=True)
    with zipfile.ZipFile(os.path.join(adir, "actor-images.zip"), "w") as z:
        for aid in (101, 202, 303):
            for k in range(4):
                z.writestr(f"a{aid}_{k}.jpeg.json", json.dumps({
                    "box": [0, 0, 20, 20],
                    "embeddings": {"20170512-110547":
                                   rng.normal(size=emb_dim).tolist()},
                    "actorID": str(aid), "actorname": f"Actor {aid}"}))


def bench_pipeline(extract_extra: dict):
    """Full-pipeline wall clock: extract (already measured) + merge +
    cluster + classify on the SAME output dir, one recorded line.

    The reference's product is the whole stage list with per-stage
    timing (/root/reference/facerec/facerec-pipeline.py:244-261); this
    leg puts an end-to-end number — film frames over the sum of every
    stage's wall — on the driver artifact.  merge uses
    --min-face-size 20 (synthetic faces are 28-44 px; the reference
    default 50 is calibrated for real films).
    """
    from facerec_tpu.pipeline import classify, cluster, merge

    out = extract_extra["out"]
    frames = extract_extra["frames"]
    stage_s = {"extract": extract_extra["extract_seconds"]}

    def stage_list(root):
        adir = os.path.join(root, "actors")
        _make_actor_zip(adir)
        return [
            ("merge", merge.main, ["--path", f"{root}/*-data",
                                   "--min-face-size", "20"]),
            ("cluster", cluster.main, ["--path", f"{root}/*-data"]),
            ("classify", classify.main,
             ["--path", f"{root}/125261-data", "--actors-dir", adir]),
        ]

    # warmup on the e2e leg's warm-run output (same film, same shapes)
    # so the measured pass times the stages, not their first compile
    # through the tunnel — the e2e legs get the same treatment via
    # their full-run warmup
    if os.path.isdir(out + "_warm"):
        log("[pipeline] warmup (merge/cluster/classify compiles)...")
        for _name, main, argv in stage_list(out + "_warm"):
            with contextlib.redirect_stdout(io.StringIO()):
                main(argv)

    for name, main, argv in stage_list(out):
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            main(argv)
        stage_s[name] = time.perf_counter() - t0
    for f in ("trajectories.jsonl", "clusters.json", "predictions.json"):
        assert os.path.exists(f"{out}/125261-data/{f}"), f
    total = sum(stage_s.values())
    fps = frames / total
    breakdown = " ".join(f"{k}={v:.2f}s" for k, v in stage_s.items())
    log(f"[pipeline] {fps:.1f} fps end-to-end ({breakdown})")
    return {
        "metric": "pipeline_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "config": f"extract(parity)+merge+cluster+classify "
                  f"frames={frames} detections=scripted {breakdown}",
    }


PARITY_DEVICE_MIN_BUDGET = 450.0  # skip the 2nd device compile below this


def run_default(args) -> None:
    """Budget-gated default mode: device headlines + labeled e2e legs.

    Print order: speed device headline (warmest program — something is
    on record fast), parity device headline (the north-star:
    frames/s/chip with the native-resolution detector,
    /root/reference/facerec/detector.py:20), parity e2e, full-pipeline
    leg chained on the parity extract output, speed e2e.  Every
    measured line re-emits in the ``finally`` block so the driver's
    short output tail carries ALL metrics, device headline last for
    single-metric consumers.
    """
    import jax

    log(f"devices: {jax.devices()}")
    measured: list = []
    try:
        arm_watchdog()
        headline = bench_device("speed", DETECTOR_SIZE)
        measured.append(headline)
        emit(headline)   # on record immediately

        if remaining() >= PARITY_DEVICE_MIN_BUDGET:
            import jax.numpy as jnp

            from facerec_tpu.pipeline.extract import EmbedderBank

            bank = EmbedderBank.create_default(dtype=jnp.bfloat16)
            measured.append(bench_device("parity", NATIVE_SIZE,
                                         bank=bank))
            emit(measured[-1])
        else:
            log(f"[device-parity] SKIPPED: {remaining():.0f}s left "
                f"< {PARITY_DEVICE_MIN_BUDGET:.0f}s minimum")

        e2e_legs = [
            # parity first: the claim that matters (beats the 16.7 fps
            # cluster budget) must be on record for the PARITY path.
            # rgb-delta is byte-exact (outputs identical to wire=rgb,
            # tests/test_extract_e2e.py::
            # test_wire_format_rgb_delta_byte_identical) while riding
            # the link compressed — plain rgb is capped ~18 fps by the
            # tunnel's ~35 MB/s on 1.4 GB of frames
            ("parity", NATIVE_SIZE, "rgb-delta"),
            ("speed", DETECTOR_SIZE, "yuv420-delta"),
        ]
        if args.no_e2e:
            e2e_legs = []
        for label, det_size, wire in e2e_legs:
            if remaining() < E2E_LEG_MIN_BUDGET:
                log(f"[{label}] SKIPPED: {remaining():.0f}s budget left "
                    f"< {E2E_LEG_MIN_BUDGET:.0f}s leg minimum")
                continue
            emit(headline)   # tail insurance if this leg is killed
            try:
                line, extra = bench_e2e_config(label, args.frames,
                                               det_size, wire,
                                               repeats=args.repeats)
                measured.append(line)
                emit(line)
                if label == "parity" and remaining() > 30:
                    measured.append(bench_pipeline(extra))
                    emit(measured[-1])
            except BenchTimeout:
                log(f"[{label}] ABORTED by watchdog "
                    f"({BUDGET:.0f}s budget)")
                break
    except BenchTimeout:
        log(f"watchdog fired ({BUDGET:.0f}s budget)")
    finally:
        signal.alarm(0)
        # re-emit EVERY measured line as the final block (the driver
        # records only a short output tail; the device headline goes
        # last for single-metric consumers)
        for line in measured[1:] + measured[:1]:
            emit(line)


def run_e2e_sweep(args) -> None:
    """Manual mode: worker sweep + decode-only baseline."""
    from facerec_tpu.video.reader import open_block_reader, probe_video

    arm_watchdog()
    film, _clip = make_bench_film(args.frames)
    info = probe_video(film, None)
    workers = [int(w) for w in args.decode_workers.split(",")]
    for w in workers:
        r = open_block_reader(film, info, BLOCK, decode_workers=w)
        t0 = time.perf_counter()
        seen = 0
        for _f0, frames in r.blocks(0, info.n_frames, BLOCK):
            seen += len(frames)
        dt = time.perf_counter() - t0
        r.close()
        log(f"decode-only (workers={w}): {seen / dt:.0f} fps")
    for w in workers:
        line, _extra = bench_e2e_config(f"sweep-w{w}", args.frames,
                                        DETECTOR_SIZE, args.wire_format,
                                        workers=w, repeats=args.repeats)
        emit(line)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--e2e", action="store_true",
                        help="manual worker-sweep mode (decode-only "
                             "baseline + e2e per worker setting)")
    parser.add_argument("--frames", type=int, default=E2E_FRAMES,
                        help="synthetic film length for e2e legs")
    parser.add_argument("--decode-workers", type=str, default="0,2",
                        help="comma-separated settings for --e2e sweep")
    parser.add_argument("--wire-format", type=str, default="yuv420-delta",
                        help="wire format for the --e2e sweep")
    parser.add_argument("--repeats", type=int, default=1,
                        help="measured runs per e2e leg (best-of-N)")
    parser.add_argument("--no-e2e", action="store_true",
                        help="device headline only")
    args = parser.parse_args()

    # The tunneled backend occasionally fails at init right after
    # another client exits — and sometimes HANGS outright (observed:
    # jax.devices() blocking >10 min while the relay accepts TCP but
    # the remote stays silent).  The main watchdog only arms after
    # init, so an unguarded hang here would burn the whole budget and
    # leave the driver an EMPTY output tail (the round-3 failure
    # mode).  A SIGALRM cannot reliably interrupt a blocking C-level
    # RPC wait, so each attempt probes in a KILLABLE subprocess first;
    # only a successful probe is followed by in-process init.
    import subprocess

    INIT_ATTEMPT_BUDGET = min(420.0, BUDGET * 0.35)
    PROBE = ("from facerec_tpu.runtime import ensure_platform; "
             "ensure_platform(); import jax; "
             "print([str(d) for d in jax.devices()])")
    for attempt in range(2):
        t0 = time.perf_counter()
        try:
            r = subprocess.run([sys.executable, "-c", PROBE],
                               timeout=INIT_ATTEMPT_BUDGET,
                               capture_output=True, text=True)
            ok = r.returncode == 0
            detail = (r.stdout.strip().splitlines() or ["<no output>"]
                      )[-1] if ok else (r.stderr.strip().splitlines()
                                        or ["<no stderr>"])[-1]
        except subprocess.TimeoutExpired:
            ok, detail = False, (f"HUNG past {INIT_ATTEMPT_BUDGET:.0f}s "
                                 "(probe killed)")
        if ok:
            log(f"backend probe ok in "
                f"{time.perf_counter() - t0:.0f}s: {detail}")
            from facerec_tpu.runtime import ensure_platform

            ensure_platform()
            import jax

            jax.devices()
            break
        log(f"backend init attempt {attempt + 1}/2: {detail}")
        if attempt == 1:
            log("giving up: TPU backend unreachable — no metrics this "
                "run (device tunnel outage, not a bench regression; "
                "see the init attempts above)")
            sys.exit(3)
        time.sleep(20)

    if args.e2e:
        run_e2e_sweep(args)
    else:
        run_default(args)
