"""Film-scale soak: the reference's nominal workload, end to end.

The reference routinely processes ~180k-frame films
(/root/reference/facerec/extract.py:209,266 — 2 h at 25 fps), split
into 100-256 SLURM shards with an 8 GB/CPU memory budget
(/root/reference/scripts/extract.sh:10-12).  Nothing short proves a
single-process loop survives that scale: pixel-window / host-RSS
growth across thousands of fetch groups, checkpoint cadence, JPEG
writer backpressure, features-file size.  This soak runs a low-res
scripted-detector film through the REAL extract loop (checkpoints on,
images on, the delta-I420 wire) while sampling host RSS and the
checkpoint's ``next_frame``, then asserts:

  - every frame processed (final counters match the film length);
  - host RSS stays under the budget (default: the reference's 8 GB);
  - checkpoint progress is monotone non-decreasing;
  - output files exist and are non-trivial.

Run the full soak (≈100k frames; synthesis a few minutes, the run
itself depends on the host/link)::

  python -m facerec_tpu.tools.soak --out /tmp/soak --frames 100000

A trimmed variant runs in CI (tests/test_soak.py).  The scripted
detector replays ground truth (no trained weights needed) and the
default embedder is a cheap deferred-fetch stub — the soak measures
loop/memory behavior, not model FLOPs (bench.py measures those).
"""
from __future__ import annotations

import argparse
import json
import os
import threading
import time
from typing import Optional

import numpy as np


def _vm_rss_bytes() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) * 1024
    return 0


from facerec_tpu.pipeline.extract import EmbedderBank


class StubBank(EmbedderBank):
    """Deferred-fetch pooled-pixel projection bank (4 checkpoints'
    worth of output dims, a few matmuls): realistic fetch-buffer sizes
    without FaceNet compile time.  Inherits the crop+dispatch_packed
    deferred protocol from EmbedderBank."""

    supports_deferred = True

    def __init__(self, seed: int = 0):
        import jax
        import jax.numpy as jnp

        from facerec_tpu.config import FACENET_DIMS, FACENET_MODELS
        from facerec_tpu.runtime.transfer import pack_tree

        rng = np.random.default_rng(seed)
        self.names_ = list(FACENET_MODELS)
        self.dims = [FACENET_DIMS[n] for n in self.names_]
        self.total_dim = sum(self.dims)
        proj = [jnp.asarray(rng.normal(size=(75, d)) / 8.0, jnp.float32)
                for d in self.dims]

        def embed(crops):
            x = crops.astype(jnp.float32)
            pooled = x.reshape(-1, 5, 32, 5, 32, 3).mean(axis=(2, 4))
            flat = pooled.reshape(x.shape[0], -1) / 255.0
            outs = []
            for p in proj:
                e = flat @ p
                e = e / jnp.maximum(
                    jnp.linalg.norm(e, axis=1, keepdims=True), 1e-9)
                outs.append(e)
            return pack_tree(jnp.concatenate(outs, -1))

        self._packed = jax.jit(embed)

    def dispatch_packed(self, crops):
        return self._packed(crops)

    def unpack(self, buf, n):
        flat = np.asarray(buf).view(np.float32).reshape(-1,
                                                        self.total_dim)
        parts = np.split(flat[:n], np.cumsum(self.dims)[:-1], axis=-1)
        return dict(zip(self.names_, parts))

    def __call__(self, crops):
        return self.unpack(np.asarray(self.dispatch_packed(crops)),
                           int(crops.shape[0]))


class _Monitor:
    """Background sampler: host RSS high-water mark + the checkpoint's
    next_frame series (monotone progress proof)."""

    def __init__(self, ckpt_path: str, interval: float = 1.0):
        self.ckpt_path = ckpt_path
        self.interval = interval
        self.max_rss = 0
        self.ckpt_frames: list = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def _loop(self) -> None:
        from facerec_tpu.runtime import checkpoint as ckpt

        while not self._stop.is_set():
            self.max_rss = max(self.max_rss, _vm_rss_bytes())
            state = ckpt.load_checkpoint(self.ckpt_path)
            if state is not None:
                f = int(state["next_frame"])
                if not self.ckpt_frames or f != self.ckpt_frames[-1]:
                    self.ckpt_frames.append(f)
            self._stop.wait(self.interval)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join()


def run_soak(out: str, n_frames: int = 100_000, width: int = 256,
             height: int = 192, block_frames: int = 128,
             checkpoint_every: int = 16, fetch_every: int = 8,
             save_every: int = 5, wire_format: str = "yuv420-delta",
             save_images: bool = True, rss_budget_gb: float = 8.0,
             decode_workers: int = 2, embedders=None,
             film: Optional[str] = None) -> dict:
    """Synthesize (cached) + run + assert; returns the soak report."""
    from facerec_tpu.config import ExtractConfig
    from facerec_tpu.contract.naming import movie_id_from_filename
    from facerec_tpu.pipeline.extract import run_extract
    from facerec_tpu.video.synth import PureScriptedDetector, make_clip

    os.makedirs(out, exist_ok=True)
    if film is None:
        film = os.path.join(out, f"125261-Soak{n_frames}.mp4")
    truth_path = film + ".truth.pkl"
    import pickle

    if not (os.path.exists(film) and os.path.exists(truth_path)):
        print(f"synthesizing {n_frames}-frame {width}x{height} film...",
              flush=True)
        t0 = time.perf_counter()
        clip = make_clip(film + ".tmp.mp4", n_frames=n_frames,
                         width=width, height=height,
                         cuts=tuple(range(400, n_frames, 400)), seed=3)
        os.replace(film + ".tmp.mp4", film)
        clip = clip.__class__(**{**clip.__dict__, "path": film})
        with open(truth_path, "wb") as f:
            pickle.dump(clip, f)
        print(f"  synthesized in {time.perf_counter() - t0:.0f}s",
              flush=True)
    with open(truth_path, "rb") as f:
        clip = pickle.load(f)

    movie_id = movie_id_from_filename(film)
    cfg = ExtractConfig(
        block_frames=block_frames, save_every=save_every,
        checkpoint_every_blocks=checkpoint_every,
        fetch_every_blocks=fetch_every, wire_format=wire_format,
        save_images=save_images, decode_workers=decode_workers,
        resume=False)
    if embedders is None:
        embedders = StubBank()
    detector = PureScriptedDetector(clip, max_detections=8)

    data_dir = os.path.join(out, f"{movie_id}-data")
    ckpt_path = os.path.join(data_dir,
                             f".extract_{movie_id}_0-{n_frames}.ckpt")
    t0 = time.perf_counter()
    with _Monitor(ckpt_path) as mon:
        counters = run_extract(film, cfg, out, detector=detector,
                               embedders=embedders)
    wall = time.perf_counter() - t0

    feat_dir = os.path.join(data_dir, "features")
    (feat_name,) = os.listdir(feat_dir)
    feat_bytes = os.path.getsize(os.path.join(feat_dir, feat_name))
    n_images = (len(os.listdir(os.path.join(data_dir, "images")))
                if save_images else 0)

    import jax

    report = {
        "recorded_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                      time.gmtime()),
        "platform": jax.devices()[0].platform,
        "host_cpus": os.cpu_count(),
        "n_frames": n_frames,
        "resolution": f"{width}x{height}",
        "wire_format": wire_format,
        "wall_seconds": round(wall, 1),
        "frames_per_sec": round(counters.frames_processed / wall, 1),
        "frames_processed": counters.frames_processed,
        "saved_boxes": counters.saved_boxes,
        "saved_trajectories": counters.saved_trajectories,
        "overflow": counters.overflow,
        "max_rss_gb": round(mon.max_rss / (1 << 30), 3),
        "rss_budget_gb": rss_budget_gb,
        "ckpt_samples": len(mon.ckpt_frames),
        "ckpt_first_last": (mon.ckpt_frames[:1] + mon.ckpt_frames[-1:]
                            if mon.ckpt_frames else []),
        "features_bytes": feat_bytes,
        "n_face_images": n_images,
    }

    failures = []
    if counters.frames_processed != n_frames:
        failures.append(f"processed {counters.frames_processed} != "
                        f"{n_frames}")
    if mon.max_rss > rss_budget_gb * (1 << 30):
        failures.append(f"RSS {report['max_rss_gb']} GB over the "
                        f"{rss_budget_gb} GB budget")
    if mon.ckpt_frames != sorted(mon.ckpt_frames):
        failures.append(f"checkpoint progress not monotone: "
                        f"{mon.ckpt_frames}")
    if counters.saved_boxes == 0 or feat_bytes == 0:
        failures.append("no features written")
    if counters.saved_trajectories == 0:
        failures.append("no trajectories written")
    report["failures"] = failures
    report["pass"] = not failures

    with open(os.path.join(out, "soak_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main(argv=None) -> int:
    from facerec_tpu.runtime import ensure_platform

    ensure_platform()
    os.environ.setdefault("FACEREC_ALLOW_RANDOM", "1")
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--out", required=True)
    parser.add_argument("--frames", type=int, default=100_000)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--block-frames", type=int, default=128)
    parser.add_argument("--checkpoint-every", type=int, default=16)
    parser.add_argument("--fetch-every", type=int, default=8)
    parser.add_argument("--wire-format", default="yuv420-delta")
    parser.add_argument("--no-images", action="store_true")
    parser.add_argument("--rss-budget-gb", type=float, default=8.0)
    parser.add_argument("--decode-workers", type=int, default=2)
    parser.add_argument("--embedders", choices=("stub", "real"),
                        default="stub",
                        help="real = the full 4-FaceNet bank")
    args = parser.parse_args(argv)

    embedders = None
    if args.embedders == "real":
        from facerec_tpu.pipeline.extract import EmbedderBank

        embedders = EmbedderBank.create_default()
    report = run_soak(
        args.out, n_frames=args.frames, width=args.width,
        height=args.height, block_frames=args.block_frames,
        checkpoint_every=args.checkpoint_every,
        fetch_every=args.fetch_every, wire_format=args.wire_format,
        save_images=not args.no_images,
        rss_budget_gb=args.rss_budget_gb,
        decode_workers=args.decode_workers, embedders=embedders)
    print(json.dumps(report, indent=2))
    print(f"SOAK: {'PASS' if report['pass'] else 'FAIL'}", flush=True)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
