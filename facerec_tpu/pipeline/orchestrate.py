"""Pipeline orchestrator.

Replaces /root/reference/facerec/facerec-pipeline.py: a declarative
stage list executed in order with per-stage timing and
abort-on-failure.  No SLURM — one TPU chip replaces the 100-way array
job, so stages run in-process (extract can still fan out over shards
with ``--n-shards`` for multi-host setups; shard outputs merge
identically).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time
import traceback
from typing import Callable, List, Optional

from facerec_tpu.config import (ClassifyConfig, ClusterConfig, ExtractConfig,
                                MergeConfig, PipelineConfig)
from facerec_tpu.contract.naming import movie_id_from_filename


@dataclasses.dataclass
class Stage:
    name: str
    run: Callable[[], object]
    skip: bool = False


def build_stages(filmfile: str, out_path: str, cfg: PipelineConfig,
                 actors_dir: Optional[str] = None,
                 skip: List[str] = (),
                 shard_procs: int = 0,
                 mesh: int = 0,
                 detector_weights: Optional[str] = None,
                 facenet_weights: Optional[str] = None) -> List[Stage]:
    movie_id = movie_id_from_filename(filmfile)
    data_dir = os.path.join(out_path, f"{movie_id}-data")

    def download():
        # The reference pipeline opens with a download stage
        # (facerec-pipeline.py:33-35 → download.sh); ours shells out to
        # the same contract and is skipped when the film is on disk.
        import subprocess

        if os.path.exists(filmfile):
            print(f"{filmfile} already exists")
            return None
        script = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
            "scripts", "download.sh")
        res = subprocess.run(["bash", script, filmfile])
        if res.returncode != 0:
            raise RuntimeError(f"download failed ({res.returncode})")
        return None

    def extract():
        if shard_procs > 1:
            # One subprocess per shard — the reference's array-job model
            # (facerec-pipeline.py GPU array / scripts/extract.sh) run
            # locally and sequentially.  Each shard is idempotent and
            # resume-marked, so a crashed run re-runs only the missing
            # shards; per-shard processes also bound host memory on
            # hosts whose device runtime grows with transfer count.
            import subprocess
            import sys

            weight_args = []
            if detector_weights is not None:
                weight_args += ["--detector-weights", detector_weights]
            if facenet_weights is not None:
                weight_args += ["--facenet-weights", facenet_weights]
            for i in range(shard_procs):
                cmd = [sys.executable, "-m", "facerec_tpu.pipeline.extract",
                       "--n-shards", str(shard_procs), "--shard-i", str(i),
                       "--out-path", out_path, *weight_args, filmfile]
                print(f"[extract shard {i + 1}/{shard_procs}] "
                      + " ".join(cmd), flush=True)
                res = subprocess.run(cmd)
                if res.returncode != 0:
                    raise RuntimeError(
                        f"extract shard {i} failed ({res.returncode})")
            return None
        if mesh > 1:
            from facerec_tpu.parallel.extract_mesh import run_extract_mesh

            return run_extract_mesh(filmfile, cfg.extract, out_path,
                                    mesh_size=mesh,
                                    detector_weights=detector_weights,
                                    facenet_weights=facenet_weights)
        from facerec_tpu.pipeline.extract import run_extract

        return run_extract(filmfile, cfg.extract, out_path,
                           detector_weights=detector_weights,
                           facenet_weights=facenet_weights)

    def merge():
        from facerec_tpu.pipeline.merge import run_merge

        return run_merge(data_dir, movie_id, cfg.merge)

    def cluster():
        from facerec_tpu.pipeline.cluster import run_cluster

        return run_cluster(data_dir, cfg.cluster)

    def classify():
        from facerec_tpu.pipeline.classify import (build_training_set,
                                                   read_actor_embeddings,
                                                   run_classify)

        zipf = os.path.join(actors_dir or ".", "actor-images.zip")
        embeddings, _ = read_actor_embeddings(zipf, cfg.classify.emb_name)
        x, y = build_training_set(embeddings, cfg.classify.min_samples)
        return run_classify(data_dir, x, y, cfg.classify)

    stages = [
        Stage("download", download,
              skip=os.path.exists(filmfile)),
        Stage("extract", extract),
        Stage("merge", merge),
        Stage("cluster", cluster),
        Stage("classify", classify,
              skip=actors_dir is None),
    ]
    for s in stages:
        if s.name in skip:
            s.skip = True
    return stages


def run_pipeline(stages: List[Stage], verbose: bool = False,
                 data_dir: Optional[str] = None) -> bool:
    """Run stages in order; abort on first failure
    (facerec-pipeline.py:244-261 semantics).  With ``data_dir`` the
    per-stage wall times land in the movie's ``run_report.json``
    alongside each stage's own counters (SURVEY.md §5.5; the reference
    only prints them, facerec-pipeline.py:250-260)."""
    from facerec_tpu.runtime.metrics import StageReport

    report = StageReport("pipeline") if data_dir is not None else None
    ok = True
    for i, stage in enumerate(stages):
        if stage.skip:
            print(f"Skipping stage <{stage.name}>")
            continue
        start = time.time()
        print(f"Starting stage #{i} <{stage.name}>")
        try:
            stage.run()
        except Exception:
            print(f"Stage #{i} <{stage.name}> failed in "
                  f"{time.time() - start:.1f}s, aborting.")
            traceback.print_exc()
            ok = False
        if report is not None:
            report.set(f"{stage.name}_seconds",
                       round(time.time() - start, 3))
            if not ok:
                report.set("failed_stage", stage.name)
        if not ok:
            break
        print(f"Stage #{i} <{stage.name}> succeeded in "
              f"{time.time() - start:.1f}s")
    if report is not None and os.path.isdir(data_dir):
        report.write(data_dir)
    return ok


def main(argv=None) -> int:
    from facerec_tpu.runtime import ensure_platform

    ensure_platform()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--filmfile", type=str, required=True,
                        help="film path like 125261-name.mp4")
    parser.add_argument("--out-path", type=str, default=".")
    parser.add_argument("--actors-dir", type=str, default=None,
                        help="directory with actor-images.zip (enables "
                             "the classify stage)")
    parser.add_argument("--skip", type=str, default="",
                        help="comma-separated stage names to skip")
    parser.add_argument("--shard-procs", type=int, default=0,
                        help="run extract as N sequential per-shard "
                             "subprocesses (the reference's array-job "
                             "model; shards are resumable)")
    parser.add_argument("--mesh", type=int, default=0,
                        help="run extract as N simultaneous shard "
                             "spans on an N-device mesh (see extract "
                             "--mesh)")
    parser.add_argument("--facenet-weights", type=str, default=None,
                        help="directory with the four FaceNet "
                             "checkpoints (see extract --help)")
    parser.add_argument("--detector-weights", type=str, default=None,
                        help="orbax checkpoint dir of detector weights")
    parser.add_argument("--fetch-every-blocks", type=int, default=None,
                        help="extract transfer batching (see extract "
                             "--help); raise on high-latency links")
    parser.add_argument("--decode-workers", type=int, default=None,
                        help="parallel native decode workers for "
                             "extract")
    parser.add_argument("--wire-format", type=str, default=None,
                        choices=["rgb", "rgb-delta", "yuv420-delta"],
                        help="extract host→device pixel format (see "
                             "extract --help; rgb-delta is byte-exact "
                             "and wire-compressor-friendly, "
                             "yuv420-delta for transfer-bound hosts)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    import dataclasses as _dc

    pcfg = PipelineConfig()
    overrides = {k: v for k, v in (
        ("fetch_every_blocks", args.fetch_every_blocks),
        ("decode_workers", args.decode_workers),
        ("wire_format", args.wire_format)) if v is not None}
    if overrides:
        pcfg = _dc.replace(
            pcfg, extract=_dc.replace(pcfg.extract, **overrides))

    stages = build_stages(args.filmfile, args.out_path, pcfg,
                          actors_dir=args.actors_dir,
                          skip=args.skip.split(",") if args.skip else (),
                          shard_procs=args.shard_procs,
                          mesh=args.mesh,
                          detector_weights=args.detector_weights,
                          facenet_weights=args.facenet_weights)
    movie_id = movie_id_from_filename(args.filmfile)
    ok = run_pipeline(stages, verbose=args.verbose,
                      data_dir=os.path.join(args.out_path,
                                            f"{movie_id}-data"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
