"""Structured metrics, timing and profiling.

The reference's observability is unbuffered prints into SLURM logs
(SURVEY.md §5.1, §5.5); here every stage emits a machine-readable
summary — counters + wall time — merged into ``run_report.json`` in the
movie data dir, and the JAX profiler can be enabled per-stage with
``FACEREC_PROFILE_DIR`` for XLA-level traces.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Dict, Optional


def effective_env_knobs() -> Dict[str, object]:
    """Effective values of the environment A/B knobs (SURVEY.md §5.6).

    A recorded number is only reproducible if it carries its FULL
    effective configuration; these four knobs bypass ``ExtractConfig``
    (two are read at import time), so every stage report embeds them.
    For the import-time knobs the value is taken from the already-loaded
    module when present — the process's actual behaviour — falling back
    to the same env/default read the module would perform.
    """
    def from_module(mod_name: str, attr: str, fallback):
        mod = sys.modules.get(mod_name)
        return getattr(mod, attr, fallback) if mod is not None else fallback

    return {
        "tracker_unroll": from_module(
            "facerec_tpu.track.tracker", "SCAN_UNROLL",
            int(os.environ.get("FACEREC_TRACKER_UNROLL", "8"))),
        "eq_fold": from_module(
            "facerec_tpu.ops.pallas.equalize", "_PACK",
            int(os.environ.get("FACEREC_EQ_FOLD", "1"))),
        "resize": os.environ.get("FACEREC_RESIZE", "xla"),
        "seek_check": os.environ.get("FACEREC_SEEK_CHECK", "1") != "0",
        "stem_fold": from_module(
            "facerec_tpu.models.facenet", "_STEM_FOLD",
            os.environ.get("FACEREC_STEM_FOLD", "0") == "1"),
    }


class StageReport:
    """Counters + wall-clock for one stage run."""

    def __init__(self, stage: str):
        self.stage = stage
        self.counters: Dict[str, float] = {}
        self._start = time.time()

    def count(self, name: str, value: float = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + value

    def set(self, name: str, value) -> None:
        self.counters[name] = value

    def finish(self) -> dict:
        return {
            "stage": self.stage,
            "wall_seconds": round(time.time() - self._start, 3),
            "counters": self.counters,
            "env_knobs": effective_env_knobs(),
        }

    def write(self, data_dir: str) -> dict:
        """Merge this stage's summary into ``run_report.json``."""
        summary = self.finish()
        path = os.path.join(data_dir, "run_report.json")
        report = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    report = json.load(f)
            except (json.JSONDecodeError, OSError):
                report = {}
        report[self.stage] = summary
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1)
        os.replace(tmp, path)
        return summary


@contextlib.contextmanager
def maybe_profile(stage: str):
    """JAX profiler trace when FACEREC_PROFILE_DIR is set."""
    profile_dir = os.environ.get("FACEREC_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    out = os.path.join(profile_dir, stage)
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        yield
