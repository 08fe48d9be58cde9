"""Crash/resume: interrupted extract resumes to byte-identical output."""
import dataclasses
import json
import os

import pytest

from facerec_tpu.config import ExtractConfig
from facerec_tpu.pipeline.extract import run_extract
from facerec_tpu.video.synth import ScriptedDetector, make_clip
from tests.test_extract_e2e import StubEmbedderBank


class CrashingDetector(ScriptedDetector):
    def __init__(self, clip, crash_at_frame, **kw):
        super().__init__(clip, **kw)
        self.crash_at_frame = crash_at_frame

    def __call__(self, frames):
        if self._frame0 >= self.crash_at_frame:
            raise RuntimeError("injected crash")
        return super().__call__(frames)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ck") / "9-ck.mp4")
    return make_clip(path, n_frames=48, cuts=(24,), seed=11)


def run(clip, out, detector, checkpoint_every=0, resume=True):
    cfg = ExtractConfig(block_frames=8, max_detections=8, max_tracks=16,
                        checkpoint_every_blocks=checkpoint_every,
                        resume=resume, save_images=False)
    return run_extract(clip.path, cfg, out, detector=detector,
                       embedders=StubEmbedderBank())


def read_outputs(out):
    d = f"{out}/9-data"
    return {
        "traj": open(f"{d}/trajectories/trajectories_9_0-48.jsonl",
                     "rb").read(),
        "feat": open(f"{d}/features/features_9_0-48.jsonl", "rb").read(),
        "sc": open(f"{d}/scene_changes/scene_changes_9_0-48.json",
                   "rb").read(),
    }


@pytest.mark.slow
def test_crash_resume_byte_identical(clip, tmp_path):
    clean = str(tmp_path / "clean")
    run(clip, clean, ScriptedDetector(clip, max_detections=8))
    want = read_outputs(clean)

    crashed = str(tmp_path / "crashed")
    with pytest.raises(RuntimeError, match="injected crash"):
        run(clip, crashed,
            CrashingDetector(clip, crash_at_frame=30, max_detections=8),
            checkpoint_every=1)
    # checkpoint left behind
    ckpts = [f for f in os.listdir(f"{crashed}/9-data")
             if f.endswith(".ckpt")]
    assert ckpts

    run(clip, crashed, ScriptedDetector(clip, max_detections=8),
        checkpoint_every=1)
    got = read_outputs(crashed)
    assert got == want
    # checkpoint cleaned up, done marker present
    files = os.listdir(f"{crashed}/9-data")
    assert not any(f.endswith(".ckpt") for f in files)
    assert any(f.endswith(".done") for f in files)


def test_done_marker_skips_rerun(clip, tmp_path):
    out = str(tmp_path / "out")
    c1 = run(clip, out, ScriptedDetector(clip, max_detections=8))
    assert c1.frames_processed == 48
    c2 = run(clip, out, ScriptedDetector(clip, max_detections=8))
    assert c2.frames_processed == 0  # skipped


def test_run_report_written(clip, tmp_path):
    out = str(tmp_path / "rep")
    run(clip, out, ScriptedDetector(clip, max_detections=8))
    report = json.load(open(f"{out}/9-data/run_report.json"))
    (stage,) = report.keys()
    assert stage.startswith("extract_")
    assert report[stage]["counters"]["frames_processed"] == 48
    assert report[stage]["wall_seconds"] > 0
    # the per-phase wall breakdown the bench's "phases:" line reads
    for p in ("decode", "dispatch", "upload", "fetch", "consume",
              "flush_dispatch"):
        assert f"{p}_seconds" in report[stage]["counters"], p
    # every report carries the effective env A/B knobs (SURVEY §5.6):
    # the import-time values come from the loaded modules, so the
    # recorded run's full effective config is in the artifact
    from facerec_tpu.ops.pallas import equalize
    from facerec_tpu.track import tracker

    knobs = report[stage]["env_knobs"]
    assert knobs["tracker_unroll"] == tracker.SCAN_UNROLL
    assert knobs["eq_fold"] == equalize._PACK
    assert knobs["resize"] in ("xla", "periodic")
    assert isinstance(knobs["seek_check"], bool)
