"""Pinned CI quality budget: deploy the COMMITTED probe detector.

VERDICT r4 next-step #7: the selfcheck's absolute >=0.9 gates are
calibrated for a fuller training budget than CI can afford, so the
reduced-scale CI path previously ran with the gates off — a detection
quality regression could ride through on the ratio argument alone.

The fix pins the budget on both sides of the train/deploy split:

* Training happens ONCE, on-chip, at the pinned probe budget
  (``scripts/make_probe_fixture.py`` records the exact command), and
  the trained detector is committed as
  ``tests/data/probe_detector_w96.npz`` (f16, single-file npz).
* THIS test replays the deploy half only — the same synthetic film the
  probe was scored on, through the real extract path (letterbox →
  detector → NMS → tracker → feature records) with the committed
  weights — and enforces gates calibrated against the committed
  fixture's recorded scores (docs/DESIGN.md "Pinned CI quality
  budget").  No training runs in CI; a deploy-path regression fails
  loudly at probe scale.

Reference point: the reference has no automated QA at all
(/root/reference — SURVEY.md §4); this is the rebuild's replacement.
"""
import json
import os

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "probe_detector_w96.npz")

# Pinned probe budget (must match scripts/make_probe_fixture.py).
FILM_W, FILM_H, FRAMES, IDENTITIES, DET_SIZE = 384, 288, 180, 3, 384

# Gates calibrated against the committed fixture's recorded deploy
# (docs/DESIGN.md "Pinned CI quality budget": precision 1.0 / recall
# 0.861, IDENTICAL on the TPU train host and the CPU CI replay of the
# f16 fixture); the margin below absorbs compiler-version numeric
# drift only.  Regenerating the fixture requires re-reading the
# printed scores and recalibrating.
MIN_PRECISION = 0.9
MIN_RECALL = 0.8


@pytest.mark.slow
def test_committed_probe_detector_meets_pinned_gates(tmp_path):
    from facerec_tpu.config import ExtractConfig
    from facerec_tpu.models.detector import DetectorHarness
    from facerec_tpu.models.weights import load_params_npz
    from facerec_tpu.pipeline import merge as merge_mod
    from facerec_tpu.pipeline.extract import run_extract
    from facerec_tpu.tools.selfcheck import score_detections
    from facerec_tpu.video.synth import make_clip
    from tests.test_extract_e2e import StubEmbedderBank

    assert os.path.exists(FIXTURE), (
        "committed probe fixture missing; regenerate with "
        "scripts/make_probe_fixture.py")

    harness = DetectorHarness.create(
        backbone_width=96, input_size=(DET_SIZE, DET_SIZE),
        max_detections=16, score_threshold=0.9, min_face_size=20)
    harness.variables = load_params_npz(FIXTURE, harness.variables)

    # The same film selfcheck deploys on (make_clip is deterministic
    # for a given seed — selfcheck uses the default seed 0).
    clip = make_clip(str(tmp_path / "777-Probe_Film.mp4"),
                     n_frames=FRAMES, width=FILM_W, height=FILM_H,
                     cuts=(FRAMES // 3, 2 * FRAMES // 3), n_faces=2,
                     identities=IDENTITIES)
    data_root = str(tmp_path / "data")
    run_extract(clip.path,
                ExtractConfig(face_threshold=0.9, resume=False,
                              save_images=False),
                data_root, detector=harness,
                embedders=StubEmbedderBank())

    merge_mod.main(["--path", os.path.join(data_root, "*-data"),
                    "--min-face-size", "20"])
    data_dir = os.path.join(data_root, "777-data")
    det = score_detections(data_dir, clip.truth)
    cuts = json.load(open(os.path.join(
        data_dir, "scene_changes.json")))["frame_indices"]
    print(f"probe deploy scores: {det} cuts={cuts} "
          f"truth={clip.scene_cuts}")

    assert det["precision"] >= MIN_PRECISION, det
    assert det["recall"] >= MIN_RECALL, det
    for cut in clip.scene_cuts:
        assert cut in cuts, (cut, cuts)
