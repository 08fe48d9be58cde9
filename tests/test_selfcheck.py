"""Selfcheck scoring helpers (pure host logic)."""
import json
import numpy as np

from facerec_tpu.tools.selfcheck import score_detections


def _write_features(tmp_path, recs):
    with open(tmp_path / "features.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


def test_score_one_to_one(tmp_path):
    truth = {0: [(np.array([0, 0, 10, 10], np.float32), None)]}
    # two predictions on the same single truth box: only one may match
    _write_features(tmp_path, [
        {"frame": 0, "box": [0, 0, 10, 10]},
        {"frame": 0, "box": [1, 1, 11, 11]},
    ])
    rep = score_detections(str(tmp_path), truth)
    assert rep["n_pred"] == 2 and rep["n_matched"] == 1
    assert rep["precision"] == 0.5 and rep["recall"] == 1.0


def test_score_counts_truth_only_on_predicted_frames(tmp_path):
    truth = {
        0: [(np.array([0, 0, 10, 10], np.float32), None)],
        5: [(np.array([0, 0, 10, 10], np.float32), None),
            (np.array([20, 20, 40, 40], np.float32), None)],
    }
    _write_features(tmp_path, [
        {"frame": 5, "box": [0, 0, 10, 10]},
        {"frame": 5, "box": [21, 21, 41, 41]},
    ])
    rep = score_detections(str(tmp_path), truth)
    assert rep["n_matched"] == 2
    assert rep["precision"] == 1.0 and rep["recall"] == 1.0
