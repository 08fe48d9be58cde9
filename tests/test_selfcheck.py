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


def test_score_whole_frame_misses_hit_recall(tmp_path):
    """Recall counts truth on every feature-cadence frame: a frame with
    zero predictions still contributes its truth boxes."""
    truth = {
        0: [(np.array([0, 0, 10, 10], np.float32), None)],   # missed
        3: [(np.array([0, 0, 10, 10], np.float32), None)],   # off-cadence
        5: [(np.array([0, 0, 10, 10], np.float32), None),
            (np.array([20, 20, 40, 40], np.float32), None)],
    }
    _write_features(tmp_path, [
        {"frame": 5, "box": [0, 0, 10, 10]},
        {"frame": 5, "box": [21, 21, 41, 41]},
    ])
    rep = score_detections(str(tmp_path), truth, save_every=5)
    assert rep["n_matched"] == 2
    assert rep["precision"] == 1.0
    assert rep["recall"] == round(2 / 3, 3)


def test_cluster_purity_excludes_unknown():
    from facerec_tpu.tools.selfcheck import cluster_purity

    # cluster 0: identities {1, 1}; cluster 1: all unknown (-1)
    purity, majority = cluster_purity([0, 0, 1, 1], [1, 1, -1, -1])
    assert purity == 1.0
    assert majority == {0: 1, 1: -1}
    # nothing known at all → purity is None, not a perfect score
    purity, _ = cluster_purity([0, 0], [-1, -1])
    assert purity is None


def test_check_gates_pass_and_fail():
    from facerec_tpu.tools.selfcheck import check_gates

    good = {
        "detection": {"precision": 0.95, "recall": 0.93},
        "cluster_purity": 1.0,
        "classify_accuracy": 1.0,
        "scene_cuts_found": [80, 160],
        "scene_cuts_truth": [80, 160],
    }
    assert check_gates(good) == []

    bad = {
        "detection": {"precision": 0.5, "recall": 0.93},
        "cluster_purity": 0.6,
        "classify_accuracy": None,
        "scene_cuts_found": [80],
        "scene_cuts_truth": [80, 160],
    }
    failures = check_gates(bad)
    joined = "\n".join(failures)
    assert "precision" in joined
    assert "purity" in joined
    assert "accuracy" in joined and "missing" in joined
    assert "scene cut 160" in joined
    assert len(failures) == 4

    # thresholds are tunable
    assert check_gates(bad, min_precision=0.4, min_purity=0.5,
                       min_accuracy=0.0) != []  # accuracy None still fails
