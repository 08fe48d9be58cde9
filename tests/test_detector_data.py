"""WIDER-FACE-style loader + detector eval harness."""
import json
import os

import numpy as np
import pytest

from facerec_tpu.tools.detector_eval import (evaluate_detections,
                                             harness_predictions)
from facerec_tpu.train.widerface import WiderFaceDataset, parse_bbx_gt


@pytest.fixture
def wider_dir(tmp_path, rng):
    """A miniature WIDER-FACE tree: 5 images + bbx_gt annotations."""
    import cv2

    root = tmp_path / "images"
    (root / "0--Event").mkdir(parents=True)
    lines = []
    for i in range(5):
        name = f"0--Event/img_{i}.jpg"
        img = rng.integers(0, 255, (90 + 10 * i, 120, 3)).astype(np.uint8)
        cv2.imwrite(str(root / name), img)
        if i == 4:
            lines += [name, "0", "0 0 0 0 0 0 0 0 0 0"]
            continue
        boxes = [(10, 12, 30, 34, 0), (50 + i, 40, 20, 22, 0),
                 (5, 5, 12, 12, 1)]          # last one invalid
        lines.append(name)
        lines.append(str(len(boxes)))
        for x, y, w, h, inv in boxes:
            lines.append(f"{x} {y} {w} {h} 0 0 0 {inv} 0 0")
    ann = tmp_path / "bbx_gt.txt"
    ann.write_text("\n".join(lines) + "\n")
    return str(root), str(ann)


def test_parse_bbx_gt(wider_dir):
    _root, ann = wider_dir
    samples = parse_bbx_gt(ann)
    assert len(samples) == 5
    assert samples[0].boxes.shape == (3, 4)
    # xywh → xyxy
    np.testing.assert_array_equal(samples[0].boxes[0], [10, 12, 40, 46])
    assert samples[0].invalid.tolist() == [False, False, True]
    assert samples[4].boxes.shape == (0, 4)


def test_dataset_batches(wider_dir):
    root, ann = wider_dir
    ds = WiderFaceDataset(root, ann, input_size=(64, 64), max_boxes=8,
                          min_face=4)
    assert len(ds) == 4          # the empty image is dropped
    img, boxes, valid, content = ds.load(0)
    assert img.shape == (64, 64, 3)
    # image is 90x120 → scale 64/120; letterboxed at top-left
    scale = 64 / 120
    assert valid.sum() == 2      # invalid-flagged box filtered
    np.testing.assert_allclose(boxes[0], np.array([10, 12, 40, 46])
                               * scale, atol=1e-5)
    assert (boxes[valid][:, 2] <= 64).all()
    # letterboxed content area (anchors outside train as negatives)
    np.testing.assert_array_equal(content, [round(90 * scale), 64])

    it = ds.batches(2, np.random.default_rng(0))
    ims, bxs, vds, ldm, chw = next(it)
    assert ims.shape == (2, 64, 64, 3)
    assert bxs.shape == (2, 8, 4) and vds.shape == (2, 8)
    assert ldm.shape == (2, 8, 5, 2) and (ldm == 0).all()
    assert chw.shape == (2, 2) and (chw <= 64).all() and (chw > 0).all()


@pytest.mark.slow
def test_wider_train_step_runs(wider_dir, tmp_path):
    """One real optimizer step on WIDER-style data (landmark head
    frozen) and the checkpoint loads back into a harness."""
    import jax.numpy as jnp

    from facerec_tpu.models.load import load_detector_harness
    from facerec_tpu.train.widerface import train

    root, ann = wider_dir
    losses = train(root, ann, str(tmp_path / "ckpt"), steps=2,
                   batch_size=2, input_size=(64, 64), seed=0)
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
    h = load_detector_harness(str(tmp_path / "ckpt"),
                              input_size=(64, 64), max_detections=4,
                              score_threshold=0.5, min_face_size=4)
    det = h(jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert np.asarray(det.boxes).shape == (1, 4, 4)

    # default-on BN recalibration replaced the 2-step-stale running
    # statistics (0.995^2 of them would still be the init values)
    train(root, ann, str(tmp_path / "ckpt_raw"), steps=2,
          batch_size=2, input_size=(64, 64), seed=0, recalibrate=False)
    from facerec_tpu.models.weights import _flatten, load_params

    cal = _flatten(load_params(str(tmp_path / "ckpt")))
    raw = _flatten(load_params(str(tmp_path / "ckpt_raw")))
    stat_keys = [k for k in cal if k[0] == "batch_stats"]
    assert stat_keys
    assert any(not np.allclose(np.asarray(cal[k]), np.asarray(raw[k]))
               for k in stat_keys)
    # params themselves are identical — recalibration touches only stats
    for k in (k for k in cal if k[0] == "params"):
        np.testing.assert_array_equal(np.asarray(cal[k]),
                                      np.asarray(raw[k]))


def test_evaluate_detections_perfect_and_degraded():
    truth = {0: [[10, 10, 40, 45], [60, 60, 75, 76]],   # 30px, 15px
             5: [[0, 0, 100, 100]]}                      # 100px
    perfect = {f: [(b, 0.99) for b in bs] for f, bs in truth.items()}
    m = evaluate_detections(perfect, truth)
    assert m["precision"] == 1.0 and m["recall"] == 1.0
    assert m["mean_matched_iou"] == 1.0
    assert m["recall_by_size"] == {"0-20px": 1.0, "20-50px": 1.0,
                                   "50-px": 1.0}
    assert m["truth_by_size"] == {"0-20px": 1, "20-50px": 1, "50-px": 1}

    # drop the small face, add one false positive
    preds = {0: [([10, 10, 40, 45], 0.9), ([200, 200, 240, 240], 0.8)],
             5: [([0, 0, 100, 100], 0.99)]}
    m = evaluate_detections(preds, truth)
    assert m["n_matched"] == 2 and m["n_pred"] == 3
    assert m["recall_by_size"]["0-20px"] == 0.0
    assert m["recall_by_size"]["20-50px"] == 1.0
    assert m["recall"] == round(2 / 3, 4)


def test_harness_predictions_batching(rng):
    """harness_predictions drives any Detections-returning callable."""
    from facerec_tpu.models.detector import Detections

    class Fake:
        def __call__(self, frames):
            import jax.numpy as jnp

            b = frames.shape[0]
            boxes = jnp.tile(jnp.asarray([[1.0, 2, 3, 4]]), (b, 1))[:, None]
            return Detections(boxes, jnp.full((b, 1), 0.7),
                              jnp.zeros((b, 1, 5, 2)),
                              jnp.ones((b, 1), bool))

    frames = [(i, rng.integers(0, 255, (8, 8, 3)).astype(np.uint8))
              for i in range(5)]
    preds = harness_predictions(Fake(), frames, batch=2)
    assert set(preds) == {0, 1, 2, 3, 4}
    assert preds[3] == [([1.0, 2.0, 3.0, 4.0], 0.699999988079071)]
