"""Crop/resize vs OpenCV; NMS vs a numpy oracle."""
import cv2
import numpy as np
import jax.numpy as jnp

from facerec_tpu.ops.crops import crop_resize
from facerec_tpu.ops.nms import nms
from facerec_tpu.ops.boxes import iou_matrix


def test_crop_resize_matches_cv2(rng):
    frames = rng.integers(0, 255, (2, 60, 80, 3)).astype(np.uint8)
    boxes = np.array([[10, 5, 50, 45], [20, 10, 70, 55]], np.float32)
    fidx = np.array([0, 1], np.int32)
    out = np.asarray(crop_resize(jnp.asarray(frames), jnp.asarray(fidx),
                                 jnp.asarray(boxes), 32))
    for i in range(2):
        x1, y1, x2, y2 = boxes[i].astype(int)
        want = cv2.resize(frames[fidx[i], y1:y2, x1:x2].astype(np.float32),
                          (32, 32), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(out[i], want, atol=1.0)


def test_crop_resize_edge_clamp(rng):
    frames = rng.integers(0, 255, (1, 40, 40, 3)).astype(np.uint8)
    # box partially outside the frame: must not NaN or crash
    boxes = np.array([[-10, -10, 30, 30]], np.float32)
    out = np.asarray(crop_resize(jnp.asarray(frames),
                                 jnp.zeros(1, np.int32),
                                 jnp.asarray(boxes), 16))
    assert np.isfinite(out).all()


def oracle_nms(boxes, scores, thresh):
    order = list(np.argsort(-scores))
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if scores[i] <= -1e29 or not alive[i]:
            continue
        keep.append(i)
        ious = np.asarray(iou_matrix(jnp.asarray(boxes[i][None]),
                                     jnp.asarray(boxes)))[0]
        alive &= ~(ious > thresh)
    return keep


def test_nms_matches_oracle(rng):
    n = 64
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 200, n)
    boxes[:, 1] = rng.uniform(0, 200, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(10, 60, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(10, 60, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4, 16)
    got = np.asarray(idx)[np.asarray(valid)].tolist()
    want = oracle_nms(boxes, scores, 0.4)[:16]
    assert got == want


def test_nms_all_invalid():
    boxes = jnp.zeros((8, 4), jnp.float32)
    scores = jnp.full((8,), -1e30, jnp.float32)
    _, valid = nms(boxes, scores, 0.4, 4)
    assert not np.asarray(valid).any()


def test_pose_frontalness():
    import jax.numpy as jnp

    from facerec_tpu.ops.pose import frontalness, is_frontal

    frontal = jnp.asarray([[[10.0, 10], [30, 10], [20, 20],
                            [13, 28], [27, 28]]])
    profile = jnp.asarray([[[10.0, 10], [30, 10], [29, 20],
                            [13, 28], [27, 28]]])
    degenerate = jnp.asarray([[[10.0, 10], [10, 10], [10, 20],
                               [10, 28], [10, 28]]])
    s = frontalness(jnp.concatenate([frontal, profile, degenerate]))
    assert float(s[0]) > 0.9
    assert float(s[1]) < 0.2
    assert float(s[2]) == 0.0
    assert is_frontal(frontal)[0]
