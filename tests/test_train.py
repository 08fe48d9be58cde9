"""Detector training: target assignment sanity + loss decreases +
mesh-sharded step runs on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facerec_tpu.models.detector import FaceDetector, anchor_centers
from facerec_tpu.parallel import frame_mesh
from facerec_tpu.train import DetectorTrainer, anchor_targets


SIZE = (64, 64)


def make_batch(rng, b):
    images = rng.integers(0, 255, (b, *SIZE, 3)).astype(np.uint8)
    g = 2
    boxes = np.zeros((b, g, 4), np.float32)
    valid = np.zeros((b, g), bool)
    ldm = np.zeros((b, g, 5, 2), np.float32)
    for i in range(b):
        x, y = rng.uniform(4, 20, 2)
        w = rng.uniform(12, 30)
        boxes[i, 0] = [x, y, x + w, y + w]
        valid[i, 0] = True
        ldm[i, 0] = np.stack([np.linspace(x, x + w, 5),
                              np.linspace(y, y + w, 5)], -1)
        # paint the "face"
        images[i, int(y):int(y + w), int(x):int(x + w)] = 220
    return (jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(valid),
            jnp.asarray(ldm))


def test_anchor_targets_assign(rng):
    anchors = jnp.asarray(anchor_centers(SIZE))
    gt = jnp.asarray([[6.0, 6.0, 38.0, 38.0], [0, 0, 0, 0]])
    valid = jnp.asarray([True, False])
    t = anchor_targets(anchors, gt, valid)
    labels = np.asarray(t.labels)
    assert (labels == 1).sum() >= 1           # someone claims the face
    assert (labels == 0).sum() > len(labels) // 2  # mostly negatives
    # positive anchors decode back near the gt center
    pos = np.where(labels == 1)[0]
    a = np.asarray(anchors)[pos]
    bt = np.asarray(t.box_targets)[pos]
    cx = a[:, 0] + bt[:, 0] * 0.1 * a[:, 2]
    assert np.all(np.abs(cx - 22.0) < 1.0)


def test_train_step_decreases_loss(rng):
    trainer = DetectorTrainer(FaceDetector(fpn_features=16),
                              input_size=SIZE, learning_rate=1e-3)
    params, opt_state = trainer.init()
    batch = make_batch(rng, 4)
    losses = []
    for _ in range(5):
        params, opt_state, loss = trainer.step(params, opt_state, *batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_train_step_sharded(rng):
    mesh = frame_mesh()
    trainer = DetectorTrainer(FaceDetector(fpn_features=16),
                              input_size=SIZE, mesh=mesh)
    params, opt_state = trainer.init()
    batch = make_batch(rng, 8)
    params, opt_state, loss = trainer.step(params, opt_state, *batch)
    assert np.isfinite(float(loss))
