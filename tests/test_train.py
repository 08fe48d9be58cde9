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
    from facerec_tpu.video.synth import synth_batch

    frames, boxes, valid, ldm = synth_batch(
        rng, b, SIZE[1], SIZE[0], max_faces=2, face_size=(12.0, 30.0))
    return (jnp.asarray(frames), jnp.asarray(boxes), jnp.asarray(valid),
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_train_step_sharded(rng):
    mesh = frame_mesh()
    trainer = DetectorTrainer(FaceDetector(fpn_features=16),
                              input_size=SIZE, mesh=mesh)
    params, opt_state = trainer.init()
    batch = make_batch(rng, 8)
    params, opt_state, loss = trainer.step(params, opt_state, *batch)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_training_updates_batch_stats(rng):
    """BN must run in batch mode during training: the running mean moves
    away from its zero init (it stayed frozen before the train-flag
    plumbing)."""
    trainer = DetectorTrainer(FaceDetector(fpn_features=16),
                              input_size=SIZE, learning_rate=1e-3)
    variables, opt_state = trainer.init()
    stats0 = [np.asarray(s) for s in
              jax.tree.leaves(variables["batch_stats"])]
    batch = make_batch(rng, 4)
    variables, opt_state, _ = trainer.step(variables, opt_state, *batch)
    stats1 = [np.asarray(s) for s in
              jax.tree.leaves(variables["batch_stats"])]
    assert any(not np.array_equal(a, b) for a, b in zip(stats0, stats1))
