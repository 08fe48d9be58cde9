"""Sharded extract step on the 8-device CPU mesh vs serial results."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facerec_tpu.models.detector import Detections
from facerec_tpu.ops import scene as scene_ops
from facerec_tpu.parallel import frame_mesh, sharded_extract_step
from facerec_tpu.parallel.extract_sharded import UID_STRIDE
from facerec_tpu.track import TrackerConfig
from tests.test_scene import make_clip


class BrightBoxDetector:
    """Deterministic pure-JAX detector: one fixed-position probe box per
    frame whose validity depends on mean brightness — traceable inside
    shard_map."""

    def __init__(self, d=4):
        self.d = d

    def __call__(self, frames):
        b = frames.shape[0]
        mean = frames.astype(jnp.float32).mean(axis=(1, 2, 3))
        boxes = jnp.tile(jnp.asarray([8.0, 8.0, 40.0, 40.0]), (b, self.d, 1))
        valid = jnp.zeros((b, self.d), bool).at[:, 0].set(mean > 0)
        scores = jnp.where(valid, 0.99, 0.0)
        ldm = jnp.zeros((b, self.d, 5, 2), jnp.float32)
        return Detections(boxes, scores, ldm, valid)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return frame_mesh()


@pytest.mark.slow
def test_sharded_scene_matches_serial(mesh, rng):
    frames = make_clip(rng, n=32, h=48, w=64, n_cuts=4)
    serial, _ = scene_ops.detect_block(
        jnp.asarray(frames), scene_ops.initial_state(48, 64))

    out = sharded_extract_step(
        mesh, BrightBoxDetector(), TrackerConfig(max_tracks=4,
                                                 max_detections=4),
        jnp.asarray(frames))
    np.testing.assert_array_equal(np.asarray(out.flags),
                                  np.asarray(serial))


@pytest.mark.slow
def test_sharded_tracker_uid_namespaces(mesh, rng):
    frames = make_clip(rng, n=16, h=48, w=64, n_cuts=0)
    out = sharded_extract_step(
        mesh, BrightBoxDetector(), TrackerConfig(max_tracks=4,
                                                 max_detections=4),
        jnp.asarray(frames))
    uid = np.asarray(out.emit.uid)
    emit = np.asarray(out.emit.emit)
    local = 16 // 8
    for dev in range(8):
        sl = uid[dev * local:(dev + 1) * local][
            emit[dev * local:(dev + 1) * local]]
        if sl.size:
            assert (sl // UID_STRIDE == dev).all()


@pytest.mark.slow
def test_sharded_detections_match_serial(mesh, rng):
    frames = make_clip(rng, n=16, h=48, w=64)
    det = BrightBoxDetector()
    serial = det(jnp.asarray(frames))
    out = sharded_extract_step(
        mesh, det, TrackerConfig(max_tracks=4, max_detections=4),
        jnp.asarray(frames))
    np.testing.assert_array_equal(np.asarray(out.detections.valid),
                                  np.asarray(serial.valid))
    np.testing.assert_allclose(np.asarray(out.detections.boxes),
                               np.asarray(serial.boxes))


@pytest.mark.slow
def test_sharded_scene_mid_film_warmup(mesh, rng):
    """With block_frame0 > 0 device 0 has no left halo; its first two
    local frames must warm up (stay False) exactly like a fresh serial
    shard — not flag on garbage statistics."""
    frames = make_clip(rng, n=32, h=48, w=64, n_cuts=4)
    serial, _ = scene_ops.detect_block(
        jnp.asarray(frames), scene_ops.initial_state(48, 64))

    out = sharded_extract_step(
        mesh, BrightBoxDetector(), TrackerConfig(max_tracks=4,
                                                 max_detections=4),
        jnp.asarray(frames), block_frame0=1000)
    np.testing.assert_array_equal(np.asarray(out.flags),
                                  np.asarray(serial))
