"""Device tracker scan + host assembler vs the sequential SORT oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from facerec_tpu.track import (TrackerConfig, TrajectoryAssembler,
                               init_tracker, run_block)
from tests.oracles import oracle_extract_loop


def simulate_stream(rng, n_frames=120, width=320, height=240, max_det=8,
                    p_cut=0.02, p_miss=0.15, n_objects=4):
    """Objects drifting with noise; random appear/disappear; scene cuts."""
    objs = []
    det_stream = []
    scene_flags = np.zeros(n_frames, bool)
    for f in range(n_frames):
        if f > 2 and rng.uniform() < p_cut:
            scene_flags[f] = True
            objs = []
        while len(objs) < n_objects and rng.uniform() < 0.3:
            w = rng.uniform(20, 60)
            h = rng.uniform(20, 60)
            x = rng.uniform(0, width - w)
            y = rng.uniform(0, height - h)
            objs.append(np.array([x, y, x + w, y + h,
                                  rng.uniform(-3, 3), rng.uniform(-3, 3)]))
        objs = [o for o in objs if rng.uniform() > 0.02]
        dets = []
        for o in objs:
            o[:4] += np.array([o[4], o[5], o[4], o[5]])
            if rng.uniform() > p_miss:
                jitter = rng.normal(0, 1.0, 4)
                dets.append(np.clip(o[:4] + jitter, 0,
                                    [width, height, width, height]))
        rng.shuffle(dets)
        det_stream.append([d for d in dets[:max_det]])
    return det_stream, scene_flags


def run_device(det_stream, scene_flags, width, height, cfg, block=16):
    n = len(det_stream)
    d = cfg.max_detections
    boxes = np.zeros((n, d, 4), np.float32)
    valid = np.zeros((n, d), bool)
    for f, dets in enumerate(det_stream):
        for i, b in enumerate(dets):
            boxes[f, i] = b
            valid[f, i] = True

    state = init_tracker(cfg)
    asm = TrajectoryAssembler(width, height, min_hits=cfg.min_hits,
                              expiry_age=2 * cfg.min_hits)
    out = []
    for f0 in range(0, n, block):
        f1 = min(f0 + block, n)
        state, emit = run_block(
            cfg, state,
            jnp.asarray(boxes[f0:f1]), jnp.asarray(valid[f0:f1]),
            jnp.asarray(scene_flags[f0:f1]), jnp.int32(f0))
        out.extend(asm.feed(emit, f0))
    out.extend(asm.finish())
    return out, asm


@pytest.mark.parametrize("seed,block", [(0, 16), (1, 7), (2, 120), (3, 1)])
@pytest.mark.slow
def test_matches_oracle(seed, block):
    rng = np.random.default_rng(seed)
    width, height = 320, 240
    det_stream, scene_flags = simulate_stream(rng, width=width, height=height)

    want, _ = oracle_extract_loop(det_stream, scene_flags, width, height)

    cfg = TrackerConfig(max_tracks=16, max_detections=8)
    got, asm = run_device(det_stream, scene_flags, width, height, cfg, block)

    assert asm.overflow == 0
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g["start"] == w["start"]
        assert g["len"] == w["len"]
        assert g["detected"] == w["detected"]
        assert g["object_type"] == w["object_type"]
        # float32-batched vs float64-scalar Kalman: int boxes may differ
        # by 1 px at rounding boundaries
        np.testing.assert_allclose(np.array(g["bbs"]), np.array(w["bbs"]),
                                   atol=1)


@pytest.mark.slow
def test_face_validity_matches_oracle():
    rng = np.random.default_rng(7)
    width, height = 320, 240
    det_stream, scene_flags = simulate_stream(rng, n_frames=60,
                                              width=width, height=height)
    _, oracle = oracle_extract_loop(det_stream, scene_flags, width, height)

    cfg = TrackerConfig(max_tracks=16, max_detections=8)
    n = len(det_stream)
    d = cfg.max_detections
    boxes = np.zeros((n, d, 4), np.float32)
    valid = np.zeros((n, d), bool)
    for f, dets in enumerate(det_stream):
        for i, b in enumerate(dets):
            boxes[f, i] = b
            valid[f, i] = True

    state = init_tracker(cfg)
    asm = TrajectoryAssembler(width, height)
    state, emit = run_block(cfg, state, jnp.asarray(boxes),
                            jnp.asarray(valid), jnp.asarray(scene_flags),
                            jnp.int32(0))
    asm.feed(emit, 0)
    asm.finish()

    det_slot = np.asarray(emit.det_slot)
    uid = np.asarray(emit.uid)
    n_checked = 0
    for f in range(n):
        for i in range(len(det_stream[f])):
            slot = det_slot[f, i]
            assert slot >= 0
            u = int(uid[f, slot])
            got = asm.track_valid(u)
            want = oracle.face_valid(f, i)
            assert got == want, (f, i, u, got, want)
            n_checked += 1
    assert n_checked > 50


def test_overflow_counted():
    cfg = TrackerConfig(max_tracks=2, max_detections=4)
    state = init_tracker(cfg)
    boxes = np.zeros((1, 4, 4), np.float32)
    for i in range(4):
        boxes[0, i] = [i * 50, 0, i * 50 + 40, 40]
    state, emit = run_block(cfg, state, jnp.asarray(boxes),
                            jnp.ones((1, 4), bool),
                            jnp.zeros((1,), bool), jnp.int32(0))
    assert int(np.asarray(emit.overflow)[0]) == 2
