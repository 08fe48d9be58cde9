"""Golden parity against the ACTUAL reference implementation.

tests/oracles.py re-derives reference semantics; these tests instead
execute the code at /root/reference/facerec (via tests/refimpl.py) on
identical inputs and diff the outputs — scene decisions, tracker
trajectories, shard merging (byte-for-byte), clustering and KNN
classification (byte-for-byte).  A misunderstanding shared by our
implementation and the hand-written oracle fails here.
"""
import json
import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from facerec_tpu.config import (ClassifyConfig, ClusterConfig, ExtractConfig,
                                MergeConfig)
from facerec_tpu.ops import scene as scene_ops
from facerec_tpu.pipeline.extract import run_extract
from facerec_tpu.pipeline.merge import run_merge
from facerec_tpu.track import TrackerConfig
from facerec_tpu.video.synth import ScriptedDetector, make_clip
from tests.oracles import oracle_extract_loop
from tests.refimpl import load_ref, reference_extract_tracks
from tests.test_extract_e2e import StubEmbedderBank
from tests.test_tracker import run_device, simulate_stream


# ---------------------------------------------------------------------------
# scene.py


def _decode_frames(path):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(frame[..., ::-1].copy())  # BGR → RGB
    cap.release()
    return np.stack(frames)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ref") / "125261-RefParity.mp4")
    return make_clip(path, n_frames=60, cuts=(20, 41), seed=13)


def test_scene_parity(clip):
    """Our block scene detector flags == reference
    SceneChangeDetector.update flags, frame for frame
    (/root/reference/facerec/scene.py:81-136)."""
    ref_scene = load_ref("scene")
    frames = _decode_frames(clip.path)
    n, h, w = frames.shape[:3]

    det = ref_scene.SceneChangeDetector(grayscale=False, crop=True,
                                        movie_id=0)
    want = np.array([det.update(f) for f in frames])

    state = scene_ops.initial_state(h, w, crop=True)
    got = []
    for f0 in range(0, n, 16):
        flags, state = scene_ops.detect_block(
            jnp.asarray(frames[f0:f0 + 16]), state)
        got.extend(np.asarray(flags).tolist())
    got = np.array(got)

    np.testing.assert_array_equal(got, want)
    assert want.nonzero()[0].tolist() == list(clip.scene_cuts)


# ---------------------------------------------------------------------------
# sort.py


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_tracker_parity(seed):
    """Our tracker scan == the real reference Sort driven through
    extract.py's frame loop (/root/reference/facerec/sort.py:226-378)."""
    rng = np.random.default_rng(seed)
    width, height = 320, 240
    det_stream, scene_flags = simulate_stream(rng, width=width,
                                              height=height)

    want, _ = reference_extract_tracks(det_stream, scene_flags, width,
                                       height)

    cfg = TrackerConfig(max_tracks=16, max_detections=8)
    got, asm = run_device(det_stream, scene_flags, width, height, cfg)

    assert asm.overflow == 0
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g["start"] == w["start"]
        assert g["len"] == w["len"]
        assert g["detected"] == w["detected"]
        # float32-batched vs float64-scalar Kalman: int boxes may differ
        # by 1 px at rounding boundaries
        np.testing.assert_allclose(np.array(g["bbs"]), np.array(w["bbs"]),
                                   atol=1)


@pytest.mark.parametrize("seed", [4, 5])
def test_oracle_matches_reference(seed):
    """tests/oracles.py (used throughout the suite) is itself validated
    against the real reference Sort — no shared-misunderstanding gap."""
    rng = np.random.default_rng(seed)
    width, height = 320, 240
    det_stream, scene_flags = simulate_stream(rng, width=width,
                                              height=height)
    want, _ = reference_extract_tracks(det_stream, scene_flags, width,
                                       height)
    got, _ = oracle_extract_loop(det_stream, scene_flags, width, height)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["start"], g["len"], g["detected"]) == \
            (w["start"], w["len"], w["detected"])
        np.testing.assert_allclose(np.array(g["bbs"]), np.array(w["bbs"]),
                                   atol=1)


# ---------------------------------------------------------------------------
# merge_shards.py


def _read_bytes(path):
    with open(path, "rb") as f:
        return f.read()


def test_merge_parity_byte_identical(clip, tmp_path):
    """The real merge_shards.merge and our run_merge(strict_start=True)
    produce byte-identical trajectories.jsonl / features.jsonl /
    scene_changes.json from OUR shard files
    (/root/reference/facerec/merge_shards.py:137-276)."""
    ref_merge = load_ref("merge_shards")

    out = str(tmp_path / "out")
    for i in range(3):
        cfg = ExtractConfig(n_shards=3, shard_i=i, block_frames=16,
                            max_detections=8, max_tracks=16)
        run_extract(clip.path, cfg, out,
                    detector=ScriptedDetector(clip, max_detections=8),
                    embedders=StubEmbedderBank())
    data = f"{out}/125261-data"
    ref_dir = str(tmp_path / "refcopy")
    shutil.copytree(data, ref_dir)

    # synthetic faces are 28-44 px; reference default 50 removes all
    ref_merge.merge(ref_dir, 125261, iou_threshold=0.5, overlap=5,
                    min_face_size=20)
    run_merge(data, 125261, MergeConfig(min_face_size=20,
                                        strict_start=True))

    for name in ("trajectories.jsonl", "features.jsonl",
                 "scene_changes.json"):
        assert _read_bytes(os.path.join(data, name)) == \
            _read_bytes(os.path.join(ref_dir, name)), name
    assert _read_bytes(os.path.join(data, "trajectories.jsonl"))


def test_merge_consumes_reference_written_shards(tmp_path):
    """Shard files produced by reference semantics (real Sort + real
    bbox_float_to_int) merge identically under both mergers — the
    interchangeability claim in merge.py:6-8."""
    ref_merge = load_ref("merge_shards")
    rng = np.random.default_rng(17)
    width, height = 192, 144
    det_stream, scene_flags = simulate_stream(
        rng, n_frames=60, width=width, height=height, n_objects=3)

    data = str(tmp_path / "321-data")
    for sub in ("trajectories", "scene_changes", "features", "images"):
        os.makedirs(os.path.join(data, sub))

    # three reference-driven shards with the reference's 5-frame overlap
    shard_len, max_age = 20, 5
    for i in range(3):
        beg = i * shard_len
        end = min(beg + shard_len, 60)
        stop = min(end + max_age, 60)
        trajs, _ = reference_extract_tracks(
            det_stream[beg:stop], scene_flags[beg:stop], width, height)
        with open(os.path.join(
                data, "trajectories",
                f"trajectories_321_{beg}-{end}.jsonl"), "w") as f:
            for t in trajs:
                t = dict(t, start=t["start"] + beg)
                json.dump(t, f, indent=None, separators=(",", ":"))
                f.write("\n")
        cuts = [f for f in range(beg, stop) if scene_flags[f]]
        with open(os.path.join(
                data, "scene_changes",
                f"scene_changes_321_{beg}-{end}.json"), "w") as f:
            json.dump({"frame_indices": cuts}, f, indent=None,
                      separators=(",", ":"))
        # features give every trajectory an image-map entry
        with open(os.path.join(
                data, "features", f"features_321_{beg}-{end}.jsonl"),
                "w") as f:
            for t in trajs:
                for k, box in enumerate(t["bbs"]):
                    rec = {"frame": t["start"] + beg + k,
                           "box": box,
                           "embeddings": {"m": [0.0]}}
                    json.dump(rec, f, indent=None, separators=(",", ":"))
                    f.write("\n")

    ref_dir = str(tmp_path / "refcopy")
    shutil.copytree(data, ref_dir)
    ref_merge.merge(ref_dir, 321, iou_threshold=0.5, overlap=5,
                    min_face_size=10)
    run_merge(data, 321, MergeConfig(min_face_size=10, strict_start=True))

    for name in ("trajectories.jsonl", "scene_changes.json"):
        assert _read_bytes(os.path.join(data, name)) == \
            _read_bytes(os.path.join(ref_dir, name)), name
    assert _read_bytes(os.path.join(data, "trajectories.jsonl"))


# ---------------------------------------------------------------------------
# cluster.py / classify_knn.py


def _synth_data_dir(tmp_path, n_ident=3, per_ident=30, dim=16, seed=23):
    """A merged data dir: trajectories around n_ident identity centers
    with per-frame features (large identities exercise the >max_size
    split path of cluster_trajectories)."""
    rng = np.random.default_rng(seed)
    data = str(tmp_path / "555-data")
    os.makedirs(data)
    centers = rng.normal(size=(n_ident, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    tf = open(os.path.join(data, "trajectories.jsonl"), "w")
    ff = open(os.path.join(data, "features.jsonl"), "w")
    idx = 0
    ident_of = []
    frame = 0
    for ident in range(n_ident):
        for _ in range(per_ident):
            length = int(rng.integers(2, 5))
            bbs = []
            for k in range(length):
                x1 = int(rng.integers(0, 100))
                y1 = int(rng.integers(0, 100))
                bbs.append([x1, y1, x1 + 40, y1 + 40])
            traj = {"start": frame, "len": length, "bbs": bbs,
                    "detected": [True] * length, "w": 192, "h": 144,
                    "object_type": "face", "index": idx,
                    "movie_id": 555}
            json.dump(traj, tf, indent=None, separators=(",", ":"))
            tf.write("\n")
            for k, box in enumerate(bbs):
                vec = centers[ident] + 0.05 * rng.normal(size=dim)
                rec = {"frame": frame + k, "box": box,
                       "embeddings": {
                           "20170512-110547":
                               [round(float(v), 6) for v in vec]}}
                json.dump(rec, ff, indent=None, separators=(",", ":"))
                ff.write("\n")
            ident_of.append(ident)
            frame += length + 3
            idx += 1
    tf.close()
    ff.close()
    return data, ident_of


def test_cluster_parity_byte_identical(tmp_path):
    """Real cluster.py pipeline vs our run_cluster: identical
    clusters.json (/root/reference/facerec/cluster.py:163-225)."""
    ref_cluster = load_ref("cluster")
    ref_cluster.debug = False
    from facerec_tpu.pipeline.cluster import run_cluster

    data, _ = _synth_data_dir(tmp_path)
    ref_dir = str(tmp_path / "refcopy")
    shutil.copytree(data, ref_dir)

    vector_map = ref_cluster.read_features(ref_dir)
    trajectories, mean_emb = ref_cluster.read_trajectories(
        ref_dir, vector_map)
    clusters = ref_cluster.cluster_trajectories(
        trajectories, mean_emb, 18, 12, 24)
    ref_cluster.write_clusters(clusters, ref_dir, 555)

    run_cluster(data, ClusterConfig())

    assert _read_bytes(os.path.join(data, "clusters.json")) == \
        _read_bytes(os.path.join(ref_dir, "clusters.json"))


def _training_embeddings(n_actors=4, per_actor=12, dim=16, seed=31):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_actors, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    out = []
    for a in range(n_actors):
        for _ in range(per_actor):
            v = centers[a] + 0.05 * rng.normal(size=dim)
            out.append((1000 + a, [float(x) for x in v]))
    return out, centers


def test_classify_parity_byte_identical(tmp_path):
    """Real classify_knn.py (sklearn KNN) vs our run_classify: identical
    predictions.json, including the default-json-format quirk
    (/root/reference/facerec/classify_knn.py:186-258)."""
    ref_classify = load_ref("classify_knn")
    from facerec_tpu.pipeline.classify import (build_training_set,
                                               run_classify)

    # features drawn from the same 3 identity centers as the actors'
    data, ident_of = _synth_data_dir(tmp_path, n_ident=3)
    rng = np.random.default_rng(41)
    emb, _ = _training_embeddings(n_actors=4)
    with open(os.path.join(data, "clusters.json"), "w") as f:
        json.dump({"clusters": [int(i) for i in ident_of],
                   "movie_id": 555}, f, indent=None, separators=(",", ":"))
        f.write("\n")
    os.makedirs(str(tmp_path / "ref"))
    ref_dir = str(tmp_path / "ref" / "555-data")
    shutil.copytree(data, ref_dir)

    # the reference's progress print reads the actor_names global
    # populated by read_actor_embeddings (classify_knn.py:38,132)
    ref_classify.actor_names.update({a: f"Actor {a}"
                                     for a, _ in emb})
    ref_x, ref_y = ref_classify.get_class_data(emb, min_samples=20)
    our_x, our_y = build_training_set(emb, min_samples=20)
    np.testing.assert_array_equal(ref_x, our_x)
    np.testing.assert_array_equal(ref_y, our_y)

    ref_classify.classify(ref_dir, ref_x, ref_y, k=10, save_p_higher=0.05)
    run_classify(data, our_x, our_y, ClassifyConfig())

    assert _read_bytes(os.path.join(data, "predictions.json")) == \
        _read_bytes(os.path.join(ref_dir, "predictions.json"))


def test_classify_parity_too_few_classes(tmp_path):
    """<3 distinct actors: both write the bare {cluster: {}} map
    (classify_knn.py:204-208)."""
    ref_classify = load_ref("classify_knn")
    from facerec_tpu.pipeline.classify import (build_training_set,
                                               run_classify)

    data, ident_of = _synth_data_dir(tmp_path, n_ident=2, per_ident=8)
    emb, _ = _training_embeddings(n_actors=2)
    with open(os.path.join(data, "clusters.json"), "w") as f:
        json.dump({"clusters": [int(i) for i in ident_of],
                   "movie_id": 555}, f, indent=None, separators=(",", ":"))
        f.write("\n")
    os.makedirs(str(tmp_path / "ref"))
    ref_dir = str(tmp_path / "ref" / "555-data")
    shutil.copytree(data, ref_dir)

    ref_classify.actor_names.update({a: f"Actor {a}" for a, _ in emb})
    ref_x, ref_y = ref_classify.get_class_data(emb, min_samples=20)
    our_x, our_y = build_training_set(emb, min_samples=20)
    ref_classify.classify(ref_dir, ref_x, ref_y, k=10)
    run_classify(data, our_x, our_y, ClassifyConfig())

    assert _read_bytes(os.path.join(data, "predictions.json")) == \
        _read_bytes(os.path.join(ref_dir, "predictions.json"))
