"""Byte-format tests for the data contract (SURVEY.md §2.2)."""
import json
import os

from facerec_tpu.contract import jsonio, naming, records


def test_movie_id_momaf():
    assert naming.movie_id_from_filename("/x/125261-PekkaJaPatka-1955.mp4") == 125261


def test_movie_id_ussee_concat():
    # Non-leading-digit names concatenate all digit groups (extract.py:241-246)
    assert naming.movie_id_from_filename("reel-01-0044-7.m4v") == 100447


def test_shard_names_roundtrip():
    name = naming.shard_file_name("trajectories", 987654, 1000, 2000)
    assert name == "trajectories_987654_1000-2000.jsonl"
    assert naming.parse_shard_file_name(name) == ("trajectories", 987654, 1000, 2000)
    sc = naming.shard_file_name("scene_changes", 1, 0, 10)
    assert sc.endswith(".json")


def test_trajectory_record_bytes():
    rec = records.trajectory_record(
        start=7, bbs=[[1, 2, 3, 4], [5, 6, 7, 8]], detected=[True, False],
        width=757, height=574,
    )
    line = jsonio.dumps_compact(rec)
    assert line == (
        '{"start":7,"len":2,"bbs":[[1,2,3,4],[5,6,7,8]],'
        '"detected":[true,false],"w":757,"h":574,"object_type":"face"}'
    )


def test_merged_trajectory_key_order():
    rec = records.trajectory_record(0, [[0, 0, 1, 1]], [True], 10, 10)
    rec["index"] = 0
    rec["movie_id"] = 42
    line = jsonio.dumps_compact(rec)
    # index and movie_id appended last, like merge_shards.py:65-66
    assert line.endswith('"object_type":"face","index":0,"movie_id":42}')


def test_scene_change_files(tmp_path):
    shard = tmp_path / "scene_changes_1_0-10.json"
    records.write_shard_scene_changes(str(shard), [3, 7])
    raw = shard.read_bytes()
    assert raw == b'{"frame_indices":[3,7]}'  # no newline (extract.py:361-363)

    merged = tmp_path / "scene_changes.json"
    records.write_merged_scene_changes(str(merged), {7, 3}, movie_id=42)
    assert merged.read_bytes() == b'{"frame_indices":[3,7],"movie_id":42}\n'


def test_predictions_default_format(tmp_path):
    path = tmp_path / "predictions.json"
    records.write_predictions(str(path), 42, {0: {"momaf:elonet_henkilo_1": 0.5}})
    raw = path.read_text()
    # default json.dump separators with spaces (classify_knn.py:251-256)
    assert raw == (
        '{"movie_id": 42, "predictions": {"0": '
        '{"momaf:elonet_henkilo_1": 0.5}}}'
    )
    records.write_empty_predictions(str(path), [0, 1])
    assert path.read_text() == '{"0": {}, "1": {}}'


def test_feature_record_and_maps(tmp_path):
    rec = records.feature_record(
        frame=5, tag="42:5:1_2_3_4",
        embeddings={"m": [0.5, 0.25]},
        box=[1, 2, 3, 4],
        keypoints={"left_eye": (1, 1), "right_eye": (2, 1), "nose": (1, 2),
                   "mouth_left": (0, 3), "mouth_right": (2, 3)},
        width=100, height=80,
    )
    path = tmp_path / "features.jsonl"
    with open(path, "w") as f:
        records.write_feature(f, rec)

    vm = records.load_feature_map(str(path))
    assert (1, 2, 3, 4) in vm[5]

    traj = {"start": 4, "bbs": [[9, 9, 9, 9], [1, 2, 3, 4]]}
    vecs = records.trajectory_vectors(traj, vm, "m")
    assert vecs.shape == (1, 2)
    assert vecs[0][0] == 0.5


def test_images_map_fallback(tmp_path):
    images = tmp_path / "images"
    features = tmp_path / "features"
    os.makedirs(images)
    os.makedirs(features)
    with open(features / "features_1_0-10.jsonl", "w") as f:
        records.write_feature(f, records.feature_record(
            3, "1:3:1_1_2_2", {"m": [0.0]}, [1, 1, 2, 2], {}, 10, 10))
    # no images → fall back to features (utils/utils.py:46-58)
    m = records.load_images_map(str(images), str(features))
    assert m == {3: {(1, 1, 2, 2)}}
    # with an image present, images win
    (images / "1:9:0_0_5_5.jpeg").write_bytes(b"")
    m = records.load_images_map(str(images), str(features))
    assert m == {9: {(0, 0, 5, 5)}}
