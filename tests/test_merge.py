"""Merge stage: stitching, filtering, ordering, file formats."""
import json
import os

import numpy as np
import pytest

from facerec_tpu.config import MergeConfig
from facerec_tpu.contract import records
from facerec_tpu.pipeline.merge import (big_enough, has_image, run_merge,
                                        stitch_within_shard)


def traj(start, bbs, detected=None):
    detected = detected if detected is not None else [True] * len(bbs)
    return records.trajectory_record(start, bbs, detected, 320, 240)


def test_stitch_adjacent_high_iou():
    t1 = traj(0, [[10, 10, 50, 50], [12, 10, 52, 50]])
    t2 = traj(2, [[13, 10, 53, 50], [14, 10, 54, 50]])
    out, n = stitch_within_shard([t2, t1], scene_cuts=set(),
                                 iou_threshold=0.5)
    assert n == 1
    assert len(out) == 1
    assert out[0]["start"] == 0 and out[0]["len"] == 4


def test_stitch_blocked_by_scene_cut():
    t1 = traj(0, [[10, 10, 50, 50], [12, 10, 52, 50]])
    t2 = traj(2, [[13, 10, 53, 50]])
    out, n = stitch_within_shard([t1, t2], scene_cuts={2},
                                 iou_threshold=0.5)
    assert n == 0 and len(out) == 2


def test_stitch_requires_overlap():
    t1 = traj(0, [[10, 10, 50, 50]])
    t2 = traj(1, [[200, 200, 240, 240]])  # far away
    out, n = stitch_within_shard([t1, t2], set(), 0.5)
    assert n == 0 and len(out) == 2


def test_filters():
    t = traj(5, [[0, 0, 10, 10], [0, 0, 60, 60]])
    assert big_enough(t, 50)
    assert not big_enough(traj(0, [[0, 0, 30, 30]]), 50)
    images = {5: {(0, 0, 10, 10)}}
    assert has_image(t, images)
    assert not has_image(traj(9, [[0, 0, 10, 10]]), images)


@pytest.fixture
def movie_dir(tmp_path):
    d = tmp_path / "99-data"
    for sub in ("trajectories", "scene_changes", "features", "images"):
        (d / sub).mkdir(parents=True)
    return d


def write_shard(d, beg, end, trajectories, scene_cuts, features):
    with open(d / "trajectories" /
              f"trajectories_99_{beg}-{end}.jsonl", "w") as f:
        for t in trajectories:
            records.write_trajectory(f, t)
    records.write_shard_scene_changes(
        str(d / "scene_changes" / f"scene_changes_99_{beg}-{end}.json"),
        scene_cuts)
    with open(d / "features" / f"features_99_{beg}-{end}.jsonl", "w") as f:
        for rec in features:
            records.write_feature(f, rec)


def feature_for(t, frame_offset=0):
    frame = t["start"] + frame_offset
    box = t["bbs"][frame_offset]
    return records.feature_record(
        frame, f"99:{frame}:{box[0]}_{box[1]}_{box[2]}_{box[3]}",
        {"m": [0.0]}, box, {}, 320, 240)


def test_cross_shard_merge_equals_unsharded(movie_dir):
    # One object alive frames 0..14, shards [0,8) and [8,15) with a
    # 3-frame halo: shard0 tracks 0..10, shard1 tracks 8..14.
    boxes = [[100 + 2 * i, 50, 160 + 2 * i, 110] for i in range(15)]
    t_a = traj(0, boxes[:11])
    t_b = traj(8, boxes[8:])
    write_shard(movie_dir, 0, 8, [t_a], [], [feature_for(t_a)])
    write_shard(movie_dir, 8, 15, [t_b], [], [feature_for(t_b)])

    counters = run_merge(str(movie_dir), 99, MergeConfig(overlap=3))
    assert counters["merges"] == 1
    out = records.read_trajectories(str(movie_dir / "trajectories.jsonl"))
    assert len(out) == 1
    assert out[0]["start"] == 0
    assert out[0]["len"] == 15
    assert out[0]["bbs"] == boxes
    assert out[0]["index"] == 0
    assert out[0]["movie_id"] == 99

    # features concatenated in shard order
    with open(movie_dir / "features.jsonl") as f:
        frames = [json.loads(l)["frame"] for l in f]
    assert frames == sorted(frames)


def test_merge_filters_and_scene_union(movie_dir):
    t_small = traj(0, [[0, 0, 30, 30], [1, 0, 31, 30], [2, 0, 32, 30]])
    t_ok = traj(0, [[100, 50, 160, 110]] * 3)
    t_noimg = traj(20, [[100, 50, 160, 110]] * 3)
    write_shard(movie_dir, 0, 10, [t_small, t_ok], [4],
                [feature_for(t_small), feature_for(t_ok)])
    write_shard(movie_dir, 10, 25, [t_noimg], [12], [])

    counters = run_merge(str(movie_dir), 99, MergeConfig())
    out = records.read_trajectories(str(movie_dir / "trajectories.jsonl"))
    # too-small and no-image trajectories dropped
    assert counters["saved"] == 1 and counters["removed"] == 2
    assert len(out) == 1 and out[0]["bbs"][0] == [100, 50, 160, 110]

    sc = json.loads((movie_dir / "scene_changes.json").read_text())
    assert sc == {"frame_indices": [4, 12], "movie_id": 99}
