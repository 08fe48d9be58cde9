"""In-stage checkpoint/resume for long extract runs.

The reference's restart granularity is a whole shard (~1/100 film,
SURVEY.md §5.4).  On a single chip the whole film is one "shard", so we
add block-granular checkpoints: device carries (scene + tracker state),
host carries (assembler, pending faces, pixel window, counters) and the
output files' byte offsets, written atomically every N blocks.  Resume
truncates the shard files to the recorded offsets and continues from
the next block — output is byte-identical to an uninterrupted run.

Shard-level completion markers make multi-shard runs idempotent
(skip already-finished shards, like the reference's re-run-one-array-
index recovery).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np


def _device_state_to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, next_frame: int, scene_state,
                    tracker_state, assembler, pending, counters,
                    scene_changes, pixel_window, feat_offset: int,
                    traj_offset: int) -> None:
    payload = {
        "next_frame": next_frame,
        "scene_state": _device_state_to_numpy(scene_state),
        "tracker_state": _device_state_to_numpy(tracker_state),
        "assembler": assembler,
        "pending": pending,
        "counters": counters,
        "scene_changes": scene_changes,
        "pixel_window": pixel_window,
        "feat_offset": feat_offset,
        "traj_offset": traj_offset,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[dict]:
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except (EOFError, pickle.UnpicklingError, OSError):
        return None


def shard_done_marker(data_dir: str, kind: str, movie_id: int, beg: int,
                      end: int) -> str:
    return os.path.join(data_dir,
                        f".{kind}_{movie_id}_{beg}-{end}.done")


def mark_shard_done(data_dir: str, kind: str, movie_id: int, beg: int,
                    end: int) -> None:
    with open(shard_done_marker(data_dir, kind, movie_id, beg, end),
              "w") as f:
        f.write("done\n")


def is_shard_done(data_dir: str, kind: str, movie_id: int, beg: int,
                  end: int) -> bool:
    return os.path.exists(
        shard_done_marker(data_dir, kind, movie_id, beg, end))
