"""Sequential numpy oracles re-deriving reference-stage semantics.

These mirror the *behavior* of /root/reference/facerec modules for use
as test oracles; implementations are independent re-derivations from
the documented semantics in SURVEY.md.
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

from facerec_tpu.ops import kalman
from facerec_tpu.ops.boxes import round_clip_box


def to_z(box):
    w = box[2] - box[0]
    h = box[3] - box[1]
    return np.array([box[0] + w / 2, box[1] + h / 2, w * h, w / h],
                    np.float64)


def to_box(x):
    w = np.sqrt(max(x[2] * x[3], 0.0))
    h = x[2] / w if w > 0 else 0.0
    return np.array([x[0] - w / 2, x[1] - h / 2, x[0] + w / 2, x[1] + h / 2])


def iou_np(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


class OracleTrack:
    """One track: scalar Kalman + SORT bookkeeping (sort.py:82-169)."""

    def __init__(self, box, frame, uid):
        self.uid = uid
        self.first = frame
        self.x = np.zeros(8)
        self.x[:4] = to_z(box)
        self.P = kalman.P0.astype(np.float64).copy()
        self.entries = [(to_box(self.x), True)]
        self.tsu = 0
        self.hits = 1
        self.initial_hits = 1

    def predict(self):
        F, Q = kalman.F.astype(np.float64), kalman.Q.astype(np.float64)
        if self.x[6] + self.x[2] < 1e-3:
            self.x[6] = 0.0
        if self.x[7] + self.x[3] < 1e-3:
            self.x[7] = 0.0
        self.tsu += 1
        self.x = F @ self.x
        self.P = F @ self.P @ F.T + Q
        self.entries.append((to_box(self.x), False))

    def update(self, box):
        H = kalman.H.astype(np.float64)
        R = kalman.R.astype(np.float64)
        y = to_z(box) - H @ self.x
        S = H @ self.P @ H.T + R
        K = self.P @ H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        IKH = np.eye(8) - K @ H
        self.P = IKH @ self.P @ IKH.T + K @ R @ K.T
        self.entries[-1] = (to_box(self.x), True)
        self.tsu = 0
        self.hits += 1
        if len(self.entries) == self.hits:
            self.initial_hits += 1


class OracleSort:
    """Reference Sort semantics (sort.py:202-378), sequential."""

    def __init__(self, max_age=5, min_hits=3, iou_threshold=0.5):
        self.max_age = max_age
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold
        self.followed = []            # live tracks
        self.all_tracks = {}          # uid -> track, until popped
        self.det_track = {}           # (frame, det_index) -> track
        self.next_uid = 0

    def kill(self):
        self.followed = []

    def update(self, det_boxes, frame):
        for trk in self.followed:
            trk.predict()

        n_d, n_t = len(det_boxes), len(self.followed)
        matched_d, matched_t = set(), set()
        pairs = []
        if n_d and n_t:
            util = np.array([[iou_np(d, trk.entries[-1][0])
                              for trk in self.followed] for d in det_boxes])
            util = np.where(util < self.iou_threshold, -1.0, util)
            rows, cols = linear_sum_assignment(util, maximize=True)
            for r, c in zip(rows, cols):
                if util[r, c] >= self.iou_threshold:
                    pairs.append((r, c))
                    matched_d.add(r)
                    matched_t.add(c)
        for r, c in pairs:
            trk = self.followed[c]
            trk.update(det_boxes[r])
            self.det_track[(frame, r)] = trk

        keep = []
        for trk in self.followed:
            expired = (trk.tsu > self.max_age
                       and len(trk.entries) >= self.min_hits)
            not_started = (len(trk.entries) <= self.min_hits
                           and trk.initial_hits < len(trk.entries))
            if not (expired or not_started):
                keep.append(trk)
        self.followed = keep

        for r in range(n_d):
            if r not in matched_d:
                trk = OracleTrack(det_boxes[r], frame, self.next_uid)
                self.next_uid += 1
                self.followed.append(trk)
                self.all_tracks[trk.uid] = trk
                self.det_track[(frame, r)] = trk

        # register matched tracks in all_tracks (already there)
        return

    def pop_expired(self, expiry_age, frame=None):
        popped = []
        for uid in sorted(self.all_tracks):
            trk = self.all_tracks[uid]
            last_update = trk.first + len(trk.entries) - trk.tsu - 1
            age = (frame - last_update) if frame is not None else 10 ** 9
            if age >= expiry_age:
                del self.all_tracks[uid]
                if trk.initial_hits >= self.min_hits:
                    trk.entries = trk.entries[:len(trk.entries) - trk.tsu]
                    popped.append(trk)
        return popped

    def face_valid(self, frame, det_index):
        trk = self.det_track.get((frame, det_index))
        return (trk is not None and trk.initial_hits >= self.min_hits)


def oracle_extract_loop(det_stream, scene_flags, width, height,
                        max_age=5, min_hits=3, iou_threshold=0.5):
    """Reference extract.py frame-loop ordering: kill on scene change,
    update, pop_expired(2*min_hits) per frame, final pop at the end.

    Returns (trajectory_records, sort) in file order.
    """
    from facerec_tpu.contract import records

    sort = OracleSort(max_age, min_hits, iou_threshold)
    out = []

    def save(tracks):
        for trk in tracks:
            bbs = [round_clip_box(b, width, height) for b, _ in trk.entries]
            det = [d for _, d in trk.entries]
            out.append(records.trajectory_record(trk.first, bbs, det,
                                                 width, height))

    for frame, dets in enumerate(det_stream):
        if scene_flags[frame]:
            sort.kill()
        sort.update(dets, frame)
        save(sort.pop_expired(2 * min_hits, frame))
    save(sort.pop_expired(0))
    return out, sort
