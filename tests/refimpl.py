"""Load the ACTUAL reference implementation as executable golden oracles.

tests/oracles.py re-derives reference semantics from SURVEY notes; this
module instead imports the code at /root/reference/facerec itself, so a
misunderstanding shared by our implementation and the hand-written
oracle cannot pass silently (VERDICT round 1, missing #2).

The only reference dependency absent from this environment is
``filterpy``; a minimal shim of ``filterpy.kalman.KalmanFilter`` is
installed implementing the textbook predict/update equations with
filterpy's documented defaults (x=0, P=Q=I, F=I, H=0, R=I;
Joseph-form covariance update) — exactly the surface
/root/reference/facerec/sort.py:96-130 touches.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np

REF_DIR = "/root/reference/facerec"


class _ShimKalmanFilter:
    """filterpy.kalman.KalmanFilter, restricted to the reference's use."""

    def __init__(self, dim_x: int, dim_z: int):
        self.dim_x, self.dim_z = dim_x, dim_z
        self.x = np.zeros((dim_x, 1))
        self.P = np.eye(dim_x)
        self.Q = np.eye(dim_x)
        self.F = np.eye(dim_x)
        self.H = np.zeros((dim_z, dim_x))
        self.R = np.eye(dim_z)
        self._I = np.eye(dim_x)

    def predict(self):
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, z):
        z = np.reshape(np.asarray(z, dtype=float), (self.dim_z, 1))
        y = z - self.H @ self.x
        S = self.H @ self.P @ self.H.T + self.R
        K = self.P @ self.H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        I_KH = self._I - K @ self.H
        self.P = I_KH @ self.P @ I_KH.T + K @ self.R @ K.T


def _install_shims():
    os.environ.setdefault("MPLBACKEND", "Agg")
    if "filterpy" not in sys.modules:
        kalman = types.ModuleType("filterpy.kalman")
        kalman.KalmanFilter = _ShimKalmanFilter
        filterpy = types.ModuleType("filterpy")
        filterpy.kalman = kalman
        sys.modules["filterpy"] = filterpy
        sys.modules["filterpy.kalman"] = kalman


_cache = {}


def load_ref(name: str):
    """Import reference module ``name`` (e.g. 'scene', 'sort',
    'merge_shards', 'cluster', 'classify_knn') as ``ref_<name>``."""
    if name in _cache:
        return _cache[name]
    _install_shims()
    if REF_DIR not in sys.path:
        # for `from utils.utils import ...` inside reference modules
        sys.path.append(REF_DIR)
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"ref_{name}"] = mod
    spec.loader.exec_module(mod)
    _cache[name] = mod
    return mod


def reference_extract_tracks(det_stream, scene_flags, width, height,
                             max_age=5, min_hits=3, iou_threshold=0.5):
    """Drive the REAL reference Sort through extract.py's frame loop
    (extract.py:312-327,357-358): kill on scene change, update,
    pop_expired(2*min_hits, f) per frame, final pop_expired(0).

    Returns trajectory records in file order, built with the reference's
    own bbox_float_to_int semantics (extract.py:38-76).
    """
    ref_sort = load_ref("sort")
    sort = ref_sort.Sort(max_age=max_age, min_hits=min_hits,
                         iou_threshold=iou_threshold)
    out = []

    def save(tracks):
        for trk in tracks:
            bbs, det = [], []
            for bbox_float, d in trk.history:
                bbs.append(_bbox_float_to_int(bbox_float, width, height))
                det.append(bool(d))
            out.append({"start": int(trk.first_frame), "len": len(bbs),
                        "bbs": bbs, "detected": det, "w": width,
                        "h": height, "object_type": "face"})

    for frame, dets in enumerate(det_stream):
        if scene_flags[frame]:
            sort.kill_trackers()
        d = np.array([[*box, 0.95] for box in dets]).reshape((-1, 5))
        sort.update(d, frame=frame)
        save(sort.pop_expired(2 * min_hits, frame))
    save(sort.pop_expired(expiry_age=0))
    return out, sort


def _bbox_float_to_int(bbox_float, max_w, max_h, padding=0.0):
    """extract.py:38-53 verbatim semantics (np.round = banker's)."""
    b = np.array(bbox_float, dtype=np.float32)
    dim = np.minimum(b[2] - b[0], b[3] - b[1])
    pad = padding * dim
    b += np.array([-pad, -pad, pad, pad])
    b = np.maximum(b, [0, 0, 0, 0])
    b = np.minimum(b, [max_w, max_h, max_w, max_h])
    return [int(c) for c in np.round(b)]
