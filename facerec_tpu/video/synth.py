"""Synthetic test clips with ground-truth face boxes.

Generates short mp4s of bright "face" rectangles moving over static
scene backgrounds with hard cuts, plus the ground-truth detection
stream — the oracle for end-to-end extract tests (the reference has no
test assets at all; SURVEY.md §4).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SynthClip:
    path: str
    width: int
    height: int
    n_frames: int
    fps: float
    # frame → list of (box, landmarks) ground truths
    truth: Dict[int, List[Tuple[np.ndarray, np.ndarray]]]
    scene_cuts: List[int]
    # frame → identity id per truth entry (empty when identities=0)
    truth_ids: Dict[int, List[int]] = dataclasses.field(
        default_factory=dict)


def _landmarks_for(box: np.ndarray) -> np.ndarray:
    """Plausible 5-point layout inside a box (eyes, nose, mouth)."""
    x1, y1, x2, y2 = box
    w, h = x2 - x1, y2 - y1
    return np.array([
        [x1 + 0.3 * w, y1 + 0.35 * h],
        [x1 + 0.7 * w, y1 + 0.35 * h],
        [x1 + 0.5 * w, y1 + 0.55 * h],
        [x1 + 0.35 * w, y1 + 0.75 * h],
        [x1 + 0.65 * w, y1 + 0.75 * h],
    ], np.float32)


def identity_style(identity: int) -> Tuple[np.ndarray, int]:
    """Deterministic appearance of a synthetic identity: a face RGB
    color plus an eye-marker shade (drawn at the eye landmarks)."""
    r = np.random.default_rng(10_000 + identity)
    color = r.integers(150, 250, 3).astype(np.uint8)
    eye = int(r.integers(0, 90))
    return color, eye


def paint_face(frame: np.ndarray, box: np.ndarray,
               identity: Optional[int], shade: int) -> None:
    """Draw one face rectangle; with an identity, use its color and eye
    markers so an embedder can tell identities apart."""
    x1, y1, x2, y2 = [int(round(c)) for c in box]
    if identity is None:
        frame[y1:y2, x1:x2] = shade
        return
    color, eye = identity_style(identity)
    frame[y1:y2, x1:x2] = color
    w, h = x2 - x1, y2 - y1
    r = max(1, min(w, h) // 8)
    for lx, ly in _landmarks_for(box)[:2]:       # the two eyes
        cx, cy = int(round(lx)), int(round(ly))
        frame[max(cy - r, 0):cy + r, max(cx - r, 0):cx + r] = eye


def make_clip(path: str, n_frames: int = 60, width: int = 192,
              height: int = 144, fps: float = 25.0, seed: int = 0,
              cuts: Tuple[int, ...] = (), n_faces: int = 2,
              identities: int = 0) -> SynthClip:
    """Write an mp4 and return ground truth.

    Faces are bright rectangles drifting linearly; scenes are static
    noisy backgrounds replaced at each cut (cut also respawns faces).
    With ``identities=K`` each face carries a persistent identity
    (consistent color + eye markers across scenes) sampled from K
    actors, recorded per frame in ``truth_ids``.
    """
    import cv2

    rng = np.random.default_rng(seed)
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height))
    if not writer.isOpened():
        raise RuntimeError("cv2.VideoWriter failed to open")

    truth: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}
    truth_ids: Dict[int, List[int]] = {}

    def new_scene():
        bg = rng.integers(20, 90, (height, width, 3)).astype(np.uint8)
        faces = []
        cast = (rng.choice(identities, size=n_faces, replace=False)
                if identities >= n_faces else None)
        for k in range(n_faces):
            w = rng.uniform(28, 44)
            h = w * rng.uniform(1.1, 1.3)
            x = rng.uniform(2, width - w - 2)
            y = rng.uniform(2, height - h - 2)
            vx, vy = rng.uniform(-1.5, 1.5, 2)
            shade = int(rng.integers(170, 240))
            ident = int(cast[k]) if cast is not None else None
            faces.append([x, y, w, h, vx, vy, shade, ident])
        return bg, faces

    bg, faces = new_scene()
    for f in range(n_frames):
        if f in cuts:
            bg, faces = new_scene()
        frame = bg.copy()
        truth[f] = []
        truth_ids[f] = []
        for face in faces:
            x, y, w, h, vx, vy, shade, ident = face
            x = float(np.clip(x + vx, 0, width - w))
            y = float(np.clip(y + vy, 0, height - h))
            face[0], face[1] = x, y
            box = np.array([x, y, x + w, y + h], np.float32)
            paint_face(frame, box, ident, shade)
            truth[f].append((box, _landmarks_for(box)))
            truth_ids[f].append(-1 if ident is None else ident)
        writer.write(frame[..., ::-1])  # RGB → BGR
    writer.release()

    return SynthClip(path=path, width=width, height=height,
                     n_frames=n_frames, fps=fps, truth=truth,
                     scene_cuts=list(cuts), truth_ids=truth_ids)


def identity_crops(rng: np.random.Generator, identity: int, n: int,
                   size: int = 160,
                   native_face: Tuple[float, float] = (19.0, 30.0)
                   ) -> np.ndarray:
    """(n, size, size, 3) uint8 crops of one identity's face —
    training/reference data for the embedder.

    Faces are painted at their NATIVE film scale (a couple dozen
    pixels) in a small crop window and bilinearly upscaled to the embed
    size, matching what the pipeline's ``crop_resize`` feeds the
    embedder; training on crisp full-resolution faces instead measurably
    hurts deployed identity separation."""
    import cv2

    out = np.zeros((n, size, size, 3), np.uint8)
    for i in range(n):
        w = rng.uniform(*native_face)
        cs = int(round(w / rng.uniform(0.55, 0.9)))   # crop window side
        canvas = rng.integers(20, 90, (cs, cs, 3)).astype(np.uint8)
        h = min(w * rng.uniform(1.0, 1.25), cs - 2.0)
        x = rng.uniform(0, cs - w - 1)
        y = rng.uniform(0, cs - h - 1)
        paint_face(canvas, np.array([x, y, x + w, y + h], np.float32),
                   identity, shade=0)
        out[i] = cv2.resize(canvas, (size, size),
                            interpolation=cv2.INTER_LINEAR)
    return out


def synth_batch(rng: np.random.Generator, batch: int, width: int,
                height: int, max_faces: int = 3,
                face_size: Tuple[float, float] = (24.0, 64.0),
                identities: int = 0, identity_base: int = 0):
    """Random training frames of "face" rectangles over noise
    backgrounds — the same face model :func:`make_clip` paints, batched
    with padded ground truth for the detector trainer.  With
    ``identities=K`` faces are painted in random identity styles so the
    detector trains on the same appearance distribution the identity
    clips deploy.

    Returns (frames (B,H,W,3) uint8, boxes (B,F,4) f32, valid (B,F)
    bool, landmarks (B,F,5,2) f32).
    """
    frames = rng.integers(20, 90, (batch, height, width, 3)).astype(np.uint8)
    boxes = np.zeros((batch, max_faces, 4), np.float32)
    valid = np.zeros((batch, max_faces), bool)
    ldm = np.zeros((batch, max_faces, 5, 2), np.float32)
    for i in range(batch):
        for j in range(int(rng.integers(1, max_faces + 1))):
            w = rng.uniform(*face_size)
            h = min(w * rng.uniform(1.1, 1.3), height - 5)
            x = rng.uniform(2, width - w - 2)
            y = rng.uniform(2, height - h - 2)
            box = np.array([x, y, x + w, y + h], np.float32)
            ident = (identity_base + int(rng.integers(0, identities))
                     if identities else None)
            paint_face(frames[i], box, ident,
                       shade=int(rng.integers(170, 240)))
            boxes[i, j] = box
            valid[i, j] = True
            ldm[i, j] = _landmarks_for(box)
    return frames, boxes, valid, ldm


class PureScriptedDetector:
    """Pure-function scripted detector (mesh/shard_map compatible).

    The whole clip's ground truth is materialized as arrays; the
    forward is a ``dynamic_slice`` by global frame index, so it can run
    inside a jitted/shard_mapped program (unlike
    :class:`ScriptedDetector`, whose per-block host lookup forces a
    dispatch boundary).  Also usable on the serial host path via the
    ``set_block_start``/``__call__`` protocol for byte-identity
    comparisons between the two extract paths.
    """

    def __init__(self, clip: SynthClip, max_detections: int = 8,
                 score: float = 0.99, pad_blocks: int = 1024):
        n = clip.n_frames + pad_blocks  # slack for padded tail blocks
        d = max_detections
        boxes = np.zeros((n, d, 4), np.float32)
        ldm = np.zeros((n, d, 5, 2), np.float32)
        valid = np.zeros((n, d), bool)
        scores = np.zeros((n, d), np.float32)
        for f, entries in clip.truth.items():
            for j, (box, marks) in enumerate(entries[:d]):
                boxes[f, j] = box
                ldm[f, j] = marks
                valid[f, j] = True
                scores[f, j] = score
        self.variables = {"boxes": boxes, "ldm": ldm, "valid": valid,
                          "scores": scores}
        self.max_detections = max_detections
        self._frame0 = 0

    def forward_indexed(self, variables, frames, frame0):
        import jax.lax as lax
        import jax.numpy as jnp

        from facerec_tpu.models.detector import Detections

        b = frames.shape[0]
        sl = lambda a: lax.dynamic_slice_in_dim(
            jnp.asarray(a), frame0, b, axis=0)
        return Detections(sl(variables["boxes"]),
                          sl(variables["scores"]),
                          sl(variables["ldm"]), sl(variables["valid"]))

    # serial-path protocol (pipeline/extract.py host fallback)
    def set_block_start(self, frame0: int) -> None:
        self._frame0 = frame0

    def __call__(self, frames):
        import jax.numpy as jnp

        b = frames.shape[0]
        v = self.variables
        f0 = self._frame0
        from facerec_tpu.models.detector import Detections

        return Detections(jnp.asarray(v["boxes"][f0:f0 + b]),
                          jnp.asarray(v["scores"][f0:f0 + b]),
                          jnp.asarray(v["ldm"][f0:f0 + b]),
                          jnp.asarray(v["valid"][f0:f0 + b]))


class ScriptedDetector:
    """Detector stand-in that replays ground-truth boxes.

    Matches the :class:`~facerec_tpu.models.detector.DetectorHarness`
    call contract so end-to-end extract tests exercise the full device
    pipeline (scene, tracking, crops, embedding, contract files)
    without depending on trained detector weights.
    """

    def __init__(self, clip: SynthClip, max_detections: int = 8,
                 score: float = 0.99):
        self.clip = clip
        self.max_detections = max_detections
        self.score = score
        self._frame0 = 0

    def set_block_start(self, frame0: int) -> None:
        self._frame0 = frame0

    def __call__(self, frames):
        import jax.numpy as jnp

        b = frames.shape[0]
        d = self.max_detections
        boxes = np.zeros((b, d, 4), np.float32)
        ldm = np.zeros((b, d, 5, 2), np.float32)
        valid = np.zeros((b, d), bool)
        scores = np.zeros((b, d), np.float32)
        for i in range(b):
            for j, (box, marks) in enumerate(
                    self.clip.truth.get(self._frame0 + i, [])[:d]):
                boxes[i, j] = box
                ldm[i, j] = marks
                valid[i, j] = True
                scores[i, j] = self.score
        from facerec_tpu.models.detector import Detections

        return Detections(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(ldm), jnp.asarray(valid))
