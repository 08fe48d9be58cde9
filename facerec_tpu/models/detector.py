"""Single-stage face detector with landmarks (TPU-first).

The reference detects faces with the ``mtcnn`` package — a three-stage
cascade with dynamic image pyramids and per-stage host round trips
(/root/reference/facerec/detector.py:19-35).  Cascades are hostile to
XLA (data-dependent shapes), so this is a RetinaFace-style single-shot
design instead: one static-shape forward pass over an FPN with SSH
context modules, anchor decoding, score/size filtering and greedy NMS
all fused on device.  Output matches the reference's detect() contract:
boxes [x1,y1,x2,y2] + 5 named landmarks + confidence filter
(detector.py:3-13,27).

Weights: train or import via :mod:`facerec_tpu.models.weights`.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facerec_tpu.models.layers import ConvBN
from facerec_tpu.ops.nms import nms

STRIDES = (8, 16, 32)
ANCHOR_SIZES = ((16, 32), (64, 128), (256, 512))
VARIANCES = (0.1, 0.2)


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        y = ConvBN(self.features, 3, self.stride, dtype=d,
                   name="conv1")(x, train)
        y = ConvBN(self.features, 3, 1, act=False, dtype=d,
                   name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvBN(self.features, 1, self.stride, act=False, dtype=d,
                       name="proj")(x, train)
        return nn.relu(x + y)


class SSH(nn.Module):
    """SSH context module: 3x3 ∥ 5x5 ∥ 7x7 receptive fields via stacked
    3x3 convs, concatenated."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        half = self.features // 2
        quarter = self.features // 4
        c3 = ConvBN(half, 3, act=False, dtype=d, name="conv3")(x, train)
        c5a = ConvBN(quarter, 3, dtype=d, name="conv5a")(x, train)
        c5 = ConvBN(quarter, 3, act=False, dtype=d, name="conv5")(c5a, train)
        c7a = ConvBN(quarter, 3, dtype=d, name="conv7a")(c5a, train)
        c7 = ConvBN(quarter, 3, act=False, dtype=d, name="conv7")(c7a, train)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FaceDetector(nn.Module):
    """Backbone + FPN + SSH + per-level anchor heads.

    The backbone opens with a single 12×12 stride-4 convolution to 96
    channels: TPU convs on 3/16/32 channels are HBM-bandwidth-bound
    with idle MXU lanes, so the stem jumps straight to stride 4 and a
    wide channel count (the same function class as space-to-depth +
    3×3 conv, without the layout copies), and every later layer runs
    ≥96 channels at ≤1/4 spatial resolution.

    Returns raw per-level predictions; decoding lives in
    :class:`DetectorHarness` so the model stays a pure function of
    pixels.
    """

    fpn_features: int = 64
    num_anchors: int = 2
    backbone_width: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Dict[str, jnp.ndarray]]:
        d = self.dtype
        x = x.astype(d)
        # Backbone to strides 8/16/32.  The stem is a 12x12 stride-4
        # convolution — the exact same function class as a 4x4
        # space-to-depth followed by a 3x3 conv on 48 channels (the
        # receptive fields and stride coincide; the weight mapping is
        # bijective), but with no reshape/transpose: inside the fused
        # block program the s2d formulation cost two layout copies of
        # the full stem input (~0.55 ms/64-frame block on v5e).
        # backbone_width scales every backbone level (96/192/384 at the
        # default 96).  Measured verdict (docs/DESIGN.md "Backbone-width
        # harvest"): the mid-level limiter is MXU Cout lane padding
        # (192 ch = 1.5 lanes; w=128's 256-ch mid-levels run 1.78x the
        # FLOPs in the same time), and the narrower w=72 collapses
        # detection in the paired selfcheck A/B (recall 0.073 vs 0.646
        # for w=96 at the identical probe scale) — so 96 stays the
        # default and width changes are retraining decisions, not
        # speed knobs.
        w = self.backbone_width
        x = ConvBN(w, 12, 4, dtype=d, name="stem")(x, train)
        x = ResBlock(w, 2, dtype=d, name="c3_1")(x, train)
        c3 = ResBlock(w, 1, dtype=d, name="c3_2")(x, train)
        x = ResBlock(2 * w, 2, dtype=d, name="c4_1")(c3, train)
        c4 = ResBlock(2 * w, 1, dtype=d, name="c4_2")(x, train)
        x = ResBlock(4 * w, 2, dtype=d, name="c5_1")(c4, train)
        c5 = ResBlock(4 * w, 1, dtype=d, name="c5_2")(x, train)

        # FPN top-down
        f = self.fpn_features
        p5 = ConvBN(f, 1, act=False, dtype=d, name="lat5")(c5, train)
        p4 = ConvBN(f, 1, act=False, dtype=d, name="lat4")(c4, train)
        p3 = ConvBN(f, 1, act=False, dtype=d, name="lat3")(c3, train)
        # Exact 2x nearest upsample as repeat: jax.image.resize lowers
        # to a serial while loop on TPU for the same values.
        up = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
        p4 = p4 + up(p5)
        p3 = p3 + up(p4)
        p4 = ConvBN(f, 3, dtype=d, name="smooth4")(p4, train)
        p3 = ConvBN(f, 3, dtype=d, name="smooth3")(p3, train)

        outs = []
        for i, p in enumerate((p3, p4, p5)):
            feat = SSH(f, dtype=d, name=f"ssh{i}")(p, train)
            a = self.num_anchors
            # One 1x1 conv per level emitting [score | 4 box | 10 ldm]
            # per anchor: three narrow convs (2/8/20 output channels)
            # each wasted MXU output lanes and its own pass over feat.
            head = nn.Conv(15 * a, (1, 1), dtype=d, name=f"head{i}")(feat)
            b, hh, ww, _ = head.shape
            head = head.reshape(b, hh * ww * a, 15).astype(jnp.float32)
            outs.append({
                "score": head[..., 0],
                "box": head[..., 1:5],
                "ldm": head[..., 5:15],
            })
        return outs


def fit_input_size(height: int, width: int, long_side: int = 512,
                   multiple: int = 32) -> Tuple[int, int]:
    """Smallest detector input matching the frame's aspect ratio.

    Letterboxing into a fixed square wastes backbone FLOPs and anchors
    on padding (a 576x768 film block fills only 432 of 512 rows — 15%
    of the convolution work runs on constant pixels).  Scaling the long
    side to ``long_side`` and rounding each dimension up to the stride
    multiple keeps the content scale identical while shrinking the
    input to an (almost) padding-free shape — e.g. 384x512 for 16:9-ish
    films, a measured ~1.3x detector speedup with the same detections.
    """
    scale = min(1.0, long_side / max(height, width))   # never upscale
    rnd = lambda v: max(multiple, int(np.ceil(v * scale / multiple)) * multiple)
    return rnd(height), rnd(width)


@functools.lru_cache(maxsize=None)
def anchor_centers(input_size: Tuple[int, int]) -> np.ndarray:
    """All anchors as (A, 4) [cx, cy, w, h] in input pixels, level-major,
    row-major within a level, anchor-minor — matching the head reshape."""
    h, w = input_size
    all_anchors = []
    for stride, sizes in zip(STRIDES, ANCHOR_SIZES):
        gh, gw = h // stride, w // stride
        ys = (np.arange(gh) + 0.5) * stride
        xs = (np.arange(gw) + 0.5) * stride
        cy, cx = np.meshgrid(ys, xs, indexing="ij")
        centers = np.stack([cx, cy], axis=-1).reshape(gh * gw, 1, 2)
        whs = np.array([[s, s] for s in sizes], np.float32)  # (a, 2)
        grid = np.concatenate(
            [np.broadcast_to(centers, (gh * gw, len(sizes), 2)),
             np.broadcast_to(whs[None], (gh * gw, len(sizes), 2))],
            axis=-1,
        ).reshape(-1, 4)
        all_anchors.append(grid.astype(np.float32))
    return np.concatenate(all_anchors, axis=0)


def decode_scores_boxes(raw: List[Dict[str, jnp.ndarray]],
                        anchors: jnp.ndarray):
    """Scores + boxes for every anchor; landmarks stay RAW so the
    harness can decode them only for its top-k NMS candidates (the
    full-anchor landmark decode is 10/14 of the decode traffic and all
    but ~1% of it is discarded by pre-selection).

    Returns (scores (B,A), boxes (B,A,4) xyxy, ldm_raw (B,A,10)).
    """
    score = jnp.concatenate([o["score"] for o in raw], axis=1)
    box = jnp.concatenate([o["box"] for o in raw], axis=1)
    ldm_raw = jnp.concatenate([o["ldm"] for o in raw], axis=1)

    a_cx, a_cy, a_w, a_h = [anchors[:, i] for i in range(4)]
    v0, v1 = VARIANCES
    cx = a_cx + box[..., 0] * v0 * a_w
    cy = a_cy + box[..., 1] * v0 * a_h
    w = a_w * jnp.exp(jnp.clip(box[..., 2] * v1, -10, 6))
    h = a_h * jnp.exp(jnp.clip(box[..., 3] * v1, -10, 6))
    xyxy = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)
    return jax.nn.sigmoid(score), xyxy, ldm_raw


def decode_landmarks(ldm_raw: jnp.ndarray, anchors: jnp.ndarray
                     ) -> jnp.ndarray:
    """(..., 10) raw landmark offsets + (..., 4) anchors → (..., 5, 2)."""
    a_cx, a_cy, a_w, a_h = [anchors[..., i] for i in range(4)]
    v0 = VARIANCES[0]
    ldm = ldm_raw.reshape(*ldm_raw.shape[:-1], 5, 2)
    lx = a_cx[..., None] + ldm[..., 0] * v0 * a_w[..., None]
    ly = a_cy[..., None] + ldm[..., 1] * v0 * a_h[..., None]
    return jnp.stack([lx, ly], axis=-1)


def decode(raw: List[Dict[str, jnp.ndarray]], anchors: jnp.ndarray):
    """Full decode of every anchor (tests/tools; the harness uses the
    split form above).

    Returns (scores (B,A), boxes (B,A,4) xyxy, landmarks (B,A,5,2)).
    """
    scores, xyxy, ldm_raw = decode_scores_boxes(raw, anchors)
    return scores, xyxy, decode_landmarks(ldm_raw, anchors)


class Detections(NamedTuple):
    """Padded per-frame detections (leading batch axis)."""

    boxes: jnp.ndarray      # (B, D, 4) float32, display coords
    scores: jnp.ndarray     # (B, D)
    landmarks: jnp.ndarray  # (B, D, 5, 2)
    valid: jnp.ndarray      # (B, D) bool


@dataclasses.dataclass
class DetectorHarness:
    """Pixels → padded detections: letterbox, forward, decode, filter, NMS.

    The score threshold and minimum face size replicate the reference
    filters (detector.py:20-27: ``face_threshold=0.95``,
    ``min_face_size=20``); NMS replaces the cascade's internal merging.
    """

    model: FaceDetector
    variables: Dict
    input_size: Tuple[int, int] = (512, 512)
    max_detections: int = 16
    score_threshold: float = 0.95
    min_face_size: float = 20.0
    nms_iou: float = 0.4
    # NMS candidate pre-selection count; None = 8 × max_detections
    # (≥128).  Scales with detection capacity instead of silently
    # capping dense frames at a fixed 128 candidates.
    n_candidates: int = None

    @classmethod
    def create(cls, rng_seed: int = 0, dtype: Any = jnp.float32,
               backbone_width: int = 96, **kwargs) -> "DetectorHarness":
        from facerec_tpu.models.facenet import cast_float_tree

        model = FaceDetector(dtype=dtype, backbone_width=backbone_width)
        size = kwargs.get("input_size", (512, 512))
        variables = model.init(
            jax.random.PRNGKey(rng_seed),
            jnp.zeros((1, size[0], size[1], 3), jnp.float32))
        # Pre-cast params to the compute dtype: identical numerics to
        # flax's per-use cast, half the per-dispatch weight traffic.
        return cls(model=model, variables=cast_float_tree(variables, dtype),
                   **kwargs)

    def __call__(self, frames: jnp.ndarray) -> Detections:
        """(B, H, W, 3) uint8 frames at display resolution → detections
        mapped back to display coordinates.

        Dispatched as one jitted program per input shape (cached)."""
        if not hasattr(self, "_jitted"):
            object.__setattr__(self, "_jitted", jax.jit(self._forward))
        return self._jitted(self.variables, frames)

    def _forward(self, variables, frames: jnp.ndarray) -> Detections:
        b, h, w, _ = frames.shape
        ih, iw = self.input_size
        # Cap at 1: frames smaller than the input are padded, never
        # upscaled (matches fit_input_size's contract).
        scale = min(1.0, ih / h, iw / w)
        sh, sw = int(round(h * scale)), int(round(w * scale))

        # Letterbox in the model's compute dtype: the f32 resize of a
        # full frame block is pure HBM traffic (~7 ms/block at 576×768
        # b64) and halves in bf16 with no effect on detections.  Both
        # alternative formulations LOSE inside the fused block program
        # on-chip (scripts/resize_ab.py): a separable-matmul resize
        # measured 17× slower end-to-end, and the gather-free periodic
        # strided-slice path (ops/resize.py) — detections bit-identical
        # — measured 42.4 vs 30.3 ms/block (its go×K slice terms defeat
        # XLA's fusion here the same way).  jax.image.resize stays the
        # default; FACEREC_RESIZE=periodic remains for re-measuring on
        # future compiler versions.
        import os as _os

        x = frames.astype(self.model.dtype)
        if _os.environ.get("FACEREC_RESIZE", "xla") == "periodic":
            from facerec_tpu.ops.resize import letterbox_resize

            x = letterbox_resize(x, (sh, sw))
        else:
            x = jax.image.resize(x, (b, sh, sw, 3), "bilinear")
        x = jnp.pad(x, ((0, 0), (0, ih - sh), (0, iw - sw), (0, 0)))
        x = (x - 127.5) / 128.0

        raw = self.model.apply(variables, x)
        anchors = jnp.asarray(anchor_centers(self.input_size))
        scores, boxes, ldm_raw = decode_scores_boxes(raw, anchors)

        # back to display coordinates (landmarks decode lazily below)
        boxes = boxes / scale

        # Clamp to the display frame BEFORE the size filter: a box
        # whose visible part is smaller than min_face_size is not a
        # detection, and boxes decoded entirely into the letterbox
        # padding collapse to zero size and die here.
        lim = jnp.asarray([w, h, w, h], jnp.float32)
        boxes = jnp.clip(boxes, 0.0, lim)

        wh = jnp.minimum(boxes[..., 2] - boxes[..., 0],
                         boxes[..., 3] - boxes[..., 1])
        keep = (scores > self.score_threshold) & (wh >= self.min_face_size)
        masked = jnp.where(keep, scores, -1.0)

        # Candidate pre-selection: greedy NMS over all ~14k anchors
        # sweeps the full score row every step; the top 8× the
        # detection capacity by score always contain every possible
        # survivor unless a frame has that many above-threshold
        # anchors — not a real film frame at the default capacity.
        n_cand = self.n_candidates or max(128, 8 * self.max_detections)
        n_cand = min(n_cand, masked.shape[1])
        top_scores, top_idx = jax.lax.top_k(masked, n_cand)
        top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        # landmarks decode only for the selected candidates — same
        # per-element math as a full decode + gather, a fraction of
        # the traffic
        top_ldm = decode_landmarks(
            jnp.take_along_axis(ldm_raw, top_idx[..., None], axis=1),
            anchors[top_idx]) / scale

        def per_frame(bx, sc, ldm):
            idx, valid = nms(bx, sc, self.nms_iou, self.max_detections)
            return bx[idx], sc[idx], ldm[idx], valid

        sel_boxes, sel_scores, sel_ldm, sel_valid = jax.vmap(per_frame)(
            top_boxes, top_scores, top_ldm)
        sel_valid = sel_valid & (sel_scores > self.score_threshold)
        return Detections(sel_boxes, sel_scores, sel_ldm, sel_valid)
