"""Bounding-box geometry: IoU matrices, coordinate conversions, rounding.

Box convention is ``[x1, y1, x2, y2]`` everywhere (the reference's
detector output convention, /root/reference/facerec/detector.py:3-13).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two box sets.

    Args:
        boxes_a: (N, 4) boxes.
        boxes_b: (M, 4) boxes.
    Returns:
        (N, M) IoU values; 0/0 boxes yield NaN-free 0 via safe division.

    Matches the semantics of /root/reference/facerec/sort.py:35-52.
    """
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(0.0, x2 - x1) * jnp.maximum(0.0, y2 - y1)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def box_to_z(box: jnp.ndarray) -> jnp.ndarray:
    """[x1,y1,x2,y2] → measurement [cx, cy, area, aspect]
    (sort.py:55-67). Works over any leading batch dims."""
    w = box[..., 2] - box[..., 0]
    h = box[..., 3] - box[..., 1]
    cx = box[..., 0] + w / 2.0
    cy = box[..., 1] + h / 2.0
    return jnp.stack([cx, cy, w * h, w / h], axis=-1)


def z_to_box(z: jnp.ndarray) -> jnp.ndarray:
    """[cx, cy, area, aspect] → [x1,y1,x2,y2] (sort.py:70-79).
    Negative area/aspect (transient Kalman states) give NaN-free 0-size
    boxes via clamping inside the sqrt."""
    s = z[..., 2]
    r = z[..., 3]
    w = jnp.sqrt(jnp.maximum(s * r, 0.0))
    h = jnp.where(w > 0, s / jnp.where(w > 0, w, 1.0), 0.0)
    return jnp.stack(
        [z[..., 0] - w / 2.0, z[..., 1] - h / 2.0,
         z[..., 0] + w / 2.0, z[..., 1] + h / 2.0],
        axis=-1,
    )


def round_clip_box(box, max_w: int, max_h: int, padding: float = 0.0):
    """Float box → int box with optional symmetric padding, border clamping
    and round-half-to-even, exactly mirroring
    /root/reference/facerec/extract.py:38-53 (numpy round semantics).

    Host-side helper (numpy): runs in the trajectory emission path.
    """
    b = np.asarray(box, dtype=np.float32)
    dim = np.minimum(b[2] - b[0], b[3] - b[1])
    pad = padding * dim
    b = b + np.array([-pad, -pad, pad, pad], dtype=np.float32)
    b = np.maximum(b, [0, 0, 0, 0])
    b = np.minimum(b, [max_w, max_h, max_w, max_h])
    b = np.round(b)
    return [int(c) for c in b]


def iou_single(box_a, box_b) -> float:
    """Host-side scalar IoU used by the merge stage
    (merge_shards.py:81-89)."""
    xa = max(box_a[0], box_b[0])
    ya = max(box_a[1], box_b[1])
    xb = min(box_a[2], box_b[2])
    yb = min(box_a[3], box_b[3])
    inter = max(xb - xa, 0) * max(yb - ya, 0)
    area_a = (box_a[2] - box_a[0]) * (box_a[3] - box_a[1])
    area_b = (box_b[2] - box_b[0]) * (box_b[3] - box_b[1])
    return inter / float(area_a + area_b - inter)
