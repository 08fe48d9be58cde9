"""Fixed-shape greedy non-maximum suppression.

Selects the top-``k`` surviving boxes in ``k`` vectorized
argmax+suppress steps — no dynamic shapes, so it jits and shards.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from facerec_tpu.ops.boxes import iou_matrix

_NEG = -1e30  # plain float: avoids backend init at import time


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS.

    Args:
        boxes: (N, 4) float32.
        scores: (N,) float32; use -inf/very negative for invalid boxes.
        iou_threshold: suppression overlap.
        k: number of outputs (padded with invalid entries).

    Returns:
        (indices, valid): (k,) int32 selected box indices in descending
        score order and (k,) bool validity.
    """

    def body(scores_cur, _):
        i = jnp.argmax(scores_cur).astype(jnp.int32)
        s = scores_cur[i]
        overlap = iou_matrix(boxes[i][None], boxes)[0]
        suppress = overlap > iou_threshold
        # always remove the selected box itself
        scores_next = jnp.where(suppress, _NEG, scores_cur).at[i].set(_NEG)
        return scores_next, (i, s)

    _, (idx, sel_scores) = jax.lax.scan(body, scores.astype(jnp.float32),
                                        None, length=k)
    return idx, sel_scores > _NEG / 2
