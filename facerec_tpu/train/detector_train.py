"""Face-detector training (data parallel).

Anchor assignment + multi-task loss (score BCE with hard-negative
weighting, smooth-L1 box and landmark regression) for the single-stage
detector, and a mesh-sharded training step: batch split over the mesh
axis, parameters replicated, gradients all-reduced by XLA through the
sharding annotations.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerec_tpu.models.detector import (FaceDetector, VARIANCES,
                                         anchor_centers)
from facerec_tpu.ops.boxes import iou_matrix
from facerec_tpu.parallel.mesh import FRAME_AXIS


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray      # (A,) 1 pos / 0 neg / -1 ignore
    box_targets: jnp.ndarray  # (A, 4) encoded offsets
    ldm_targets: jnp.ndarray  # (A, 10)
    ldm_valid: jnp.ndarray    # (A,) bool


def anchor_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   gt_landmarks: Optional[jnp.ndarray] = None,
                   pos_iou: float = 0.5,
                   neg_iou: float = 0.3,
                   content_hw: Optional[jnp.ndarray] = None
                   ) -> AnchorTargets:
    """Assign padded ground-truth boxes to anchors.

    Anchors with best-gt IoU ≥ pos_iou are positive, < neg_iou negative,
    in between ignored; each valid gt also force-claims its best anchor.

    ``content_hw`` ((2,) = (h, w)) marks the letterboxed content area:
    anchors centered in the zero padding outside it are forced NEGATIVE
    instead of falling into the pos/ignore bands — without this the
    0.3-0.5 ignore band leaves boundary-adjacent padding anchors
    untrained and free to drift confident at deploy time.
    """
    a_cx, a_cy, a_w, a_h = [anchors[:, i] for i in range(4)]
    anchors_xyxy = jnp.stack([a_cx - a_w / 2, a_cy - a_h / 2,
                              a_cx + a_w / 2, a_cy + a_h / 2], axis=-1)
    iou = iou_matrix(anchors_xyxy, gt_boxes)          # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)                  # (A,)
    best_iou = jnp.max(iou, axis=1)

    # force-match: the best anchor of each gt becomes positive
    best_anchor = jnp.argmax(iou, axis=0)              # (G,)
    forced = jnp.zeros(anchors.shape[0], bool).at[best_anchor].set(
        gt_valid, mode="drop")

    labels = jnp.where(best_iou >= pos_iou, 1, -1)
    labels = jnp.where(best_iou < neg_iou, 0, labels)
    labels = jnp.where(forced, 1, labels)
    if content_hw is not None:
        inside = (a_cy < content_hw[0]) & (a_cx < content_hw[1])
        labels = jnp.where(inside, labels, 0)

    g = gt_boxes[best_gt]                              # (A, 4)
    g_w = g[:, 2] - g[:, 0]
    g_h = g[:, 3] - g[:, 1]
    g_cx = g[:, 0] + g_w / 2
    g_cy = g[:, 1] + g_h / 2
    v0, v1 = VARIANCES
    eps = 1e-6
    box_t = jnp.stack([
        (g_cx - a_cx) / (v0 * a_w),
        (g_cy - a_cy) / (v0 * a_h),
        jnp.log(jnp.maximum(g_w, eps) / a_w) / v1,
        jnp.log(jnp.maximum(g_h, eps) / a_h) / v1,
    ], axis=-1)

    if gt_landmarks is None:
        ldm_t = jnp.zeros((anchors.shape[0], 10))
        ldm_valid = jnp.zeros(anchors.shape[0], bool)
    else:
        lm = gt_landmarks[best_gt]                     # (A, 5, 2)
        lx = (lm[..., 0] - a_cx[:, None]) / (v0 * a_w[:, None])
        ly = (lm[..., 1] - a_cy[:, None]) / (v0 * a_h[:, None])
        ldm_t = jnp.stack([lx, ly], axis=-1).reshape(-1, 10)
        ldm_valid = labels == 1
    return AnchorTargets(labels, box_t, ldm_t, ldm_valid)


def smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def detector_loss(raw_outputs, targets: AnchorTargets,
                  neg_weight: float = 1.0,
                  box_weight: float = 2.0,
                  ldm_weight: float = 1.0) -> Tuple[jnp.ndarray, Dict]:
    """Multi-task loss over a batch of raw head outputs.

    ``targets`` fields carry a leading batch axis (from a vmapped
    :func:`anchor_targets`); all reductions are per-image, averaged.
    """
    score = jnp.concatenate([o["score"] for o in raw_outputs], axis=1)
    box = jnp.concatenate([o["box"] for o in raw_outputs], axis=1)
    ldm = jnp.concatenate([o["ldm"] for o in raw_outputs], axis=1)

    labels, box_t, ldm_t, ldm_valid = targets
    pos = labels == 1
    neg = labels == 0
    n_pos = jnp.maximum(pos.sum(axis=1), 1)            # (B,)

    bce = optax.sigmoid_binary_cross_entropy(
        score, pos.astype(jnp.float32))
    cls_loss = (jnp.where(pos, bce, 0.0).sum(axis=1)
                + neg_weight * jnp.where(neg, bce, 0.0).sum(axis=1)) / n_pos
    box_loss = (smooth_l1(box - box_t).sum(-1)
                * pos.astype(jnp.float32)).sum(axis=1) / n_pos
    ldm_loss = (smooth_l1(ldm - ldm_t).sum(-1)
                * ldm_valid.astype(jnp.float32)).sum(axis=1) / n_pos

    total = (cls_loss + box_weight * box_loss
             + ldm_weight * ldm_loss).mean()
    return total, {"cls": cls_loss.mean(), "box": box_loss.mean(),
                   "ldm": ldm_loss.mean(), "n_pos": n_pos.sum()}


@dataclasses.dataclass
class DetectorTrainer:
    """Data-parallel detector trainer over a mesh.

    ``step(params, opt_state, images, gt_boxes, gt_valid, gt_landmarks)``
    is jit-compiled with the batch sharded over the mesh axis and
    parameters replicated; XLA inserts the gradient all-reduce.
    """

    model: FaceDetector
    input_size: Tuple[int, int]
    mesh: Optional[Mesh] = None
    learning_rate: float = 1e-3
    # False for datasets without landmark annotations (e.g. WIDER-FACE
    # bbx_gt): the landmark head gets no gradient, boxes/scores train
    # normally.  gt_landmarks is then ignored (pass zeros).
    use_landmarks: bool = True

    def __post_init__(self):
        self.tx = optax.adam(self.learning_rate)
        self.anchors = jnp.asarray(anchor_centers(self.input_size))

        def loss_fn(params, batch_stats, images, gt_boxes, gt_valid,
                    gt_landmarks, content_hw):
            x = (images.astype(jnp.float32) - 127.5) / 128.0
            raw, mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"])
            targets = jax.vmap(
                lambda b, v, l, c: anchor_targets(
                    self.anchors, b, v,
                    l if self.use_landmarks else None,
                    content_hw=c)
            )(gt_boxes, gt_valid, gt_landmarks, content_hw)
            loss, _ = detector_loss(raw, targets)
            return loss, mutated["batch_stats"]

        def step(variables, opt_state, images, gt_boxes, gt_valid,
                 gt_landmarks, content_hw):
            params = variables["params"]
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, variables["batch_stats"],
                                       images, gt_boxes, gt_valid,
                                       gt_landmarks, content_hw)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return ({"params": params, "batch_stats": new_stats},
                    opt_state, loss)

        if self.mesh is not None:
            batch_sharding = NamedSharding(self.mesh, P(FRAME_AXIS))
            replicated = NamedSharding(self.mesh, P())
            self._step = jax.jit(
                step,
                in_shardings=(replicated, replicated, batch_sharding,
                              batch_sharding, batch_sharding,
                              batch_sharding, batch_sharding),
                out_shardings=(replicated, replicated, replicated))
        else:
            self._step = jax.jit(step)

    def init(self, rng_seed: int = 0):
        """Returns (variables, opt_state); ``variables`` carries both
        the trained params and the BN running statistics and plugs
        straight into :class:`~facerec_tpu.models.DetectorHarness`."""
        variables = self.model.init(
            jax.random.PRNGKey(rng_seed),
            jnp.zeros((1, *self.input_size, 3), jnp.float32))
        variables = dict(variables)
        return variables, self.tx.init(variables["params"])

    def step(self, variables, opt_state, images, gt_boxes, gt_valid,
             gt_landmarks, content_hw=None):
        """``content_hw``: per-sample (B, 2) letterboxed content (h, w)
        in input pixels; None = the whole input is content."""
        if content_hw is None:
            b = images.shape[0]
            content_hw = jnp.broadcast_to(
                jnp.asarray(self.input_size, jnp.float32), (b, 2))
        return self._step(variables, opt_state, images, gt_boxes,
                          gt_valid, gt_landmarks, content_hw)
