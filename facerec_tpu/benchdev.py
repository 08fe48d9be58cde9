"""Traced benchmark programs, isolated from ``bench.py`` edits.

The JAX persistent compile cache keys cover the source locations of
traced code, so editing a file that *defines* a traced function —
even far above it — re-keys its executable and forces a cold compile
(measured on this harness: ~100 s warm load vs 500-700 s cold on a
contended tunnel).  ``bench.py`` is exactly the file one keeps tweaking
(budgets, logging, leg order), so every traced function the benchmark
dispatches lives HERE, in a module that only changes when the measured
program itself changes:

- :class:`HybridDetector` — traced inside the e2e extract program.
- :func:`make_device_step` — the fused device-throughput block step.

Nothing in this module reads benchmark configuration from the
environment; everything arrives as arguments.
"""
from __future__ import annotations

import numpy as np


class HybridDetector:
    """Real detector FLOPs, scripted ground-truth detections.

    The full FaceDetector forward runs (so the e2e bench pays the real
    conv cost) but its decoded outputs are replaced by the synthetic
    clip's truth — overlaid with a zero-valued dependency on the real
    scores so XLA cannot dead-code the model — giving the downstream
    tracker/crop/embed/JPEG stages a deterministic, realistic load.
    """

    def __init__(self, harness, scripted):
        self.harness = harness
        self.scripted = scripted
        self.variables = {"h": harness.variables,
                          "s": scripted.variables}

    def forward_indexed(self, variables, frames, frame0):
        import jax.numpy as jnp

        real = self.harness._forward(variables["h"], frames)
        truth = self.scripted.forward_indexed(variables["s"], frames,
                                              frame0)
        anchor = (real.scores.astype(jnp.float32).sum() * 0.0)
        return type(real)(truth.boxes + anchor, truth.scores + anchor,
                          truth.landmarks + anchor, truth.valid)


def make_device_step(detector_size, block, height, width,
                     crops_per_block, bank=None):
    """Build the fused device-headline program and its inputs.

    Returns ``(step, args)`` where ``step(*args)`` runs scene
    statistics + detection + the tracker scan + crop + 4×FaceNet
    embedding for one frame block as ONE XLA computation, returning
    ``(fingerprint, scene_state, tracker_state)``; callers thread the
    two states back in through ``args[4]``/``args[5]``.

    ``bank`` (an ``EmbedderBank``) may be passed in so a second
    device-headline config (the native-resolution parity detector)
    reuses the 4-checkpoint FaceNet init — the bank's init dispatches
    are minutes of RPC latency on the tunneled harness.
    """
    import jax
    import jax.numpy as jnp

    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.ops import scene as scene_ops
    from facerec_tpu.ops.crops import crop_resize
    from facerec_tpu.pipeline.extract import EmbedderBank
    from facerec_tpu.track import TrackerConfig, init_tracker
    from facerec_tpu.track.tracker import _run_block_impl

    compute_dtype = jnp.bfloat16
    detector = DetectorHarness.create(
        input_size=detector_size, max_detections=16,
        score_threshold=0.95, dtype=compute_dtype)
    if bank is None:
        bank = EmbedderBank.create_default(dtype=compute_dtype)
    tracker_cfg = TrackerConfig(max_tracks=32, max_detections=16)

    def block_step(det_vars, backbone_stack, bottlenecks, frames,
                   scene_state, tracker_state, crop_boxes, crop_frames):
        flags, scene_state = scene_ops._detect_block_impl(
            frames, scene_state)
        det = detector._forward(det_vars, frames)
        tracker_state, emit = _run_block_impl(
            tracker_cfg, tracker_state, det.boxes, det.valid, flags,
            jnp.int32(0))
        crops = crop_resize(frames, crop_frames, crop_boxes, 160)
        embs = bank.pooled._embed(backbone_stack, bottlenecks, crops)
        emb_sum = sum(e.sum().astype(jnp.float32) for e in embs)
        fp = flags.sum().astype(jnp.float32) + emit.box.sum() + emb_sum
        return fp, scene_state, tracker_state

    step = jax.jit(block_step)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (block, height, width, 3)),
                         jnp.uint8)
    crop_boxes = jnp.asarray(
        np.stack([rng.uniform(0, 300, crops_per_block),
                  rng.uniform(0, 300, crops_per_block),
                  rng.uniform(360, 700, crops_per_block),
                  rng.uniform(360, 560, crops_per_block)], axis=1),
        jnp.float32)
    crop_frames = jnp.asarray(
        rng.integers(0, block, crops_per_block), jnp.int32)
    scene_state = scene_ops.initial_state(height, width)
    tracker_state = init_tracker(tracker_cfg)

    args = (detector.variables, bank.pooled.backbone_stack,
            bank.pooled.bottlenecks, frames, scene_state, tracker_state,
            crop_boxes, crop_frames)
    return step, args
