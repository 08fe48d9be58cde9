"""On-hardware numerics check for the Pallas equalize kernel.

Interpreter-mode tests (tests/test_pallas_kernels.py) validate the
math; this script validates the MOSAIC LOWERING on a real TPU — both
dispatch paths (fused plane-resident and row-tiled two-pass) against
the numpy oracle, including a cropped-1080p plane that exceeds the
fused VMEM budget (the round-1 version errored above ~3 MB planes).

Run: python scripts/tpu_kernel_check.py   (needs a TPU)
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp


def check(shape, rng):
    from facerec_tpu.ops.pallas import equalize as eqmod

    b, h, w = shape
    y = rng.uniform(0, 255.999, shape).astype(np.float32)
    packed = eqmod.pack_planes(jnp.asarray(y))
    plane_bytes = packed.shape[1] * packed.shape[2] * 4
    path = ("fused" if plane_bytes <= eqmod._FUSED_PLANE_BYTES
            else "tiled")
    eq_raw, cum = jax.device_get(eqmod.equalize_stats_tpu(packed))

    idx = y.astype(np.uint8).astype(np.int32)
    counts = np.stack([np.bincount(i.ravel(), minlength=256)
                       for i in idx])
    want_cum = np.cumsum(counts, axis=-1).astype(np.float32)
    np.testing.assert_array_equal(cum, want_cum)
    want_eq = np.take_along_axis(want_cum, idx.reshape(b, -1),
                                 axis=-1).reshape(shape)
    np.testing.assert_array_equal(
        eq_raw[:, :h, :], want_eq)
    pad = eq_raw[:, h:, :]
    assert (pad == 0).all()
    print(f"  {h}x{w} ({plane_bytes / 1e6:.1f} MB, {path}): exact")


def check_fullhd_block() -> None:
    """The WHOLE fused extract block program at 1080p on hardware:
    row-tiled equalize inside the scene scan + AR-fitted detector +
    tracker + crops — the high-resolution e2e spot check
    (tests/test_extract_e2e.py::test_full_hd_film_e2e is the CPU
    twin)."""
    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.models.detector import fit_input_size
    from facerec_tpu.ops import scene as scene_ops
    from facerec_tpu.ops.crops import crop_resize
    from facerec_tpu.track import TrackerConfig, init_tracker
    from facerec_tpu.track.tracker import _run_block_impl

    b, h, w = 32, 1080, 1920
    size = fit_input_size(h, w, long_side=512)
    detector = DetectorHarness.create(
        input_size=size, max_detections=16, score_threshold=0.95,
        dtype=jnp.bfloat16)
    tracker_cfg = TrackerConfig(max_tracks=32, max_detections=16)

    def block(det_vars, frames, scene_state, tracker_state):
        flags, scene_state = scene_ops._detect_block_impl(
            frames, scene_state)
        det = detector._forward(det_vars, frames)
        tracker_state, emit = _run_block_impl(
            tracker_cfg, tracker_state, det.boxes, det.valid, flags,
            jnp.int32(0))
        crops = crop_resize(frames, jnp.zeros(16, jnp.int32),
                            jnp.tile(jnp.asarray(
                                [[100., 100., 260., 260.]]), (16, 1)),
                            160)
        return (flags.sum().astype(jnp.float32) + emit.box.sum()
                + crops.sum() + det.scores.astype(jnp.float32).sum())

    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.integers(0, 255, (b, h, w, 3)), jnp.uint8)
    out = jax.jit(block)(detector.variables, frames,
                         scene_ops.initial_state(h, w, crop=True),
                         init_tracker(tracker_cfg))
    assert np.isfinite(float(out)), out
    print(f"  fused 1080p block ({b} frames, detector {size}): finite")


def check_grouped_fetch_identity() -> None:
    """The production loop fetches many blocks' packed payloads as ONE
    jnp.concatenate'd device→host transfer; the joined bytes must be
    identical to fetching each payload alone ON HARDWARE — the CPU
    byte-identity tests can't rule out the TPU runtime laying out the
    concatenated uint8 buffer differently."""
    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.ops import scene as scene_ops
    from facerec_tpu.pipeline.extract import FusedBlockStep
    from facerec_tpu.track import TrackerConfig, init_tracker

    b, h, w = 32, 576, 768
    detector = DetectorHarness.create(
        input_size=(384, 512), max_detections=16, score_threshold=0.5,
        dtype=jnp.bfloat16)
    tracker_cfg = TrackerConfig(max_tracks=32, max_detections=16)
    fused = FusedBlockStep(detector, tracker_cfg)

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, (2 * b, h, w, 3)).astype(np.uint8)
    ss0 = scene_ops.initial_state(h, w, crop=True)
    ts0 = init_tracker(tracker_cfg)

    p0, ss, ts = fused(jnp.asarray(frames[:b]), ss0, ts0, 0)
    p1, ss, ts = fused(jnp.asarray(frames[b:]), ss, ts, b)
    alone = [np.asarray(p0), np.asarray(p1)]

    joined = np.asarray(jnp.concatenate([p0.ravel(), p1.ravel()]))
    np.testing.assert_array_equal(joined[:alone[0].size], alone[0])
    np.testing.assert_array_equal(joined[alone[0].size:], alone[1])
    print(f"  group-joined payload fetch ({b}-frame blocks): "
          "bit-identical")


def main():
    if jax.default_backend() != "tpu":
        print("No TPU present; nothing checked.")
        return 1
    rng = np.random.default_rng(3)
    print(f"device: {jax.devices()[0]}")
    check((4, 383, 768), rng)     # SD film post-crop, odd rows (fused)
    check((2, 960, 1920), rng)    # cropped 1080p, 7.4 MB (tiled)
    check((1, 2048, 4096), rng)   # 4K-class plane, 33.6 MB (tiled)
    check_fullhd_block()          # whole extract block at 1080p
    check_grouped_fetch_identity()
    print("TPU kernel check: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
