"""A/B: BN running-stat recalibration on saved selfcheck checkpoints.

A short-budget probe leaves BatchNorm running statistics ~37% stale
(momentum 0.995 over 200 steps keeps 0.995^200 of the INIT stats);
docs/DESIGN.md "BN recalibration" records the w=128 probe whose
eval-mode logits reached 4.4e4 against a sane train-mode max of 6.1.
This script deploys a saved detector checkpoint on the selfcheck film
twice — as-saved vs after `recalibrate_detector` (exact EMA unwinding
over deploy-matched synthetic batches) — and scores detections against
ground truth, isolating what the stale statistics cost.

Usage:
    python scripts/recal_ab.py --ckpt /tmp/sc_w128/detector.npz \
        --width 128 [--out /tmp/recal_ab] [--film-frames 240]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from facerec_tpu.runtime import ensure_platform

ensure_platform()


class _StubBank:
    """Deterministic host-side embedder: pooled pixels → projection.

    Embeddings are irrelevant to the detection score; skipping the real
    FaceNet bank keeps the A/B's compile surface to the detector only.
    """

    supports_deferred = False

    def __init__(self, names=("m1", "m2"), dim=16, seed=0):
        rng = np.random.default_rng(seed)
        self.proj = {n: rng.normal(size=(75, dim)).astype(np.float32)
                     for n in names}

    def __call__(self, crops):
        x = np.asarray(crops, np.float32)
        n = x.shape[0]
        pooled = x.reshape(n, 5, 32, 5, 32, 3).mean(axis=(2, 4))
        flat = pooled.reshape(n, -1) / 255.0
        out = {}
        for name, p in self.proj.items():
            e = flat @ p
            e /= np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-9)
            out[name] = e
        return out


def deploy_and_score(tag, variables, width, detector_size, clip, out):
    from facerec_tpu.config import ExtractConfig
    from facerec_tpu.models.detector import DetectorHarness, FaceDetector
    from facerec_tpu.pipeline import merge as merge_mod
    from facerec_tpu.pipeline.extract import run_extract
    from facerec_tpu.tools.selfcheck import score_detections

    detector = DetectorHarness(
        model=FaceDetector(backbone_width=width), variables=variables,
        input_size=(detector_size, detector_size), max_detections=16,
        score_threshold=0.9, min_face_size=20)
    data_root = os.path.join(out, tag)
    run_extract(clip.path,
                ExtractConfig(face_threshold=0.9, resume=False,
                              save_images=False),
                data_root, detector=detector, embedders=_StubBank())
    merge_mod.main(["--path", os.path.join(data_root, "*-data"),
                    "--min-face-size", "20"])
    det = score_detections(os.path.join(data_root, "777-data"), clip.truth)
    print(f"[{tag}] {det}", flush=True)
    return det


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="orbax detector checkpoint dir (selfcheck's "
                        "<out>/detector.npz)")
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--detector-size", type=int, default=512)
    p.add_argument("--film-frames", type=int, default=240)
    p.add_argument("--film-width", type=int, default=768)
    p.add_argument("--film-height", type=int, default=576)
    p.add_argument("--identities", type=int, default=4)
    p.add_argument("--n-batches", type=int, default=32)
    p.add_argument("--out", default="/tmp/recal_ab")
    args = p.parse_args()

    import jax

    from facerec_tpu.models.detector import FaceDetector
    from facerec_tpu.models.weights import load_params
    from facerec_tpu.tools.selfcheck import recalibrate_detector
    from facerec_tpu.video.synth import make_clip

    model = FaceDetector(backbone_width=args.width)
    size = (args.detector_size, args.detector_size)
    template = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, *size, 3), np.float32))
    variables = load_params(os.path.abspath(args.ckpt), dict(template))

    os.makedirs(args.out, exist_ok=True)
    clip = make_clip(os.path.join(args.out, "777-Recal_Film.mp4"),
                     n_frames=args.film_frames, width=args.film_width,
                     height=args.film_height,
                     cuts=(args.film_frames // 3,
                           2 * args.film_frames // 3), n_faces=2,
                     identities=args.identities)

    before = deploy_and_score("before", variables, args.width,
                              args.detector_size, clip, args.out)
    film_hw = (args.film_height, args.film_width)
    recal = recalibrate_detector(model, variables, size, film_hw,
                                 (28.0, 44.0), n_batches=args.n_batches)
    after = deploy_and_score("after", recal, args.width,
                             args.detector_size, clip, args.out)

    report = {"ckpt": args.ckpt, "width": args.width,
              "n_batches": args.n_batches,
              "before": before, "after": after}
    with open(os.path.join(args.out, "recal_ab.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
