"""End-to-end self-check: train → extract → merge → cluster → score.

Trains the single-stage detector from scratch on synthetic face frames
(the same generator the tests use), deploys the trained weights through
the real extract CLI path on a fresh synthetic film, and scores the
pipeline's output against the clip's ground truth — detection
precision/recall at IoU 0.5, scene-cut exactness, trajectory counts.

This is the framework's built-in integration probe: it exercises the
trainer, weight save/load, the fused extract block step, trajectory
assembly, shard merge and clustering in one command, with no external
data or checkpoints.  The reference has no analogue (its quality
control is manual; SURVEY.md §4).

Usage:
    python -m facerec_tpu.tools.selfcheck --out /tmp/selfcheck \
        --train-steps 200
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def train_detector(steps: int, batch: int, input_size, deploy_hw,
                   face_size, seed: int = 0, log_every: int = 50):
    """Train FaceDetector from scratch on synthetic frames drawn in the
    DEPLOYED letterbox geometry.

    At inference the harness scales a (H, W) film frame by
    ``min(ih/H, iw/W)`` and zero-pads to ``input_size``; training frames
    are painted directly onto that scaled content area (with the film's
    face sizes scaled the same way) so the train and deploy
    distributions match.

    Returns (variables, losses).
    """
    import jax.numpy as jnp

    from facerec_tpu.models.detector import FaceDetector
    from facerec_tpu.train import DetectorTrainer
    from facerec_tpu.video.synth import synth_batch

    rng = np.random.default_rng(seed)
    trainer = DetectorTrainer(FaceDetector(), input_size=input_size,
                              learning_rate=1e-3)
    variables, opt_state = trainer.init()
    losses = []
    ih, iw = input_size
    dh, dw = deploy_hw
    scale = min(ih / dh, iw / dw)
    ch, cw = int(round(dh * scale)), int(round(dw * scale))
    scaled_faces = (face_size[0] * scale, face_size[1] * scale)
    for s in range(steps):
        frames, boxes, valid, ldm = synth_batch(
            rng, batch, cw, ch, face_size=scaled_faces)
        frames = np.pad(frames, ((0, 0), (0, ih - ch), (0, iw - cw),
                                 (0, 0)))
        variables, opt_state, loss = trainer.step(
            variables, opt_state, jnp.asarray(frames), jnp.asarray(boxes),
            jnp.asarray(valid), jnp.asarray(ldm))
        if s % log_every == 0 or s == steps - 1:
            losses.append(float(loss))
            print(f"step {s}: loss {losses[-1]:.3f}", flush=True)
    return variables, losses


def score_detections(data_dir: str, truth, iou_thr: float = 0.5):
    """One-to-one greedy matching of features.jsonl boxes against the
    per-frame ground truth: each truth box is consumed by at most one
    prediction, so duplicate detections count against precision."""
    def iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    preds_by_frame = {}
    with open(os.path.join(data_dir, "features.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            preds_by_frame.setdefault(rec["frame"], []).append(rec["box"])

    n_pred = n_match = n_truth = 0
    for fr, preds in preds_by_frame.items():
        gts = [t[0] for t in truth.get(fr, [])]
        used = [False] * len(gts)
        n_pred += len(preds)
        n_truth += len(gts)
        for p in preds:
            cand = [(iou(p, g), k) for k, g in enumerate(gts)
                    if not used[k]]
            if not cand:
                continue
            best, k = max(cand)
            if best >= iou_thr:
                used[k] = True
                n_match += 1
    precision = n_match / n_pred if n_pred else 0.0
    recall = n_match / n_truth if n_truth else 0.0
    return {"n_pred": n_pred, "n_matched": n_match,
            "precision": round(precision, 3), "recall": round(recall, 3)}


def main(argv=None):
    from facerec_tpu.runtime import ensure_platform

    ensure_platform()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--out", type=str, default="./selfcheck")
    parser.add_argument("--train-steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--film-frames", type=int, default=240)
    parser.add_argument("--face-threshold", type=float, default=0.9)
    parser.add_argument("--detector-size", type=int, default=512)
    args = parser.parse_args(argv)

    from facerec_tpu.config import ExtractConfig
    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.models.detector import FaceDetector
    from facerec_tpu.models.weights import load_params, save_params
    from facerec_tpu.pipeline import cluster as cluster_mod
    from facerec_tpu.pipeline import merge as merge_mod
    from facerec_tpu.pipeline.extract import run_extract
    from facerec_tpu.video.synth import make_clip

    os.makedirs(args.out, exist_ok=True)
    size = (args.detector_size, args.detector_size)
    film_hw = (576, 768)
    film_faces = (28.0, 44.0)   # make_clip's face-width range

    t0 = time.time()
    print("=== training detector on synthetic faces ===", flush=True)
    params, losses = train_detector(args.train_steps, args.batch, size,
                                    deploy_hw=film_hw,
                                    face_size=film_faces)
    weights_path = os.path.join(args.out, "detector.npz")
    save_params(weights_path, params)
    print(f"trained in {time.time() - t0:.0f}s; weights → {weights_path}",
          flush=True)

    print("=== running pipeline with trained detector ===", flush=True)
    clip = make_clip(os.path.join(args.out, "777-Selfcheck_Film.mp4"),
                     n_frames=args.film_frames, width=768, height=576,
                     cuts=(args.film_frames // 3,
                           2 * args.film_frames // 3), n_faces=2)
    detector = DetectorHarness(
        model=FaceDetector(), variables=load_params(weights_path, params),
        input_size=size, max_detections=16,
        score_threshold=args.face_threshold, min_face_size=20)
    data_root = os.path.join(args.out, "data")
    counters = run_extract(
        clip.path,
        ExtractConfig(face_threshold=args.face_threshold, resume=False),
        data_root, detector=detector)
    merge_mod.main(["--path", os.path.join(data_root, "*-data"),
                    "--min-face-size", "20"])
    cluster_mod.main(["--path", os.path.join(data_root, "*-data")])

    data_dir = os.path.join(data_root, "777-data")

    # Classify against a synthetic actor DB seeded from the film's own
    # feature vectors (cluster 0's mean = "actor 100") plus two
    # distractor identities — proves the full predictions.json path.
    import zipfile

    from facerec_tpu.config import EMB_NAME
    from facerec_tpu.pipeline import classify as classify_mod

    feats = [json.loads(l) for l in
             open(os.path.join(data_dir, "features.jsonl"))]
    rng = np.random.default_rng(7)
    actors_dir = os.path.join(args.out, "actors")
    os.makedirs(actors_dir, exist_ok=True)
    with zipfile.ZipFile(os.path.join(actors_dir, "actor-images.zip"),
                         "w") as z:
        for a in range(3):
            if a == 0 and feats:
                base = np.array(feats[0]["embeddings"][EMB_NAME])
                center = base / max(np.linalg.norm(base), 1e-9)
            else:
                center = rng.normal(size=128)
                center /= np.linalg.norm(center)
            for i in range(6):
                v = center + rng.normal(size=128) * 0.05
                z.writestr(f"img_{a}_{i}.jpeg.json", json.dumps({
                    "box": [0, 0, 10, 10],
                    "embeddings": {EMB_NAME: v.tolist()},
                    "actorID": str(100 + a),
                    "actorname": f"Actor {a}",
                }))
    classify_mod.main(["--path", data_dir, "--actors-dir", actors_dir])
    predictions = json.load(
        open(os.path.join(data_dir, "predictions.json")))

    report = {
        "predictions": predictions["predictions"],
        "train_loss_first": losses[0], "train_loss_last": losses[-1],
        "saved_boxes": counters.saved_boxes,
        "saved_trajectories": counters.saved_trajectories,
        "detection": score_detections(data_dir, clip.truth),
        "scene_cuts_found": json.load(
            open(os.path.join(data_dir, "scene_changes.json"))
        )["frame_indices"],
        "scene_cuts_truth": clip.scene_cuts,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.out, "selfcheck.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
