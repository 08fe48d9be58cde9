"""Detector distillation from reference-produced detections.

The reference ships pretrained MTCNN weights
(/root/reference/facerec/detector.py:19-27) that cannot be translated
into our single-stage FPN+SSH detector weight-for-weight.  The
practical parity path for a real user is DISTILLATION: run the
reference once on a film (or reuse an existing run's
``features.jsonl`` — its records carry the detector's boxes and
5-point keypoints, extract.py:186-195), then train our detector on
those detections over the decoded frames.  One reference run is
sufficient supervision; no WIDER-FACE download needed.

Truth formats accepted (auto-detected per record):
  - ``{"frame": i, "box": [x1,y1,x2,y2]}`` — detector dumps
    (the same JSONL ``tools/detector_eval.py`` consumes);
  - full feature records with ``keypoints`` — then the landmark head
    trains too.

Run:
  python -m facerec_tpu.train.distill \
      --film 125261-Name.mp4 --truth ref-data/features.jsonl \
      --steps 4000 --out detector_ckpt
then measure parity:
  python -m facerec_tpu.tools.detector_eval --film ... \
      --boxes-jsonl ref-data/features.jsonl --weights detector_ckpt
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

KEYPOINT_NAMES = ("left_eye", "right_eye", "nose", "mouth_left",
                  "mouth_right")


def load_truth(path: str) -> Dict[int, List[Tuple[np.ndarray,
                                                  Optional[np.ndarray]]]]:
    """JSONL → frame → [(box xyxy f32, landmarks (5,2) f32 or None)]."""
    truth: Dict[int, list] = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            box = np.asarray(rec["box"], np.float32)
            lm = None
            kp = rec.get("keypoints")
            if kp and all(k in kp for k in KEYPOINT_NAMES):
                lm = np.asarray([kp[k] for k in KEYPOINT_NAMES],
                                np.float32)
            truth.setdefault(int(rec["frame"]), []).append((box, lm))
    return truth


class DistillDataset:
    """Letterboxed training batches from a film + truth detections.

    Frames with truth are decoded once per epoch (streaming — a film
    does not fit in memory) and letterboxed into the detector input
    exactly as :class:`~facerec_tpu.models.DetectorHarness` letterboxes
    at deploy time, with ``content_hw`` marking the padded area.  Small
    runs are cached in memory (``cache_frames``) so later epochs skip
    the decode.
    """

    def __init__(self, film: str, truth: Dict[int, list],
                 input_size: Tuple[int, int], max_boxes: int = 32,
                 cache_frames: int = 4096):
        self.film = film
        self.truth = {f: v for f, v in truth.items() if v}
        self.input_size = input_size
        self.max_boxes = max_boxes
        self.cache_frames = cache_frames
        self._cache: Optional[Dict[int, tuple]] = None
        self.use_landmarks = all(
            lm is not None for recs in self.truth.values()
            for _, lm in recs)

    def __len__(self) -> int:
        return len(self.truth)

    def _letterbox(self, img: np.ndarray, frame: int) -> tuple:
        ih, iw = self.input_size
        h, w = img.shape[:2]
        scale = min(ih / h, iw / w)
        sh, sw = int(round(h * scale)), int(round(w * scale))
        import cv2

        canvas = np.zeros((ih, iw, 3), np.uint8)
        canvas[:sh, :sw] = cv2.resize(np.ascontiguousarray(img), (sw, sh))

        m = self.max_boxes
        boxes = np.zeros((m, 4), np.float32)
        valid = np.zeros((m,), bool)
        lms = np.zeros((m, 5, 2), np.float32)
        for k, (box, lm) in enumerate(self.truth[frame][:m]):
            boxes[k] = box * scale
            valid[k] = True
            if lm is not None:
                lms[k] = lm * scale
        return canvas, boxes, valid, lms, np.array([sh, sw], np.int32)

    def _samples(self):
        """Yield (frame, letterboxed tuple) for every truth frame, in
        frame order, decoding the film once."""
        if self._cache is not None:
            for f in sorted(self._cache):
                yield f, self._cache[f]
            return
        import cv2

        wanted = set(self.truth)
        cache: Optional[Dict[int, tuple]] = (
            {} if len(wanted) <= self.cache_frames else None)
        cap = cv2.VideoCapture(self.film)
        try:
            i = 0
            remaining = set(wanted)
            while remaining:
                ret, frame = cap.read()
                if not ret:
                    break
                if i in wanted:
                    sample = self._letterbox(
                        np.ascontiguousarray(frame[..., ::-1]), i)
                    if cache is not None:
                        cache[i] = sample
                    remaining.discard(i)
                    yield i, sample
                i += 1
        finally:
            cap.release()
        if cache is not None:
            self._cache = cache

    def batches(self, batch_size: int, rng: np.random.Generator):
        """Endless batches: (ims u8, boxes, valid, landmarks,
        content_hw).  Within an epoch samples stream in frame order
        (decode is sequential); batch composition is randomized by a
        shuffled carry-over pool."""
        pool: List[tuple] = []
        while True:
            for _f, sample in self._samples():
                pool.append(sample)
                if len(pool) >= 4 * batch_size:
                    rng.shuffle(pool)
                    batch, pool = pool[:batch_size], pool[batch_size:]
                    yield self._stack(batch)
            while len(pool) >= batch_size:
                rng.shuffle(pool)
                batch, pool = pool[:batch_size], pool[batch_size:]
                yield self._stack(batch)

    @staticmethod
    def _stack(batch):
        ims, bxs, vds, lms, chw = zip(*batch)
        return (np.stack(ims), np.stack(bxs), np.stack(vds),
                np.stack(lms), np.stack(chw))


def distill(film: str, truth_path: str, out: str, steps: int,
            batch_size: int = 16,
            input_size: Optional[Tuple[int, int]] = None,
            long_side: int = 512, learning_rate: float = 1e-3,
            init_weights: Optional[str] = None, seed: int = 0,
            log_every: int = 50,
            model_kwargs: Optional[dict] = None,
            recalibrate: bool = True) -> list:
    """Train the detector toward the reference's detections; saves an
    orbax checkpoint consumable by ``--detector-weights``.  Returns the
    loss history."""
    import jax.numpy as jnp

    from facerec_tpu.models.detector import FaceDetector, fit_input_size
    from facerec_tpu.models.weights import save_params
    from facerec_tpu.train.detector_train import DetectorTrainer
    from facerec_tpu.video.reader import probe_video

    truth = load_truth(truth_path)
    if input_size is None:
        info = probe_video(film, None)
        input_size = fit_input_size(info.display_height,
                                    info.display_width,
                                    long_side=long_side)
    ds = DistillDataset(film, truth, input_size=input_size)
    if len(ds) == 0:
        raise RuntimeError(f"no truth frames found in {truth_path}")
    print(f"distill: {len(ds)} truth frames, input {input_size}, "
          f"landmarks={'on' if ds.use_landmarks else 'off'}")

    trainer = DetectorTrainer(FaceDetector(**(model_kwargs or {})),
                              input_size=input_size,
                              learning_rate=learning_rate,
                              use_landmarks=ds.use_landmarks)
    if init_weights is not None:
        from facerec_tpu.models.weights import load_params

        variables = dict(load_params(init_weights))
        opt_state = trainer.tx.init(variables["params"])
    else:
        variables, opt_state = trainer.init(seed)
    rng = np.random.default_rng(seed)
    losses = []
    for step, (ims, bxs, vds, lms, chw) in enumerate(
            ds.batches(batch_size, rng)):
        if step >= steps:
            break
        variables, opt_state, loss = trainer.step(
            variables, opt_state, jnp.asarray(ims), jnp.asarray(bxs),
            jnp.asarray(vds), jnp.asarray(lms),
            content_hw=jnp.asarray(chw))
        losses.append(float(loss))
        if step % log_every == 0:
            print(f"step {step}: loss {losses[-1]:.4f}", flush=True)
    if recalibrate:
        # Post-training BN running-stat refresh on film batches through
        # the same letterbox — short distill budgets otherwise deploy
        # with stats still ~0.995^steps stale (train/recalibrate.py).
        import jax

        from facerec_tpu.train.recalibrate import recalibrate_batch_stats

        @jax.jit
        def _apply_batch(v, x):
            xin = (x.astype(jnp.float32) - 127.5) / 128.0
            _, mut = trainer.model.apply(v, xin, train=True,
                                         mutable=["batch_stats"])
            return mut["batch_stats"]

        def _cal_batches(n=32):
            it = ds.batches(batch_size, np.random.default_rng(seed + 99))
            for i, (ims, *_rest) in enumerate(it):
                if i >= n:
                    break
                yield jnp.asarray(ims)

        print("recalibrating BN statistics on film batches", flush=True)
        variables = recalibrate_batch_stats(variables, _cal_batches(),
                                            _apply_batch)
    save_params(os.path.abspath(out), variables)
    # self-describing checkpoint: record the model hyperparameters so
    # load_detector_harness reconstructs non-default architectures
    # (fpn_features etc.) without the caller re-supplying them
    with open(os.path.abspath(out) + ".model.json", "w") as f:
        json.dump(model_kwargs or {}, f)
    print(f"saved distilled detector checkpoint to {out}")
    return losses


def main(argv=None):
    from facerec_tpu.runtime import ensure_platform

    ensure_platform()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--film", required=True)
    parser.add_argument("--truth", required=True,
                        help="reference detections JSONL (features.jsonl "
                             "works directly)")
    parser.add_argument("--out", default="./detector_ckpt")
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--long-side", type=int, default=512,
                        help="AR-fitted detector input long side "
                             "(match the deploy setting)")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--init-weights", default=None,
                        help="warm-start from an existing checkpoint "
                             "(e.g. a WIDER-FACE pretrain)")
    parser.add_argument("--backbone-width", type=int, default=96,
                        help="detector backbone width (the checkpoint "
                             "records it; load_detector_harness infers "
                             "it back)")
    parser.add_argument("--no-recalibrate", dest="recalibrate",
                        action="store_false",
                        help="skip the post-training BN running-stat "
                             "recalibration on film batches")
    args = parser.parse_args(argv)
    distill(args.film, args.truth, args.out, args.steps, args.batch,
            long_side=args.long_side, learning_rate=args.lr,
            init_weights=args.init_weights,
            model_kwargs={"backbone_width": args.backbone_width},
            recalibrate=args.recalibrate)


if __name__ == "__main__":
    main()
