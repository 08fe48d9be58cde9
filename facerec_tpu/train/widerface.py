"""WIDER-FACE-style detector training on real data.

The reference sidesteps training entirely by shipping pretrained MTCNN
weights (/root/reference/facerec/detector.py:19-27); our single-stage
detector needs a production training path, and WIDER FACE is the
standard corpus for it.  This module parses the dataset's canonical
annotation format (``wider_face_train_bbx_gt.txt``: an image path
line, a face-count line, then one ``x y w h blur expression
illumination invalid occlusion pose`` line per face — a count of 0 is
followed by a single all-zero line), feeds letterboxed batches to
:class:`~facerec_tpu.train.detector_train.DetectorTrainer` (landmark
head untrained — bbx_gt has no landmarks), and saves an orbax
checkpoint that plugs into ``extract --detector-weights``.

Run:
  python -m facerec_tpu.train.widerface \
      --root WIDER_train/images \
      --ann wider_face_split/wider_face_train_bbx_gt.txt \
      --steps 20000 --out detector_ckpt
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Sample:
    path: str
    boxes: np.ndarray        # (G, 4) float32 xyxy, pixel coords
    invalid: np.ndarray      # (G,) bool — annotation's invalid flag


def parse_bbx_gt(ann_file: str) -> List[Sample]:
    """Parse the WIDER bbx_gt annotation format."""
    samples = []
    with open(ann_file) as f:
        lines = [l.rstrip("\n") for l in f]
    i = 0
    while i < len(lines):
        path = lines[i].strip()
        if not path:
            i += 1
            continue
        count = int(lines[i + 1].strip())
        rows = lines[i + 2:i + 2 + max(count, 1)]
        i += 2 + max(count, 1)
        boxes, invalid = [], []
        for row in rows[:count]:
            vals = [int(v) for v in row.split()[:10]]
            x, y, w, h = vals[:4]
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w, y + h])
            invalid.append(bool(vals[7]) if len(vals) > 7 else False)
        samples.append(Sample(
            path,
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(invalid, bool).reshape(-1)))
    return samples


class WiderFaceDataset:
    """Letterboxed training batches from a WIDER-FACE directory tree."""

    def __init__(self, images_root: str, ann_file: str,
                 input_size: Tuple[int, int] = (640, 640),
                 max_boxes: int = 32, min_face: float = 8.0):
        self.images_root = images_root
        self.input_size = input_size
        self.max_boxes = max_boxes
        self.min_face = min_face
        self.samples = [s for s in parse_bbx_gt(ann_file)
                        if len(s.boxes)]

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, idx: int):
        """→ (image (ih, iw, 3) uint8 RGB letterboxed, boxes (M, 4),
        valid (M,), content_hw (2,) int32) with M = max_boxes padding.
        ``content_hw`` is the letterboxed content size (sh, sw) — the
        trainer ignores anchors centred on the zero padding instead of
        leaving them in the 0.3-0.5 IoU ignore band (the
        'confident padding anchors drift at deploy' failure documented
        in docs/DESIGN.md)."""
        import cv2

        s = self.samples[idx]
        img = cv2.imread(os.path.join(self.images_root, s.path),
                         cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(s.path)
        img = img[..., ::-1]                      # BGR → RGB
        h, w = img.shape[:2]
        ih, iw = self.input_size
        scale = min(ih / h, iw / w)
        sh, sw = int(round(h * scale)), int(round(w * scale))
        img = cv2.resize(np.ascontiguousarray(img), (sw, sh))
        canvas = np.zeros((ih, iw, 3), np.uint8)
        canvas[:sh, :sw] = img

        boxes = s.boxes * scale
        wh = np.minimum(boxes[:, 2] - boxes[:, 0],
                        boxes[:, 3] - boxes[:, 1])
        keep = (~s.invalid) & (wh >= self.min_face)
        boxes = boxes[keep][:self.max_boxes]

        m = self.max_boxes
        out_boxes = np.zeros((m, 4), np.float32)
        out_valid = np.zeros((m,), bool)
        out_boxes[:len(boxes)] = boxes
        out_valid[:len(boxes)] = True
        return (canvas, out_boxes, out_valid,
                np.array([sh, sw], np.int32))

    def batches(self, batch_size: int, rng: np.random.Generator
                ) -> Iterator[tuple]:
        """Endless shuffled batches:
        (images (B,ih,iw,3) u8, boxes (B,M,4), valid (B,M),
        landmarks zeros (B,M,5,2), content_hw (B,2) i32)."""
        order = np.arange(len(self.samples))
        while True:
            rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                idxs = order[i:i + batch_size]
                ims, bxs, vds, chw = zip(*(self.load(j) for j in idxs))
                yield (np.stack(ims), np.stack(bxs), np.stack(vds),
                       np.zeros((batch_size, self.max_boxes, 5, 2),
                                np.float32),
                       np.stack(chw))


def train(images_root: str, ann_file: str, out: str, steps: int,
          batch_size: int = 16, input_size: Tuple[int, int] = (640, 640),
          learning_rate: float = 1e-3, seed: int = 0,
          log_every: int = 50, recalibrate: bool = True) -> list:
    """Train the detector on WIDER-FACE data; saves an orbax checkpoint
    consumable by ``--detector-weights``.  Returns the loss history."""
    import jax.numpy as jnp

    from facerec_tpu.models.detector import FaceDetector
    from facerec_tpu.models.weights import save_params
    from facerec_tpu.train.detector_train import DetectorTrainer

    ds = WiderFaceDataset(images_root, ann_file, input_size=input_size)
    if len(ds) < batch_size:
        raise RuntimeError(
            f"only {len(ds)} annotated images under {ann_file}")
    print(f"WIDER-FACE: {len(ds)} images, input {input_size}")

    trainer = DetectorTrainer(FaceDetector(), input_size=input_size,
                              learning_rate=learning_rate,
                              use_landmarks=False)
    variables, opt_state = trainer.init(seed)
    rng = np.random.default_rng(seed)
    losses = []
    for step, (ims, bxs, vds, ldm, chw) in enumerate(
            ds.batches(batch_size, rng)):
        if step >= steps:
            break
        variables, opt_state, loss = trainer.step(
            variables, opt_state, jnp.asarray(ims), jnp.asarray(bxs),
            jnp.asarray(vds), jnp.asarray(ldm),
            content_hw=jnp.asarray(chw))
        losses.append(float(loss))
        if step % log_every == 0:
            print(f"step {step}: loss {losses[-1]:.4f}", flush=True)
    if recalibrate:
        # Post-training BN running-stat refresh on dataset batches —
        # negligible at the 20k-step default (0.995^20000 ≈ 0) but a
        # short-budget run otherwise deploys with running statistics
        # still ~0.995^steps anchored to their initialization
        # (train/recalibrate.py, docs/DESIGN.md "BN recalibration").
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

        print("recalibrating BN statistics on dataset batches",
              flush=True)
        variables = recalibrate_batch_stats(variables, _cal_batches(),
                                            _apply_batch)
    save_params(os.path.abspath(out), variables)
    print(f"saved detector checkpoint to {out}")
    return losses


def main(argv=None):
    from facerec_tpu.runtime import ensure_platform

    ensure_platform()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--root", required=True,
                        help="WIDER images root (contains event dirs)")
    parser.add_argument("--ann", required=True,
                        help="wider_face_*_bbx_gt.txt annotation file")
    parser.add_argument("--out", default="./detector_ckpt")
    parser.add_argument("--steps", type=int, default=20000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=640)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--no-recalibrate", dest="recalibrate",
                        action="store_false",
                        help="skip the post-training BN statistics "
                             "recalibration on dataset batches")
    args = parser.parse_args(argv)
    train(args.root, args.ann, args.out, args.steps, args.batch,
          (args.size, args.size), args.lr,
          recalibrate=args.recalibrate)


if __name__ == "__main__":
    main()
