"""Parity toolchain: embedding-parity meter + detector distillation."""
import json
import os

import numpy as np
import pytest

from facerec_tpu.tools.embedding_eval import (evaluate_embedding_parity,
                                              match_records)


def _write_features(path, recs):
    with open(path, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


def _rec(frame, box, vecs):
    return {"frame": frame, "box": box,
            "embeddings": {k: list(map(float, v)) for k, v in vecs.items()}}


@pytest.fixture
def feature_pair(tmp_path, rng):
    """A reference features file and a near-identical 'ours' file:
    boxes jittered by 1px (IoU-matched, not byte-equal), vectors
    perturbed by ~1e-3 cosine distance."""
    dim = 8
    base = {f: rng.normal(size=(2, dim)) for f in (0, 5, 10)}
    ref, ours = [], []
    for f, vv in base.items():
        for k in range(2):
            v = vv[k] / np.linalg.norm(vv[k])
            box = [10 + 40 * k, 10, 40 + 40 * k, 50]
            ref.append(_rec(f, box, {"m1": v, "m2": -v}))
            v2 = v + rng.normal(size=dim) * 1e-3
            box2 = [b + 1 for b in box]
            ours.append(_rec(f, box2, {"m1": v2, "m2": -v2}))
    rp, op = str(tmp_path / "ref.jsonl"), str(tmp_path / "ours.jsonl")
    _write_features(rp, ref)
    _write_features(op, ours)
    return rp, op


def test_embedding_parity_pass(feature_pair):
    rp, op = feature_pair
    rep = evaluate_embedding_parity(rp, op, max_p95=0.05)
    assert rep["pass"] is True
    assert rep["n_matched"] == 6 and rep["match_rate"] == 1.0
    for name in ("m1", "m2"):
        ck = rep["checkpoints"][name]
        assert ck["n"] == 6
        assert ck["p95_cos_dist"] < 1e-3
        assert ck["pass"] is True


def test_embedding_parity_fail_on_divergent_checkpoint(tmp_path, rng):
    v = rng.normal(size=8)
    v /= np.linalg.norm(v)
    u = rng.normal(size=8)
    u /= np.linalg.norm(u)
    rp, op = str(tmp_path / "r.jsonl"), str(tmp_path / "o.jsonl")
    _write_features(rp, [_rec(0, [0, 0, 10, 10], {"m1": v, "m2": v})])
    # m1 matches, m2 is a different model entirely
    _write_features(op, [_rec(0, [0, 0, 10, 10], {"m1": v, "m2": u})])
    rep = evaluate_embedding_parity(rp, op, max_p95=0.05)
    assert rep["checkpoints"]["m1"]["pass"] is True
    assert rep["checkpoints"]["m2"]["pass"] is False
    assert rep["pass"] is False


def test_embedding_parity_match_rate_counts_misses(tmp_path, rng):
    v = rng.normal(size=4)
    rp, op = str(tmp_path / "r.jsonl"), str(tmp_path / "o.jsonl")
    _write_features(rp, [_rec(0, [0, 0, 10, 10], {"m1": v}),
                         _rec(1, [50, 50, 90, 90], {"m1": v})])
    _write_features(op, [_rec(0, [1, 1, 11, 11], {"m1": v})])
    rep = evaluate_embedding_parity(rp, op)
    assert rep["n_matched"] == 1 and rep["match_rate"] == 0.5


def test_match_records_is_one_to_one(rng):
    v = [0.0]
    ref = {0: [_rec(0, [0, 0, 10, 10], {"m": v}),
               _rec(0, [1, 1, 11, 11], {"m": v})]}
    ours = {0: [_rec(0, [0, 0, 10, 10], {"m": v})]}
    pairs = match_records(ref, ours, iou_thr=0.3)
    assert len(pairs) == 1     # a single candidate can't match twice


def test_embedding_eval_cli(feature_pair, tmp_path, capsys):
    from facerec_tpu.tools.embedding_eval import main

    rp, op = feature_pair
    out = str(tmp_path / "rep.json")
    rc = main(["--ref", rp, "--ours", op, "--out", out])
    assert rc == 0
    assert json.load(open(out))["pass"] is True
    rc = main(["--ref", rp, "--ours", op, "--max-p95", "1e-9"])
    assert rc == 1


# ---------------------------------------------------------------- distill

@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    from facerec_tpu.video.synth import make_clip

    path = str(tmp_path_factory.mktemp("dclips") / "42-Distill.mp4")
    return make_clip(path, n_frames=24, cuts=(), seed=13)


def truth_jsonl_from_clip(clip, path, every=2, with_keypoints=True):
    """Reference-style detections JSONL from the synthetic clip's
    ground truth (the schema of extract.py:186-195)."""
    with open(path, "w") as f:
        for frame in range(0, clip.n_frames, every):
            for box, lm in clip.truth.get(frame, []):
                rec = {"frame": frame,
                       "box": [float(v) for v in box]}
                if with_keypoints and lm is not None:
                    from facerec_tpu.train.distill import KEYPOINT_NAMES

                    rec["keypoints"] = {
                        k: [float(lm[i, 0]), float(lm[i, 1])]
                        for i, k in enumerate(KEYPOINT_NAMES)}
                f.write(json.dumps(rec) + "\n")
    return path


def test_distill_dataset_batches(clip, tmp_path):
    from facerec_tpu.train.distill import DistillDataset, load_truth

    tj = truth_jsonl_from_clip(clip, str(tmp_path / "t.jsonl"))
    truth = load_truth(tj)
    ds = DistillDataset(clip.path, truth, input_size=(64, 96),
                        max_boxes=8)
    assert len(ds) == len(truth) > 0
    assert ds.use_landmarks
    it = ds.batches(4, np.random.default_rng(0))
    ims, bxs, vds, lms, chw = next(it)
    assert ims.shape == (4, 64, 96, 3)
    assert bxs.shape == (4, 8, 4) and vds.shape == (4, 8)
    assert lms.shape == (4, 8, 5, 2)
    assert chw.shape == (4, 2) and (chw > 0).all() and (chw <= 96).all()
    # boxes land inside the letterboxed content
    assert (bxs[vds][:, 2] <= chw[:, 1].max() + 1e-3).all()
    # second epoch is served from the cache, identically shaped
    ims2 = next(it)[0]
    assert ims2.shape == ims.shape


def test_distill_box_only_truth_disables_landmarks(clip, tmp_path):
    from facerec_tpu.train.distill import DistillDataset, load_truth

    tj = truth_jsonl_from_clip(clip, str(tmp_path / "t.jsonl"),
                               with_keypoints=False)
    ds = DistillDataset(clip.path, load_truth(tj), input_size=(64, 96))
    assert not ds.use_landmarks


@pytest.mark.slow
def test_distill_improves_detection_parity(clip, tmp_path):
    """Distilling from reference-style detections improves P/R vs the
    reference's boxes on HELD-OUT frames (VERDICT r2 next-step #2b):
    train on even frames, evaluate on odd frames."""
    import jax.numpy as jnp

    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.models.detector import FaceDetector
    from facerec_tpu.models.weights import load_params
    from facerec_tpu.tools.detector_eval import (evaluate_detections,
                                                 harness_predictions)
    from facerec_tpu.train.distill import distill

    tj = truth_jsonl_from_clip(clip, str(tmp_path / "train.jsonl"),
                               every=2)
    out = str(tmp_path / "ckpt")
    size = (96, 128)     # 2/3 of 144x192, no letterbox padding
    mk = dict(fpn_features=16)
    losses = distill(clip.path, tj, out, steps=240, batch_size=4,
                     input_size=size, learning_rate=3e-3, seed=0,
                     model_kwargs=mk)
    assert losses[-1] < losses[0]

    def harness(variables):
        from facerec_tpu.models.facenet import cast_float_tree

        return DetectorHarness(
            model=FaceDetector(**mk),
            variables=cast_float_tree(variables, jnp.float32),
            input_size=size, max_detections=8, score_threshold=0.25,
            min_face_size=8.0)

    import cv2

    cap = cv2.VideoCapture(clip.path)
    frames = []
    i = 0
    while True:
        ret, fr = cap.read()
        if not ret:
            break
        if i % 2 == 1:                      # held out
            frames.append((i, np.ascontiguousarray(fr[..., ::-1])))
        i += 1
    cap.release()
    truth_odd = {f: [t[0].tolist() for t in clip.truth[f]]
                 for f in clip.truth if f % 2 == 1}

    trained = harness(dict(load_params(out)))
    model = FaceDetector(**mk)
    import jax

    random_vars = model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, *size, 3), jnp.float32))
    untrained = harness(dict(random_vars))

    m_pre = evaluate_detections(
        harness_predictions(untrained, frames), truth_odd, iou_thr=0.3)
    m_post = evaluate_detections(
        harness_predictions(trained, frames), truth_odd, iou_thr=0.3)
    assert m_post["n_matched"] > m_pre["n_matched"], (m_pre, m_post)
    assert m_post["recall"] > m_pre["recall"], (m_pre, m_post)


@pytest.mark.slow
def test_distill_trains_and_checkpoint_loads(clip, tmp_path):
    import jax.numpy as jnp

    from facerec_tpu.models.load import load_detector_harness
    from facerec_tpu.train.distill import distill

    tj = truth_jsonl_from_clip(clip, str(tmp_path / "t.jsonl"))
    out = str(tmp_path / "ckpt")
    losses = distill(clip.path, tj, out, steps=3, batch_size=2,
                     input_size=(64, 96), seed=0)
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)
    h = load_detector_harness(out, input_size=(64, 96),
                              max_detections=4, score_threshold=0.5)
    det = h(jnp.zeros((1, 48, 64, 3), jnp.uint8))
    assert det.boxes.shape[0] == 1


# ------------------------------------------------------- parity rehearsal

@pytest.mark.slow
def test_parity_rehearsal_end_to_end(tmp_path):
    """The one-command migration validator (VERDICT r3 next-step #3):
    refimpl-generated 'reference' features on a synthetic clip →
    distill → detector_eval → production extract → embedding_eval →
    single pass/fail report.  Also proves the FAIL branch and the CLI
    exit code with an existing checkpoint."""
    from facerec_tpu.config import ExtractConfig
    from facerec_tpu.pipeline.extract import run_extract
    from facerec_tpu.tools.parity_rehearsal import main, run_rehearsal
    from facerec_tpu.video.synth import ScriptedDetector, make_clip
    from tests.test_extract_e2e import StubEmbedderBank

    clip = make_clip(str(tmp_path / "99-Rehearse.mp4"), n_frames=32,
                     cuts=(), seed=7)
    # the stand-in "reference pipeline run" (same record schema as
    # /root/reference/facerec/extract.py:186-195)
    refout = str(tmp_path / "ref")
    cfg = ExtractConfig(block_frames=16, max_detections=8, max_tracks=16,
                        save_images=False, save_every=2, resume=False)
    run_extract(clip.path, cfg, refout,
                detector=ScriptedDetector(clip, max_detections=8),
                embedders=StubEmbedderBank())
    ref_feats = f"{refout}/99-data/features/features_99_0-32.jsonl"

    out = str(tmp_path / "rehearsal")
    # extract at a calibration-appropriate threshold: a freshly
    # distilled model's scores are not MTCNN-calibrated, so the 0.95
    # reference default would save nothing
    extract_cfg = ExtractConfig(block_frames=16, max_detections=8,
                                max_tracks=16, save_images=False,
                                save_every=2, resume=False,
                                detector_long_side=96,
                                face_threshold=0.5)
    rep = run_rehearsal(
        clip.path, ref_feats, out, steps=600, long_side=96,
        model_kwargs={"backbone_width": 32, "fpn_features": 16},
        distill_kwargs={"batch_size": 4, "learning_rate": 3e-3},
        max_p95=0.05, min_recall=0.5, min_precision=0.5,
        extract_cfg=extract_cfg, embedders=StubEmbedderBank())

    assert rep["pass"] is True
    assert rep["detector"]["pass"] is True
    assert rep["detector"]["recall"] >= 0.5
    assert rep["embeddings"]["pass"] is True
    assert rep["embeddings"]["n_matched"] > 0
    assert os.path.exists(f"{out}/parity_report.json")
    assert json.load(open(f"{out}/parity_report.json"))["pass"] is True

    # FAIL branch: impossible gate, reusing the distilled checkpoint
    rep2 = run_rehearsal(
        clip.path, ref_feats, str(tmp_path / "r2"),
        detector_weights=f"{out}/detector_ckpt", long_side=96,
        max_p95=0.05, min_recall=1.01, min_precision=0.5,
        extract_cfg=extract_cfg, embedders=StubEmbedderBank())
    assert rep2["detector"]["pass"] is False
    assert rep2["pass"] is False


@pytest.mark.slow
def test_parity_rehearsal_facenet_weights_dir_passes(tmp_path):
    """The remaining rehearsal branch (VERDICT r4 next-step #9): a
    4-checkpoint FaceNet weights dir (our orbax layout) flows through
    the rehearsal's production extract and the embedding gate PASSES on
    the real bank — the first real-weights user hits no first-time
    code.  The 'reference' run uses the SAME weights dir and the same
    scripted detector, so parity must hold exactly (same crops, same
    imported parameters)."""
    from facerec_tpu.config import (FACENET_DIMS, FACENET_MODELS,
                                    ExtractConfig)
    from facerec_tpu.models import FaceNetEmbedder
    from facerec_tpu.models.weights import save_params
    from facerec_tpu.pipeline.extract import run_extract
    from facerec_tpu.tools.parity_rehearsal import run_rehearsal
    from facerec_tpu.video.synth import ScriptedDetector, make_clip

    class EvalAwareScripted(ScriptedDetector):
        """ScriptedDetector that also satisfies the detector_eval
        protocol: harness_predictions batches (frame, image) pairs by
        POSITION, so the eval-phase calls replay truth in the known
        frame order instead of block offsets."""

        def __init__(self, clip, eval_order, **kw):
            super().__init__(clip, **kw)
            self._eval_order = list(eval_order)

        def __call__(self, frames):
            if not self._eval_order:
                return super().__call__(frames)
            idxs = self._eval_order[:frames.shape[0]]
            del self._eval_order[:len(idxs)]
            saved = self._frame0
            try:
                # replay one frame at a time at its absolute index
                import jax.numpy as jnp

                from facerec_tpu.models.detector import Detections
                outs = []
                for row, fi in enumerate(idxs):
                    self._frame0 = fi
                    outs.append(super().__call__(frames[row:row + 1]))
                return Detections(
                    jnp.concatenate([o.boxes for o in outs]),
                    jnp.concatenate([o.scores for o in outs]),
                    jnp.concatenate([o.landmarks for o in outs]),
                    jnp.concatenate([o.valid for o in outs]))
            finally:
                self._frame0 = saved

    wdir = str(tmp_path / "fweights")
    for i, name in enumerate(FACENET_MODELS):
        emb = FaceNetEmbedder(name, FACENET_DIMS[name], rng_seed=i)
        save_params(os.path.join(wdir, name), emb.variables)

    clip = make_clip(str(tmp_path / "97-Weights.mp4"), n_frames=16,
                     cuts=(), seed=5)
    cfg = ExtractConfig(block_frames=16, max_detections=8, max_tracks=16,
                        save_images=False, save_every=2, resume=False)
    refout = str(tmp_path / "ref")
    run_extract(clip.path, cfg, refout,
                detector=ScriptedDetector(clip, max_detections=8),
                facenet_weights=wdir)
    ref_feats = f"{refout}/97-data/features/features_97_0-16.jsonl"
    recs = [json.loads(l) for l in open(ref_feats)]
    assert recs and all(len(r["embeddings"]) == 4 for r in recs)

    eval_frames = sorted({r["frame"] for r in recs})
    rep = run_rehearsal(
        clip.path, ref_feats, str(tmp_path / "out"),
        facenet_weights=wdir, long_side=96, max_p95=1e-4,
        min_recall=0.9, min_precision=0.9, extract_cfg=cfg,
        detector=EvalAwareScripted(clip, eval_frames, max_detections=8))

    assert "distill" not in rep          # injected detector skips distill
    assert rep["detector"]["pass"] is True
    assert rep["embeddings"]["n_matched"] > 0
    # all four checkpoints imported and byte-identical crops → ~0 dist
    cks = rep["embeddings"]["checkpoints"]
    assert sorted(cks) == sorted(FACENET_MODELS)
    for name, ck in cks.items():
        assert ck["pass"] is True, (name, ck)
    assert rep["pass"] is True


@pytest.mark.slow
def test_parity_rehearsal_cli_exit_codes(tmp_path):
    """CLI surface: --detector-weights skips distill; exit 1 on a
    failing gate.  (The embedding gate fails here because the CLI path
    builds the REAL FaceNet bank with random weights — exactly what a
    user without --facenet-weights should see.)"""
    from facerec_tpu.config import ExtractConfig
    from facerec_tpu.pipeline.extract import run_extract
    from facerec_tpu.tools.parity_rehearsal import main
    from facerec_tpu.train.distill import distill
    from facerec_tpu.video.synth import ScriptedDetector, make_clip
    from tests.test_extract_e2e import StubEmbedderBank

    clip = make_clip(str(tmp_path / "98-Cli.mp4"), n_frames=16,
                     cuts=(), seed=9)
    refout = str(tmp_path / "ref")
    cfg = ExtractConfig(block_frames=16, max_detections=8, max_tracks=16,
                        save_images=False, save_every=2, resume=False)
    run_extract(clip.path, cfg, refout,
                detector=ScriptedDetector(clip, max_detections=8),
                embedders=StubEmbedderBank())
    ref_feats = f"{refout}/98-data/features/features_98_0-16.jsonl"
    ckpt = str(tmp_path / "ckpt")
    distill(clip.path, ref_feats, ckpt, steps=3, batch_size=2,
            input_size=(96, 96),
            model_kwargs={"backbone_width": 32, "fpn_features": 16})

    rc = main(["--film", clip.path, "--ref-features", ref_feats,
               "--out", str(tmp_path / "out"),
               "--detector-weights", ckpt, "--long-side", "96",
               "--min-recall", "0", "--min-precision", "0",
               "--max-eval-frames", "4"])
    assert rc == 1   # random FaceNet bank cannot pass embedding parity
