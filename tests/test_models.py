"""Model smoke + invariance tests (shapes, normalization, batching)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facerec_tpu.models import FaceNetEmbedder, DetectorHarness


@pytest.fixture(scope="module")
def embedder():
    return FaceNetEmbedder("test", embedding_dim=128)


@pytest.fixture(scope="module")
def detector():
    return DetectorHarness.create(
        input_size=(128, 128), max_detections=8, score_threshold=0.5)


def test_facenet_shapes_and_norm(embedder, rng):
    crops = rng.integers(0, 255, (3, 160, 160, 3)).astype(np.uint8)
    emb = np.asarray(embedder(jnp.asarray(crops)))
    assert emb.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_facenet_batch_independent(embedder, rng):
    crops = rng.integers(0, 255, (4, 160, 160, 3)).astype(np.uint8)
    full = np.asarray(embedder(jnp.asarray(crops)))
    single = np.asarray(embedder(jnp.asarray(crops[1:2])))
    np.testing.assert_allclose(full[1], single[0], atol=1e-4)


def test_facenet_param_count(embedder):
    n = sum(np.prod(p.shape) for p in
            jax.tree.leaves(embedder.variables["params"]))
    # Inception-ResNet-v1 ~ 22-24M params at dim 128
    assert 18e6 < n < 30e6, n


def test_detector_shapes(detector, rng):
    frames = rng.integers(0, 255, (2, 96, 128, 3)).astype(np.uint8)
    det = detector(jnp.asarray(frames))
    assert det.boxes.shape == (2, 8, 4)
    assert det.scores.shape == (2, 8)
    assert det.landmarks.shape == (2, 8, 5, 2)
    assert det.valid.shape == (2, 8)
    b = np.asarray(det.boxes)
    assert (b >= 0).all()
    assert (b[..., [0, 2]] <= 128).all() and (b[..., [1, 3]] <= 96).all()


def test_detector_valid_implies_threshold_and_order(detector, rng):
    frames = rng.integers(0, 255, (1, 96, 128, 3)).astype(np.uint8)
    det = detector(jnp.asarray(frames))
    scores = np.asarray(det.scores[0])
    valid = np.asarray(det.valid[0])
    if valid.any():
        assert (scores[valid] > 0.5).all()
        # NMS emits in descending score order
        sv = scores[valid]
        assert (np.diff(sv) <= 1e-6).all()


def test_detector_jit_stability(detector, rng):
    frames = jnp.asarray(rng.integers(0, 255, (1, 96, 128, 3)), jnp.uint8)
    jitted = jax.jit(lambda f: detector(f))
    a = jitted(frames)
    b = detector(frames)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               atol=1e-5)


@pytest.mark.slow
def test_pooled_embedders_match_individual(rng):
    """The one-program vmapped-backbone embed must reproduce each
    checkpoint's individual forward to f32 roundoff."""
    import jax.numpy as jnp

    from facerec_tpu.config import FACENET_DIMS, FACENET_MODELS
    from facerec_tpu.models import FaceNetEmbedder
    from facerec_tpu.models.facenet import PooledStackedEmbedders

    embs = [FaceNetEmbedder(n, FACENET_DIMS[n], rng_seed=i)
            for i, n in enumerate(FACENET_MODELS)]
    pooled = PooledStackedEmbedders(embs)
    crops = jnp.asarray(rng.integers(0, 255, (2, 160, 160, 3)), jnp.uint8)
    outs = pooled(crops)
    for e, o in zip(embs, outs):
        np.testing.assert_allclose(np.asarray(e(crops)), np.asarray(o),
                                   atol=1e-5)


@pytest.mark.slow
def test_pooled_fold_stem_matches_unrolled(rng):
    """FACEREC_STEM_FOLD runs the checkpoints' stems as ONE grouped
    pass; matched math with the unrolled stems to f32 conv roundoff
    (not bit-identical: conv-sum reassociation)."""
    import jax.numpy as jnp

    from facerec_tpu.models import FaceNetEmbedder
    from facerec_tpu.models.facenet import (PooledStackedEmbedders,
                                            _jitted_pooled_embed)

    embs = [FaceNetEmbedder(f"ck{i}", 128, rng_seed=i) for i in range(2)]
    pooled = PooledStackedEmbedders(embs)
    crops = jnp.asarray(rng.integers(0, 255, (3, 160, 160, 3)), jnp.uint8)
    fold = _jitted_pooled_embed(2, jnp.float32, fold_stem=True)(
        pooled.backbone_stack, pooled.bottlenecks, crops)
    unrolled = _jitted_pooled_embed(2, jnp.float32, fold_stem=False)(
        pooled.backbone_stack, pooled.bottlenecks, crops)
    for a, b in zip(fold, unrolled):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)


def test_fit_input_size():
    from facerec_tpu.models.detector import fit_input_size

    # 576x768 film: long side 768 → scale 2/3 → exactly 384x512, no pad
    assert fit_input_size(576, 768) == (384, 512)
    # square stays square
    assert fit_input_size(512, 512) == (512, 512)
    # portrait flips
    assert fit_input_size(768, 576) == (512, 384)
    # rounding goes up to the stride multiple, never below it
    assert fit_input_size(570, 768) == (384, 512)
    assert fit_input_size(20, 768) == (32, 512)
    h, w = fit_input_size(480, 720)
    assert h % 32 == 0 and w % 32 == 0
    assert h >= 480 * (512 / 720) and w == 512


def test_detector_ar_fitted_input_runs(detector, rng):
    """The same conv variables run at an AR-fitted input size (the
    model is fully convolutional); content scale must match."""
    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.models.detector import fit_input_size
    import dataclasses

    size = fit_input_size(144, 192, long_side=128)
    assert size == (96, 128)
    fitted = dataclasses.replace(detector, input_size=size)
    frames = jnp.asarray(rng.integers(0, 255, (2, 144, 192, 3)), jnp.uint8)
    det = jax.jit(fitted._forward)(fitted.variables, frames)
    assert det.boxes.shape == (2, 8, 4)
    # boxes map back to display coordinates
    assert float(det.boxes.max()) <= 192.0


def test_fit_input_size_small_film_no_upscale():
    from facerec_tpu.models.detector import fit_input_size

    # frames smaller than the target long side are padded, not upscaled
    assert fit_input_size(150, 214) == (160, 224)
    assert fit_input_size(100, 100) == (128, 128)


@pytest.mark.slow
def test_build_detector_honors_config_backbone_width(monkeypatch):
    """ExtractConfig.backbone_width reaches random-init harnesses (the
    gated speed knob); checkpoints keep inferring their own width."""
    from facerec_tpu.config import ExtractConfig
    from facerec_tpu.pipeline.extract import build_detector

    monkeypatch.setenv("FACEREC_ALLOW_RANDOM", "1")
    cfg = ExtractConfig(backbone_width=72, detector_long_side=64)
    h = build_detector(cfg, 48, 64, detector_weights=None)
    assert h.model.backbone_width == 72
    stem = h.variables["params"]["stem"]["Conv_0"]["kernel"]
    assert stem.shape[-1] == 72
