"""Periodic strided-slice letterbox resize vs jax.image.resize."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facerec_tpu.ops.resize import _axis_plan, letterbox_resize


@pytest.mark.parametrize("h,w,sh,sw,periodic", [
    (576, 768, 384, 512, True),     # film 2/3 downscale
    (144, 192, 96, 128, True),      # synthetic clip 2/3
    (576, 768, 288, 384, True),     # 1/2
    (210, 150, 96, 64, False),      # irregular → fallback
])
@pytest.mark.slow
def test_matches_xla_resize(rng, h, w, sh, sw, periodic):
    x = jnp.asarray(rng.uniform(0, 255, (2, h, w, 3)), jnp.float32)
    want = jax.image.resize(x, (2, sh, sw, 3), "bilinear")
    got = letterbox_resize(x, (sh, sw), method="auto")
    assert float(jnp.abs(want - got).max()) < 2e-3
    assert (_axis_plan(h, sh) is not None) == periodic


def test_upscale_and_identity_fall_back(rng):
    assert _axis_plan(100, 100) is None
    assert _axis_plan(100, 150) is None
    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)), jnp.float32)
    got = letterbox_resize(x, (64, 64), method="auto")   # W only
    want = jax.image.resize(x, (1, 64, 64, 3), "bilinear")
    assert float(jnp.abs(want - got).max()) < 2e-3


def test_first_use_inside_jit_trace(rng):
    """Plan extraction must work when first reached INSIDE a jit trace
    (the fused extract block program does exactly this): the eye/resize
    weight probe must evaluate eagerly, not stage tracers."""
    _axis_plan.cache_clear()
    x = jnp.asarray(rng.uniform(0, 255, (1, 432, 576, 3)), jnp.float32)

    @jax.jit
    def f(x):
        return letterbox_resize(x, (288, 384), method="periodic")

    got = f(x)
    want = jax.image.resize(x, (1, 288, 384, 3), "bilinear")
    assert float(jnp.abs(want - got).max()) < 2e-3


@pytest.mark.slow
def test_detector_detections_identical_across_resize_paths(rng,
                                                           monkeypatch):
    """The parity requirement: periodic-resize detections == XLA-resize
    detections (same valid mask, boxes within float-order noise)."""
    from facerec_tpu.models import DetectorHarness

    frames = jnp.asarray(rng.integers(0, 255, (4, 144, 192, 3)),
                         jnp.uint8)
    h = DetectorHarness.create(input_size=(96, 128), max_detections=8,
                               score_threshold=0.05)

    monkeypatch.setenv("FACEREC_RESIZE", "xla")
    a = jax.jit(h._forward)(h.variables, frames)
    monkeypatch.setenv("FACEREC_RESIZE", "periodic")
    b = jax.jit(h._forward)(h.variables, frames)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    va = np.asarray(a.valid)
    np.testing.assert_allclose(np.asarray(a.boxes)[va],
                               np.asarray(b.boxes)[va], atol=0.1)
