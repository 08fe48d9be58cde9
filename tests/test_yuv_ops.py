"""Device-side delta-I420 wire decode (ops/yuv.py) vs cv2 oracles."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from facerec_tpu.ops import yuv


def test_delta_decode_exact():
    """cumsum-mod-256 undoes uint8 wraparound differences bit for bit."""
    rng = np.random.default_rng(0)
    planes = rng.integers(0, 256, (17, 36, 48), dtype=np.uint8)
    delta = planes.copy()
    delta[1:] -= planes[:-1]
    out = np.asarray(yuv.delta_decode(jnp.asarray(delta)))
    np.testing.assert_array_equal(out, planes)


def test_i420_to_rgb_matches_cv2():
    """Device BT.601 limited-range conversion == cv2 YUV2RGB_I420
    within 1 LSB (fixed-point vs float rounding)."""
    rng = np.random.default_rng(1)
    h, w, b = 32, 48, 3
    frames = rng.integers(0, 256, (b, yuv.i420_rows(h), w),
                          dtype=np.uint8)
    ours = np.asarray(yuv.i420_to_rgb(jnp.asarray(frames), h))
    want = np.stack([cv2.cvtColor(f, cv2.COLOR_YUV2RGB_I420)
                     for f in frames])
    diff = np.abs(ours.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()


def test_wire_roundtrip_on_film_content():
    """encode_block → device decode reproduces film-like RGB within
    the 4:2:0 chroma re-quantization error (small on smooth content),
    and matches cv2's own I420 roundtrip within 1 LSB."""
    rng = np.random.default_rng(2)
    h, w, b = 48, 64, 5
    # smooth gradient scene + moving bright rectangle ("face")
    xs = np.linspace(0, 200, w, dtype=np.float32)
    base = np.broadcast_to(xs[None, :, None], (h, w, 3)).copy()
    frames = np.stack([base + 10.0 * i for i in range(b)])
    frames = np.clip(frames + rng.normal(0, 2, frames.shape), 0,
                     255).astype(np.uint8)
    for i in range(b):
        frames[i, 10:30, 5 + 3 * i:25 + 3 * i] = 230

    wire = yuv.encode_block(frames)
    assert wire.shape == (b, yuv.i420_rows(h), w)
    ours = np.asarray(yuv.delta_i420_to_rgb(jnp.asarray(wire), h))

    cv2_round = np.stack([
        cv2.cvtColor(cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420),
                     cv2.COLOR_YUV2RGB_I420) for f in frames])
    assert np.abs(ours.astype(int) - cv2_round.astype(int)).max() <= 1
    # vs the original RGB: bounded chroma requantization only
    assert np.abs(ours.astype(int)
                  - frames.astype(int)).max() <= 12


def test_i420_shape_validation():
    with pytest.raises(ValueError):
        yuv.i420_rows(33)
    with pytest.raises(ValueError):
        yuv.i420_to_rgb(jnp.zeros((1, 36, 47), jnp.uint8), 24)


def test_rgb_delta_roundtrip_exact():
    """The rgb-delta wire is LOSSLESS: uint8-wraparound host encode +
    modular-cumsum device decode reproduce RGB blocks bit for bit,
    including wraparound-heavy content."""
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, (9, 24, 32, 3), dtype=np.uint8)
    wire = yuv.encode_delta(frames)
    assert wire.shape == frames.shape and wire.dtype == np.uint8
    back = np.asarray(yuv.delta_decode(jnp.asarray(wire)))
    np.testing.assert_array_equal(back, frames)
    # deltas of static content are zero (the compressibility claim)
    static = np.broadcast_to(frames[:1], frames.shape).copy()
    assert (yuv.encode_delta(static)[1:] == 0).all()
