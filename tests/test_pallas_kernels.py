"""Pallas TPU kernels, validated on CPU via interpreter mode.

All kernel arithmetic is exact (integer counts in f32); the final cdf
division is strength-reduced by XLA with per-lowering rounding, so the
contract vs the jnp path and numpy is 1 ulp (2e-5 on the 0-255 scale)
— far below the integer scene-decision thresholds.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from facerec_tpu.ops import scene as scene_ops
from facerec_tpu.ops.pallas.equalize import equalize_tpu
from facerec_tpu.ops.pallas.equalize_v2 import equalize_tpu_v2

KERNELS = [equalize_tpu, equalize_tpu_v2]


def _np_oracle(y):
    b, h, w = y.shape
    idx = y.astype(np.uint8).astype(np.int32)
    counts = np.stack([np.bincount(i.ravel(), minlength=256) for i in idx])
    cdf = np.cumsum(counts.astype(np.float32), axis=-1) / (h * w)
    return np.take_along_axis(
        cdf, idx.reshape(b, -1), axis=-1).reshape(b, h, w) * 255.0


@pytest.mark.parametrize("kernel", KERNELS)
def test_equalize_kernel_matches_jnp_path(rng, kernel):
    for shape in [(2, 33, 64), (1, 100, 130), (2, 48, 512)]:
        y = rng.uniform(0, 255.999, shape).astype(np.float32)
        got = np.asarray(kernel(jnp.asarray(y), interpret=True))
        want = np.asarray(scene_ops.equalize(jnp.asarray(y)))
        np.testing.assert_allclose(got, want, atol=2e-5)
        np.testing.assert_allclose(got, _np_oracle(y), atol=2e-5)


@pytest.mark.parametrize("kernel", KERNELS)
def test_equalize_kernel_constant_plane(rng, kernel):
    # all pixels in one bin: cdf jumps to 1 at that bin
    y = np.full((1, 16, 512), 77.3, np.float32)
    got = np.asarray(kernel(jnp.asarray(y), interpret=True))
    np.testing.assert_array_equal(got, np.full_like(y, 255.0))


def test_equalize_v3_raw_and_hist(rng):
    from facerec_tpu.ops.pallas.equalize_v3 import (equalize_stats_tpu,
                                                    pack_planes)

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
        idx = y.astype(np.uint8).astype(np.int32)
        counts = np.stack([np.bincount(i.ravel(), minlength=256)
                           for i in idx])
        np.testing.assert_array_equal(
            cum, np.cumsum(counts, axis=-1).astype(np.float32))


def test_equalize_v3_matches_cpu_raw_path(rng):
    """The kernel and the bincount fallback are bit-identical on raw
    integer counts (the only division happens in the caller)."""
    from facerec_tpu.ops.pallas.equalize_v3 import (equalize_stats_tpu,
                                                    pack_planes)

    y = rng.uniform(0, 255.999, (2, 40, 96)).astype(np.float32)
    packed = pack_planes(jnp.asarray(y))
    eq_k, cum_k = equalize_stats_tpu(packed, interpret=True)
    eq_c, cum_c = scene_ops._equalize_raw(packed)
    np.testing.assert_array_equal(np.asarray(eq_k), np.asarray(eq_c))
    np.testing.assert_array_equal(np.asarray(cum_k), np.asarray(cum_c))
