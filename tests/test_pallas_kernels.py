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
