"""On-hardware numerics check for the Pallas equalize kernel.

Interpreter-mode tests (tests/test_pallas_kernels.py) validate the
math; this script validates the MOSAIC LOWERING on a real TPU — both
dispatch paths (fused plane-resident and row-tiled two-pass) against
the numpy oracle, including a cropped-1080p plane that exceeds the
fused VMEM budget (the round-1 version errored above ~3 MB planes).

Run: python scripts/tpu_kernel_check.py   (needs a TPU)
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp


def check(shape, rng):
    from facerec_tpu.ops.pallas import equalize as eqmod

    b, h, w = shape
    y = rng.uniform(0, 255.999, shape).astype(np.float32)
    packed = eqmod.pack_planes(jnp.asarray(y))
    plane_bytes = packed.shape[1] * packed.shape[2] * 4
    path = ("fused" if plane_bytes <= eqmod._FUSED_PLANE_BYTES
            else "tiled")
    eq_raw, cum = jax.device_get(eqmod.equalize_stats_tpu(packed))

    idx = y.astype(np.uint8).astype(np.int32)
    counts = np.stack([np.bincount(i.ravel(), minlength=256)
                       for i in idx])
    want_cum = np.cumsum(counts, axis=-1).astype(np.float32)
    np.testing.assert_array_equal(cum, want_cum)
    want_eq = np.take_along_axis(want_cum, idx.reshape(b, -1),
                                 axis=-1).reshape(shape)
    np.testing.assert_array_equal(
        eq_raw[:, :h, :], want_eq)
    pad = eq_raw[:, h:, :]
    assert (pad == 0).all()
    print(f"  {h}x{w} ({plane_bytes / 1e6:.1f} MB, {path}): exact")


def main():
    if jax.default_backend() != "tpu":
        print("No TPU present; nothing checked.")
        return 1
    rng = np.random.default_rng(3)
    print(f"device: {jax.devices()[0]}")
    check((4, 383, 768), rng)     # SD film post-crop, odd rows (fused)
    check((2, 960, 1920), rng)    # cropped 1080p, 7.4 MB (tiled)
    check((1, 2048, 4096), rng)   # 4K-class plane, 33.6 MB (tiled)
    print("TPU kernel check: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
