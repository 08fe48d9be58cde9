"""A/B: the HBM-bound FaceNet stem, unrolled-per-checkpoint vs folded.

The fused block program spends ~9.4 of ~30.6 ms in crop+4×embed, and
the recorded bottleneck is the Inception-ResNet-v1 stem's 77-79px
activations (docs/DESIGN.md "Where the time goes").  All four
checkpoints run the SAME architecture on the SAME prewhitened crops,
so the stem admits one concrete reformulation at matched math
(VERDICT r4 next-step #5): the first conv's four 3→32 kernels
concatenate into ONE 3→128 conv (one pass over the shared input,
lane-aligned Cout), and every later stem conv becomes a
feature_group_count=4 grouped conv on the folded 4×C channel axis,
splitting back to four towers before Block35.

This script measures, on the real chip:

  1. the full pooled embed (production formulation) — context baseline;
  2. stem-only, unrolled ×4 (current form);
  3. stem-only, folded/grouped (candidate);

and cross-checks the folded stem's numerics against the unrolled one.
Each stem variant runs inside ONE jit that iterates the stem K times
with a data dependency (dispatch/RPC latency amortized away), so the
per-iteration delta is device time, not tunnel mood.

Usage: python scripts/stem_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from facerec_tpu.runtime import ensure_platform

ensure_platform()
import jax
import jax.numpy as jnp
from jax import lax

from facerec_tpu.pipeline.extract import EmbedderBank


def log(m):
    print(m, file=sys.stderr, flush=True)


CROPS = int(os.environ.get("FACEREC_AB_CROPS", "64"))
K_ITERS = int(os.environ.get("FACEREC_AB_ITERS", "20"))
dt = jnp.bfloat16

bank = EmbedderBank.create_default(dtype=dt)
stack = bank.pooled.backbone_stack            # leading axis = 4 ckpts
N_CK = 4

# (name, stride, padding) of the stem's ConvBN layers, in order
STEM = [
    ("Conv2d_1a_3x3", 2, "VALID"),
    ("Conv2d_2a_3x3", 1, "VALID"),
    ("Conv2d_2b_3x3", 1, "SAME"),
    # maxpool here
    ("Conv2d_3b_1x1", 1, "VALID"),
    ("Conv2d_4a_3x3", 1, "VALID"),
    ("Conv2d_4b_3x3", 2, "VALID"),
]


def _cbn_params(tree, name, i=None):
    p = tree["params"][name]
    s = tree["batch_stats"][name]
    k = p["Conv_0"]["kernel"]
    b = p["BatchNorm_0"]["bias"]
    m = s["BatchNorm_0"]["mean"]
    v = s["BatchNorm_0"]["var"]
    if i is not None:
        k, b, m, v = k[i], b[i], m[i], v[i]
    return k, b, m, v


def _bn_affine(b, m, v):
    """ConvBN's BatchNorm (no scale): y = (x-m)*rsqrt(v+eps) + b."""
    inv = lax.rsqrt(v.astype(jnp.float32) + 1e-3).astype(dt)
    return inv, (b.astype(dt) - m.astype(dt) * inv)


def _conv(x, k, stride, pad, groups=1):
    return lax.conv_general_dilated(
        x, k.astype(dt), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), "VALID")


def prewhiten(crops):
    x = crops.astype(jnp.float32)
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    std = x.std(axis=(1, 2, 3), keepdims=True)
    return ((x - mean) / jnp.maximum(std, 1e-6)).astype(dt)


def stem_unrolled(stack, x):
    """Current formulation: four independent stems."""
    outs = []
    for i in range(N_CK):
        y = x
        for li, (name, stride, pad) in enumerate(STEM):
            k, b, m, v = _cbn_params(stack, name, i)
            inv, sh = _bn_affine(b, m, v)
            y = jax.nn.relu(_conv(y, k, stride, pad) * inv + sh)
            if li == 2:
                y = _maxpool(y)
        outs.append(y)
    return jnp.stack(outs)          # (4, N, 17, 17, 256)


def _folded_kernel(stack, name):
    k = stack["params"][name]["Conv_0"]["kernel"]    # (4, kh, kw, ci, co)
    return jnp.moveaxis(k, 0, 3).reshape(
        k.shape[1], k.shape[2], k.shape[3], N_CK * k.shape[4])


def _folded_bn(stack, name):
    s = stack["batch_stats"][name]["BatchNorm_0"]
    b = stack["params"][name]["BatchNorm_0"]["bias"]
    return (b.reshape(-1), s["mean"].reshape(-1), s["var"].reshape(-1))


def stem_folded(stack, x):
    """Candidate: conv1 as one 3→128 conv over the shared input, then
    grouped convs on the folded channel axis, split before Block35."""
    for li, (name, stride, pad) in enumerate(STEM):
        kf = _folded_kernel(stack, name)
        b, m, v = _folded_bn(stack, name)
        inv, sh = _bn_affine(b, m, v)
        groups = 1 if li == 0 else N_CK
        if li == 0:
            k0 = stack["params"][name]["Conv_0"]["kernel"]
            kf = jnp.moveaxis(k0, 0, 3).reshape(
                k0.shape[1], k0.shape[2], k0.shape[3], -1)
        x = jax.nn.relu(_conv(x, kf, stride, pad, groups=groups)
                        * inv + sh)
        if li == 2:
            x = _maxpool(x)
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, N_CK, c // N_CK)
    return jnp.moveaxis(x, 3, 0)    # (4, N, 17, 17, 256)


def iterate(fn):
    """K data-dependent iterations inside one jit; returns scalar."""

    @jax.jit
    def run(stack, crops):
        x = prewhiten(crops)
        s = jnp.float32(0)
        for _ in range(K_ITERS):
            out = fn(stack, x)
            s = s + out.astype(jnp.float32).sum()
            # data dependency so XLA cannot CSE the repeats; the add
            # is one cheap elementwise pass over the crop batch
            x = x + (s * jnp.float32(1e-30)).astype(dt)
        return s

    return run


def time_fn(label, run, *args, reps=3):
    t0 = time.perf_counter()
    _ = float(run(*args))
    log(f"[{label}] compile+first {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, time.perf_counter() - t0)
    per_iter = best / K_ITERS * 1e3
    log(f"[{label}] best {best * 1e3:.1f} ms for {K_ITERS} iters "
        f"= {per_iter:.3f} ms/iter")
    return per_iter


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.integers(0, 255, (CROPS, 160, 160, 3)),
                        jnp.uint8)

    # numerics cross-check (folded == unrolled at matched math)
    xa = jax.jit(lambda s, c: stem_unrolled(s, prewhiten(c)))(stack, crops)
    xb = jax.jit(lambda s, c: stem_folded(s, prewhiten(c)))(stack, crops)
    err = float(jnp.max(jnp.abs(xa.astype(jnp.float32)
                                - xb.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(xa.astype(jnp.float32)))) or 1.0
    log(f"numerics: max|A-B| = {err:.4g} (max|A| = {scale:.4g})")
    assert err <= 0.05 * scale, "folded stem diverges from unrolled"

    a = time_fn("stem-unrolled", iterate(stem_unrolled), stack, crops)
    b = time_fn("stem-folded", iterate(stem_folded), stack, crops)

    # context: the full production pooled embed (compile check only;
    # single-dispatch wall time through the tunnel is RPC-dominated)
    t0 = time.perf_counter()
    out = bank.pooled(crops)
    _ = [np.asarray(o) for o in out]
    log(f"[full-pooled] first call {time.perf_counter() - t0:.1f}s "
        "(incl compile; tunnel-bound, context only)")

    verdict = "folded WINS" if b < a * 0.95 else (
        "folded LOSES" if b > a * 1.05 else "within noise")
    print(f"STEM A/B: unrolled {a:.3f} ms/iter vs folded {b:.3f} "
          f"ms/iter -> {verdict}")


if __name__ == "__main__":
    main()
