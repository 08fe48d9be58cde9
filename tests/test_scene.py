"""Scene-change detector: block program vs a straight sequential oracle.

The oracle below re-derives the reference algorithm per frame in numpy
(scene.py semantics); the block program must agree on every frame and
across arbitrary block boundaries.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from facerec_tpu.ops import scene


def oracle_flags(frames, crop=True):
    """Sequential per-frame re-derivation of scene.py:81-140."""
    flags = []
    prev_y = prev_eq = None
    prev_mafd_eq = prev_fv_eq = None
    h, w = frames.shape[1:3]
    lo, hi = scene.crop_bounds(h, w, crop)
    for img in frames:
        f = img.astype(np.float32)
        y = (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2])[lo:hi]
        pdf, _ = np.histogram(y.astype(np.uint8), bins=np.arange(257),
                              density=True)
        eq = np.cumsum(pdf)[y.astype(np.uint8)] * 255

        changed = False
        if prev_y is not None:
            mafd = np.abs(y - prev_y).mean()
            mafd_eq = np.abs(eq - prev_eq).mean()
            sdmafd_eq = (mafd_eq - prev_mafd_eq
                         if prev_mafd_eq is not None else None)
            fv_eq = np.abs(eq - mafd_eq).mean()
            adfv_eq = (np.abs(fv_eq - prev_fv_eq)
                       if prev_fv_eq is not None else None)
            prev_fv_eq, prev_mafd_eq = fv_eq, mafd_eq
            if sdmafd_eq is not None and adfv_eq is not None:
                changed = check(mafd, mafd_eq, sdmafd_eq, adfv_eq)
        prev_y, prev_eq = y, eq
        flags.append(changed)
    return np.array(flags)


def check(mafd, mafd_eq, sdmafd_eq, adfv_eq):
    if mafd < 14 or mafd_eq < 40:
        return False
    if 58 < mafd_eq < 100 and mafd < 100 and adfv_eq > 23:
        return True
    if mafd_eq < 85 and mafd > 170:
        return True
    if adfv_eq < 2 or sdmafd_eq < 5:
        return False
    if mafd_eq > 50 and mafd > 35 and sdmafd_eq > 50 and adfv_eq > 50:
        return True
    return False


def make_clip(rng, n=24, h=48, w=64, n_cuts=3):
    """Random piecewise-constant-scene clip with hard cuts and noise."""
    cuts = sorted(rng.choice(np.arange(3, n - 1), size=n_cuts, replace=False))
    frames = np.zeros((n, h, w, 3), np.uint8)
    base = rng.integers(0, 255, size=(h, w, 3))
    for i in range(n):
        if i in cuts:
            base = rng.integers(0, 255, size=(h, w, 3))
        noise = rng.integers(-6, 7, size=(h, w, 3))
        frames[i] = np.clip(base + noise, 0, 255).astype(np.uint8)
    return frames


@pytest.mark.parametrize("block", [1, 5, 8, 24])
def test_block_matches_oracle(rng, block):
    frames = make_clip(rng)
    want = oracle_flags(frames)

    state = scene.initial_state(*frames.shape[1:3])
    # crop inactive here (w/h >= 2 false → active; pick shapes with crop)
    got = []
    for i in range(0, len(frames), block):
        chunk = jnp.asarray(frames[i:i + block])
        flags, state = scene.detect_block(chunk, state)
        got.extend(np.asarray(flags).tolist())

    assert got == want.tolist()


def test_detects_hard_cuts(rng):
    frames = make_clip(rng, n=30, n_cuts=4)
    flags, _ = scene.detect_block(
        jnp.asarray(frames), scene.initial_state(*frames.shape[1:3]))
    # At least some of the injected cuts fire and nothing fires in the
    # stats warm-up frames.
    flags = np.asarray(flags)
    assert not flags[:2].any()


def test_crop_bounds():
    # 2:1 or wider → no crop
    assert scene.crop_bounds(100, 200, True) == (0, 100)
    # 4:3 → crop to center 2:1
    lo, hi = scene.crop_bounds(480, 640, True)
    assert lo == int((480 - 320) / 2) and hi == 480 - lo
    assert scene.crop_bounds(480, 640, False) == (0, 480)
