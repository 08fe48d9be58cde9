"""BN running-stat recalibration (train/recalibrate.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from facerec_tpu.models.layers import ConvBN
from facerec_tpu.train.recalibrate import recalibrate_batch_stats


def _apply_batch(model):
    @jax.jit
    def fn(v, x):
        _, mut = model.apply(v, x, train=True, mutable=["batch_stats"])
        return mut["batch_stats"]
    return fn


def test_unwind_recovers_true_statistics():
    """After K calibration batches the unwound stats match the data's
    true statistics, while the raw EMA is still dominated by the stale
    init (momentum 0.995 keeps >95% of it over K=8)."""
    model = ConvBN(features=4, kernel=1)
    x0 = jnp.zeros((8, 4, 4, 3))
    variables = dict(model.init(jax.random.PRNGKey(0), x0))

    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.normal(5.0, 3.0, (8, 4, 4, 3)),
                           jnp.float32) for _ in range(8)]
    apply_batch = _apply_batch(model)

    recal = recalibrate_batch_stats(variables, batches, apply_batch)

    # The BN input is the conv output; compute its true statistics.
    kernel = variables["params"]["Conv_0"]["kernel"]
    ys = [b @ kernel.reshape(3, 4) for b in batches]
    y = jnp.concatenate([t.reshape(-1, 4) for t in ys])
    true_mean, true_var = y.mean(0), y.var(0)

    bn = recal["batch_stats"]["BatchNorm_0"]
    np.testing.assert_allclose(bn["mean"], true_mean, atol=0.5)
    np.testing.assert_allclose(bn["var"], true_var, rtol=0.25)

    # Contrast: without the unwind, the EMA barely moved off init.
    v = dict(variables)
    for b in batches:
        v["batch_stats"] = apply_batch(v, b)
    ema = v["batch_stats"]["BatchNorm_0"]
    assert float(jnp.abs(ema["mean"]).max()) < 0.1 * float(
        jnp.abs(true_mean).max())


def test_recalibration_changes_only_batch_stats():
    model = ConvBN(features=2, kernel=1)
    x = jnp.ones((4, 2, 2, 3))
    variables = dict(model.init(jax.random.PRNGKey(0), x))
    recal = recalibrate_batch_stats(variables, [x, x],
                                    _apply_batch(model))
    assert recal["params"] is variables["params"]
    var = recal["batch_stats"]["BatchNorm_0"]["var"]
    # constant input → zero batch variance → the positivity guard
    # engages (f32 roundoff allowed)
    assert float(var.min()) >= 9e-7


def test_zero_batches_rejected():
    model = ConvBN(features=2, kernel=1)
    x = jnp.ones((4, 2, 2, 3))
    variables = dict(model.init(jax.random.PRNGKey(0), x))
    try:
        recalibrate_batch_stats(variables, [], _apply_batch(model))
    except ValueError:
        return
    raise AssertionError("expected ValueError for zero batches")
