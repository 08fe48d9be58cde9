"""Weight import: torch state-dict conversion, BN-γ folding numerics,
keras h5 mapping, orbax roundtrip."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from facerec_tpu.models import FaceNetEmbedder
from facerec_tpu.models import weights as W
from facerec_tpu.models.layers import ConvBN


def test_fold_bn_gamma_numerics(rng):
    """Scale-free BN with folded variance == affine torch BN."""
    c = 8
    x = torch.tensor(rng.normal(size=(2, c, 5, 5)).astype(np.float32))
    bn = torch.nn.BatchNorm2d(c, eps=1e-3, affine=True)
    bn.weight.data = torch.tensor(
        rng.uniform(0.5, 2.0, c).astype(np.float32))
    bn.bias.data = torch.tensor(rng.normal(size=c).astype(np.float32))
    bn.running_mean = torch.tensor(rng.normal(size=c).astype(np.float32))
    bn.running_var = torch.tensor(
        rng.uniform(0.5, 2.0, c).astype(np.float32))
    bn.eval()
    want = bn(x).detach().numpy()

    var_folded = W.fold_bn_gamma(bn.weight.detach().numpy(),
                                 bn.running_var.numpy())
    mean = bn.running_mean.numpy()
    got = ((x.numpy() - mean[None, :, None, None])
           / np.sqrt(var_folded + 1e-3)[None, :, None, None]
           + bn.bias.detach().numpy()[None, :, None, None])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convbn_matches_torch(rng):
    """Our ConvBN with imported torch weights == torch Conv+BN+ReLU."""
    conv = torch.nn.Conv2d(3, 6, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(6, eps=1e-3, affine=True)
    bn.weight.data = torch.tensor(
        rng.uniform(0.5, 2.0, 6).astype(np.float32))
    bn.bias.data = torch.tensor(rng.normal(size=6).astype(np.float32))
    bn.running_mean = torch.tensor(rng.normal(size=6).astype(np.float32))
    bn.running_var = torch.tensor(
        rng.uniform(0.5, 2.0, 6).astype(np.float32))
    conv.eval(), bn.eval()

    x = rng.normal(size=(2, 7, 7, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch.relu(bn(conv(
            torch.tensor(x.transpose(0, 3, 1, 2))))).numpy()
    want = want.transpose(0, 2, 3, 1)

    module = ConvBN(6, 3, 1, "SAME")
    import jax

    template = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    updates = {
        ("params", "Conv_0", "kernel"):
            conv.weight.detach().numpy().transpose(2, 3, 1, 0),
        ("params", "BatchNorm_0", "bias"): bn.bias.detach().numpy(),
        ("batch_stats", "BatchNorm_0", "mean"): bn.running_mean.numpy(),
        ("batch_stats", "BatchNorm_0", "var"):
            W.fold_bn_gamma(bn.weight.detach().numpy(),
                            bn.running_var.numpy()),
    }
    variables = W.assign_checked(template, updates)
    got = np.asarray(module.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def template():
    return FaceNetEmbedder("t", 128).variables


def fake_torch_state_dict(template, rng):
    """Random state dict with facenet-pytorch names, shapes derived by
    inverting the mapping from our template."""
    flat = W._flatten(template)
    sd = {}
    for ours, theirs in W.convbn_module_map().items():
        path = tuple(ours.split("/"))
        k = flat[("params",) + path + ("Conv_0", "kernel")]
        o = k.shape[-1]
        sd[f"{theirs}.conv.weight"] = rng.normal(
            size=(k.shape[3], k.shape[2], k.shape[0], k.shape[1])
        ).astype(np.float32) * 0.05
        sd[f"{theirs}.bn.weight"] = rng.uniform(0.5, 1.5, o).astype(
            np.float32)
        sd[f"{theirs}.bn.bias"] = rng.normal(size=o).astype(np.float32)
        sd[f"{theirs}.bn.running_mean"] = rng.normal(size=o).astype(
            np.float32)
        sd[f"{theirs}.bn.running_var"] = rng.uniform(0.5, 1.5, o).astype(
            np.float32)
    for ours, theirs in W.up_conv_map().items():
        path = tuple(ours.split("/"))
        k = flat[("params",) + path + ("kernel",)]
        sd[f"{theirs}.weight"] = rng.normal(
            size=(k.shape[3], k.shape[2], k.shape[0], k.shape[1])
        ).astype(np.float32) * 0.05
        sd[f"{theirs}.bias"] = rng.normal(size=k.shape[-1]).astype(
            np.float32)
    bk = flat[("params", "Bottleneck", "kernel")]
    sd["last_linear.weight"] = rng.normal(
        size=(bk.shape[1], bk.shape[0])).astype(np.float32) * 0.05
    d = bk.shape[1]
    sd["last_bn.weight"] = rng.uniform(0.5, 1.5, d).astype(np.float32)
    sd["last_bn.bias"] = rng.normal(size=d).astype(np.float32)
    sd["last_bn.running_mean"] = rng.normal(size=d).astype(np.float32)
    sd["last_bn.running_var"] = rng.uniform(0.5, 1.5, d).astype(np.float32)
    return sd


def test_full_torch_import_and_h5_equivalence(template, rng, tmp_path):
    import h5py

    sd = fake_torch_state_dict(template, rng)
    via_torch = W.facenet_params_from_torch(sd, template)

    # write the same weights as a keras-facenet style h5
    h5path = str(tmp_path / "facenet.h5")
    with h5py.File(h5path, "w") as f:
        g = f.create_group("model_weights")

        def put(layer, wname, arr):
            g.create_dataset(f"{layer}/{layer}/{wname}:0", data=arr)

        for ours, theirs in W.convbn_module_map().items():
            conv_l, bn_l = W._keras_layer_name(ours)
            put(conv_l, "kernel",
                sd[f"{theirs}.conv.weight"].transpose(2, 3, 1, 0))
            put(bn_l, "beta", sd[f"{theirs}.bn.bias"])
            put(bn_l, "moving_mean", sd[f"{theirs}.bn.running_mean"])
            put(bn_l, "moving_variance",
                W.fold_bn_gamma(sd[f"{theirs}.bn.weight"],
                                sd[f"{theirs}.bn.running_var"]))
        for ours, theirs in W.up_conv_map().items():
            conv_l, _ = W._keras_layer_name(ours)
            put(conv_l, "kernel",
                sd[f"{theirs}.weight"].transpose(2, 3, 1, 0))
            put(conv_l, "bias", sd[f"{theirs}.bias"])
        put("Bottleneck", "kernel", sd["last_linear.weight"].T)
        put("Bottleneck_BatchNorm", "beta", sd["last_bn.bias"])
        put("Bottleneck_BatchNorm", "moving_mean",
            sd["last_bn.running_mean"])
        put("Bottleneck_BatchNorm", "moving_variance",
            W.fold_bn_gamma(sd["last_bn.weight"],
                            sd["last_bn.running_var"]))

    via_h5 = W.facenet_params_from_keras_h5(h5path, template)

    fa = W._flatten(via_torch)
    fb = W._flatten(via_h5)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], rtol=1e-5,
                                   err_msg="/".join(k))

    # imported model runs and differs from the random template
    emb = FaceNetEmbedder("imported", 128, params=via_torch)
    crops = rng.integers(0, 255, (1, 160, 160, 3)).astype(np.uint8)
    out = np.asarray(emb(jnp.asarray(crops)))
    assert np.isfinite(out).all()


def test_assign_checked_rejects_mismatch(template):
    with pytest.raises(ValueError, match="mismatch"):
        W.assign_checked(template, {})


def test_orbax_roundtrip(template, tmp_path):
    path = str(tmp_path / "ckpt")
    W.save_params(path, template)
    restored = W.load_params(path, template)
    fa, fb = W._flatten(template), W._flatten(restored)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))


def test_orbax_save_overwrites_existing(template, tmp_path):
    """Re-running a tool with the same --out must replace the previous
    checkpoint (orbax's default refuses an existing destination — a
    second `selfcheck --out X` run used to die at its save step)."""
    path = str(tmp_path / "ckpt")
    W.save_params(path, template)
    changed = W._unflatten({k: np.asarray(v) + 1.0 if k[0] == "params"
                            else np.asarray(v)
                            for k, v in W._flatten(template).items()})
    W.save_params(path, changed)   # must not raise
    restored = W.load_params(path, template)
    fa, fb = W._flatten(changed), W._flatten(restored)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))


def _toy_tree(rng):
    return {"params": {"stem": {"kernel": rng.normal(
                size=(3, 3, 3, 8)).astype(np.float32)},
                       "head": {"bias": rng.normal(size=(8,)).astype(
                           np.float32)}},
            "batch_stats": {"stem": {"count": np.arange(4)}}}


def test_npz_roundtrip_and_f16_cast(rng, tmp_path):
    """save_params_npz/load_params_npz: single-file fixture format;
    f16 cast roundtrips through the template's dtypes with half-float
    precision (the committed probe checkpoints use this)."""
    template = _toy_tree(rng)
    path = str(tmp_path / "ckpt.npz")
    W.save_params_npz(path, template)
    restored = W.load_params_npz(path, template)
    fa, fb = W._flatten(template), W._flatten(restored)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))

    W.save_params_npz(path, template, cast=np.float16)
    restored16 = W.load_params_npz(path, template)
    for k, v in W._flatten(restored16).items():
        a = np.asarray(fa[k])
        assert np.asarray(v).dtype == a.dtype   # restored to template dtype
        np.testing.assert_allclose(np.asarray(v), a, rtol=2e-3, atol=2e-3,
                                   err_msg="/".join(k))


def test_npz_load_rejects_wrong_tree(rng, tmp_path):
    template = _toy_tree(rng)
    path = str(tmp_path / "ckpt.npz")
    W.save_params_npz(path, template)
    import copy

    wrong = W._unflatten({k + ("extra",) if i == 0 else k: v
                          for i, (k, v) in
                          enumerate(W._flatten(copy.deepcopy(template)).items())})
    with pytest.raises(ValueError, match="mismatch"):
        W.load_params_npz(path, wrong)
