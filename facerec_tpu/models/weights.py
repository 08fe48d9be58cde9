"""Pretrained-weight import/export for the models.

The reference gets its weights from external packages
(``keras_facenet`` checkpoints, ``mtcnn``; /root/reference/facerec/
extract.py:24-25,392).  This module brings equivalent weights into our
Flax trees from the two public formats users actually have on disk:

  - ``facenet-pytorch`` ``InceptionResnetV1`` state dicts (.pt) — same
    davidsandberg architecture; BatchNorm γ is folded into the running
    variance since our inference BN is scale-free like the TF original.
  - keras-facenet .h5 model files — TF layer names map 1:1 onto our
    module names.

Plus orbax save/load of our own checkpoints.  All assignments are
shape-checked against the target tree; anything unmatched is an error,
so a silent partial import is impossible.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

BN_EPS = 1e-3


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value
    return root


def assign_checked(target_tree, updates: Dict[Tuple[str, ...], np.ndarray]):
    """Replace leaves of ``target_tree`` by path; shapes must match and
    every target leaf must be covered."""
    flat = _flatten(target_tree)
    missing = set(flat) - set(updates)
    extra = set(updates) - set(flat)
    if missing or extra:
        msg = []
        if missing:
            msg.append(f"missing {len(missing)}: "
                       f"{sorted('/'.join(p) for p in missing)[:5]}...")
        if extra:
            msg.append(f"unmatched {len(extra)}: "
                       f"{sorted('/'.join(p) for p in extra)[:5]}...")
        raise ValueError("weight import mismatch: " + "; ".join(msg))
    out = {}
    for path, old in flat.items():
        new = np.asarray(updates[path])
        if new.shape != old.shape:
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"{new.shape} vs {old.shape}")
        out[path] = new.astype(np.asarray(old).dtype)
    return _unflatten(out)


# ---------------------------------------------------------------------------
# facenet-pytorch import

# our ConvBN module ← facenet-pytorch BasicConv2d module
_STEM = {
    "Conv2d_1a_3x3": "conv2d_1a",
    "Conv2d_2a_3x3": "conv2d_2a",
    "Conv2d_2b_3x3": "conv2d_2b",
    "Conv2d_3b_1x1": "conv2d_3b",
    "Conv2d_4a_3x3": "conv2d_4a",
    "Conv2d_4b_3x3": "conv2d_4b",
    "Mixed_6a_Branch_0_Conv2d_1a_3x3": "mixed_6a.branch0",
    "Mixed_6a_Branch_1_Conv2d_0a_1x1": "mixed_6a.branch1.0",
    "Mixed_6a_Branch_1_Conv2d_0b_3x3": "mixed_6a.branch1.1",
    "Mixed_6a_Branch_1_Conv2d_1a_3x3": "mixed_6a.branch1.2",
    "Mixed_7a_Branch_0_Conv2d_0a_1x1": "mixed_7a.branch0.0",
    "Mixed_7a_Branch_0_Conv2d_1a_3x3": "mixed_7a.branch0.1",
    "Mixed_7a_Branch_1_Conv2d_0a_1x1": "mixed_7a.branch1.0",
    "Mixed_7a_Branch_1_Conv2d_1a_3x3": "mixed_7a.branch1.1",
    "Mixed_7a_Branch_2_Conv2d_0a_1x1": "mixed_7a.branch2.0",
    "Mixed_7a_Branch_2_Conv2d_0b_3x3": "mixed_7a.branch2.1",
    "Mixed_7a_Branch_2_Conv2d_1a_3x3": "mixed_7a.branch2.2",
}

_BLOCK_BRANCHES = {
    "block35": {
        "Branch_0_Conv2d_1x1": "branch0",
        "Branch_1_Conv2d_0a_1x1": "branch1.0",
        "Branch_1_Conv2d_0b_3x3": "branch1.1",
        "Branch_2_Conv2d_0a_1x1": "branch2.0",
        "Branch_2_Conv2d_0b_3x3": "branch2.1",
        "Branch_2_Conv2d_0c_3x3": "branch2.2",
    },
    "block17": {
        "Branch_0_Conv2d_1x1": "branch0",
        "Branch_1_Conv2d_0a_1x1": "branch1.0",
        "Branch_1_Conv2d_0b_1x7": "branch1.1",
        "Branch_1_Conv2d_0c_7x1": "branch1.2",
    },
    "block8": {
        "Branch_0_Conv2d_1x1": "branch0",
        "Branch_1_Conv2d_0a_1x1": "branch1.0",
        "Branch_1_Conv2d_0b_1x3": "branch1.1",
        "Branch_1_Conv2d_0c_3x1": "branch1.2",
    },
}


def convbn_module_map() -> Dict[str, str]:
    """Full mapping our ConvBN path → facenet-pytorch BasicConv2d path."""
    mapping = dict(_STEM)
    for i in range(5):
        for ours, theirs in _BLOCK_BRANCHES["block35"].items():
            mapping[f"Repeat_block35_{i + 1}/{ours}"] = \
                f"repeat_1.{i}.{theirs}"
    for i in range(10):
        for ours, theirs in _BLOCK_BRANCHES["block17"].items():
            mapping[f"Repeat_1_block17_{i + 1}/{ours}"] = \
                f"repeat_2.{i}.{theirs}"
    for i in range(5):
        for ours, theirs in _BLOCK_BRANCHES["block8"].items():
            mapping[f"Repeat_2_block8_{i + 1}/{ours}"] = \
                f"repeat_3.{i}.{theirs}"
    for ours, theirs in _BLOCK_BRANCHES["block8"].items():
        mapping[f"Block8/{ours}"] = f"block8.{theirs}"
    return mapping


def up_conv_map() -> Dict[str, str]:
    """The residual 'up' convs (kernel+bias, no BN)."""
    mapping = {}
    for i in range(5):
        mapping[f"Repeat_block35_{i + 1}/Conv2d_1x1"] = f"repeat_1.{i}.conv2d"
    for i in range(10):
        mapping[f"Repeat_1_block17_{i + 1}/Conv2d_1x1"] = \
            f"repeat_2.{i}.conv2d"
    for i in range(5):
        mapping[f"Repeat_2_block8_{i + 1}/Conv2d_1x1"] = f"repeat_3.{i}.conv2d"
    mapping["Block8/Conv2d_1x1"] = "block8.conv2d"
    return mapping


def fold_bn_gamma(gamma: np.ndarray, var: np.ndarray,
                  eps: float = BN_EPS) -> np.ndarray:
    """Fold an affine BN's γ into the running variance so a scale-free
    BN computes the same function: (x-μ)/√(v'+ε) == γ(x-μ)/√(v+ε) with
    v' = (v+ε)/γ² − ε."""
    return (var + eps) / (gamma * gamma) - eps


def facenet_params_from_torch(state_dict: Dict[str, "np.ndarray"],
                              template_variables) -> dict:
    """facenet-pytorch ``InceptionResnetV1`` state dict → our variables.

    Args:
        state_dict: name → tensor/ndarray (call ``.numpy()`` upstream or
            pass torch tensors — both handled).
        template_variables: our ``model.init(...)`` tree (shapes/dtypes).
    """
    def arr(name):
        v = state_dict[name]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)

    updates: Dict[Tuple[str, ...], np.ndarray] = {}

    for ours, theirs in convbn_module_map().items():
        path = tuple(ours.split("/"))
        kernel = arr(f"{theirs}.conv.weight").transpose(2, 3, 1, 0)
        gamma = arr(f"{theirs}.bn.weight")
        beta = arr(f"{theirs}.bn.bias")
        mean = arr(f"{theirs}.bn.running_mean")
        var = arr(f"{theirs}.bn.running_var")
        updates[("params",) + path + ("Conv_0", "kernel")] = kernel
        updates[("params",) + path + ("BatchNorm_0", "bias")] = beta
        updates[("batch_stats",) + path + ("BatchNorm_0", "mean")] = mean
        updates[("batch_stats",) + path + ("BatchNorm_0", "var")] = \
            fold_bn_gamma(gamma, var)

    for ours, theirs in up_conv_map().items():
        path = tuple(ours.split("/"))
        updates[("params",) + path + ("kernel",)] = \
            arr(f"{theirs}.weight").transpose(2, 3, 1, 0)
        updates[("params",) + path + ("bias",)] = arr(f"{theirs}.bias")

    updates[("params", "Bottleneck", "kernel")] = \
        arr("last_linear.weight").T
    gamma = arr("last_bn.weight")
    updates[("params", "Bottleneck_BatchNorm", "bias")] = arr("last_bn.bias")
    updates[("batch_stats", "Bottleneck_BatchNorm", "mean")] = \
        arr("last_bn.running_mean")
    updates[("batch_stats", "Bottleneck_BatchNorm", "var")] = \
        fold_bn_gamma(gamma, arr("last_bn.running_var"))

    return assign_checked(template_variables, updates)


# ---------------------------------------------------------------------------
# keras-facenet h5 import

def _keras_layer_name(ours: str) -> Tuple[str, str]:
    """(conv_layer, bn_layer) keras names for one of our ConvBN paths."""
    if ours.startswith("Repeat_block35_"):
        i = int(re.match(r"Repeat_block35_(\d+)/", ours).group(1))
        rest = ours.split("/", 1)[1]
        base = f"Block35_{i}_{rest}"
    elif ours.startswith("Repeat_1_block17_"):
        i = int(re.match(r"Repeat_1_block17_(\d+)/", ours).group(1))
        rest = ours.split("/", 1)[1]
        base = f"Block17_{i}_{rest}"
    elif ours.startswith("Repeat_2_block8_"):
        i = int(re.match(r"Repeat_2_block8_(\d+)/", ours).group(1))
        rest = ours.split("/", 1)[1]
        base = f"Block8_{i}_{rest}"
    elif ours.startswith("Block8/"):
        base = f"Block8_6_{ours.split('/', 1)[1]}"
    else:
        base = ours.replace("/", "_")
    return base, base + "_BatchNorm"


def facenet_params_from_keras_h5(h5_path: str, template_variables) -> dict:
    """keras-facenet .h5 model file → our variables."""
    import h5py

    weights: Dict[Tuple[str, str], np.ndarray] = {}
    with h5py.File(h5_path, "r") as f:
        group = f["model_weights"] if "model_weights" in f else f

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                parts = name.split("/")
                wname = parts[-1].split(":")[0]
                weights[(parts[-2], wname)] = np.array(obj)

        group.visititems(visit)

    updates: Dict[Tuple[str, ...], np.ndarray] = {}
    for ours in convbn_module_map():
        path = tuple(ours.split("/"))
        conv_l, bn_l = _keras_layer_name(ours)
        updates[("params",) + path + ("Conv_0", "kernel")] = \
            weights[(conv_l, "kernel")]
        updates[("params",) + path + ("BatchNorm_0", "bias")] = \
            weights[(bn_l, "beta")]
        updates[("batch_stats",) + path + ("BatchNorm_0", "mean")] = \
            weights[(bn_l, "moving_mean")]
        updates[("batch_stats",) + path + ("BatchNorm_0", "var")] = \
            weights[(bn_l, "moving_variance")]
    for ours in up_conv_map():
        path = tuple(ours.split("/"))
        conv_l, _ = _keras_layer_name(ours)
        updates[("params",) + path + ("kernel",)] = weights[(conv_l, "kernel")]
        updates[("params",) + path + ("bias",)] = weights[(conv_l, "bias")]

    updates[("params", "Bottleneck", "kernel")] = \
        weights[("Bottleneck", "kernel")]
    updates[("params", "Bottleneck_BatchNorm", "bias")] = \
        weights[("Bottleneck_BatchNorm", "beta")]
    updates[("batch_stats", "Bottleneck_BatchNorm", "mean")] = \
        weights[("Bottleneck_BatchNorm", "moving_mean")]
    updates[("batch_stats", "Bottleneck_BatchNorm", "var")] = \
        weights[("Bottleneck_BatchNorm", "moving_variance")]

    return assign_checked(template_variables, updates)


# ---------------------------------------------------------------------------
# single-file compact checkpoints (.npz)

def save_params_npz(path: str, variables, cast=None) -> None:
    """Flatten a variables tree into ONE compressed ``.npz`` file.

    The orbax format (:func:`save_params`) is a directory tree — right
    for training runs, wrong for a small committed fixture.  ``cast``
    (e.g. ``np.float16``) halves the file for fixtures whose consumers
    recalibrate against the cast weights anyway (tests/data/ probe
    checkpoints).
    """
    flat = _flatten(variables)
    out = {}
    for p, leaf in flat.items():
        arr = np.asarray(leaf)
        if cast is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(cast)
        out["/".join(p)] = arr
    np.savez_compressed(path, **out)


def load_params_npz(path: str, template_variables):
    """Restore a :func:`save_params_npz` file onto the template's
    structure and dtypes; shape/coverage mismatches are hard errors."""
    data = np.load(path)
    tflat = _flatten(template_variables)
    updates = {}
    for key in data.files:
        p = tuple(key.split("/"))
        arr = data[key]
        if p in tflat:
            arr = arr.astype(np.asarray(tflat[p]).dtype)
        updates[p] = arr
    return assign_checked(template_variables, updates)


# ---------------------------------------------------------------------------
# our own checkpoints (orbax)

def save_params(path: str, variables) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    # force=True: overwrite an existing checkpoint at the destination.
    # Re-running a tool with the same --out (selfcheck, trainers) must
    # replace the previous run's weights, not die on orbax's
    # existing-destination guard.
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template_variables=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template_variables is not None:
        return ckptr.restore(path, template_variables)
    return ckptr.restore(path)
