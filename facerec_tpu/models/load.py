"""Resolve on-disk pretrained weights into production models.

The reference obtains its weights implicitly from external packages —
``keras_facenet`` downloads the four FaceNet checkpoints by name and
``mtcnn`` ships pretrained cascade weights
(/root/reference/facerec/extract.py:24-25,392, detector.py:19-27).
This module is the explicit equivalent for the TPU pipeline: a weights
directory on disk is resolved into ready-to-run models, accepting the
formats users actually have:

  FaceNet (per checkpoint name, first match wins):
    <dir>/<name>.pt         facenet-pytorch InceptionResnetV1 state dict
    <dir>/<name>.h5         keras-facenet h5 model file
    <dir>/<name>/model.h5   keras-facenet extracted-archive layout
    <dir>/<name>/           orbax checkpoint of our own variables tree

  Detector:
    <path>                  orbax checkpoint of DetectorHarness variables
                            (produced by facerec_tpu.train or selfcheck)

All imports go through :mod:`facerec_tpu.models.weights`, whose
``assign_checked`` rejects any shape/coverage mismatch, so a silently
partial load is impossible.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

from facerec_tpu.config import FACENET_DIMS, FACENET_MODELS


class WeightsNotFoundError(FileNotFoundError):
    """No usable weights found at the given location."""


def resolve_facenet_params(weights_dir: str, name: str, template) -> dict:
    """Load one FaceNet checkpoint by name from ``weights_dir``.

    Tries the supported formats in a fixed order (see module docstring)
    and returns a variables tree matching ``template``.
    """
    from facerec_tpu.models import weights as W

    pt = os.path.join(weights_dir, name + ".pt")
    if os.path.isfile(pt):
        import torch

        sd = torch.load(pt, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):      # a whole module was saved
            sd = sd.state_dict()
        if "state_dict" in sd and isinstance(sd["state_dict"], dict):
            sd = sd["state_dict"]
        return W.facenet_params_from_torch(sd, template)

    h5 = os.path.join(weights_dir, name + ".h5")
    if os.path.isfile(h5):
        return W.facenet_params_from_keras_h5(h5, template)

    sub = os.path.join(weights_dir, name)
    if os.path.isdir(sub):
        model_h5 = os.path.join(sub, "model.h5")
        if os.path.isfile(model_h5):
            return W.facenet_params_from_keras_h5(model_h5, template)
        # otherwise treat as an orbax checkpoint of our own tree
        return W.load_params(os.path.abspath(sub), template)

    raise WeightsNotFoundError(
        f"No weights for FaceNet checkpoint '{name}' under "
        f"{weights_dir!r} (tried {name}.pt, {name}.h5, {name}/model.h5, "
        f"{name}/ as orbax)")


def load_facenet_embedders(weights_dir: str, names=FACENET_MODELS,
                           dtype: Any = None,
                           missing_ok: bool = True) -> Dict[str, "object"]:
    """name → FaceNetEmbedder with imported weights, for every name.

    A PARTIAL weights dir (e.g. one checkpoint trained with
    ``train.facenet_train``) is usable: missing names fall back to
    random init with the loud :func:`warn_random_init` warning (which
    ``FACEREC_REQUIRE_WEIGHTS=1`` turns into an error) — downstream
    cluster/classify consume only ``EMB_NAME`` anyway
    (/root/reference/facerec/cluster.py:17, classify_knn.py:13).  A dir
    where NO name resolves still raises: that is a wrong path, not a
    partial install.  ``missing_ok=False`` restores all-or-nothing.
    """
    import jax.numpy as jnp

    from facerec_tpu.models import FaceNetEmbedder

    d = dtype or jnp.float32
    out = {}
    n_loaded = 0
    for i, name in enumerate(names):
        template = FaceNetEmbedder(name, FACENET_DIMS[name]).variables
        try:
            params = resolve_facenet_params(weights_dir, name, template)
        except WeightsNotFoundError:
            if not missing_ok:
                raise
            warn_random_init(
                f"FaceNet checkpoint '{name}'",
                f"a {name}.pt/.h5 or {name}/ orbax checkpoint in "
                f"{weights_dir!r}")
            out[name] = FaceNetEmbedder(name, FACENET_DIMS[name],
                                        dtype=d, rng_seed=i)
            continue
        n_loaded += 1
        out[name] = FaceNetEmbedder(name, FACENET_DIMS[name], dtype=d,
                                    params=params)
    if names and n_loaded == 0:
        raise WeightsNotFoundError(
            f"No FaceNet checkpoint of {list(names)} found under "
            f"{weights_dir!r} — wrong --facenet-weights path?")
    return out


def load_detector_harness(path: str, dtype: Any = None,
                          **harness_kwargs) -> "object":
    """Orbax checkpoint → ready DetectorHarness.

    ``harness_kwargs`` are the runtime knobs (input_size,
    max_detections, score_threshold, min_face_size) — they do not
    affect the parameter shapes, so one checkpoint serves any film
    geometry.
    """
    import jax
    import jax.numpy as jnp

    from facerec_tpu.models import DetectorHarness
    from facerec_tpu.models import weights as W
    from facerec_tpu.models.detector import FaceDetector
    from facerec_tpu.models.facenet import cast_float_tree

    if not os.path.isdir(path):
        raise WeightsNotFoundError(
            f"Detector weights not found: {path!r} is not an orbax "
            f"checkpoint directory")
    d = dtype or jnp.float32
    # Architecture hyperparameters are a property of the checkpoint,
    # not a runtime knob.  Distilled checkpoints carry a
    # `<path>.model.json` sidecar (train/distill.py) with the exact
    # FaceDetector kwargs; otherwise infer the backbone width from the
    # stem kernel ((12, 12, 3, width)) and assume defaults elsewhere.
    raw = W.load_params(os.path.abspath(path))
    sidecar = os.path.abspath(path) + ".model.json"
    if os.path.exists(sidecar):
        import json

        with open(sidecar) as f:
            model_kwargs = json.load(f)
    else:
        try:
            stems = [l for l in jax.tree.leaves(raw["params"]["stem"])
                     if getattr(l, "ndim", 0) == 4]
            model_kwargs = {"backbone_width": int(stems[0].shape[-1])}
        except (KeyError, IndexError) as e:
            raise WeightsNotFoundError(
                f"Detector checkpoint {path!r} has no recognizable stem "
                f"parameters: {e!r}")
    model = FaceDetector(dtype=d, **model_kwargs)
    # Parameter shapes are spatial-size independent (fully
    # convolutional), so a small init suffices as the restore template.
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32))
    variables = W.load_params(os.path.abspath(path), template)
    return DetectorHarness(model=model,
                           variables=cast_float_tree(variables, d),
                           **harness_kwargs)


_WARNED: set = set()


def warn_random_init(what: str, flag: str) -> None:
    """Loud, once-per-process warning (or hard error) on random-weight
    models reaching a production path.

    The reference can't run without pretrained weights at all; a silent
    random-init default would produce plausible-looking garbage.  Set
    ``FACEREC_REQUIRE_WEIGHTS=1`` to turn this into an error, or
    ``FACEREC_ALLOW_RANDOM=1`` to silence it (tests/benchmarks).
    """
    if os.environ.get("FACEREC_ALLOW_RANDOM") == "1" or what in _WARNED:
        return
    _WARNED.add(what)
    msg = (f"{what} is running with RANDOM weights — detections/"
           f"embeddings are meaningless. Pass {flag} to load pretrained "
           f"parameters.")
    if os.environ.get("FACEREC_REQUIRE_WEIGHTS") == "1":
        raise RuntimeError(msg)
    bar = "!" * 72
    print(f"{bar}\nWARNING: {msg}\n{bar}", flush=True)
