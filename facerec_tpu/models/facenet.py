"""FaceNet (Inception-ResNet-v1) embedder in Flax.

Architecture follows the checkpoints the reference loads through
``keras_facenet`` (/root/reference/facerec/extract.py:21-25,166-167):
the davidsandberg Inception-ResNet-v1 with bottleneck size 512
('20180402-114759', '20180408-102900') or 128 ('20170511-185253',
'20170512-110547').  Module names mirror the TF checkpoint scopes so
:mod:`facerec_tpu.models.weights` can import pretrained weights
mechanically.

Embedding convention matches ``FaceNet.embeddings``: per-image
prewhitening of the 160×160 crop, forward pass, then L2 normalization
(cf. /root/reference/facerec/utils/utils.py:8-24 for the recipe).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from facerec_tpu.models.layers import ConvBN


class Block35(nn.Module):
    """Inception-ResNet-A residual block (input/output 256ch)."""

    scale: float = 0.17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(32, 1, dtype=d, name="Branch_0_Conv2d_1x1")(x, train)
        b1 = ConvBN(32, 1, dtype=d, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(32, 3, dtype=d, name="Branch_1_Conv2d_0b_3x3")(b1, train)
        b2 = ConvBN(32, 1, dtype=d, name="Branch_2_Conv2d_0a_1x1")(x, train)
        b2 = ConvBN(32, 3, dtype=d, name="Branch_2_Conv2d_0b_3x3")(b2, train)
        b2 = ConvBN(32, 3, dtype=d, name="Branch_2_Conv2d_0c_3x3")(b2, train)
        mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d,
                     name="Conv2d_1x1")(mixed)
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):
    """Inception-ResNet-B residual block (input/output 896ch)."""

    scale: float = 0.10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(128, 1, dtype=d, name="Branch_0_Conv2d_1x1")(x, train)
        b1 = ConvBN(128, 1, dtype=d, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(128, (1, 7), dtype=d, name="Branch_1_Conv2d_0b_1x7")(b1, train)
        b1 = ConvBN(128, (7, 1), dtype=d, name="Branch_1_Conv2d_0c_7x1")(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d,
                     name="Conv2d_1x1")(mixed)
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):
    """Inception-ResNet-C residual block (input/output 1792ch)."""

    scale: float = 0.20
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBN(192, 1, dtype=d, name="Branch_0_Conv2d_1x1")(x, train)
        b1 = ConvBN(192, 1, dtype=d, name="Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(192, (1, 3), dtype=d, name="Branch_1_Conv2d_0b_1x3")(b1, train)
        b1 = ConvBN(192, (3, 1), dtype=d, name="Branch_1_Conv2d_0c_3x1")(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d,
                     name="Conv2d_1x1")(mixed)
        out = x + self.scale * up
        return nn.relu(out) if self.act else out


class FaceNet(nn.Module):
    """Inception-ResNet-v1 producing unnormalized bottleneck features.

    With ``pool_only`` the forward stops at the 1792-d global pool —
    the backbone is architecturally identical across all four reference
    checkpoints (only the bottleneck dim differs), which lets the
    extract stage vmap all four backbones in one program.

    With ``skip_stem`` the input is expected to be the post-stem
    17×17×256 activations (the pooled multi-checkpoint path computes
    the four stems as ONE folded/grouped pass over the shared crops —
    see :func:`folded_stem`); the stem parameters in the variables tree
    are simply unused.
    """

    embedding_dim: int = 512
    dtype: Any = jnp.float32
    pool_only: bool = False
    skip_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)
        if not self.skip_stem:
            # Stem (VALID paddings per the TF graph)
            x = ConvBN(32, 3, 2, "VALID", dtype=d, name="Conv2d_1a_3x3")(x, train)
            x = ConvBN(32, 3, 1, "VALID", dtype=d, name="Conv2d_2a_3x3")(x, train)
            x = ConvBN(64, 3, 1, "SAME", dtype=d, name="Conv2d_2b_3x3")(x, train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            x = ConvBN(80, 1, 1, "VALID", dtype=d, name="Conv2d_3b_1x1")(x, train)
            x = ConvBN(192, 3, 1, "VALID", dtype=d, name="Conv2d_4a_3x3")(x, train)
            x = ConvBN(256, 3, 2, "VALID", dtype=d, name="Conv2d_4b_3x3")(x, train)

        for i in range(5):
            x = Block35(dtype=d, name=f"Repeat_block35_{i + 1}")(x, train)

        # Reduction-A → 896ch
        b0 = ConvBN(384, 3, 2, "VALID", dtype=d,
                    name="Mixed_6a_Branch_0_Conv2d_1a_3x3")(x, train)
        b1 = ConvBN(192, 1, 1, "SAME", dtype=d,
                    name="Mixed_6a_Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(192, 3, 1, "SAME", dtype=d,
                    name="Mixed_6a_Branch_1_Conv2d_0b_3x3")(b1, train)
        b1 = ConvBN(256, 3, 2, "VALID", dtype=d,
                    name="Mixed_6a_Branch_1_Conv2d_1a_3x3")(b1, train)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b0, b1, b2], axis=-1)

        for i in range(10):
            x = Block17(dtype=d, name=f"Repeat_1_block17_{i + 1}")(x, train)

        # Reduction-B → 1792ch
        b0 = ConvBN(256, 1, 1, "SAME", dtype=d,
                    name="Mixed_7a_Branch_0_Conv2d_0a_1x1")(x, train)
        b0 = ConvBN(384, 3, 2, "VALID", dtype=d,
                    name="Mixed_7a_Branch_0_Conv2d_1a_3x3")(b0, train)
        b1 = ConvBN(256, 1, 1, "SAME", dtype=d,
                    name="Mixed_7a_Branch_1_Conv2d_0a_1x1")(x, train)
        b1 = ConvBN(256, 3, 2, "VALID", dtype=d,
                    name="Mixed_7a_Branch_1_Conv2d_1a_3x3")(b1, train)
        b2 = ConvBN(256, 1, 1, "SAME", dtype=d,
                    name="Mixed_7a_Branch_2_Conv2d_0a_1x1")(x, train)
        b2 = ConvBN(256, 3, 1, "SAME", dtype=d,
                    name="Mixed_7a_Branch_2_Conv2d_0b_3x3")(b2, train)
        b2 = ConvBN(256, 3, 2, "VALID", dtype=d,
                    name="Mixed_7a_Branch_2_Conv2d_1a_3x3")(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)

        for i in range(5):
            x = Block8(dtype=d, name=f"Repeat_2_block8_{i + 1}")(x, train)
        x = Block8(scale=1.0, act=False, dtype=d, name="Block8")(x, train)

        # Global average pool + bottleneck (dense, no bias, then BN)
        x = jnp.mean(x, axis=(1, 2))
        if self.pool_only:
            return x.astype(jnp.float32)
        x = nn.Dense(self.embedding_dim, use_bias=False, dtype=d,
                     name="Bottleneck")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         use_scale=False, dtype=d,
                         name="Bottleneck_BatchNorm")(x)
        return x.astype(jnp.float32)


def prewhiten(crops: jnp.ndarray) -> jnp.ndarray:
    """Per-image standardization over all pixels/channels
    (utils/utils.py:12-15)."""
    x = crops.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mean = x.mean(axis=axes, keepdims=True)
    std = x.std(axis=axes, keepdims=True)
    return (x - mean) / jnp.maximum(std, 1e-6)


import functools


@functools.lru_cache(maxsize=None)
def _jitted_embed(embedding_dim: int, dtype: Any):
    """One compiled embed program per (dim, dtype) — the two 128-d and
    the two 512-d checkpoints share an executable, with parameters
    passed as arguments."""
    model = FaceNet(embedding_dim=embedding_dim, dtype=dtype)

    @jax.jit
    def embed(variables, crops):
        x = prewhiten(crops)
        emb = model.apply(variables, x)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb / jnp.maximum(norm, 1e-12)

    return model, embed


def cast_float_tree(tree, dtype):
    """Cast floating-point leaves to the compute dtype ONCE.

    flax modules with ``dtype=bfloat16`` cast f32-stored params to bf16
    on every forward — which on TPU means streaming the full f32 copy
    from HBM per dispatch (the 4-checkpoint FaceNet bank is ~370 MB of
    weight traffic per embed).  Pre-casting is bit-identical to the
    per-use cast and halves the weight bytes read."""
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def stack_embedder_params(embedders):
    """Stack the parameter trees of same-architecture embedders for a
    vmapped forward (leading checkpoint axis)."""
    trees = [e.variables for e in embedders]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


@functools.lru_cache(maxsize=None)
def _jitted_stacked_embed(embedding_dim: int, dtype: Any):
    """Compiled vmapped embed: (K stacked param trees, crops) →
    (K, N, dim).  The four reference checkpoints collapse into two such
    programs (one per bottleneck size) instead of four."""
    model = FaceNet(embedding_dim=embedding_dim, dtype=dtype)

    def one(variables, x):
        emb = model.apply(variables, x)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb / jnp.maximum(norm, 1e-12)

    @jax.jit
    def embed(stacked_variables, crops):
        x = prewhiten(crops)
        return jax.vmap(one, in_axes=(0, None))(stacked_variables, x)

    return embed


def _split_bottleneck(variables):
    """variables → (backbone variables, bottleneck arrays dict)."""
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    backbone = {
        "params": {k: v for k, v in params.items()
                   if not k.startswith("Bottleneck")},
        "batch_stats": {k: v for k, v in stats.items()
                        if not k.startswith("Bottleneck")},
    }
    # The pooled path computes the bottleneck matmul+BN by hand in f32
    # (unlike the backbone, whose flax modules cast to the compute
    # dtype anyway) — keep these at full precision even when the
    # embedder's variables were pre-cast.
    bottleneck = {
        "kernel": jnp.asarray(params["Bottleneck"]["kernel"], jnp.float32),
        "bias": jnp.asarray(params["Bottleneck_BatchNorm"]["bias"],
                            jnp.float32),
        "mean": jnp.asarray(stats["Bottleneck_BatchNorm"]["mean"],
                            jnp.float32),
        "var": jnp.asarray(stats["Bottleneck_BatchNorm"]["var"],
                           jnp.float32),
    }
    return backbone, bottleneck


# The stem's ConvBN layers in order: (name, stride, padding); a 3×3/2
# max-pool follows layer index 2 (Conv2d_2b_3x3).
_STEM_LAYERS = (
    ("Conv2d_1a_3x3", 2, "VALID"),
    ("Conv2d_2a_3x3", 1, "VALID"),
    ("Conv2d_2b_3x3", 1, "SAME"),
    ("Conv2d_3b_1x1", 1, "VALID"),
    ("Conv2d_4a_3x3", 1, "VALID"),
    ("Conv2d_4b_3x3", 2, "VALID"),
)

# Fold the K checkpoints' stems into one grouped pass over the shared
# crops (FACEREC_STEM_FOLD=1).  Measured on v5e (scripts/stem_ab.py +
# fused-program A/B, docs/DESIGN.md "FaceNet stem fold"): the stem is
# HBM/lane-bound at 32-64 channels, and the fold lane-aligns it
# (conv1 Cout 4×32=128 over ONE read of the shared input; later stem
# convs as feature_group_count=4).  Not bit-identical to the unrolled
# stems (conv-sum reassociation at bf16, ≤0.8% of activation scale),
# which is why the knob exists rather than a silent default change.
_STEM_FOLD = os.environ.get("FACEREC_STEM_FOLD", "0") == "1"


def folded_stem(backbone_stack, x, n_ckpts: int, dtype: Any):
    """(N,160,160,3) prewhitened crops → (K, N, 17, 17, 256) stem
    activations for all K stacked checkpoints in one grouped pass.

    Matched math with the per-checkpoint stems: kernels concatenate on
    the output-channel axis (conv1 runs once over the shared input;
    every later conv is a K-group conv), BN affine vectors concatenate
    per channel."""
    from jax import lax

    params = backbone_stack["params"]
    stats = backbone_stack["batch_stats"]
    for li, (name, stride, pad) in enumerate(_STEM_LAYERS):
        k = params[name]["Conv_0"]["kernel"]          # (K, kh, kw, ci, co)
        kf = jnp.moveaxis(k, 0, 3).reshape(
            k.shape[1], k.shape[2], k.shape[3], n_ckpts * k.shape[4])
        b = params[name]["BatchNorm_0"]["bias"].reshape(-1)
        m = stats[name]["BatchNorm_0"]["mean"].reshape(-1)
        v = stats[name]["BatchNorm_0"]["var"].reshape(-1)
        inv = lax.rsqrt(v.astype(jnp.float32) + 1e-3).astype(dtype)
        shift = b.astype(dtype) - m.astype(dtype) * inv
        x = lax.conv_general_dilated(
            x.astype(dtype), kf.astype(dtype), (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=1 if li == 0 else n_ckpts)
        x = jax.nn.relu(x * inv + shift)
        if li == 2:
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
    n, h, w, c = x.shape
    return jnp.moveaxis(
        x.reshape(n, h, w, n_ckpts, c // n_ckpts), 3, 0)


@functools.lru_cache(maxsize=None)
def _jitted_pooled_embed(n_ckpts: int, dtype: Any,
                         fold_stem: bool = _STEM_FOLD):
    """Compiled embed over ALL checkpoints in one program: unrolled
    per-checkpoint backbones plus per-checkpoint bottleneck matmuls.

    The backbones are UNROLLED rather than vmapped over the checkpoint
    axis: vmap turns every conv into a 4-group grouped conv, and on
    TPU the memory-bound Inception stem (77×79 spatial, 32-64
    channels) then pays ~0.9 ms/block of pure layout copies shuffling
    the group axis. Plain convs per checkpoint read/write the same
    bytes with no relayout — measured 10.3 → 9.0 ms per 64-crop block
    on v5e, and the op form now matches the individual-embedder path
    exactly.  ``fold_stem`` (FACEREC_STEM_FOLD) instead runs the four
    STEMS (only) as one folded grouped pass — see :func:`folded_stem`;
    Block35 onward stays unrolled either way."""
    model = FaceNet(dtype=dtype, pool_only=True, skip_stem=fold_stem)

    @jax.jit
    def embed(backbone_stack, bottlenecks, crops):
        x = prewhiten(crops)
        if fold_stem:
            towers = folded_stem(backbone_stack, x, n_ckpts, dtype)
            feats = [
                model.apply(jax.tree.map(lambda a, i=i: a[i],
                                         backbone_stack), towers[i])
                for i in range(n_ckpts)]
        else:
            feats = [
                model.apply(jax.tree.map(lambda a, i=i: a[i],
                                         backbone_stack), x)
                for i in range(n_ckpts)]
        outs = []
        for i in range(n_ckpts):
            b = bottlenecks[i]
            f = feats[i] @ b["kernel"]
            f = ((f - b["mean"]) * jax.lax.rsqrt(b["var"] + 1e-3)
                 + b["bias"])
            norm = jnp.linalg.norm(f, axis=-1, keepdims=True)
            outs.append(f / jnp.maximum(norm, 1e-12))
        return tuple(outs)

    return embed


class PooledStackedEmbedders:
    """All FaceNet checkpoints (any bottleneck dims) as ONE program:
    vmapped shared-architecture backbone + per-checkpoint bottlenecks."""

    def __init__(self, embedders):
        self.names = [e.name for e in embedders]
        self.dtype = embedders[0].dtype
        split = [_split_bottleneck(e.variables) for e in embedders]
        # Variables were already pre-cast by FaceNetEmbedder.__init__;
        # this stays a no-op safety for externally-built embedders.
        self.backbone_stack = cast_float_tree(jax.tree.map(
            lambda *xs: jnp.stack(xs), *[s[0] for s in split]), self.dtype)
        self.bottlenecks = tuple(s[1] for s in split)
        self._embed = _jitted_pooled_embed(len(embedders), self.dtype)

    def __call__(self, crops):
        """(N,160,160,3) → tuple of (N, dim_i) unit embeddings."""
        return self._embed(self.backbone_stack, self.bottlenecks, crops)


class StackedEmbedders:
    """Several same-dim FaceNet checkpoints as one vmapped forward."""

    def __init__(self, embedders):
        dims = {e.embedding_dim for e in embedders}
        assert len(dims) == 1, "stack same-dim embedders only"
        self.names = [e.name for e in embedders]
        self.dtype = embedders[0].dtype
        self.stacked = cast_float_tree(stack_embedder_params(embedders),
                                       self.dtype)
        self._embed = _jitted_stacked_embed(dims.pop(), self.dtype)

    def __call__(self, crops) -> jnp.ndarray:
        """(N,160,160,3) → (K, N, dim) unit embeddings, one dispatch."""
        return self._embed(self.stacked, crops)


class FaceNetEmbedder:
    """Callable wrapper: crops → L2-normalized embeddings.

    One instance per checkpoint name; the extract stage stacks several
    and runs them over the same crop batch (extract.py:166-167 runs 4).
    The forward pass is a single jitted dispatch (the tunneled TPU has
    ~50 ms per-call latency, so op-by-op execution is fatal).
    """

    def __init__(self, name: str, embedding_dim: int,
                 dtype: Any = jnp.float32, params: Dict | None = None,
                 rng_seed: int = 0):
        self.name = name
        self.embedding_dim = embedding_dim
        self.dtype = dtype
        self.model, self._embed = _jitted_embed(embedding_dim, dtype)
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, 160, 160, 3), jnp.float32))
        # Pre-cast to the compute dtype (bit-identical to flax's per-use
        # cast, without re-streaming the f32 copy every dispatch).
        self.variables = cast_float_tree(params, dtype)

    def __call__(self, crops: jnp.ndarray) -> jnp.ndarray:
        """(N, 160, 160, 3) uint8/float crops → (N, dim) unit vectors."""
        return self._embed(self.variables, crops)
