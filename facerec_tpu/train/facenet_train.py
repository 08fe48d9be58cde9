"""FaceNet embedder training: triplet loss with online semi-hard mining.

The FaceNet recipe (batch-all distance matrix → semi-hard negative
selection → margin triplet loss) maps perfectly onto the MXU: the
pairwise distance matrix is one matmul, mining is pure vectorized
masking.  The train step is data-parallel over a mesh like the detector
trainer (batch sharded, params replicated, XLA all-reduces grads).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerec_tpu.models.facenet import FaceNet, prewhiten
from facerec_tpu.parallel.mesh import FRAME_AXIS


def pairwise_sq_dists(emb: jnp.ndarray) -> jnp.ndarray:
    sq = jnp.sum(emb * emb, axis=-1)
    d2 = sq[:, None] - 2.0 * (emb @ emb.T) + sq[None, :]
    return jnp.maximum(d2, 0.0)


def semi_hard_triplet_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                           margin: float = 0.2) -> jnp.ndarray:
    """Batch semi-hard triplet loss (FaceNet §3.2).

    For each anchor-positive pair, pick the hardest semi-hard negative
    (d_an > d_ap but minimal); fall back to the easiest negative when no
    semi-hard one exists.
    """
    d2 = pairwise_sq_dists(embeddings)
    n = embeddings.shape[0]
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(n, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same

    big = jnp.float32(1e9)
    # for each anchor a and positive p: smallest d_an with d_an > d_ap
    d_ap = d2[:, :, None]                       # (a, p, 1)
    d_an = d2[:, None, :]                       # (a, 1, n)
    semi = neg_mask[:, None, :] & (d_an > d_ap)
    semi_neg = jnp.min(jnp.where(semi, d_an, big), axis=2)      # (a, p)
    easiest = jnp.max(jnp.where(neg_mask[:, None, :], d_an, -big),
                      axis=2)
    chosen_neg = jnp.where(semi_neg < big / 2, semi_neg, easiest)

    losses = jnp.maximum(d2 + margin - chosen_neg, 0.0)
    # anchors with no negative at all (single-identity batch) carry no
    # triplet — without this mask `easiest` is a -1e9 sentinel and one
    # such batch would blow up the optimizer state
    has_neg = neg_mask.any(axis=1)              # (a,)
    losses = jnp.where(pos_mask & has_neg[:, None], losses, 0.0)
    n_pos = jnp.maximum((pos_mask & has_neg[:, None]).sum(), 1)
    return losses.sum() / n_pos


@dataclasses.dataclass
class FaceNetTrainer:
    """Data-parallel triplet trainer for the embedder."""

    embedding_dim: int = 128
    mesh: Optional[Mesh] = None
    learning_rate: float = 1e-3
    margin: float = 0.2
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        self.model = FaceNet(embedding_dim=self.embedding_dim,
                             dtype=self.dtype)
        self.tx = optax.adam(self.learning_rate)

        def loss_fn(params, batch_stats, crops, labels):
            x = prewhiten(crops)
            emb, mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"])
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            loss = semi_hard_triplet_loss(emb, labels, self.margin)
            return loss, mutated["batch_stats"]

        def step(variables, opt_state, crops, labels):
            params = variables["params"]
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, variables["batch_stats"],
                                       crops, labels)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return ({"params": optax.apply_updates(params, updates),
                     "batch_stats": new_stats}, opt_state, loss)

        if self.mesh is not None:
            batch = NamedSharding(self.mesh, P(FRAME_AXIS))
            rep = NamedSharding(self.mesh, P())
            self._step = jax.jit(
                step, in_shardings=(rep, rep, batch, batch),
                out_shardings=(rep, rep, rep))
        else:
            self._step = jax.jit(step)

    def init(self, rng_seed: int = 0):
        """Returns (variables, opt_state); ``variables`` carries both
        params and BN running statistics and plugs straight into
        :class:`~facerec_tpu.models.FaceNetEmbedder`."""
        variables = dict(self.model.init(
            jax.random.PRNGKey(rng_seed),
            jnp.zeros((1, 160, 160, 3), jnp.float32)))
        return variables, self.tx.init(variables["params"])

    def step(self, variables, opt_state, crops, labels
             ) -> Tuple[dict, optax.OptState, jnp.ndarray]:
        return self._step(variables, opt_state, crops, labels)
