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


# ---------------------------------------------------------------------------
# standalone CLI: train/fine-tune one FaceNet checkpoint on identity-
# labeled face crops (root/<identity>/*.jpg), saving an orbax checkpoint
# at <out>/<name>/ — the exact layout `--facenet-weights <out>` resolves
# (models/load.py).  The reference has no embedder training at all; its
# checkpoints come pre-baked from keras_facenet
# (/root/reference/facerec/extract.py:24-25,392).

class IdentityCropDataset:
    """Face crops grouped by identity from a directory tree.

    Layout: ``root/<identity>/*.jpg|jpeg|png``, any image size (resized
    to 160×160 on load — the reference resizes crops the same way via
    keras_facenet's cropBox, /root/reference/facerec/extract.py:160-164).
    """

    EXTS = (".jpg", ".jpeg", ".png")

    def __init__(self, root: str, crop_size: int = 160):
        import os

        import cv2
        import numpy as np

        self.crops = {}          # identity name -> (n, 160, 160, 3) u8
        for ident in sorted(os.listdir(root)):
            d = os.path.join(root, ident)
            if not os.path.isdir(d):
                continue
            imgs = []
            for fn in sorted(os.listdir(d)):
                if not fn.lower().endswith(self.EXTS):
                    continue
                bgr = cv2.imread(os.path.join(d, fn))
                if bgr is None:
                    continue
                rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
                imgs.append(cv2.resize(rgb, (crop_size, crop_size)))
            if imgs:
                self.crops[ident] = np.stack(imgs)
        self.idents = sorted(self.crops)

    def __len__(self) -> int:
        return len(self.idents)

    def batches(self, ids_per_batch: int, crops_per_id: int, rng):
        """Endless PK-sampled batches: P identities × K crops each
        (identities with fewer than K crops sample with replacement)."""
        import numpy as np

        p = min(ids_per_batch, len(self.idents))
        while True:
            picked = rng.choice(len(self.idents), size=p, replace=False)
            ims, labels = [], []
            for lab in picked:
                pool = self.crops[self.idents[int(lab)]]
                idx = rng.choice(len(pool), size=crops_per_id,
                                 replace=len(pool) < crops_per_id)
                ims.append(pool[idx])
                labels.extend([int(lab)] * crops_per_id)
            yield (np.concatenate(ims),
                   np.asarray(labels, dtype=np.int32))


def train(root: str, out: str, steps: int, name: Optional[str] = None,
          ids_per_batch: int = 4, crops_per_id: int = 4,
          learning_rate: float = 3e-4, seed: int = 0,
          init_weights: Optional[str] = None, log_every: int = 50,
          recalibrate: bool = True) -> list:
    """Train one named FaceNet checkpoint on identity crops; saves an
    orbax checkpoint at ``<out>/<name>/`` consumable by
    ``--facenet-weights <out>``.  Returns the loss history."""
    import os

    import numpy as np

    from facerec_tpu.config import EMB_NAME, FACENET_DIMS
    from facerec_tpu.models.weights import save_params

    name = name or EMB_NAME
    if name not in FACENET_DIMS:
        raise ValueError(f"unknown checkpoint name {name!r}; "
                         f"known: {sorted(FACENET_DIMS)}")
    ds = IdentityCropDataset(root)
    if len(ds) < 2:
        raise RuntimeError(
            f"need >=2 identity subdirectories with images under "
            f"{root!r}, found {len(ds)}")
    print(f"facenet_train: {len(ds)} identities, "
          f"{sum(len(v) for v in ds.crops.values())} crops, "
          f"checkpoint {name} (dim {FACENET_DIMS[name]})")

    trainer = FaceNetTrainer(embedding_dim=FACENET_DIMS[name],
                             learning_rate=learning_rate)
    variables, opt_state = trainer.init(seed)
    if init_weights is not None:
        from facerec_tpu.models.load import resolve_facenet_params

        variables = dict(resolve_facenet_params(init_weights, name,
                                                variables))
        opt_state = trainer.tx.init(variables["params"])
    rng = np.random.default_rng(seed)
    losses = []
    for step, (ims, labels) in enumerate(
            ds.batches(ids_per_batch, crops_per_id, rng)):
        if step >= steps:
            break
        variables, opt_state, loss = trainer.step(
            variables, opt_state, jnp.asarray(ims), jnp.asarray(labels))
        losses.append(float(loss))
        if step % log_every == 0:
            print(f"step {step}: loss {losses[-1]:.4f}", flush=True)
    if recalibrate:
        # Same post-training BN refresh as every other trainer
        # (train/recalibrate.py, docs/DESIGN.md "BN recalibration").
        from facerec_tpu.train.recalibrate import recalibrate_batch_stats

        @jax.jit
        def _apply_batch(v, x):
            _, mut = trainer.model.apply(v, prewhiten(x), train=True,
                                         mutable=["batch_stats"])
            return mut["batch_stats"]

        def _cal_batches(n=32):
            it = ds.batches(ids_per_batch, crops_per_id,
                            np.random.default_rng(seed + 99))
            for i, (ims, _labels) in enumerate(it):
                if i >= n:
                    break
                yield jnp.asarray(ims)

        print("recalibrating BN statistics on dataset batches",
              flush=True)
        variables = recalibrate_batch_stats(variables, _cal_batches(),
                                            _apply_batch)
    ckpt = os.path.abspath(os.path.join(out, name))
    save_params(ckpt, variables)
    print(f"saved FaceNet checkpoint to {ckpt}")
    return losses


def main(argv=None):
    import argparse

    from facerec_tpu.runtime import ensure_platform

    ensure_platform()
    from facerec_tpu.config import EMB_NAME

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--root", required=True,
                        help="crop root: one subdirectory of face "
                             "images per identity")
    parser.add_argument("--out", default="./facenet_weights",
                        help="weights dir; the checkpoint lands at "
                             "<out>/<name>/ ready for --facenet-weights")
    parser.add_argument("--name", default=EMB_NAME,
                        help="which of the four checkpoint names to "
                             "train")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--ids-per-batch", type=int, default=4)
    parser.add_argument("--crops-per-id", type=int, default=4)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--init-weights", default=None,
                        help="fine-tune: resolve the starting "
                             "checkpoint from this weights dir "
                             "(.pt/.h5/orbax, models/load.py)")
    parser.add_argument("--no-recalibrate", dest="recalibrate",
                        action="store_false",
                        help="skip the post-training BN statistics "
                             "recalibration on dataset batches")
    args = parser.parse_args(argv)
    train(args.root, args.out, args.steps, name=args.name,
          ids_per_batch=args.ids_per_batch,
          crops_per_id=args.crops_per_id, learning_rate=args.lr,
          seed=0, init_weights=args.init_weights,
          recalibrate=args.recalibrate)


if __name__ == "__main__":
    main()
