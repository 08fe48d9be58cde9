"""FaceNet triplet training: mining correctness + loss decreases."""
import numpy as np
import jax.numpy as jnp
import pytest

from facerec_tpu.train.facenet_train import (pairwise_sq_dists,
                                             semi_hard_triplet_loss)


def test_pairwise_sq_dists(rng):
    x = rng.normal(size=(6, 4)).astype(np.float32)
    got = np.asarray(pairwise_sq_dists(jnp.asarray(x)))
    want = ((x[:, None] - x[None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_triplet_loss_zero_when_separated(rng):
    # two tight clusters at orthogonal poles of the sphere → no violations
    pole_a = np.eye(8)[0]
    pole_b = np.eye(8)[7]
    a = (pole_a + rng.normal(size=(4, 8)) * 0.01).astype(np.float32)
    b = (pole_b + rng.normal(size=(4, 8)) * 0.01).astype(np.float32)
    emb = np.concatenate([a, b])
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    loss = float(semi_hard_triplet_loss(jnp.asarray(emb),
                                        jnp.asarray(labels)))
    # d_ap ~ 1e-4, d_an ~ 2.0 >> margin → every triplet satisfied
    assert loss < 1e-5, loss


def test_triplet_loss_positive_when_mixed(rng):
    emb = rng.normal(size=(8, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = np.array([0, 1, 0, 1, 0, 1, 0, 1])
    loss = float(semi_hard_triplet_loss(jnp.asarray(emb),
                                        jnp.asarray(labels)))
    assert loss > 0.0


@pytest.mark.slow
def test_trainer_loss_decreases(rng):
    """Tiny embedder (reuse detector-trainer style smoke): to keep the
    test light we train the full FaceNet for 3 steps on 8 crops."""
    from facerec_tpu.train.facenet_train import FaceNetTrainer

    trainer = FaceNetTrainer(embedding_dim=32, learning_rate=3e-4)
    params, opt_state = trainer.init()
    crops = jnp.asarray(rng.integers(0, 255, (8, 160, 160, 3)), jnp.uint8)
    labels = jnp.asarray(np.array([0, 0, 1, 1, 2, 2, 3, 3]))
    losses = []
    for _ in range(3):
        params, opt_state, loss = trainer.step(params, opt_state, crops,
                                               labels)
        losses.append(float(loss))
    assert losses[-1] <= losses[0] + 1e-3, losses


def test_single_identity_batch_zero_loss(rng):
    """No negatives in the batch → no triplets → loss exactly 0 (not a
    1e9 sentinel blow-up)."""
    emb = rng.normal(size=(6, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = np.zeros(6, np.int64)
    loss = float(semi_hard_triplet_loss(jnp.asarray(emb),
                                        jnp.asarray(labels)))
    assert loss == 0.0


def test_identity_crop_dataset_pk_batches(tmp_path, rng):
    """Directory-tree dataset: PK sampling shapes, with-replacement
    fallback for identities with fewer than K crops."""
    import cv2

    from facerec_tpu.train.facenet_train import IdentityCropDataset
    from facerec_tpu.video.synth import identity_crops

    for ident, n in (("anna", 4), ("bertil", 2), ("cecilia", 3)):
        d = tmp_path / ident
        d.mkdir()
        crops = identity_crops(rng, hash(ident) % 7, n, size=48)
        for i, c in enumerate(crops):
            cv2.imwrite(str(d / f"c{i}.jpg"),
                        cv2.cvtColor(c, cv2.COLOR_RGB2BGR))
    (tmp_path / "notes.txt").write_text("ignored")

    ds = IdentityCropDataset(str(tmp_path), crop_size=32)
    assert ds.idents == ["anna", "bertil", "cecilia"]
    it = ds.batches(ids_per_batch=3, crops_per_id=3,
                    rng=np.random.default_rng(0))
    ims, labels = next(it)
    assert ims.shape == (9, 32, 32, 3) and ims.dtype == np.uint8
    assert labels.shape == (9,)
    # each picked identity contributes exactly K consecutive crops
    assert sorted(set(labels)) == [0, 1, 2]
    for lab in (0, 1, 2):
        assert (labels == lab).sum() == 3


@pytest.mark.slow
def test_facenet_train_cli_checkpoint_deploys(tmp_path, rng):
    """The standalone embedder trainer end to end: identity dirs →
    2-step train (BN recalibration on) → orbax checkpoint at
    <out>/<name>/ that the PRODUCTION weights resolver loads."""
    import cv2

    from facerec_tpu.config import EMB_NAME
    from facerec_tpu.models.load import load_facenet_embedders
    from facerec_tpu.train.facenet_train import train
    from facerec_tpu.video.synth import identity_crops

    root = tmp_path / "ids"
    for ident in range(3):
        d = root / f"id{ident}"
        d.mkdir(parents=True)
        for i, c in enumerate(identity_crops(rng, ident, 3)):
            cv2.imwrite(str(d / f"c{i}.jpg"),
                        cv2.cvtColor(c, cv2.COLOR_RGB2BGR))

    out = str(tmp_path / "weights")
    losses = train(str(root), out, steps=2, ids_per_batch=3,
                   crops_per_id=2, seed=0)
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)

    embedders = load_facenet_embedders(out, names=[EMB_NAME])
    crops = jnp.asarray(rng.integers(0, 255, (2, 160, 160, 3)), jnp.uint8)
    emb = np.asarray(embedders[EMB_NAME](crops))
    assert emb.shape == (2, 128) and np.isfinite(emb).all()
