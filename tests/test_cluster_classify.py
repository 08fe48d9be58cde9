"""Clustering vs scipy, KNN vs sklearn, stage-level behaviour."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.cluster.hierarchy as sch
from sklearn.neighbors import KNeighborsClassifier

from facerec_tpu.ops.knn import knn_predict_proba
from facerec_tpu.ops.linkage import cluster_vectors, pairwise_distances
from facerec_tpu.pipeline.cluster import (cluster_trajectories, relabel,
                                          split_and_merge)


def grouping(labels):
    """Canonical partition representation independent of label values."""
    groups = {}
    for i, l in enumerate(labels):
        groups.setdefault(int(l), []).append(i)
    return sorted(tuple(v) for v in groups.values())


@pytest.mark.parametrize("n,k", [(10, 3), (50, 5), (120, 7), (40, 1),
                                 (7, 7), (30, 29), (9, 0), (13, 30)])
def test_linkage_matches_scipy(rng, n, k):
    x = rng.normal(size=(n, 8)).astype(np.float32)
    got = cluster_vectors(x, k)
    link = sch.linkage(x.astype(np.float64), method="complete")
    want = sch.fcluster(link, t=k, criterion="maxclust")
    # label-exact, not just partition-exact: downstream split ordering
    # and equal-size tie-breaks depend on the label values
    np.testing.assert_array_equal(got, want)


def test_pairwise_distances(rng):
    x = rng.normal(size=(12, 5)).astype(np.float32)
    got = np.asarray(pairwise_distances(jnp.asarray(x)))
    want = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    # the matmul form |x|²-2xy+|y|² loses ~1e-3 abs precision in f32
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_knn_matches_sklearn(rng):
    x = rng.normal(size=(60, 16)).astype(np.float32)
    y = rng.integers(0, 5, 60) * 7 + 3  # arbitrary class ids
    q = rng.normal(size=(20, 16)).astype(np.float32)

    proba, classes = knn_predict_proba(x, y, q, k=10)
    sk = KNeighborsClassifier(n_neighbors=10, weights="uniform").fit(x, y)
    np.testing.assert_array_equal(classes, sk.classes_)
    np.testing.assert_allclose(proba, sk.predict_proba(q), atol=1e-6)


def test_split_and_merge_sizes(rng):
    # one big cluster of 60, one ok (15), several tiny ones
    labels = np.array([0] * 60 + [1] * 15 + [2, 3, 4, 5] * 2)
    out = split_and_merge(labels.copy(), min_size=12, max_size=24)
    _, counts = np.unique(out, return_counts=True)
    assert counts.max() <= 24
    # the 60-cluster got split into 3 chunks of 20
    assert sorted(counts.tolist(), reverse=True)[:3] == [20, 20, 20]


def test_relabel():
    out = relabel(np.array([7, 3, 7, 9, 3]))
    assert out.tolist() == [1, 0, 1, 2, 0]


def test_cluster_trajectories_constraints(rng):
    # 3 well-separated identities with many trajectories each
    centers = rng.normal(size=(3, 32)) * 10
    x = np.concatenate([
        centers[i] + rng.normal(size=(40, 32)) * 0.1 for i in range(3)
    ]).astype(np.float32)
    labels = cluster_trajectories(x, size=18, min_size=12, max_size=24)
    assert labels.shape == (120,)
    ids, counts = np.unique(labels, return_counts=True)
    # labels are 0..k-1, biggest first
    assert ids.tolist() == list(range(len(ids)))
    assert (np.diff(counts) <= 0).all()
    assert counts.max() <= 24
    # no cluster mixes identities
    truth = np.repeat([0, 1, 2], 40)
    for ci in ids:
        assert len(np.unique(truth[labels == ci])) == 1


def test_stage_files(tmp_path, rng):
    """cluster + classify stages over synthetic contract files."""
    import json
    import zipfile

    from facerec_tpu.config import ClassifyConfig, ClusterConfig
    from facerec_tpu.contract import records
    from facerec_tpu.pipeline.classify import (build_training_set,
                                               read_actor_embeddings,
                                               run_classify)
    from facerec_tpu.pipeline.cluster import run_cluster

    data_dir = tmp_path / "42-data"
    data_dir.mkdir()

    # two identities, 4 trajectories each, features every frame
    centers = rng.normal(size=(2, 16)) * 5
    with open(data_dir / "trajectories.jsonl", "w") as tf, \
            open(data_dir / "features.jsonl", "w") as ff:
        idx = 0
        for ident in range(2):
            for _ in range(4):
                start = idx * 10
                box = [10 * idx, 10, 10 * idx + 20, 30]
                rec = records.trajectory_record(start, [box], [True], 320, 240)
                rec["index"] = idx
                rec["movie_id"] = 42
                records.write_trajectory(tf, rec)
                vec = (centers[ident]
                       + rng.normal(size=16) * 0.05).astype(np.float32)
                records.write_feature(ff, records.feature_record(
                    start, f"42:{start}:x", {"m": vec.tolist()},
                    box, {}, 320, 240))
                idx += 1

    cfg = ClusterConfig(size=4, min_size=2, max_size=6, emb_name="m")
    clusters = run_cluster(str(data_dir), cfg)
    assert (data_dir / "clusters.json").exists()
    got = json.loads((data_dir / "clusters.json").read_text())
    assert got["movie_id"] == 42
    assert len(got["clusters"]) == 8

    # actor zip with 3 actors (2 matching the identities + 1 distractor)
    zpath = tmp_path / "actor-images.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for a, center in enumerate([centers[0], centers[1],
                                    rng.normal(size=16) * 5]):
            for i in range(3):
                vec = (center + rng.normal(size=16) * 0.05).tolist()
                z.writestr(f"a{a}_{i}.jpg.json", json.dumps({
                    "box": [0, 0, 1, 1], "embeddings": {"m": vec},
                    "actorID": str(100 + a), "actorname": f"Actor {a}",
                }))

    emb, names = read_actor_embeddings(str(zpath), "m")
    assert names == {100: "Actor 0", 101: "Actor 1", 102: "Actor 2"}
    x, y = build_training_set(emb, min_samples=5)
    assert x.shape == (15, 16)

    # k=5 with 5 train rows per actor → the whole neighbourhood is the
    # correct actor for well-separated identities
    ccfg = ClassifyConfig(k=5, emb_name="m")
    run_classify(str(data_dir), x, y, ccfg)
    preds = json.loads((data_dir / "predictions.json").read_text())
    assert preds["movie_id"] == 42
    # every cluster got a confident correct actor
    for ci, p in preds["predictions"].items():
        assert p, (ci, preds)
        top = max(p, key=p.get)
        assert top in ("momaf:elonet_henkilo_100", "momaf:elonet_henkilo_101")
        assert p[top] > 0.9


def test_classify_too_few_classes(tmp_path, rng):
    import json

    from facerec_tpu.config import ClassifyConfig
    from facerec_tpu.pipeline.classify import run_classify

    data_dir = tmp_path / "7-data"
    data_dir.mkdir()
    (data_dir / "clusters.json").write_text(
        '{"clusters":[0,0,1],"movie_id":7}\n')
    (data_dir / "trajectories.jsonl").write_text("")
    (data_dir / "features.jsonl").write_text("")

    x = rng.normal(size=(10, 4)).astype(np.float32)
    y = np.array([1] * 5 + [2] * 5)
    run_classify(str(data_dir), x, y, ClassifyConfig(emb_name="m"))
    # <3 classes → bare {cluster: {}} map, default json format
    assert (data_dir / "predictions.json").read_text() == \
        '{"0": {}, "1": {}}'


def test_knn_k_too_large_raises_like_sklearn(rng):
    x = rng.normal(size=(5, 4)).astype(np.float32)
    y = np.arange(5)
    with pytest.raises(ValueError, match="n_neighbors"):
        knn_predict_proba(x, y, x, k=10)
