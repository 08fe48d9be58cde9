"""Trajectory clustering stage.

Behavioural rebuild of /root/reference/facerec/cluster.py:163-225: mean
embedding per trajectory, complete-linkage clustering into ``N // size``
clusters, recursive split of clusters above ``max_size`` with the
split-and-merge size repair, then relabeling with largest clusters
first.  The O(N²) distance work runs on device
(:mod:`facerec_tpu.ops.linkage`); the label bookkeeping is host numpy.
"""
from __future__ import annotations

import argparse
import glob
import os
from typing import List, Tuple

import numpy as np

from facerec_tpu.config import ClusterConfig
from facerec_tpu.contract import records
from facerec_tpu.contract.jsonio import read_jsonl
from facerec_tpu.ops.linkage import cluster_vectors


def split_and_merge(clusters: np.ndarray, min_size: int,
                    max_size: int) -> np.ndarray:
    """Repair cluster sizes into [min_size, max_size] (best effort).

    Same behaviour as cluster.py:61-101 including its quirks: big
    clusters split into equal chunks in index order; consecutive
    too-small clusters bundled greedily (the trailing one may stay
    small).
    """
    new = np.zeros(clusters.size, np.int32)
    next_id = 0
    ids, counts = np.unique(clusters, return_counts=True)
    for ci, n in zip(ids, counts):
        idx = np.where(clusters == ci)[0]
        if n > max_size:
            n_splits = (n + max_size - 1) // max_size
            chunk = (n + n_splits - 1) // n_splits
            for i in range(n_splits):
                new[idx[i * chunk:(i + 1) * chunk]] = next_id
                next_id += 1
        else:
            new[idx] = next_id
            next_id += 1

    ids, counts = np.unique(new, return_counts=True)
    small = np.where(counts < min_size)[0]
    small_ids = ids[small]
    small_counts = counts[small]
    prev = 0
    for upper in range(1, small.size):
        if (small_counts[prev:upper].sum() >= min_size
                or upper == small.size - 1):
            sel = np.isin(new, small_ids[prev:upper])
            new[sel] = small_ids[prev]
            prev = upper
    return new


def relabel(clusters: np.ndarray) -> np.ndarray:
    """Labels → 0..k-1 by ascending original label (cluster.py:103-109)."""
    _, inv = np.unique(clusters, return_inverse=True)
    return inv.astype(np.int32)


def cluster_trajectories(embeddings: np.ndarray, size: int, min_size: int,
                         max_size: int) -> np.ndarray:
    """Full clustering recipe (cluster.py:163-214)."""
    n = len(embeddings)
    # N // size unclamped (cluster.py:178): t=0 means every trajectory
    # its own cluster, exactly as scipy fcluster handles it
    clusters = cluster_vectors(embeddings, n // size).astype(np.int32)

    ids, counts = np.unique(clusters, return_counts=True)
    for ci, cnt in zip(ids, counts):
        if cnt > max_size:
            n_splits = (cnt + max_size - 1) // max_size
            idx = np.where(clusters == ci)[0]
            sub = cluster_vectors(embeddings[idx], n_splits)
            sub = split_and_merge(sub, min_size, max_size)
            clusters[idx] = clusters.max() + 1 + sub

    clusters = relabel(clusters)
    ids, counts = np.unique(clusters, return_counts=True)
    # biggest cluster becomes 0, and so on (stable for ties by label)
    order = np.argsort(np.argsort(-counts))[ids]
    return order[clusters]


def read_trajectory_embeddings(data_dir: str,
                               emb_name: str) -> Tuple[List[dict], np.ndarray]:
    """Mean embedding per trajectory (cluster.py:19-31)."""
    vector_map = records.load_feature_map(
        os.path.join(data_dir, "features.jsonl"))
    trajectories, means = [], []
    for traj in read_jsonl(os.path.join(data_dir, "trajectories.jsonl")):
        vectors = records.trajectory_vectors(traj, vector_map, emb_name)
        trajectories.append(traj)
        means.append(vectors.mean(axis=0))
    return trajectories, np.array(means, np.float32)


def run_cluster(data_dir: str, cfg: ClusterConfig) -> np.ndarray:
    from facerec_tpu.runtime.metrics import StageReport

    report = StageReport("cluster")
    movie_id = int(os.path.basename(data_dir).split("-")[0])
    _, embeddings = read_trajectory_embeddings(data_dir, cfg.emb_name)
    clusters = cluster_trajectories(embeddings, cfg.size, cfg.min_size,
                                    cfg.max_size)
    records.write_clusters(os.path.join(data_dir, "clusters.json"),
                           clusters, movie_id)
    # counters-as-JSON per stage (SURVEY.md §5.5; cf. cluster.py:154)
    report.set("n_trajectories", int(len(clusters)))
    report.set("n_clusters", int(len(np.unique(clusters)))
               if len(clusters) else 0)
    report.write(data_dir)
    return clusters


def main(argv=None):
    from facerec_tpu.runtime import ensure_platform
    ensure_platform()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--size", type=int, default=18,
                        help="preferred cluster size (trajectory count)")
    parser.add_argument("--min-size", type=int, default=12)
    parser.add_argument("--max-size", type=int, default=24)
    parser.add_argument("--path", type=str, default=".",
                        help="movie data directory (glob)")
    args = parser.parse_args(argv)

    for data_dir in glob.glob(args.path):
        data_dir = data_dir.rstrip("/")
        print(f"Clustering: {data_dir}")
        cfg = ClusterConfig(size=args.size, min_size=args.min_size,
                            max_size=args.max_size)
        clusters = run_cluster(data_dir, cfg)
        print(f"Number of clusters: {len(np.unique(clusters))}")


if __name__ == "__main__":
    main()
