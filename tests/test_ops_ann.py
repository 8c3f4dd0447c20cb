"""Similarity-search operators: brute-force kNN self-consistency,
LSH ANN recall vs the exact baseline, centroids vs a numpy oracle."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from swarm_ray.ops import ann

SF = "/root/testdata/sf0.001"


def _exact_numpy(sf_dir, k=ann.TOP_K, n_queries=ann.N_QUERIES):
    """Driver-side exact top-k oracle over the whole table."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    ids = t["vec_id"].to_numpy()
    m = np.asarray(list(t["embedding"]), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    q_sel = ids < n_queries
    sims = m[q_sel] @ m.T
    out = {}
    for j, qid in enumerate(ids[q_sel]):
        col = sims[j]
        order = np.lexsort((ids, -col))
        neigh = [int(ids[i]) for i in order if ids[i] != qid][:k]
        out[int(qid)] = neigh
    return out


def test_knn_bruteforce_matches_numpy_oracle():
    got = ann.q_knn_bruteforce(SF).to_pandas() \
        .sort_values(["query_vec_id", "rank"]).reset_index(drop=True)
    want = _exact_numpy(SF)
    assert set(got["query_vec_id"]) == set(want)
    for qid, g in got.groupby("query_vec_id"):
        assert list(g.sort_values("rank")["neighbor_vec_id"]) == want[int(qid)]


def test_lsh_ann_recall():
    exact = _exact_numpy(SF)
    approx = ann.q_lsh_ann(SF)
    hits = total = 0
    for qid, neigh in exact.items():
        got = set(approx[approx["query_vec_id"] == qid]["neighbor_vec_id"])
        hits += len(got & set(neigh))
        total += len(neigh)
    recall = hits / total
    assert recall >= 0.6, f"LSH recall {recall:.2f} below floor"


def test_near_dup_pairs_symmetric_and_thresholded():
    pairs = ann.q_emb_near_dup(SF)
    assert (pairs["vec_a"] < pairs["vec_b"]).all()
    # recomputing any pair's cosine must exceed tau
    if len(pairs):
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).to_pandas()
        emb = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
               for r in t.itertuples() if r.vec_id < ann.NEAR_DUP_N}
        for r in pairs.itertuples():
            a, b = emb[r.vec_a], emb[r.vec_b]
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            assert cos > ann.NEAR_DUP_TAU


def test_centroids_match_numpy():
    got = ann.centroids_float(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["label", "embedding"]).to_pandas()
    for r in got.itertuples():
        sel = t[t["label"] == r.label]
        want = np.mean(np.asarray(list(sel["embedding"]), dtype=np.float64), axis=0)
        assert r.n == len(sel)
        np.testing.assert_allclose(np.asarray(r.centroid), want, rtol=1e-12)


def test_ivf_ann_recall():
    exact = _exact_numpy(SF)
    approx = ann.q_knn_ivf(SF).to_pandas()
    hits = total = 0
    for qid, neigh in exact.items():
        got = set(approx[approx["query_vec_id"] == qid]["neighbor_vec_id"])
        hits += len(got & set(neigh))
        total += len(neigh)
    recall = hits / total
    assert recall >= 0.6, f"IVF recall {recall:.2f} below floor"
