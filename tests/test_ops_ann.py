"""Similarity-search operators: brute-force kNN self-consistency,
LSH ANN recall vs the exact baseline, centroids vs a numpy oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
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
    approx = ann.q_lsh_ann(SF).to_pandas()
    hits = total = 0
    for qid, neigh in exact.items():
        got = set(approx[approx["query_vec_id"] == qid]["neighbor_vec_id"])
        hits += len(got & set(neigh))
        total += len(neigh)
    recall = hits / total
    assert recall >= 0.6, f"LSH recall {recall:.2f} below floor"


@pytest.mark.parametrize("query_fn,fixture_fn", [
    ("q_lsh_ann", "lsh_candidates_expected_dir"),
    ("q_knn_ivf", "ivf_candidates_expected_dir"),
])
def test_ann_matches_candidate_rank_oracle(tmp_path, monkeypatch,
                                           query_fn, fixture_fn):
    """The engine's distributed bucket→score→fold plan must equal
    DuckDB ranking the fixture-derived candidate set by
    list_cosine_similarity (the emb_lsh_ann / emb_ivf_ann oracles)."""
    import duckdb

    from swarm_ray import fixtures

    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    got = getattr(ann, query_fn)(SF).to_pandas() \
        .sort_values(["query_vec_id", "rank"]).reset_index(drop=True)
    cand = getattr(fixtures, fixture_fn)(SF) / "expected.parquet"
    want = duckdb.sql(f"""
        WITH c AS (
          SELECT query_vec_id, vec_id FROM read_parquet('{cand}')
          WHERE vec_id <> query_vec_id
        ), e AS (
          SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')
        ), scored AS (
          SELECT c.query_vec_id, c.vec_id,
            list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                   CAST(e2.embedding AS DOUBLE[])) AS sim
          FROM c JOIN e q ON q.vec_id = c.query_vec_id
                 JOIN e e2 ON e2.vec_id = c.vec_id
        ), ranked AS (
          SELECT query_vec_id, vec_id,
            ROW_NUMBER() OVER (PARTITION BY query_vec_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
          FROM scored
        )
        SELECT query_vec_id, rank, vec_id AS neighbor_vec_id
        FROM ranked WHERE rank <= {ann.TOP_K}
        ORDER BY query_vec_id, rank
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


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


# ------------------------------------------------------- 1k-query API


def _synth_corpus(n=2500, dim=32, seed=5):
    """Seeded synthetic corpus + the Dataset wrapping it."""
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    flat = pa.array(m.astype(np.float32).reshape(-1), type=pa.float32())
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, dim),
    })
    # float32 storage round-trip, as the real table has
    m64 = m.astype(np.float32).astype(np.float64)
    return rd.from_arrow(t).repartition(8), np.arange(n, dtype=np.int64), m64


def test_knn_bruteforce_1k_queries(ray_session):
    """The query-set API is not structurally bounded to the 10-query
    oracle prefix (VERDICT r2 item 7): 1000 queries flow through the
    broadcast + batch-local-topk + per-query-fold plan; results match
    the driver-side numpy oracle exactly."""
    corpus, ids, m = _synth_corpus()
    nq, k = 1000, 3
    q_ids, q = ids[:nq], m[:nq]
    got = ann.knn_bruteforce(corpus, q_ids, q, k=k).to_pandas()
    assert set(got["query_vec_id"]) == set(range(nq))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn[:nq] @ mn.T
    for qid in (0, 1, 17, 500, 999):
        col = sims[qid]
        order = np.lexsort((ids, -col))
        want = [int(ids[i]) for i in order if ids[i] != qid][:k]
        g = got[got["query_vec_id"] == qid].sort_values("rank")
        assert list(g["neighbor_vec_id"]) == want


def test_knn_ivf_1k_queries(ray_session):
    """1000 queries through the IVF path: inverted probe lists, no
    per-query loop; recall vs brute force stays high."""
    corpus, ids, m = _synth_corpus()
    nq, k = 1000, 3
    q_ids, q = ids[:nq], m[:nq]
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cent = ann.train_coarse_centroids(
        (m / np.linalg.norm(m, axis=1, keepdims=True))[:1024], nlist=8)
    approx = ann.knn_ivf(corpus, q_ids, q, cent, k=k, nprobe=4).to_pandas()
    exact = ann.knn_bruteforce(corpus, q_ids, q, k=k).to_pandas()
    hits = total = 0
    for qid, g in exact.groupby("query_vec_id"):
        want = set(g["neighbor_vec_id"])
        got = set(approx[approx["query_vec_id"] == qid]["neighbor_vec_id"])
        hits += len(got & want)
        total += len(want)
    assert hits / total >= 0.6, f"IVF@1k recall {hits/total:.2f}"


def test_lsh_ann_1k_queries(ray_session):
    """1000 queries through the single-pass LSH scorer (distributed
    re-rank — no driver-side hit/embedding materialization)."""
    corpus, ids, m = _synth_corpus()
    nq, k = 1000, 3
    approx = ann.lsh_ann(corpus, ids[:nq], m[:nq], k=k).to_pandas()
    exact = ann.knn_bruteforce(corpus, ids[:nq], m[:nq], k=k).to_pandas()
    hits = total = 0
    for qid, g in exact.groupby("query_vec_id"):
        want = set(g["neighbor_vec_id"])
        got = set(approx[approx["query_vec_id"] == qid]["neighbor_vec_id"])
        hits += len(got & want)
        total += len(want)
    assert hits / total >= 0.6, f"LSH@1k recall {hits/total:.2f}"


def test_kmeans_matches_serial_recompute(ray_session, tmp_path, monkeypatch):
    """Distributed fixed-point Lloyd must be BIT-IDENTICAL to the
    serial fixture recompute (integer arithmetic end to end)."""
    import pyarrow.parquet as pq
    from swarm_ray import fixtures
    from swarm_ray.ops.ann import q_emb_kmeans
    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    got = q_emb_kmeans(SF)
    exp = pq.read_table(
        fixtures.kmeans_expected_dir(SF) / "expected.parquet").to_pandas()
    assert got["cluster"].tolist() == exp["cluster"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["csum_e6"].tolist() == exp["csum_e6"].tolist()
    # sanity: every vector assigned, >1 non-empty cluster
    assert got["n"].sum() == 500
    assert (got["n"] > 0).sum() > 1


def test_kmeans_iterates_beyond_init(ray_session):
    """Lloyd must actually move: final per-cluster stats differ from
    the iteration-0 (init-centroid) assignment."""
    from swarm_ray.ops.ann import q_emb_kmeans
    zero = q_emb_kmeans(SF, iters=0)
    final = q_emb_kmeans(SF, iters=4)
    assert zero["n"].tolist() != final["n"].tolist()


def test_knn_degenerate_batch_tie_cap(ray_session):
    """A corpus dominated by one duplicated embedding must (a) not blow
    the candidate set up to n_corpus × n_queries, and (b) still return
    the exact (sim desc, vec_id asc) top-k (ADVICE r3)."""
    import ray
    import ray.data as rd
    from swarm_ray.ops.ann import BruteForceTopK, knn_bruteforce

    rng = np.random.default_rng(11)
    dup = rng.standard_normal(8)
    distinct = rng.standard_normal((20, 8))
    m = np.vstack([np.tile(dup, (300, 1)), distinct])
    ids = np.arange(len(m), dtype=np.int64)
    q_ids, q = ids[:3], m[:3]

    # stage-level: candidate rows bounded by k·n_queries, not corpus
    stage = BruteForceTopK(ray.put((q_ids, q)), k=5)
    out = stage(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(m.astype(np.float32)),
                              type=pa.list_(pa.float32()))}))
    assert len(out) <= (5 + 1) * len(q_ids)

    # end-to-end: exact vs a serial (sim desc, vec_id asc) recompute
    corpus = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(m.astype(np.float32)),
                              type=pa.list_(pa.float32()))}))
    got = knn_bruteforce(corpus, q_ids, q, k=5).to_pandas() \
        .sort_values(["query_vec_id", "rank"]).reset_index(drop=True)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn[:3] @ mn.T
    for j, qid in enumerate(q_ids):
        order = np.lexsort((ids, -sims[j]))
        want = [int(i) for i in ids[order] if i != qid][:5]
        g = got[got["query_vec_id"] == qid].sort_values("rank")
        assert g["neighbor_vec_id"].tolist() == want


def test_semantic_dedup_reconciles(ray_session):
    """Embedding-side dedup keep-list: kept+removed covers the corpus;
    removed equals the union-find non-representatives."""
    import pyarrow.parquet as pq
    from swarm_ray.ops.ann import q_emb_dedup_semantic, q_emb_near_dup
    from swarm_ray.ops.dedup import union_find_clusters
    got = q_emb_dedup_semantic(SF).to_pandas().sort_values("label") \
        .reset_index(drop=True)
    pairs = q_emb_near_dup(SF).rename(
        columns={"vec_a": "doc_a", "vec_b": "doc_b"})
    clusters = union_find_clusters(pairs)
    removed = set(clusters.loc[clusters.doc_id != clusters.cluster_id,
                               "doc_id"])
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    emb["removed"] = emb["vec_id"].isin(removed).astype("int64")
    exp = emb.groupby("label").agg(
        kept=("removed", lambda s: int((1 - s).sum())),
        removed=("removed", "sum")).reset_index() \
        .sort_values("label").reset_index(drop=True)
    assert got["kept"].tolist() == exp["kept"].tolist()
    assert got["removed"].tolist() == exp["removed"].tolist()
    assert int(got["removed"].sum()) == len(removed) > 0


def test_semantic_dedup_antijoin_path_matches_broadcast(ray_session,
                                                        monkeypatch):
    """Large-frontier switch: threshold forced below any frontier so
    the keyed-repartition anti-join MUST run (the broadcast helper is
    poisoned to prove it), and its per-label counts must be identical
    to the broadcast path (VERDICT r3 item 2)."""
    from swarm_ray.ops import ann as _ann

    base = _ann.q_emb_dedup_semantic(SF).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    monkeypatch.setattr(_ann, "SEMANTIC_BROADCAST_MAX", -1)
    got = _ann.q_emb_dedup_semantic(SF).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, base)

    def _poisoned(*a, **k):
        raise AssertionError("anti-join path must not run under "
                             "broadcast-size frontiers")

    monkeypatch.setattr(_ann, "SEMANTIC_BROADCAST_MAX", 10**9)
    monkeypatch.setattr(_ann, "_semantic_antijoin_counts", _poisoned)
    again = _ann.q_emb_dedup_semantic(SF).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    pd.testing.assert_frame_equal(again, base)


# ------------------------------------------------- cluster-balanced sample

def test_cluster_sample_matches_serial_recompute(ray_session, tmp_path,
                                                 monkeypatch):
    """Cluster-balanced exact-quota draw must equal a plain-Python
    recompute: serial fixed-point k-means assignment + per-cluster
    quota under the salted md5 order. Also pins quota exactness (no
    cluster exceeds CS_QUOTA; smaller clusters keep all members)."""
    import hashlib

    from swarm_ray import fixtures
    from swarm_ray.ops.ann import (CS_QUOTA, CS_SALT,
                                   q_emb_cluster_sample_checked)

    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    got = (q_emb_cluster_sample_checked(SF).to_pandas()
           .sort_values(["cluster", "rank"]).reset_index(drop=True))

    # independent recompute from the serial assignment fixture
    exp_assign = pq.read_table(
        fixtures.kmeans_assign_expected_dir(SF) / "expected.parquet"
    ).to_pandas()
    exp_assign["skey"] = exp_assign["vec_id"].map(
        lambda v: hashlib.md5(f"{v}{CS_SALT}".encode()).hexdigest())
    exp = (exp_assign.sort_values(["cluster", "skey"])
           .groupby("cluster").head(CS_QUOTA))
    exp["rank"] = exp.groupby("cluster").cumcount() + 1
    exp = exp[["cluster", "rank", "vec_id"]].reset_index(drop=True)

    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"))
    sizes = exp_assign.groupby("cluster").size()
    kept = got.groupby("cluster").size()
    for c, n in sizes.items():
        assert kept.get(c, 0) == min(n, CS_QUOTA)


# ------------------------------------------------------------ IVF-PQ ANN

def test_pq_ann_recall():
    """IVF-PQ ADC top-k keeps recall@5 ≥ 0.6 vs brute force on the
    synthetic corpus — the hardest PQ case (no cluster structure for
    the codebooks to exploit; real embedding corpora do better)."""
    exact = _exact_numpy(SF)
    approx = ann.q_knn_pq(SF).to_pandas()
    hits = total = 0
    for qid, neigh in exact.items():
        got = set(approx[approx["query_vec_id"] == qid]["neighbor_vec_id"])
        hits += len(got & set(neigh))
        total += len(neigh)
    recall = hits / total
    assert recall >= 0.6, f"PQ recall {recall:.2f} below floor"


def test_pq_ann_batch_size_invariance(ray_session):
    """The whole PQ path is fixed-point integer, so results must be
    BIT-IDENTICAL under any batching/parallelism — re-running with a
    tiny batch size (different batch compositions, different local
    top-k thresholds, different fold arrival order) changes nothing."""
    coarse, books = ann.pq_fit(SF)
    q_ids, q = ann._load_queries(SF)
    base = (knn := lambda bs, nparts: ann.knn_pq(
        ann._read_emb(SF).repartition(nparts), q_ids, q, coarse, books,
        batch_size=bs).to_pandas()
        .sort_values(["query_vec_id", "rank"]).reset_index(drop=True))
    a = base(4096, 1)
    b = base(37, 13)
    pd.testing.assert_frame_equal(a, b)


def test_pq_1k_queries(ray_session):
    """1000 queries through the PQ path: per-query integer LUTs built
    once per actor, inverted probe lists, no per-query Python loop."""
    corpus, ids, m = _synth_corpus()
    nq, k = 1000, 3
    q_ids, q = ids[:nq], m[:nq]
    samp = ann._pq_int(m[:1024])
    coarse, books = ann.train_pq(samp, nlist=8, m_sub=16, ksub=128)
    approx = ann.knn_pq(corpus, q_ids, q, coarse, books, k=k,
                        nprobe=6).to_pandas()
    exact = ann.knn_bruteforce(corpus, q_ids, q, k=k).to_pandas()
    hits = total = 0
    for qid, g in exact.groupby("query_vec_id"):
        want = set(g["neighbor_vec_id"])
        got = set(approx[approx["query_vec_id"] == qid]["neighbor_vec_id"])
        hits += len(got & want)
        total += len(want)
    assert hits / total >= 0.55, f"PQ@1k recall {hits/total:.2f}"


def test_pq_encode_compression_shape():
    """pq_encode emits one small int per subspace — the compressed
    representation is (n, M) codes in [0, PQ_KSUB), not vectors."""
    rng = np.random.default_rng(3)
    x = ann._pq_int(rng.standard_normal((200, 64)))
    coarse, books = ann.train_pq(x)
    codes = pq_encode_out = ann.pq_encode(x, books)
    assert codes.shape == (200, ann.PQ_M)
    assert codes.min() >= 0 and codes.max() < ann.PQ_KSUB
    # reconstruction = codebook gather; ADC score == q · recon exactly
    recon = np.concatenate(
        [books[m][codes[:, m]] for m in range(ann.PQ_M)], axis=1)
    q = ann._pq_int(rng.standard_normal((5, 64)))
    sub = 64 // ann.PQ_M
    lut = np.stack([q[:, m*sub:(m+1)*sub] @ books[m].T
                    for m in range(ann.PQ_M)], axis=1)
    adc = np.zeros((200, 5), dtype=np.int64)
    for m in range(ann.PQ_M):
        adc += lut[:, m, :][:, codes[:, m]].T
    np.testing.assert_array_equal(adc, recon @ q.T)


# ------------------------------------------------- kNN label propagation

def test_knn_classify_matches_serial_recompute(ray_session):
    """The streaming propagation pass must equal a plain-numpy serial
    recompute: stable (sim desc, seed-id asc) top-k + majority vote
    with ties to the smallest label."""
    got = (ann.q_knn_classify(SF).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id")
    m = np.asarray(list(t["embedding"]), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    labels = t["label"].to_numpy()
    seed = t["vec_id"].to_numpy() < ann.KNNC_SEED_N
    sims = mn[~seed] @ mn[seed].T
    order = np.argsort(-sims, axis=1, kind="stable")[:, :ann.KNNC_K]
    lab_k = labels[seed][order]
    preds, votes = [], []
    for row in lab_k:
        vals, cnts = np.unique(row, return_counts=True)
        best = vals[np.lexsort((vals, -cnts))][0]
        preds.append(int(best))
        votes.append(int(cnts[vals == best][0]))
    assert got["vec_id"].tolist() == t["vec_id"].to_numpy()[~seed].tolist()
    assert got["pred_label"].tolist() == preds
    assert got["votes"].tolist() == votes


def test_knn_classify_separable_corpus(ray_session, tmp_path):
    """On a corpus whose labels follow real cluster structure the
    propagated labels must recover them (the sf fixture's labels are
    random w.r.t. geometry, so accuracy there is meaningless)."""
    rng = np.random.default_rng(11)
    n, dim, n_lab = 600, 16, 4
    centers = rng.standard_normal((n_lab, dim)) * 4
    lab = np.arange(n) % n_lab
    m = centers[lab] + rng.standard_normal((n, dim)) * 0.3
    flat = pa.array(m.astype(np.float32).reshape(-1), type=pa.float32())
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, dim),
        "label": pa.array(lab.astype(np.int32)),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = ann.q_knn_classify(str(tmp_path), seed_n=200, k=5).to_pandas()
    truth = lab[got["vec_id"].to_numpy()]
    acc = (got["pred_label"].to_numpy() == truth).mean()
    assert acc >= 0.95, f"propagation accuracy {acc:.2f} on separable data"


# ------------------------------------------------------------ SemDeDup

def test_semdedup_matches_serial_recompute(ray_session, tmp_path,
                                           monkeypatch):
    """Clustered semantic dedup must equal a plain-numpy recompute over
    the serial k-means partition: within each cluster, a vector is
    removed iff an earlier vec_id has cosine ≥ τ."""
    from swarm_ray import fixtures
    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    got = (ann.q_emb_semdedup(SF)
           .sort_values("cluster").reset_index(drop=True))

    n, ids, a, _, _, _ = fixtures._kmeans_serial(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id")
    m = np.asarray(list(t["embedding"]), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    rows = []
    for c in np.unique(a):
        sel = np.flatnonzero(a == c)          # ids sorted ⇒ sel sorted
        sims = mn[sel] @ mn[sel].T
        rem = np.triu(sims >= ann.SEMDEDUP_TAU, 1).any(axis=0)
        rows.append((int(c), len(sel), int((~rem).sum()), int(rem.sum())))
    exp = pd.DataFrame(rows, columns=["cluster", "n", "kept", "removed"])
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))
    # the fixture corpus plants near-dup pairs: some must be removed,
    # and totals must conserve
    assert got["removed"].sum() > 0
    assert (got["kept"] + got["removed"]).sum() == got["n"].sum() == n


def test_semdedup_chunk_boundary_invariance(ray_session, tmp_path,
                                            monkeypatch):
    """The chunked upper-triangle pass must give identical results when
    every cluster spans many chunks (chunk = 7 rows)."""
    from swarm_ray import fixtures
    from swarm_ray.ops import ann as _ann
    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    base = (_ann.q_emb_semdedup(SF)
            .sort_values("cluster").reset_index(drop=True))
    monkeypatch.setattr(_ann, "SEMDEDUP_CHUNK", 7)
    small = (_ann.q_emb_semdedup(SF)
             .sort_values("cluster").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, small)


def _semdedup_brute(sf_dir, tau):
    """Plain-numpy SemDeDup recompute over the serial k-means
    partition (independent of the engine's split plan)."""
    from swarm_ray import fixtures
    _, ids, a, _, _, _ = fixtures._kmeans_serial(sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id")
    m = np.asarray(list(t["embedding"]), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    rows = []
    for c in np.unique(a):
        sel = np.flatnonzero(a == c)
        sims = mn[sel] @ mn[sel].T
        rem = np.triu(sims >= tau, 1).any(axis=0)
        rows.append((int(c), len(sel), int((~rem).sum()), int(rem.sum())))
    return (pd.DataFrame(rows, columns=["cluster", "n", "kept", "removed"])
            .sort_values("cluster").reset_index(drop=True)), a


def test_semdedup_hot_cluster_split_is_exact_and_bounded(
        ray_session, tmp_path, monkeypatch):
    """VERDICT r4 item 2: a cluster over SEMDEDUP_GROUP_BOUND must
    split into vec_id-hash subgroup pairs WITHOUT changing the result,
    and the split math must bound every pair task's row count.

    Plants a corpus whose k-means partition has one dominant cluster
    ≫ bound (bound forced to 64), checks the split plan output equals
    (a) the unsplit plan and (b) an independent numpy recompute, and
    re-derives the per-pair-task row counts to pin the ≤ ~2×bound
    residency claim."""
    from swarm_ray import fixtures
    from swarm_ray.ops import ann as _ann
    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")

    rng = np.random.default_rng(7)
    n, dim, k = 600, 8, ann.KMEANS_K
    # vec_id 0..7 seed the k-means init: 8 far-apart anchors, then 90%
    # of the remaining rows packed tightly around anchor 0 — Lloyd
    # keeps one dominant (hot) cluster of ~540 rows
    anchors = np.eye(k, dim) * 40.0
    n_hot = int((n - k) * 0.9)
    hot = anchors[0] + rng.normal(0.0, 0.05, size=(n_hot, dim))
    cold_ix = rng.integers(1, k, size=n - k - n_hot)
    cold = anchors[cold_ix] + rng.normal(0.0, 1.0,
                                         size=(len(cold_ix), dim))
    emb = np.vstack([anchors, hot, cold]).astype(np.float32)
    body = k + rng.permutation(n - k)            # keep anchors first
    order = np.concatenate([np.arange(k), body])
    sf = tmp_path / "sf_hot"
    sf.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in emb[order]],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, dtype=np.int32)),
    }), sf / "embeddings.parquet")

    bound = 64
    split = (_ann.q_emb_semdedup(str(sf), bound=bound)
             .sort_values("cluster").reset_index(drop=True))
    unsplit = (_ann.q_emb_semdedup(str(sf), bound=10**9)
               .sort_values("cluster").reset_index(drop=True))
    brute, assign = _semdedup_brute(str(sf), _ann.SEMDEDUP_TAU)
    pd.testing.assert_frame_equal(split.astype("int64"),
                                  unsplit.astype("int64"))
    pd.testing.assert_frame_equal(split.astype("int64"),
                                  brute.astype("int64"))
    # the hot cluster really exceeded the bound (split actually ran)
    sizes = split.set_index("cluster")["n"]
    assert sizes.max() > 4 * bound
    # and dense near-dups really got removed there
    assert split["removed"].sum() > 0

    # re-derive the pair-task row counts from the split rule
    vids = np.arange(n, dtype=np.int64)
    for c, g in pd.DataFrame({"cluster": assign,
                              "vec_id": vids}).groupby("cluster"):
        s_c = max(1, -(-len(g) // bound))
        sub = g["vec_id"].to_numpy() % s_c
        cnt = np.bincount(sub, minlength=s_c)
        for a_ in range(s_c):
            for b_ in range(a_, s_c):
                rows = cnt[a_] + (cnt[b_] if b_ != a_ else 0)
                assert rows <= 2 * bound + s_c  # % is balanced on dense ids


def test_semdedup_keep_list_conserves_counts(ray_session, tmp_path,
                                             monkeypatch):
    """emb_semdedup_keep must be the exact complement of the counts
    view: |keep| = Σ kept, ids unique, and no removed id survives."""
    from swarm_ray import fixtures
    from swarm_ray.ops import ann as _ann
    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    counts = _ann.q_emb_semdedup(SF)
    keep = _ann.q_emb_semdedup_keep(SF).to_pandas()
    assert len(keep) == counts["kept"].sum()
    assert keep["vec_id"].is_unique
    # complement check against the independent numpy recompute
    brute, assign = _semdedup_brute(SF, _ann.SEMDEDUP_TAU)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])
    ids = np.sort(t["vec_id"].to_numpy())
    mn_removed = set(ids) - set(keep["vec_id"])
    assert len(mn_removed) == brute["removed"].sum()


def test_cluster_purity_matches_serial_recompute(ray_session, tmp_path,
                                                 monkeypatch):
    """Purity audit must agree with a direct pandas recompute over the
    serial assignment fixture (majority label, ties to lowest label,
    floor-milli purity)."""
    import pyarrow.parquet as pq
    from swarm_ray import fixtures
    from swarm_ray.ops.ann import q_emb_cluster_purity
    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")

    got = q_emb_cluster_purity(SF).sort_values("cluster") \
        .reset_index(drop=True)

    assign = pq.read_table(
        fixtures.kmeans_assign_expected_dir(SF) / "expected.parquet"
    ).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    j = assign.merge(emb, on="vec_id")
    h = (j.groupby(["cluster", "label"]).size().rename("c").reset_index()
         .sort_values(["cluster", "c", "label"],
                      ascending=[True, False, True], kind="mergesort"))
    n = h.groupby("cluster")["c"].sum()
    top = h.groupby("cluster").head(1).set_index("cluster")

    assert got["cluster"].tolist() == list(n.index)
    assert got["n"].tolist() == n.tolist()
    assert got["top_label"].tolist() == top["label"].tolist()
    assert got["purity_milli"].tolist() == \
        ((1000 * top["c"]) // n).tolist()
    assert int(got["n"].sum()) == len(emb)
    assert got["purity_milli"].between(1, 1000).all()


def test_label_dispersion_exact_second_moment(ray_session, tmp_path):
    """Dispersion must equal the brute-force Σ‖e−c‖² around the FLOOR
    integer centroid — including a label whose coordinate sum is
    negative and non-divisible (floor ≠ trunc), and be independent of
    file layout."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from swarm_ray.ops.ann import q_emb_label_dispersion

    vecs = [
        (0, [1.0, 0.0]), (0, [0.0, 1.0]), (0, [0.5, 0.5]),
        # label 1: x-sum = −550000 over n=3 → c_x = −183334 (floor),
        # trunc would give −183333
        (1, [-0.25, 0.75]), (1, [-0.30, 0.10]), (1, [0.0, 0.20]),
    ]
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v for _, v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([l for l, _ in vecs], type=pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")

    got = q_emb_label_dispersion(str(tmp_path)).reset_index(drop=True)

    # brute-force serial recompute from the same fixed-point coords
    e = np.floor(np.array([v for _, v in vecs], dtype=np.float32)
                 .astype(np.float64) * 1_000_000).astype(np.int64)
    lab = np.array([l for l, _ in vecs])
    for li, row in zip((0, 1), got.itertuples()):
        m = e[lab == li]
        c = m.sum(axis=0) // len(m)             # numpy floor division
        brute = int(((m - c) ** 2).sum())
        assert row.label == li
        assert row.n == len(m)
        assert row.ssq == int((m * m).sum())
        assert row.disp == brute
    # the floor-vs-trunc tripwire: label 1's centroid x is −183334
    m1 = e[lab == 1]
    assert (m1.sum(axis=0) // 3)[0] == -183334

    multi = tmp_path / "multi" / "embeddings.parquet"
    multi.mkdir(parents=True)
    pq.write_table(t.slice(0, 2), multi / "part-000.parquet")
    pq.write_table(t.slice(2, 4), multi / "part-001.parquet")
    got2 = q_emb_label_dispersion(str(tmp_path / "multi")) \
        .reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, got2)


def test_pq_recall_audit_consistent(ray_session):
    """The recall audit must equal a direct intersection of the two
    rankings it composes, and the PQ index must actually be good on
    this corpus (mean recall ≥ 600 milli — the pq_ann recall floor)."""
    import pandas as pd
    from swarm_ray.ops.ann import (TOP_K, q_emb_pq_recall,
                                   q_knn_bruteforce, q_knn_pq)

    got = q_emb_pq_recall(SF).sort_values("query_vec_id") \
        .reset_index(drop=True)

    ex = q_knn_bruteforce(SF).to_pandas()
    pqr = q_knn_pq(SF)
    pqr = pqr.to_pandas() if hasattr(pqr, "to_pandas") else pqr
    exp_hits = {}
    for q in ex["query_vec_id"].unique():
        a = set(ex[ex.query_vec_id == q]["neighbor_vec_id"])
        b = set(pqr[pqr.query_vec_id == q]["neighbor_vec_id"])
        exp_hits[q] = len(a & b)
    assert got["n_hits"].tolist() == [exp_hits[q] for q in
                                      sorted(exp_hits)]
    assert (got["recall_milli"] == (1000 * got["n_hits"]) // TOP_K).all()
    assert got["recall_milli"].mean() >= 600


def test_dim_stats_matches_serial_recompute(ray_session):
    """Per-dimension stats must equal a plain-numpy recompute of the
    fixed-point sums, including the FLOOR mean on negative sums."""
    got = ann.q_emb_dim_stats(SF).sort_values("dim") \
        .reset_index(drop=True)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    e = np.floor(np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
                 * ann.KMEANS_SCALE).astype(np.int64)
    n = np.full(e.shape[1], len(e), dtype=np.int64)
    s = e.sum(axis=0, dtype=np.int64)
    exp = pd.DataFrame({
        "dim": np.arange(e.shape[1], dtype=np.int64),
        "n": n,
        "sum_e6": s,
        "ssq_e12": (e * e).sum(axis=0, dtype=np.int64),
        "mean_e6": s // n,
    })
    pd.testing.assert_frame_equal(got, exp)
    assert (s < 0).any(), "fixture must exercise the negative-sum floor"


def test_outliers_match_serial_recompute(ray_session):
    """Global top-k farthest-from-centroid must equal the serial
    fixed-point recompute (same final centroids as the engine fit),
    with (dist DESC, vec_id ASC) tie order."""
    from swarm_ray import fixtures

    got = ann.q_emb_outliers(SF).to_pandas()

    _, ids, a, _, _, cents = fixtures._kmeans_serial(SF)
    fit_cents, _ = ann.kmeans_fit(SF)
    assert (cents == fit_cents).all(), \
        "serial final centroids must be bit-identical to the engine fit"
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id")
    e = np.floor(np.asarray(list(t["embedding"]), dtype=np.float64)
                 * ann.KMEANS_SCALE).astype(np.int64)
    diff = e - cents[a]
    dist = (diff * diff).sum(axis=1, dtype=np.int64)
    exp = pd.DataFrame({"vec_id": ids.astype(np.int64),
                        "cluster": a.astype(np.int64), "dist": dist}) \
        .sort_values(["dist", "vec_id"], ascending=[False, True]) \
        .head(ann.OUTLIER_K).reset_index(drop=True)
    exp.insert(0, "rank", np.arange(1, len(exp) + 1, dtype=np.int64))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_top_direction_aligns_with_float_pca(ray_session, tmp_path,
                                             monkeypatch):
    """The fixed-point power iteration must (a) equal the serial
    integer recompute exactly and (b) actually find the top principal
    direction: cosine vs numpy's float eigenvector >= 0.99."""
    from swarm_ray import fixtures
    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")

    got = ann.q_emb_top_direction(SF)
    exp_dir = fixtures.power_direction_expected_dir(SF)
    exp = pq.read_table(exp_dir / "expected.parquet").to_pandas()
    pd.testing.assert_frame_equal(got, exp)

    m = np.asarray(pq.read_table(
        f"{SF}/embeddings.parquet",
        columns=["embedding"])["embedding"].to_pylist(), dtype=np.float64)
    mc = m - m.mean(axis=0)
    w, vec = np.linalg.eigh(mc.T @ mc)
    top = vec[:, -1]
    v = got["v_e6"].to_numpy(dtype=np.float64)
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos >= 0.99, f"direction off: cos={cos:.4f}"
