"""Dedup operators: exact, simhash, minhash-LSH recall (SURVEY-plus
training-data ops)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from swarm_ray.ops import dedup


def test_word_hash32_matches_md5_prefix():
    assert dedup.word_hash32("hello") == int(hashlib.md5(b"hello").hexdigest()[:8], 16)


def test_simhash_similar_docs_close():
    s = dedup.SimHash()
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a.replace("dog", "cat")
    c = "completely different words about spaceships orbiting saturn rings forever"
    ham_ab = bin(s.simhash(a) ^ s.simhash(b)).count("1")
    ham_ac = bin(s.simhash(a) ^ s.simhash(c)).count("1")
    assert ham_ab < ham_ac


def test_simhash_deterministic():
    s1, s2 = dedup.SimHash(), dedup.SimHash()
    t = "alpha beta gamma delta epsilon zeta eta theta"
    assert s1.simhash(t) == s2.simhash(t)


def _planted_corpus(tmp_path, n=400, n_dup_pairs=20, seed=7):
    """Corpus with planted near-duplicates (95% token overlap)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(5000)]
    texts, ids = [], []
    for i in range(n):
        words = rng.choice(vocab, size=80, replace=True)
        texts.append(" ".join(words))
        ids.append(i)
    planted = set()
    for j in range(n_dup_pairs):
        src = j
        words = texts[src].split(" ")
        k = rng.integers(0, 76)
        words[k] = "CHANGED"
        texts.append(" ".join(words))
        ids.append(n + j)
        planted.add((src, n + j))
    df = pd.DataFrame({"doc_id": ids, "text": texts,
                       "lang": "en", "source": "synth", "n_chars": [len(t) for t in texts]})
    sf = tmp_path / "sfplanted"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)
    return str(sf), planted


def test_minhash_lsh_recall_and_precision(tmp_path):
    sf, planted = _planted_corpus(tmp_path)
    got = dedup.q_minhash_pairs(sf)
    got_pairs = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    # every verified pair must truly exceed the shingle-Jaccard threshold
    assert all(j >= dedup.JACCARD_TAU_MILLI for j in got["jaccard_milli"])
    # recall on planted 95%-overlap near-dups should be high
    found = planted & got_pairs
    assert len(found) >= 0.9 * len(planted), (len(found), len(planted))


def test_minhash_pairs_match_fixture_recompute(tmp_path, monkeypatch):
    """The engine's distributed LSH pipeline must produce BIT-IDENTICAL
    pairs to the fixture generator's independent single-process
    recompute (the doc_minhash_pairs differential oracle)."""
    import pyarrow.parquet as pq

    from swarm_ray import fixtures

    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    sf, _ = _planted_corpus(tmp_path)
    got = dedup.q_minhash_pairs(sf) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    exp = pq.read_table(
        fixtures.minhash_pairs_expected_dir(sf) / "expected.parquet"
    ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(exp) > 0                        # planted dups must verify
    pd.testing.assert_frame_equal(got, exp)


def test_exact_dedup_on_real_duplicates(tmp_path):
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["same text", "same text", "other", "same text"],
        "lang": "en", "source": "s", "n_chars": 9,
    })
    sf = tmp_path / "sfdup"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)
    out = dedup.q_dedup_exact(str(sf)).to_pandas().sort_values("dup_count")
    assert out["dup_count"].tolist() == [1, 3]
    assert out[out["dup_count"] == 3]["keeper_doc_id"].iloc[0] == 1


def test_dup_clusters_consistent_with_pairs(ray_session):
    from swarm_ray.ops.dedup import q_dup_clusters, q_jaccard_pairs
    sf = "/root/testdata/sf0.001"
    pairs = q_jaccard_pairs(sf)
    clusters = q_dup_clusters(sf)
    cl = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    # every paired doc is clustered, pair endpoints share a cluster
    for r in pairs.itertuples():
        assert cl[r.doc_a] == cl[r.doc_b]
    # cluster representative is the component minimum (itself clustered)
    for d, c in cl.items():
        assert c <= d and cl[c] == c


def test_bucket_pairs_star_fallback():
    from swarm_ray.ops.dedup import MAX_FULL_BUCKET, bucket_pairs_from_ids
    # small bucket: all pairs, not mega
    pairs, mega = bucket_pairs_from_ids([3, 1, 2])
    assert pairs == [(1, 2), (1, 3), (2, 3)] and not mega
    # singleton: nothing
    assert bucket_pairs_from_ids([5]) == ([], False)
    # mega bucket: chunked all-pairs + cross-chunk star, nothing dropped
    ids = list(range(500))
    pairs, mega = bucket_pairs_from_ids(ids)
    assert mega
    m, M = 500, MAX_FULL_BUCKET
    want = 300 + 19900 + 19900 + 4950             # star + 3 chunk cliques
    assert len(pairs) == want < m * (m - 1) // 2  # linear, not quadratic
    assert len(set(pairs)) == len(pairs)          # no duplicate pairs
    # every member appears, and the rep connects every chunk
    members = {a for a, _ in pairs} | {b for _, b in pairs}
    assert members == set(range(500))
    assert {(0, b) for b in range(M, 500)} <= set(pairs)
    # members within one chunk get FULL enumeration
    assert (201, 399) in set(pairs)
    # boundary: exactly MAX_FULL_BUCKET members stays all-pairs
    pairs, mega = bucket_pairs_from_ids(list(range(MAX_FULL_BUCKET)))
    assert not mega and len(pairs) == MAX_FULL_BUCKET * (MAX_FULL_BUCKET - 1) // 2


def _mega_cluster_corpus(tmp_path, n_dup=500, n_other=100, seed=11):
    """Corpus whose dominant content is one 500-strong duplicate
    cluster — the boilerplate case that used to be silently dropped."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(5000)]
    boiler = " ".join(rng.choice(vocab, size=80, replace=True))
    texts = [boiler] * n_dup
    for _ in range(n_other):
        texts.append(" ".join(rng.choice(vocab, size=80, replace=True)))
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                       "lang": "en", "source": "synth",
                       "n_chars": [len(t) for t in texts]})
    sf = tmp_path / "sfmega"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)
    return str(sf)


def test_minhash_mega_bucket_not_dropped(tmp_path, ray_session):
    """A 500-duplicate cluster lands in >MAX_FULL_BUCKET LSH buckets;
    star pairs must still surface and keep the cluster connected."""
    sf = _mega_cluster_corpus(tmp_path)
    got = dedup.q_minhash_pairs(sf)
    # every cluster member appears in at least one verified pair
    members = set(got["doc_a"]) | set(got["doc_b"])
    assert set(range(500)) <= members
    # and the cluster stage groups all 500 into ONE component
    clusters = dedup.q_dup_clusters_minhash(sf)
    cl = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    assert {cl[d] for d in range(500)} == {0}


def test_minhash_verify_repartition_matches_broadcast(tmp_path, ray_session):
    """The two verify plans are the same function: identical output on
    the planted-near-dup corpus."""
    sf, planted = _planted_corpus(tmp_path)
    via_bcast = dedup.q_minhash_pairs(sf, verify_mode="broadcast")
    via_join = dedup.q_minhash_pairs(sf, verify_mode="repartition")
    pd.testing.assert_frame_equal(via_bcast, via_join)
    found = planted & set(zip(via_join["doc_a"].astype(int),
                              via_join["doc_b"].astype(int)))
    assert len(found) >= 0.9 * len(planted)


def test_minhash_verify_large_frontier_no_driver_dict(tmp_path, ray_session,
                                                      monkeypatch):
    """Boilerplate-heavy corpus (the mega-bucket generator at 10x size)
    over the auto threshold: verify MUST take the repartition-join path
    — the broadcast (driver shingle dict) helper is poisoned to prove
    no driver-side set dict is ever built — and still surface every
    cluster member (VERDICT r2 item 1)."""
    sf = _mega_cluster_corpus(tmp_path, n_dup=5000, n_other=500)
    monkeypatch.setattr(dedup, "VERIFY_BROADCAST_MAX_PAIRS", 1000)

    def _poisoned(*a, **k):
        raise AssertionError("broadcast verify path must not run")

    monkeypatch.setattr(dedup, "_verify_broadcast", _poisoned)
    got = dedup.q_minhash_pairs(sf)            # auto → repartition
    members = set(got["doc_a"]) | set(got["doc_b"])
    assert set(range(5000)) <= members
    assert all(j >= dedup.JACCARD_TAU_MILLI for j in got["jaccard_milli"])


@pytest.mark.parametrize("mode", ["groups", "blocks", "contract"])
def test_connected_components_matches_union_find(ray_session, mode):
    import pyarrow as pa
    import ray.data as rd
    from swarm_ray.ops.dedup import connected_components, union_find_clusters
    # chain + triangle + isolated pair + shared-min overlap
    pairs = pd.DataFrame({"doc_a": [1, 2, 3, 10, 11, 10, 20, 30, 31],
                          "doc_b": [2, 3, 4, 11, 12, 12, 21, 31, 32]})
    got = connected_components(rd.from_arrow(pa.Table.from_pandas(pairs)),
                               mode=mode)
    assert got.equals(union_find_clusters(pairs))
    # empty edge set
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64")})
    assert len(connected_components(rd.from_arrow(
        pa.Table.from_pandas(empty)), mode=mode)) == 0


def test_dup_clusters_minhash_matches_union_find(ray_session):
    sf = "/root/testdata/sf0.001"
    pairs = dedup.q_minhash_pairs(sf)[["doc_a", "doc_b"]]
    got = dedup.q_dup_clusters_minhash(sf)
    want = dedup.union_find_clusters(pairs)
    assert got.equals(want)


@pytest.mark.parametrize("mode", ["groups", "blocks", "contract"])
def test_connected_components_random_graphs(ray_session, mode):
    """Seeded random graphs (varying density) vs union-find, both round
    implementations."""
    import pyarrow as pa
    import ray.data as rd
    from swarm_ray.ops.dedup import connected_components, union_find_clusters
    rng = np.random.default_rng(123)
    for n_nodes, n_edges in ((40, 20), (60, 120)):
        a = rng.integers(0, n_nodes, size=n_edges)
        b = rng.integers(0, n_nodes, size=n_edges)
        keep = a != b
        pairs = pd.DataFrame({"doc_a": np.minimum(a, b)[keep].astype("int64"),
                              "doc_b": np.maximum(a, b)[keep].astype("int64")})
        got = connected_components(rd.from_arrow(pa.Table.from_pandas(pairs)),
                                   mode=mode)
        assert got.equals(union_find_clusters(pairs))


# ------------------------------------------------------------ incremental dedup

def test_dedup_incremental_anti_join(ray_session, tmp_path):
    """Incoming docs (doc_id % 3 == 0) dedup against the corpus side:
    exact-content matches get dup_of = min corpus doc holding that
    content, fresh content gets dup_of = -1 / is_new = 1. Incoming-
    incoming duplicates must NOT suppress each other (corpus-only
    anti-join)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.dedup import q_dedup_incremental

    texts = {
        0: "shared alpha",     # incoming, dup of corpus 1
        1: "shared alpha",     # corpus
        2: "corpus only",      # corpus
        3: "fresh content",    # incoming, new
        4: "shared alpha",     # corpus (higher id than 1 — min wins)
        5: "corpus two",       # corpus
        6: "incoming twin",    # incoming, new (twin below is incoming too)
        9: "incoming twin",    # incoming, new — NOT deduped against 6
    }
    ids = sorted(texts)
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array([texts[i] for i in ids]),
                  "lang": pa.array(["en"] * len(ids)),
                  "source": pa.array(["s"] * len(ids)),
                  "n_chars": pa.array([len(texts[i]) for i in ids],
                                      type=pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_dedup_incremental(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 3, 6, 9]
    assert got["dup_of"].tolist() == [1, -1, -1, -1]
    assert got["is_new"].tolist() == [0, 1, 1, 1]


def test_dedup_near_counts_reconcile(ray_session):
    """End-to-end near-dup dedup: kept+removed must cover the corpus
    exactly, and the removal set must equal the union-find clusters'
    non-representative members."""
    import pyarrow.parquet as pq
    from swarm_ray.ops.dedup import (q_dedup_near, q_jaccard_pairs,
                                     union_find_clusters)
    sf = "/root/testdata/sf0.001"
    got = q_dedup_near(sf).to_pandas().sort_values("source") \
        .reset_index(drop=True)
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    clusters = union_find_clusters(q_jaccard_pairs(sf))
    removed = set(clusters.loc[clusters.doc_id != clusters.cluster_id,
                               "doc_id"])
    assert len(removed) > 0          # the fixture corpus has near-dups
    docs["removed"] = docs["doc_id"].isin(removed).astype("int64")
    exp = docs.groupby("source").agg(
        kept=("removed", lambda s: int((1 - s).sum())),
        removed=("removed", "sum")).reset_index() \
        .sort_values("source").reset_index(drop=True)
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["kept"].tolist() == exp["kept"].tolist()
    assert got["removed"].tolist() == exp["removed"].tolist()
    assert (got["kept"] + got["removed"]).sum() == len(docs)


# ---------------------------------------------------- PageRank (dup graph)

def test_pagerank_path_and_star(ray_session, tmp_path):
    """The sf0.01 dup frontier happens to be all K2/K3 cliques (regular
    → constant ranks), so the discriminating case is planted here: a
    3-node PATH and a 4-node STAR, where degrees differ and the three
    integer iterations must match (a) a direct recurrence over the
    adjacency list and (b) the DuckDB oracle SQL on the same corpus."""
    import hashlib

    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops import sql as osql
    from swarm_ray.ops.dedup import (PR_DAMP_MILLI, PR_ITERS, PR_SCALE,
                                     PR_SHINGLE_PREFIXES, q_doc_pagerank)

    def mine_shingle(tag):
        # 5-word shingle whose md5 first hex is in the sampled prefixes
        for n in range(10_000):
            s = f"{tag}a {tag}b {tag}c {tag}d k{n}"
            if hashlib.md5(s.encode()).hexdigest()[0] in PR_SHINGLE_PREFIXES:
                return s
        raise AssertionError("no shingle found")

    s1, s2 = mine_shingle("p1"), mine_shingle("p2")
    s3, s4, s5 = mine_shingle("q3"), mine_shingle("q4"), mine_shingle("q5")
    # path: 0—1—2 via s1, s2; star: 3 is center of 4, 5, 6 via s3..s5.
    # fillers (single unique words between shingles) change the
    # bridging 5-grams per doc so no accidental cross-doc shingles.
    docs = [
        (0, f"{s1} u0a u0b u0c u0d"),
        (1, f"{s1} u1bridge {s2}"),
        (2, f"{s2} u2a u2b u2c u2d"),
        (3, f"{s3} u3x {s4} u3y {s5}"),
        (4, f"{s3} u4a u4b u4c u4d"),
        (5, f"{s4} u5a u5b u5c u5d"),
        (6, f"{s5} u6a u6b u6c u6d"),
    ]
    t = pa.table({
        "doc_id": pa.array([i for i, _ in docs], type=pa.int64()),
        "text": pa.array([x for _, x in docs]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_pagerank(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # (a) direct integer recurrence over the intended adjacency
    adj = {0: [1], 1: [0, 2], 2: [1],
           3: [4, 5, 6], 4: [3], 5: [3], 6: [3]}
    assert got["doc_id"].tolist() == sorted(adj)
    assert got["deg"].tolist() == [len(adj[v]) for v in sorted(adj)]
    r = {v: PR_SCALE for v in adj}
    base = (1000 - PR_DAMP_MILLI) * PR_SCALE // 1000
    for _ in range(PR_ITERS):
        share = {v: r[v] // len(adj[v]) for v in adj}
        r = {v: base
             + (PR_DAMP_MILLI * sum(share[u] for u in adj[v])) // 1000
             for v in adj}
    assert got["rank_e6"].tolist() == [r[v] for v in sorted(adj)]
    # non-degenerate: the path/star MUST differentiate ranks
    assert got["rank_e6"].nunique() > 2

    # (b) the DuckDB oracle on the same corpus
    con = duckdb.connect()
    con.register("documents", t)
    exp = (con.execute(osql.SQL_DOC_PAGERANK).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"))


def test_simhash_pairs_match_exact_allpairs(ray_session, tmp_path):
    """Band bucketing must find EXACTLY the pairs within hamming ≤ 3
    of the full all-pairs scan (pigeonhole guarantees no misses at 4
    bands; popcount verify kills false positives)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.dedup import SIMHASH_HAM, SimHash, q_simhash_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    texts = []
    for i in range(40):
        words = list(rng.choice(vocab, size=30))
        texts.append(" ".join(words))
        if i % 4 == 0:            # planted near-dups: 1-word edits
            w2 = list(words)
            w2[3] = "edited"
            texts.append(" ".join(w2))
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_simhash_pairs(str(tmp_path)).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    sh = SimHash()
    hs = [sh.simhash(x) for x in texts]
    exp = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            ham = bin(hs[a] ^ hs[b]).count("1")
            if ham <= SIMHASH_HAM:
                exp.append((a, b, ham))
    expdf = pd.DataFrame(exp, columns=["doc_a", "doc_b", "hamming"]) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(expdf) > 0                 # planted dups must collide
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  expdf.astype("int64"))


def test_minhash_est_matches_serial_recompute(ray_session, tmp_path,
                                              monkeypatch):
    """The engine's vectorized uint64 signature agreement must equal
    the plain-Python-integer fixture recompute, pair for pair, and the
    estimator must be informative (not constant) on the planted dups."""
    from swarm_ray import fixtures
    from swarm_ray.ops.dedup import q_doc_minhash_est

    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    sf = "/root/testdata/sf0.001"
    got = q_doc_minhash_est(sf)
    exp_dir = fixtures.minhash_est_expected_dir(sf)
    import pyarrow.parquet as _pq
    exp = _pq.read_table(exp_dir / "expected.parquet").to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0 and got["est_milli"].nunique() > 1
    assert (got["err_milli"] == (got["est_milli"]
                                 - got["jaccard_milli"]).abs()).all()


def test_triangles_planted_clique_and_path(ray_session, tmp_path):
    """A 4-clique (one shared sampled shingle) gives every member
    C(3,2)=3 triangles; a 3-node path contributes none."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from swarm_ray.ops.dedup import (PR_SHINGLE_PREFIXES,
                                     q_doc_dup_triangles)

    def mine_shingle(tag):
        for n in range(10_000):
            s = f"{tag}a {tag}b {tag}c {tag}d k{n}"
            if hashlib.md5(s.encode()).hexdigest()[0] in PR_SHINGLE_PREFIXES:
                return s
        raise AssertionError("no shingle found")

    sK = mine_shingle("kq")               # clique key: docs 0-3
    s1, s2 = mine_shingle("pa"), mine_shingle("pb")   # path 4-5-6
    docs = [
        (0, f"{sK} u0a u0b u0c u0d"),
        (1, f"{sK} u1a u1b u1c u1d"),
        (2, f"{sK} u2a u2b u2c u2d"),
        (3, f"{sK} u3a u3b u3c u3d"),
        (4, f"{s1} u4a u4b u4c u4d"),
        (5, f"{s1} u5bridge {s2}"),
        (6, f"{s2} u6a u6b u6c u6d"),
    ]
    t = pa.table({
        "doc_id": pa.array([i for i, _ in docs], type=pa.int64()),
        "text": pa.array([x for _, x in docs]),
    })
    _pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_dup_triangles(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # only the clique members appear, each in exactly 3 triangles
    assert got["doc_id"].tolist() == [0, 1, 2, 3]
    assert got["tri"].tolist() == [3, 3, 3, 3]
