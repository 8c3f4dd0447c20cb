"""Span-dedup family (ops/spans.py): duplicated-span coverage, the
rewrite pass, the cross-source overlap matrix, and the leak-free split
— each pinned against an independent serial recompute on planted
corpora, plus the split's no-straddle guarantee."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from swarm_ray.ops import spans

W = spans.SPAN_W


def _write_corpus(tmp_path, texts, sources=None):
    n = len(texts)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": "en",
        "source": sources if sources is not None else ["s0"] * n,
        "n_chars": [len(t) for t in texts],
    })
    sf = tmp_path / "sfspans"
    sf.mkdir(exist_ok=True)
    df.to_parquet(sf / "documents.parquet", index=False)
    return str(sf)


def _serial_coverage(texts):
    """First-principles recompute: shingle dict -> per-doc covered
    position set. Shares only SPAN_W/SPAN_MIN_DOCS with the engine."""
    from collections import defaultdict
    occurrences = defaultdict(list)       # shingle -> [(doc, pos0)]
    for d, t in enumerate(texts):
        w = t.split(" ")
        for i in range(max(len(w) - W + 1, 0)):
            occurrences[" ".join(w[i:i + W])].append((d, i))
    covered = defaultdict(set)
    for g, occ in occurrences.items():
        if len({d for d, _ in occ}) >= spans.SPAN_MIN_DOCS:
            for d, i in occ:
                covered[d].update(range(i, i + W))
    return covered


def _planted_texts(rng, n=60, n_planted=12):
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(W, 60))))
             for _ in range(n)]
    # plant a shared 12-word span into pairs of docs at random offsets
    for j in range(n_planted):
        span = " ".join(rng.choice(vocab, size=12))
        for d in (2 * j, 2 * j + 1):
            w = texts[d].split(" ")
            k = int(rng.integers(0, max(len(w) - 12, 1)))
            texts[d] = " ".join(w[:k] + span.split(" ") + w[k + 12:])
    return texts


def test_dup_spans_matches_serial(tmp_path):
    rng = np.random.default_rng(11)
    texts = _planted_texts(rng)
    sf = _write_corpus(tmp_path, texts)
    got = spans.q_doc_dup_spans(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    cov = _serial_coverage(texts)
    exp = pd.DataFrame([
        {"doc_id": d, "n_words": len(texts[d].split(" ")),
         "covered_words": len(ps),
         "covered_milli": 1000 * len(ps) // len(texts[d].split(" "))}
        for d, ps in sorted(cov.items()) if ps
    ])
    assert len(got) >= 12          # every planted pair must surface
    pd.testing.assert_frame_equal(got, exp.astype("int64").astype(
        {"doc_id": "int64"}), check_dtype=False)


def test_dedup_spans_rewrite_matches_serial(tmp_path):
    rng = np.random.default_rng(13)
    texts = _planted_texts(rng)
    sf = _write_corpus(tmp_path, texts)
    got = spans.q_doc_dedup_spans(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    cov = _serial_coverage(texts)
    rows = []
    for d, t in enumerate(texts):
        w = t.split(" ")
        kept = [x for i, x in enumerate(w) if i not in cov.get(d, set())]
        if kept:
            rows.append({"doc_id": d, "n_kept": len(kept),
                         "kept_md5": hashlib.md5(
                             " ".join(kept).encode()).hexdigest()})
    exp = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dedup_spans_drops_fully_covered(tmp_path):
    # doc 0 == doc 1 (every position covered) -> neither appears;
    # doc 2 unique -> appears untouched
    dup = " ".join(f"a{i}" for i in range(W + 3))
    uniq = " ".join(f"b{i}" for i in range(W + 5))
    sf = _write_corpus(tmp_path, [dup, dup, uniq])
    got = spans.q_doc_dedup_spans(sf).to_pandas()
    assert sorted(got["doc_id"]) == [2]
    assert got["n_kept"].iloc[0] == W + 5
    assert got["kept_md5"].iloc[0] == hashlib.md5(uniq.encode()).hexdigest()


def test_source_overlap_matrix(tmp_path):
    rng = np.random.default_rng(17)
    shared = " ".join(rng.choice([f"w{i}" for i in range(300)], size=W))
    filler = lambda: " ".join(  # noqa: E731
        rng.choice([f"f{i}" for i in range(300)], size=30))
    # shared W-gram in sources A+B and A+C; nothing between B and C
    texts = [filler() + " " + shared,            # A
             shared + " " + filler(),            # B
             filler() + " " + shared + " " + filler(),  # C
             filler()]                           # D, clean
    sf = _write_corpus(tmp_path, texts, sources=["A", "B", "C", "D"])
    got = spans.q_doc_source_overlap(sf).to_pandas() \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)
    pairs = set(zip(got["source_a"], got["source_b"]))
    assert ("A", "B") in pairs and ("A", "C") in pairs \
        and ("B", "C") in pairs            # the shared gram links all 3
    assert not any("D" in p for p in pairs)
    assert (got["shared_shingles"] >= 1).all()


def test_leakfree_split_never_straddles_clusters(tmp_path):
    # planted near-dup pairs INSIDE the jaccard prefix (doc_id <
    # JACCARD_N) so q_dup_clusters — the split's SQL-checked cluster
    # source — actually sees them
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(5000)]
    texts = [" ".join(rng.choice(vocab, size=80)) for _ in range(200)]
    for j in range(30):                      # 30 pairs: (2j, 2j+1)
        w = texts[2 * j].split(" ")
        w[int(rng.integers(0, 80))] = "CHANGED"
        texts[2 * j + 1] = " ".join(w)
    sf = _write_corpus(tmp_path, texts)
    split = spans.q_doc_split_leakfree(sf).to_pandas() \
        .set_index("doc_id")["split"]
    from swarm_ray.ops.dedup import q_dup_clusters
    clusters = q_dup_clusters(sf)
    by_cluster = clusters.groupby("cluster_id")["doc_id"].apply(list)
    assert len(by_cluster) > 0
    for members in by_cluster:
        got = {split.loc[m] for m in members}
        assert len(got) == 1, f"cluster straddles splits: {members}"
    # both splits populated and train dominates (~87.5%)
    frac = (split == "train").mean()
    assert 0.7 < frac < 0.97
    assert set(split.unique()) == {"train", "eval"}
