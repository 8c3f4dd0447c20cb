"""Text-analysis operators: langid on natural text, quality integers,
fingerprint edges."""

import pandas as pd

from swarm_ray.ops.text import Fingerprint, LangId, TokenStats, quality_batch


def test_langid_profile_on_natural_text():
    l = LangId()
    assert l.predict_profile("the quick brown fox and the lazy dog sing of things") == "en"
    assert l.predict_profile("der schnelle braune fuchs springt und die hunde schlafen nicht") == "de"
    assert l.predict_profile("le renard brun et rapide saute et les chiens dorment") == "fr"


def test_langid_markers_tiebreak_deterministic():
    l = LangId()
    # 'la' is both fr and es marker; tie → ascending language order ('es' < 'fr')
    assert l.predict_markers("la la la") == "es"
    assert l.predict_markers("xyzzy qwerty") == "und"


def test_quality_integer_scaling():
    df = pd.DataFrame({"doc_id": [1], "text": ["the cat of a hat"]})
    out = quality_batch(df)
    assert out["n_words"].iloc[0] == 5
    assert out["stop_count"].iloc[0] == 3  # the, of, a
    assert out["stop_ratio_milli"].iloc[0] == 600
    # chars=16, words=5 → word chars = 16-4 = 12 → 2400 milli
    assert out["mean_word_len_milli"].iloc[0] == 2400


def test_fingerprint_short_doc_fallback():
    fp = Fingerprint()
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["only three words", "a b c d e f g"]})
    out = fp(df)
    import hashlib
    assert out["fingerprint"].iloc[0] == hashlib.md5(b"only three words").hexdigest()
    assert len(out["fingerprint"].iloc[1]) == 32


def test_token_stats():
    ts = TokenStats()
    df = pd.DataFrame({"doc_id": [1], "text": ["ab ab cd, 12"]})
    out = ts(df)
    assert out["ws_tokens"].iloc[0] == 4
    assert out["distinct_tokens"].iloc[0] == 3
    # bpe-ish: ab, ab, cd, ',', 12
    assert out["bpeish_tokens"].iloc[0] == 5


def test_hash_tokenizer_deterministic_and_bounded():
    import hashlib
    import pandas as pd
    from swarm_ray.ops.text import HashTokenizer, TOKENIZE_VOCAB

    b = pd.DataFrame({"doc_id": [1, 2], "text": ["the cat sat", "the the"]})
    tk = HashTokenizer()
    out1 = tk(b.copy())                     # now an Arrow table
    out2 = HashTokenizer()(b.copy())
    assert out1["tokens"].to_pylist() == out2["tokens"].to_pylist()
    assert out1["n_tok"].to_pylist() == [3, 2]
    the_id = int(hashlib.md5(b"the").hexdigest()[:8], 16) % TOKENIZE_VOCAB
    assert out1["tokens"].to_pylist()[0][0] == the_id
    assert out1["tokens"].to_pylist()[1] == [the_id, the_id]
    assert all(0 <= t < TOKENIZE_VOCAB
               for toks in out1["tokens"].to_pylist() for t in toks)


def test_doc_split_deterministic_and_proportional(ray_session):
    from swarm_ray.ops.text import q_doc_split
    sf = "/root/testdata/sf0.01"
    a = q_doc_split(sf).to_pandas().sort_values(["split", "lang"]).reset_index(drop=True)
    b = q_doc_split(sf).to_pandas().sort_values(["split", "lang"]).reset_index(drop=True)
    assert a.equals(b)                                  # reproducible
    by_split = a.groupby("split")["n_docs"].sum()
    total = by_split.sum()
    assert set(by_split.index) == {"train", "val", "test"}
    assert 0.7 < by_split["train"] / total < 0.9        # ~80/10/10
    assert by_split["val"] + by_split["test"] < 0.3 * total


# ------------------------------------------------------------ decontamination

def test_decontaminate_detects_planted_overlap(ray_session, tmp_path):
    """A train doc sharing a verbatim 8-gram with a test-split doc must
    be flagged with the exact distinct-overlap count; clean train docs
    and val docs must not appear."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import DECON_K, q_doc_decontaminate

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 10

    ids = list(range(200))
    test_id = next(i for i in ids if bucket(i) == 9)
    val_id = next(i for i in ids if bucket(i) == 8)
    train = [i for i in ids if bucket(i) < 8]
    leaked, clean = train[0], train[1]

    secret = " ".join(f"w{j}" for j in range(DECON_K))      # one 8-gram
    texts = {}
    for i in ids:
        texts[i] = f"filler{i} " + " ".join(f"x{i}y{j}" for j in range(10))
    texts[test_id] = f"benchmark question {secret} answer choices"
    texts[leaked] = f"scraped page containing {secret} verbatim copy"
    texts[val_id] = f"val doc containing {secret} must not count"

    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array([texts[i] for i in ids])})
    pq.write_table(t, tmp_path / "documents.parquet")

    got = q_doc_decontaminate(str(tmp_path)).to_pandas()
    assert got["doc_id"].tolist() == [leaked]
    assert got["n_overlap"].tolist() == [1]
    assert clean not in set(got["doc_id"])


# ------------------------------------------------------------ PII redaction

def test_pii_redaction_exact_spans(ray_session, tmp_path, monkeypatch):
    """Planted PII is counted per type and fully redacted — no pattern
    survives in any redacted text."""
    import re

    import pyarrow.parquet as pq

    from swarm_ray import fixtures
    from swarm_ray.ops.text import (PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE,
                                    q_doc_pii)

    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    out = q_doc_pii("/tmp/x/sf0.001").to_pandas()
    assert (out[["n_email", "n_phone", "n_ip"]].sum() > 0).all()

    # re-read the fixture and redact serially with Python re — every
    # original match must be gone, placeholders present where counted
    src = pq.read_table(
        fixtures.pii_documents_dir("sf0.001") / "part-00000.parquet"
    ).to_pandas().merge(out, on="doc_id")
    for _, r in src.head(200).iterrows():
        red = re.sub(PII_EMAIL_RE, "[EMAIL]", r["text"])
        red = re.sub(PII_IP_RE, "[IP]", red)
        red = re.sub(PII_PHONE_RE, "[PHONE]", red)
        assert not re.search(PII_EMAIL_RE, red)
        assert len(re.findall(r"\[EMAIL\]", red)) == r["n_email"]
        assert len(re.findall(r"\[PHONE\]", red)) == r["n_phone"]
        assert len(re.findall(r"\[IP\]", red)) == r["n_ip"]


# ------------------------------------------------------------ repetition filter

def test_repetition_metrics_match_serial_recompute(ray_session, tmp_path):
    """Vectorized n-gram repetition metrics must equal a plain-Python
    per-doc recompute, including short docs (0 grams) and heavy
    repetition (dup/top fractions at the extremes)."""
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import q_doc_repetition

    texts = [
        "one",                                   # 0 bigrams, 0 trigrams
        "a b",                                   # 1 bigram, 0 trigrams
        "spam spam spam spam spam spam",         # max repetition
        "the quick brown fox jumps over the quick brown fox",
        "x y x y x y x y z",
        "",                                      # split -> [""], 1 word
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_repetition(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    for i, text in enumerate(texts):
        words = text.split(" ")
        for n in (2, 3):
            grams = [" ".join(words[j:j + n])
                     for j in range(len(words) - n + 1)]
            c = Counter(grams)
            tot = len(grams)
            row = got.iloc[i]
            assert row[f"n_gram{n}"] == tot, (i, n)
            exp_dup = (1000 * (tot - len(c))) // tot if tot else 0
            exp_top = (1000 * max(c.values())) // tot if tot else 0
            assert row[f"dup{n}_milli"] == exp_dup, (i, n)
            assert row[f"top{n}_milli"] == exp_top, (i, n)


# ------------------------------------------------------------ tf-idf top terms

def test_tfidf_top_deterministic_vs_serial(ray_session, tmp_path):
    """Two-exchange distributed tf-idf must equal the serial recompute,
    ties broken by (tf DESC, df ASC, term ASC) — also exercises a
    repartition→repartition plan at the 4-CPU test cluster size (the
    multi-exchange liveness case)."""
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import q_doc_tfidf_top

    texts = [
        "apple apple banana cherry",
        "banana banana banana apple",
        "cherry date egg fig grape",
        "apple banana",                 # full tie on tf → df then term
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_tfidf_top(str(tmp_path)).to_pandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))

    tf = {(i, w): c for i, s in enumerate(texts)
          for w, c in Counter(s.split(" ")).items()}
    df = Counter(w for (_, w) in tf)
    for i in range(len(texts)):
        rows = sorted(((w, c) for (d, w), c in tf.items() if d == i),
                      key=lambda wc: (-wc[1], df[wc[0]], wc[0]))[:3]
        sub = got[got["doc_id"] == i]
        assert list(sub["term"]) == [w for w, _ in rows], i
        assert list(sub["tf"]) == [c for _, c in rows], i
        assert list(sub["df"]) == [df[w] for w, _ in rows], i
        assert list(sub["rank"]) == list(range(1, len(rows) + 1)), i


# ------------------------------------------------------------ chunking

def test_doc_chunks_windows_and_content(ray_session, tmp_path):
    """Sliding-window chunking must reproduce the serial window rule
    (C=32, S=24, last chunk clipped; short docs = one chunk) with
    exact chunk content md5s."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import DOC_CHUNK_C, DOC_CHUNK_S, q_doc_chunks

    texts = [
        " ".join(f"w{i}" for i in range(100)),   # 100 words → 4 chunks
        " ".join(f"u{i}" for i in range(32)),    # exactly C → 1 chunk
        " ".join(f"v{i}" for i in range(33)),    # C+1 → 2 chunks
        "tiny doc",
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_chunks(str(tmp_path)).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))

    C, S = DOC_CHUNK_C, DOC_CHUNK_S
    exp = []
    for d, text in enumerate(texts):
        words = text.split(" ")
        n = len(words)
        k = 1 if n <= C else 1 + -(-(n - C) // S)
        for i in range(k):
            w = words[i * S: i * S + C]
            exp.append((d, i, len(w),
                        hashlib.md5(" ".join(w).encode()).hexdigest()))
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_text_ops_on_multifile_corpus(ray_session):
    """Every documents reader must accept documents-*.parquet corpora
    (review finding: multi-file-aware _docs_count paired with
    single-file reads crashed 5 text ops + both expected-dir fixtures
    on the synthetic scaling corpora)."""
    from swarm_ray import fixtures
    from swarm_ray.ops import dedup, embed, text
    d = str(fixtures.documents_synth_dir(3000, dup_frac=0.02))
    assert text.q_doc_token_count(d).count() == 3000
    assert text.q_doc_repetition(d).count() == 3000
    assert embed.q_doc_embed(d).count() == 3000
    near = dedup.q_dedup_near(d).to_pandas()
    assert (near["kept"] + near["removed"]).sum() == 3000


# --------------------------------------------------- unigram LM score

def test_lm_score_matches_serial_recompute(ray_session, tmp_path):
    """Two-exchange unigram-LM familiarity must equal a plain-Python
    per-doc recompute (integer llr per term, exact int64 folds), and be
    independent of block layout — the same corpus split over 3 files
    must hash identically to the single-file read."""
    import math
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import q_doc_lm_score

    texts = [
        "the the the cat",           # common + rare mix
        "cat sat on the mat",
        "zyx qwv",                   # all-rare (ctf=1 -> llr 0)
        "the of and to a",           # all-common
        "",                          # split -> [""], 1 word
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_lm_score(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    ctf = Counter(w for s in texts for w in s.split(" "))
    llr = {w: int(math.floor(1000 * math.log(c) + 0.5))
           for w, c in ctf.items()}
    for i, s in enumerate(texts):
        words = s.split(" ")
        total = sum(llr[w] for w in words)
        row = got.iloc[i]
        assert row["n_words"] == len(words), i
        assert row["total_lfam"] == total, i
        assert row["fam_milli"] == total // len(words), i

    # parallelism independence: same corpus split over 3 files
    multi = tmp_path / "multi"
    multi.mkdir()
    pq.write_table(t.slice(0, 2), multi / "documents-000.parquet")
    pq.write_table(t.slice(2, 2), multi / "documents-001.parquet")
    pq.write_table(t.slice(4, 1), multi / "documents-002.parquet")
    got2 = (q_doc_lm_score(str(multi)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


# ------------------------------------------- per-source quantile gate

def test_quality_topp_exact_quantile(ray_session, tmp_path):
    """Histogram-fold quantile gate: threshold must be the ceil(n/2)-th
    largest stop_ratio_milli per source, n_kept counts the ties at the
    threshold, independent of file layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import STOPWORDS, q_doc_quality_topp

    # source A: scores 0, 250, 500, 500, 1000 -> n=5, k=3,
    #   desc order 1000,500,500,250,0 -> cum 1,2,3 -> thr=500, kept=3
    # source B: scores 0, 1000 -> n=2, k=1 -> thr=1000, kept=1
    docs = [
        ("A", "x y z w"),                       # 0/4 -> 0
        ("A", "the x y z"),                     # 1/4 -> 250
        ("A", "the of x y"),                    # 2/4 -> 500
        ("A", "the a x y"),                     # 2/4 -> 500
        ("A", "the of and to"),                 # 4/4 -> 1000
        ("B", "q r"),                           # 0
        ("B", "the of"),                        # 1000
    ]
    assert all(w in STOPWORDS for w in ("the", "of", "and", "to", "a"))
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "source": pa.array([s for s, _ in docs]),
        "text": pa.array([x for _, x in docs]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_quality_topp(str(tmp_path)).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert list(got["source"]) == ["A", "B"]
    assert list(got["n_docs"]) == [5, 2]
    assert list(got["threshold_milli"]) == [500, 1000]
    assert list(got["n_kept"]) == [3, 1]

    # layout independence
    multi = tmp_path / "multi"
    multi.mkdir()
    pq.write_table(t.slice(0, 3), multi / "documents-000.parquet")
    pq.write_table(t.slice(3, 4), multi / "documents-001.parquet")
    got2 = (q_doc_quality_topp(str(multi)).to_pandas()
            .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


# ------------------------------------------- global rank / drift audit

def test_quality_rank_matches_sql_window(ray_session, tmp_path):
    """Histogram-CDF global rank: ties share a rank (SQL RANK), pct is
    floor-milli of (rank-1)/(n-1), independent of file layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import q_doc_quality_rank

    # scores: 0, 0, 250, 500, 500, 1000  (n=6, denom=5)
    docs = [
        "x y z w",          # 0
        "q r",              # 0
        "the x y z",        # 250
        "the of x y",       # 500
        "the a x y",        # 500
        "the of and to",    # 1000
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_quality_rank(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["score"]) == [0, 0, 250, 500, 500, 1000]
    assert list(got["rnk"]) == [1, 1, 3, 4, 4, 6]
    # pct_milli = 1000*(rnk-1)//5
    assert list(got["pct_milli"]) == [0, 0, 400, 600, 600, 1000]

    # layout independence
    multi = tmp_path / "multi"
    multi.mkdir()
    pq.write_table(t.slice(0, 2), multi / "documents-000.parquet")
    pq.write_table(t.slice(2, 4), multi / "documents-001.parquet")
    got2 = (q_doc_quality_rank(str(multi)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got, got2)


def test_source_drift_ks_statistic(ray_session, tmp_path):
    """KS drift vs the global mixture, hand-computed: A=[0,0,500,1000],
    B=[500,1000,1000,1000]; global CDF-milli over dom [0,500,1000] is
    [250,500,1000]; A is [500,750,1000], B is [0,250,1000] — both
    sources drift 250, first attained at score 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import q_doc_source_drift

    docs = [
        ("A", "x y"),       # 0
        ("A", "p q"),       # 0
        ("A", "the x"),     # 500
        ("A", "the of"),    # 1000
        ("B", "the x"),     # 500
        ("B", "the of"),    # 1000
        ("B", "a to"),      # 1000
        ("B", "and of"),    # 1000
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "source": pa.array([s for s, _ in docs]),
        "text": pa.array([x for _, x in docs]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_source_drift(str(tmp_path)).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert list(got["source"]) == ["A", "B"]
    assert list(got["n_docs"]) == [4, 4]
    assert list(got["d_milli"]) == [250, 250]
    assert list(got["drift_at"]) == [0, 0]

    # layout independence (partials fold across blocks)
    multi = tmp_path / "multi"
    multi.mkdir()
    pq.write_table(t.slice(0, 3), multi / "documents-000.parquet")
    pq.write_table(t.slice(3, 5), multi / "documents-001.parquet")
    got2 = (q_doc_source_drift(str(multi)).to_pandas()
            .sort_values("source").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got, got2)


def test_source_terms_lift_and_ties(ray_session, tmp_path):
    """Integer lift vs rest-of-corpus, ties by term ASC, exact top-K
    fold independent of file layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import q_doc_source_terms

    docs = [
        ("A", "apple apple banana"),
        ("A", "apple cherry"),
        ("B", "banana banana banana"),
        ("B", "dog dog"),
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "source": pa.array([s for s, _ in docs]),
        "text": pa.array([x for _, x in docs]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    got = (q_doc_source_terms(str(tmp_path)).to_pandas()
           .sort_values(["source", "rank"]).reset_index(drop=True))
    # n_A = n_B = 5, N = 10
    # A: apple 3000//5-0=600; cherry 200-0=200; banana 200-600=-400
    # B: banana 600-200=400; dog 400-0=400 -> tie, banana < dog
    a = got[got["source"] == "A"]
    assert list(a["term"]) == ["apple", "cherry", "banana"]
    assert list(a["lift_milli"]) == [600, 200, -400]
    assert list(a["n_occ"]) == [3, 1, 1]
    b = got[got["source"] == "B"]
    assert list(b["term"]) == ["banana", "dog"]
    assert list(b["lift_milli"]) == [400, 400]
    assert list(b["rank"]) == [1, 2]

    # layout independence (partials for one (source, term) fold across
    # input blocks)
    multi = tmp_path / "multi"
    multi.mkdir()
    pq.write_table(t.slice(0, 1), multi / "documents-000.parquet")
    pq.write_table(t.slice(1, 2), multi / "documents-001.parquet")
    pq.write_table(t.slice(3, 1), multi / "documents-002.parquet")
    got2 = (q_doc_source_terms(str(multi)).to_pandas()
            .sort_values(["source", "rank"]).reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got, got2)


def test_weighted_sample_exact_selection(ray_session, tmp_path):
    """A-ES weighted sample: selection must equal a direct single-
    process recompute of key = FLOOR(−ln(u)·1e12)//w (u from md5) —
    and be independent of file layout (per-block top-K + final fold)."""
    import hashlib
    import math

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.text import EXP_SCALE, WEIGHTED_K, q_doc_weighted_sample

    # 120 docs with word counts 1..120 (weight grows with doc_id)
    texts = [" ".join(f"w{j}" for j in range(i + 1)) for i in range(120)]
    t = pa.table({
        "doc_id": pa.array(range(120), type=pa.int64()),
        "text": pa.array(texts),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    rows = []
    for i, txt in enumerate(texts):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
        u = (float(h) + 1.0) / 2.0 ** 64
        key = math.floor(-math.log(u) * float(EXP_SCALE)) // (txt.count(" ") + 1)
        rows.append((i, txt.count(" ") + 1, key))
    exp = (pd.DataFrame(rows, columns=["doc_id", "w", "key_scaled"])
           .sort_values(["key_scaled", "doc_id"]).head(WEIGHTED_K)
           .reset_index(drop=True))
    exp.insert(0, "rank", pd.Series(range(1, len(exp) + 1), dtype="int64"))

    got = q_doc_weighted_sample(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert got["doc_id"].is_unique          # without replacement

    multi = tmp_path / "multi"
    multi.mkdir()
    for j in range(4):
        pq.write_table(t.slice(j * 30, 30), multi / f"documents-{j:03d}.parquet")
    got2 = q_doc_weighted_sample(str(multi)).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got2)


def test_source_entropy_matches_serial_mathlog(ray_session):
    """The vectorized numpy-log path must equal a serial Counter +
    math.log recompute (math.log is the same libm call DuckDB makes,
    so this also guards the numpy-SIMD 1-ulp divergence class the
    weighted-sample op documented)."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    from swarm_ray.ops.text import q_doc_source_entropy

    sf = "/root/testdata/sf0.001"
    got = (q_doc_source_entropy(sf).to_pandas()
           .sort_values("source").reset_index(drop=True))

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["source", "text"]).to_pandas()
    rows = []
    for src, g in t.groupby("source"):
        c = Counter()
        for text in g["text"]:
            c.update(text.split(" "))
        n = sum(c.values())
        sl = sum(v * math.floor(1000.0 * math.log(v) + 0.5)
                 for v in c.values())
        rows.append((src, n, len(c),
                     math.floor(1000.0 * math.log(n) + 0.5) - sl // n))
    import pandas as pd
    exp = pd.DataFrame(rows, columns=["source", "n_words", "vocab",
                                      "ent_milli"]) \
        .astype({"n_words": "int64", "vocab": "int64",
                 "ent_milli": "int64"}) \
        .sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert got["ent_milli"].nunique() > 1   # sources must differ
