"""Deterministic synthetic fixtures (FIXTURES.md F1/F3).

The engine's raw input is a Parquet table of pre-tokenized training
sequences ``(doc_id: string, tokens: list<int32>, n_tok: int32,
source: string)`` — the shape mandated by ``BASELINE.json``
``input_hint``. The reference pipeline's inputs are GCS objects whose
bucket/object names drive routing (reference:
``pkg/usecase/testdata/policy/event.rego:7-9``); here the ``source``
column plays the bucket role and ``doc_id`` the object-path role.

Everything is synthesized deterministically (seeded numpy, fixed
chunking) and cached as Parquet under ``/tmp/swarm_ray_fixtures`` so

* the Ray pipeline and the DuckDB oracle read the *same* files, and
* repeated runs (and the resume tests) see identical bytes.

Generation is chunked at ``CHUNK_ROWS`` rows per file with a per-chunk
seed, so the content of row *i* is independent of how many total rows
a scale factor asks for — a prefix of a bigger corpus equals a smaller
corpus.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
CHUNK_ROWS = 100_000
FIXTURE_ROOT = Path(os.environ.get("SWARM_RAY_FIXTURE_DIR", "/tmp/swarm_ray_fixtures"))

#: deliberately skewed source mix (FIXTURES.md F1): the 55% head key is
#: the salted-key / skew case the scale design must survive.
SOURCES = ("github_audit", "cloudtrail", "access_log", "vpc_flow", "debug", "unknown_src")
SOURCE_PROBS = (0.55, 0.25, 0.12, 0.05, 0.029, 0.001)

VOCAB = 50257  # GPT-2-ish vocab bound for token values

#: rows per scale label. tiny = unit tests, small = oracle correctness,
#: bench = scaling runs (≥5M rows per FIXTURES.md F1).
ROWS_BY_LABEL = {
    "sf0.001": 10_000,
    "sf0.01": 200_000,
    "sf0.1": 5_000_000,
}

# F3 enrichment lookup: one row per known source plus one entry absent
# from the input (miss path exercised; ≙ policy data documents,
# reference pkg/infra/policy/client.go:55-60).
INTEL_ROWS = [
    {"source": "cloudtrail", "severity": 3, "tag": "team-3"},
    {"source": "github_audit", "severity": 2, "tag": "team-2"},
    {"source": "access_log", "severity": 1, "tag": "team-1"},
    {"source": "vpc_flow", "severity": 1, "tag": "team-1"},
    {"source": "debug", "severity": 0, "tag": "team-0"},
    {"source": "syslog_legacy", "severity": 9, "tag": "team-9"},  # never matches input
]


def rows_for_label(label: str) -> int:
    if label in ROWS_BY_LABEL:
        return ROWS_BY_LABEL[label]
    # fallback: derive from the numeric part of "sfX" at 50M rows/sf
    try:
        sf = float(label.removeprefix("sf"))
        return max(1_000, min(int(sf * 50_000_000), 50_000_000))
    except ValueError:
        return 10_000


def label_for_sf_dir(sf_dir: str | os.PathLike) -> str:
    return Path(sf_dir).name or "sf0.01"


def oracle_sf_dir() -> str:
    """The sf dir the driver's oracle comparison runs at. Every
    ``oracle_sql()`` that reads fixture-generated globs derives its
    path from THIS (overridable via env for local runs) instead of
    hardcoding a scale, so a driver scale change can't silently point
    the SQL at the wrong data (ADVICE r1)."""
    return os.environ.get("SWARM_RAY_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _gen_chunk(chunk_idx: int, n: int) -> pa.Table:
    """Generate rows [chunk_idx*CHUNK_ROWS, +n) of the corpus."""
    base = chunk_idx * CHUNK_ROWS
    i = np.arange(base, base + n, dtype=np.int64)
    rng = np.random.default_rng([SEED, chunk_idx])

    src_idx = rng.choice(len(SOURCES), size=n, p=SOURCE_PROBS)
    src = np.asarray(SOURCES)[src_idx]

    # token lengths: 8..255, empty list for i % 997 == 0 (edge case)
    lens = (8 + rng.integers(0, 248, size=n)).astype(np.int64)
    lens[i % 997 == 0] = 0
    total = int(lens.sum())
    values = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(values))

    # extension: ~1/64 of rows are ".tmp" scratch files (rejected by the
    # event rules, ≙ 0-match object reject); cloudtrail alternates
    # .log/.gz so two event rules route to one schema (FIXTURES F2 R1/R2).
    is_tmp = (i % 64) == 63
    is_gz = (src == "cloudtrail") & ((i % 2) == 0) & ~is_tmp
    ext = np.where(is_tmp, ".tmp", np.where(is_gz, ".gz", ".log"))
    part = i // 257
    doc_id = [
        f"{s}/part-{p:05d}/doc-{idx:08d}{e}"
        for s, p, idx, e in zip(src, part, i, ext)
    ]

    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array(src, type=pa.string()),
        }
    )


def sequences_dir(label: str) -> Path:
    """Materialize (once) and return the sequences corpus dir for a label."""
    n_rows = rows_for_label(label)
    out = FIXTURE_ROOT / label / "sequences"
    meta = out / "_FIXTURE.json"
    if meta.exists():
        try:
            if json.loads(meta.read_text())["rows"] == n_rows:
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    n_chunks = (n_rows + CHUNK_ROWS - 1) // CHUNK_ROWS
    for c in range(n_chunks):
        n = min(CHUNK_ROWS, n_rows - c * CHUNK_ROWS)
        pq.write_table(_gen_chunk(c, n), tmp / f"part-{c:05d}.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps({"rows": n_rows, "seed": SEED}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():  # lost a race with a concurrent generator; theirs is fine
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


def sequences_files(label: str) -> list[str]:
    d = sequences_dir(label)
    return sorted(str(p) for p in d.glob("*.parquet"))


def documents_synth_dir(n_docs: int, seed: int = 77,
                        dup_frac: float = 0.05) -> Path:
    """Synthetic ``documents``-shaped corpus at an arbitrary size — for
    scaling measurements of the dedup family (the driver's documents
    table is small; scaling efficiency needs enough work to amortize
    fixed Ray overheads). ~``dup_frac`` of docs are 1-word-mutated
    near-duplicates of earlier docs. Deterministic, chunked, cached."""
    out = FIXTURE_ROOT / f"docs_synth_{n_docs}_d{int(dup_frac * 1000)}"
    meta = out / "_FIXTURE.json"
    if meta.exists():
        try:
            m = json.loads(meta.read_text())
            # seed participates in cache validity — a different seed
            # must regenerate, not silently reuse stale data
            if m["rows"] == n_docs and m.get("seed") == seed:
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    vocab = np.asarray([f"w{i}" for i in range(5000)])
    chunk = 25_000
    for c in range((n_docs + chunk - 1) // chunk):
        n = min(chunk, n_docs - c * chunk)
        rng = np.random.default_rng([seed, c])
        words = vocab[rng.integers(0, len(vocab), size=(n, 80))]
        texts = [" ".join(row) for row in words]
        # plant near-duplicates of docs earlier in the same chunk
        n_dup = int(n * dup_frac)
        for j in range(n_dup):
            src = int(rng.integers(0, n))
            w = texts[src].split(" ")
            w[int(rng.integers(0, 80))] = "CHANGED"
            texts[(src + 1 + j) % n] = " ".join(w)
        base = c * chunk
        t = pa.table({
            "doc_id": pa.array(np.arange(base, base + n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["synth"] * n),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int32()),
        })
        pq.write_table(t, tmp / f"documents-{c:04d}.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps({"rows": n_docs, "seed": seed}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


NDJSON_FIXTURE_VERSION = 1


def sequences_ndjson_dir(label: str) -> Path:
    """The sequences corpus re-serialized as gzipped NDJSON — the
    reference's ACTUAL input format (newline/concatenated JSON docs,
    optionally gzip-wrapped: ``pkg/usecase/load.go:262-281``) — feeding
    the JSON ingestion source. Derived file-for-file from the Parquet
    fixture, so both paths carry identical records and the oracles can
    cross-check them."""
    src = sequences_dir(label)
    n_rows = rows_for_label(label)
    out = FIXTURE_ROOT / label / "sequences_ndjson"
    meta = out / "_FIXTURE.json"
    if meta.exists():
        try:
            m = json.loads(meta.read_text())
            if m["rows"] == n_rows and m.get("version") == NDJSON_FIXTURE_VERSION:
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    for p in sorted(src.glob("*.parquet")):
        df = pq.read_table(p).to_pandas()
        df["tokens"] = df["tokens"].map(list)
        df.to_json(tmp / f"{p.stem}.jsonl.gz", orient="records",
                   lines=True, compression="gzip")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": n_rows, "version": NDJSON_FIXTURE_VERSION}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


def sequences_ndjson_files(label: str) -> list[str]:
    return sorted(str(p) for p in sequences_ndjson_dir(label).glob("*.jsonl.gz"))


CSV_FIXTURE_VERSION = 1


def sequences_csv_dir(label: str) -> Path:
    """The sequences corpus re-serialized as gzipped CSV — the
    lowest-common-denominator export feed for the CSV ingestion
    source. ``tokens`` is a space-separated integer string (CSV has no
    list type); zero-token rows serialize as the empty string. Derived
    file-for-file from the Parquet fixture, so all three serializations
    carry identical records."""
    src = sequences_dir(label)
    n_rows = rows_for_label(label)
    out = FIXTURE_ROOT / label / "sequences_csv"
    meta = out / "_FIXTURE.json"
    if meta.exists():
        try:
            m = json.loads(meta.read_text())
            if m["rows"] == n_rows and m.get("version") == CSV_FIXTURE_VERSION:
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    for p in sorted(src.glob("*.parquet")):
        df = pq.read_table(p).to_pandas()
        df["tokens"] = df["tokens"].map(
            lambda a: " ".join(str(int(x)) for x in a))
        df.to_csv(tmp / f"{p.stem}.csv.gz", index=False,
                  compression="gzip")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": n_rows, "version": CSV_FIXTURE_VERSION}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


def sequences_csv_files(label: str) -> list[str]:
    return sorted(str(p) for p in sequences_csv_dir(label).glob("*.csv.gz"))


def intel_table() -> pa.Table:
    return pa.table(
        {
            "source": pa.array([r["source"] for r in INTEL_ROWS]),
            "severity": pa.array([r["severity"] for r in INTEL_ROWS], type=pa.int32()),
            "tag": pa.array([r["tag"] for r in INTEL_ROWS]),
        }
    )


def intel_path(label: str = "common") -> Path:
    out = FIXTURE_ROOT / label / "intel.parquet"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        tmp = out.with_suffix(".parquet.tmp")
        pq.write_table(intel_table(), tmp)
        os.replace(tmp, out)
    return out


# ---------------------------------------------------------------------------
# Expected-embedding fixture (the doc_embed / doc_embed_knn oracle side)
# ---------------------------------------------------------------------------

EMBED_FIXTURE_VERSION = 1


def doc_embed_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side expected embeddings for ``{sf_dir}/documents``:
    an INDEPENDENT per-document recompute of the stub encoder (plain
    Python loop — word→md5 id, one-segment reduceat sum, L2 normalize),
    written as (doc_id, emb_csum_e6, embedding DOUBLE[]) so DuckDB can
    (a) hash-check the engine's distributed embed stage via the
    floor-scaled integer checksum and (b) rank
    ``list_cosine_similarity`` for the doc_embed_knn oracle
    (VERDICT r2 item 3). The per-doc float32 kernels mirror the
    stage's exactly, so the two implementations are bit-identical —
    the checksum compare is exact, not tolerance-based;
    tests/test_ops_embed.py pins the bit-equality."""
    import hashlib

    label = label_for_sf_dir(sf_dir)
    out = FIXTURE_ROOT / label / "doc_embed_expected"
    meta = out / "_FIXTURE.json"
    from .ops.dedup import _doc_files
    docs = pa.concat_tables([pq.read_table(f, columns=["doc_id", "text"])
                             for f in _doc_files(sf_dir)])
    if meta.exists():
        try:
            m = json.loads(meta.read_text())
            if m["rows"] == len(docs) and m.get("version") == EMBED_FIXTURE_VERSION:
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)

    # the stub model, regenerated from its published seed (identical
    # bits to ops.embed.EmbedStage._load_model — pinned by pytest)
    from .ops.embed import EMBED_DIM, EMBED_SEED
    from .ops.text import TOKENIZE_VOCAB
    rng = np.random.default_rng(EMBED_SEED)
    model = rng.standard_normal((TOKENIZE_VOCAB, EMBED_DIM)).astype(np.float32)

    ids = docs["doc_id"].to_numpy()
    emb = np.zeros((len(docs), EMBED_DIM), dtype=np.float32)
    for i, text in enumerate(docs["text"].to_pylist()):
        toks = [int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % TOKENIZE_VOCAB
                for w in text.split(" ")]
        # one-segment reduceat: same float32 accumulation kernel the
        # stage applies per segment (a plain `acc += row` loop differs
        # from reduceat by 1 float32 ulp, which a floor-based checksum
        # cannot tolerate); composition stays independent — per-doc
        # here, one flat batched pass in the stage
        emb[i] = np.add.reduceat(model[np.asarray(toks)], [0], axis=0)[0]
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    emb = emb / norms
    csum = np.floor(emb.astype(np.float64) * 1e6).astype(np.int64).sum(axis=1)

    flat = pa.array(emb.astype(np.float64).reshape(-1), type=pa.float64())
    t = pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "emb_csum_e6": pa.array(csum),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, EMBED_DIM),
    })
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    pq.write_table(t, tmp / "expected.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": len(docs), "version": EMBED_FIXTURE_VERSION}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


# ---------------------------------------------------------------------------
# Expected MinHash-LSH pairs fixture (the doc_minhash_pairs oracle side)
# ---------------------------------------------------------------------------

MINHASH_FIXTURE_VERSION = 1


def minhash_pairs_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side expected output for ``doc_minhash_pairs`` over
    ``{sf_dir}/documents``: an INDEPENDENT single-process recompute of
    the full MinHash-LSH pipeline — per-doc signature, per-band bucket
    dict keyed on the raw signature chunk (no hashing of the chunk at
    all, where the engine buckets via blake2b of the chunk bytes),
    chunk+star pair generation for oversized buckets, cross-band set
    dedup, and exact k-shingle Jaccard verification with Python sets.
    Given the published permutation seed the LSH output is fully
    deterministic, so this is an exact differential oracle (the same
    recipe as ``doc_embed_expected_dir``); the band→bucket→pair
    topology is re-derived from first principles rather than through
    the engine's repartition plan. Bit-equality of engine vs recompute
    is pinned by tests/test_ops_dedup.py."""
    from .ops.dedup import (BANDS, JACCARD_TAU_MILLI, MAX_FULL_BUCKET,
                            MERSENNE, NUM_PERM, SHINGLE_K, _perm_params)

    label = label_for_sf_dir(sf_dir)
    out = FIXTURE_ROOT / label / "minhash_pairs_expected"
    meta = out / "_FIXTURE.json"
    from .ops.dedup import _doc_files
    docs = pa.concat_tables([pq.read_table(f, columns=["doc_id", "text"])
                             for f in _doc_files(sf_dir)])
    if meta.exists():
        try:
            m = json.loads(meta.read_text())
            if (m["rows"] == len(docs)
                    and m.get("version") == MINHASH_FIXTURE_VERSION):
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)

    import hashlib

    a_perm, b_perm = _perm_params(NUM_PERM)   # published seed, shared consts
    rows_per_band = NUM_PERM // BANDS

    def doc_shingles(text: str) -> list[int]:
        words = text.split(" ")
        if len(words) < SHINGLE_K:
            grams = [" ".join(words)]
        else:
            grams = [" ".join(words[i:i + SHINGLE_K])
                     for i in range(len(words) - SHINGLE_K + 1)]
        return [int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(),
                    "little") % MERSENNE for g in grams]

    # per-band buckets keyed on the raw signature chunk tuple
    buckets: dict[tuple, list[int]] = {}
    shingle_sets: dict[int, set[int]] = {}
    ids = docs["doc_id"].to_numpy()
    for doc_id, text in zip(ids, docs["text"].to_pylist()):
        sh = doc_shingles(text)
        shingle_sets[int(doc_id)] = set(sh)
        # universal hash with the engine's uint64 wrap semantics:
        # ((x*a + b) mod 2^64) mod p, then min over shingles
        sig = [min(((h * int(a_perm[i]) + int(b_perm[i])) % (1 << 64))
                   % MERSENNE for h in sh)
               for i in range(NUM_PERM)]
        for band in range(BANDS):
            chunk = tuple(sig[band * rows_per_band:(band + 1) * rows_per_band])
            buckets.setdefault((band, chunk), []).append(int(doc_id))

    # candidate pairs: full enumeration for small buckets; chunk+star
    # for oversized ones (mirrors the engine's documented mega-bucket
    # recall contract); cross-band duplicates collapse via the set
    cands: set[tuple[int, int]] = set()
    for members in buckets.values():
        members = sorted(members)
        if len(members) < 2:
            continue
        if len(members) <= MAX_FULL_BUCKET:
            cands.update((a, b) for i, a in enumerate(members)
                         for b in members[i + 1:])
        else:
            rep = members[0]
            cands.update((rep, b) for b in members[MAX_FULL_BUCKET:])
            for start in range(0, len(members), MAX_FULL_BUCKET):
                chunk_ids = members[start:start + MAX_FULL_BUCKET]
                cands.update((a, b) for i, a in enumerate(chunk_ids)
                             for b in chunk_ids[i + 1:])

    rows = []
    for a, b in sorted(cands):
        sa, sb = shingle_sets[a], shingle_sets[b]
        inter = len(sa & sb)
        jm = (1000 * inter) // (len(sa) + len(sb) - inter)
        if jm >= JACCARD_TAU_MILLI:
            rows.append((a, b, jm))
    t = pa.table({
        "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
        "jaccard_milli": pa.array([r[2] for r in rows], type=pa.int64()),
    })

    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    pq.write_table(t, tmp / "expected.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": len(docs), "version": MINHASH_FIXTURE_VERSION}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


def minhash_est_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side expected output for ``doc_minhash_est``: over the
    expected-pairs fixture's (doc_a, doc_b, exact-jaccard) topology,
    an INDEPENDENT plain-Python-integer recompute of each doc's minhash
    signature (explicit ``% 2**64`` wrap, no numpy) and the per-pair
    agreement estimate — the engine's vectorized uint64 path must land
    on the same integers exactly."""
    from .ops.dedup import (MERSENNE, NUM_PERM, SHINGLE_K, _doc_files,
                            _perm_params)

    pairs_dir = minhash_pairs_expected_dir(sf_dir)
    pairs = pq.read_table(pairs_dir / "expected.parquet").to_pandas()
    out = FIXTURE_ROOT / label_for_sf_dir(sf_dir) / "minhash_est_expected"
    files = _doc_files(sf_dir)
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    params = [NUM_PERM, SHINGLE_K, MINHASH_FIXTURE_VERSION]
    if _fixture_fresh(out, rows, params):
        return out

    import hashlib as _hashlib

    a_perm, b_perm = _perm_params(NUM_PERM)
    need = set(pairs["doc_a"]) | set(pairs["doc_b"])
    sigs: dict[int, list[int]] = {}
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "text"])
        for doc_id, text in zip(t["doc_id"].to_numpy(),
                                t["text"].to_pylist()):
            if int(doc_id) not in need:
                continue
            words = text.split(" ")
            if len(words) < SHINGLE_K:
                grams = [" ".join(words)]
            else:
                grams = [" ".join(words[i:i + SHINGLE_K])
                         for i in range(len(words) - SHINGLE_K + 1)]
            sh = [int.from_bytes(
                      _hashlib.blake2b(g.encode(), digest_size=8).digest(),
                      "little") % MERSENNE for g in grams]
            sigs[int(doc_id)] = [
                min(((h * int(a_perm[i]) + int(b_perm[i])) % (1 << 64))
                    % MERSENNE for h in sh)
                for i in range(NUM_PERM)]

    est = [(1000 * sum(x == y for x, y in zip(sigs[int(a)], sigs[int(b)])))
           // NUM_PERM
           for a, b in zip(pairs["doc_a"], pairs["doc_b"])]
    est_a = np.asarray(est, dtype=np.int64)
    exact = pairs["jaccard_milli"].to_numpy()
    tbl = pa.table({
        "doc_a": pa.array(pairs["doc_a"].to_numpy(), type=pa.int64()),
        "doc_b": pa.array(pairs["doc_b"].to_numpy(), type=pa.int64()),
        "jaccard_milli": pa.array(exact, type=pa.int64()),
        "est_milli": pa.array(est_a, type=pa.int64()),
        "err_milli": pa.array(np.abs(est_a - exact), type=pa.int64()),
    })
    return _write_fixture_dir(out, tbl, rows, params)


# ---------------------------------------------------------------------------
# Expected ANN candidate-set fixtures (emb_lsh_ann / emb_ivf_ann oracles)
# ---------------------------------------------------------------------------

ANN_FIXTURE_VERSION = 2   # v2: first-principles bucketing (no LshBucket)


def _ann_corpus_queries(sf_dir: str | os.PathLike):
    import pandas as pd
    t = pq.read_table(Path(sf_dir) / "embeddings.parquet",
                      columns=["vec_id", "embedding"]) \
        .to_pandas().sort_values("vec_id")
    ids = t["vec_id"].to_numpy()
    m = np.asarray(list(t["embedding"]), dtype=np.float64)
    from .ops.ann import N_QUERIES
    qmask = ids < N_QUERIES
    return ids, m, ids[qmask], m[qmask]


def _write_pairs_fixture(out: Path, n_rows: int, version: int,
                         q_col: np.ndarray, v_col: np.ndarray) -> Path:
    t = pa.table({"query_vec_id": pa.array(q_col, type=pa.int64()),
                  "vec_id": pa.array(v_col, type=pa.int64())})
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    pq.write_table(t, tmp / "expected.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": n_rows, "version": version}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


def lsh_candidates_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side expected CANDIDATE SET for ``emb_lsh_ann``: which
    (query, vector) pairs share ≥1 probed bucket (query's bucket ± every
    1-bit multiprobe flip, per table). The oracle then ranks these
    candidates in DuckDB by ``list_cosine_similarity`` — so the engine's
    whole scoring/fold path is cross-checked by SQL, and only the bucket
    topology comes from this recompute. The sign-pattern bucketing is
    RE-DERIVED here from first principles — only the published seed and
    the table/bit constants are shared with the engine (the
    ``minhash_pairs_expected_dir`` standard): hyperplanes are drawn
    per-table from the seeded generator, sign bits come from a plain
    per-table matmul, and the bucket id is assembled bit-by-bit, none
    of it through ``LshBucket``'s einsum kernel or the engine's
    inverted-index plan."""
    from .ops.ann import LSH_BITS, LSH_SEED, LSH_TABLES

    label = label_for_sf_dir(sf_dir)
    out = FIXTURE_ROOT / label / "lsh_candidates_expected"
    meta = out / "_FIXTURE.json"
    ids, m, q_ids, q = _ann_corpus_queries(sf_dir)
    if meta.exists():
        try:
            mt = json.loads(meta.read_text())
            if mt["rows"] == len(ids) and mt.get("version") == ANN_FIXTURE_VERSION:
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)

    # Independent sign-pattern bucketing: seeded hyperplane draw (the
    # published contract is ONE standard_normal((L, B, dim)) tensor from
    # default_rng(LSH_SEED)), then per-table dot products and bit
    # assembly — no engine kernel involved.
    planes = np.random.default_rng(LSH_SEED).standard_normal(
        (LSH_TABLES, LSH_BITS, m.shape[1]))

    def bucket_ids(vecs: np.ndarray) -> np.ndarray:
        out_b = np.zeros((len(vecs), LSH_TABLES), dtype=np.int64)
        for t in range(LSH_TABLES):
            for i in range(LSH_BITS):
                sign = vecs @ planes[t, i] > 0
                out_b[:, t] |= sign.astype(np.int64) << i
        return out_b

    corpus_b = bucket_ids(m)                             # (n, L)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    query_b = bucket_ids(qn)                             # (nq, L)
    pairs: set[tuple[int, int]] = set()
    for j in range(len(q_ids)):
        for t in range(LSH_TABLES):
            probes = {int(query_b[j, t])} | {
                int(query_b[j, t]) ^ (1 << i) for i in range(LSH_BITS)}
            for v in np.flatnonzero(np.isin(corpus_b[:, t],
                                            np.asarray(sorted(probes)))):
                pairs.add((int(q_ids[j]), int(ids[v])))
    rows = sorted(pairs)
    return _write_pairs_fixture(
        out, len(ids), ANN_FIXTURE_VERSION,
        np.asarray([r[0] for r in rows], dtype=np.int64),
        np.asarray([r[1] for r in rows], dtype=np.int64))


def ivf_candidates_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side expected CANDIDATE SET for ``emb_ivf_ann``: which
    (query, vector) pairs share a probed coarse list. Same contract as
    the LSH fixture: the train-on-sample quantizer (published seed +
    recipe) is shared, the assignment/probe topology is recomputed flat
    here, and DuckDB does all the ranking."""
    from .ops.ann import IVF_NPROBE, _train_coarse_centroids

    label = label_for_sf_dir(sf_dir)
    out = FIXTURE_ROOT / label / "ivf_candidates_expected"
    meta = out / "_FIXTURE.json"
    ids, m, q_ids, q = _ann_corpus_queries(sf_dir)
    if meta.exists():
        try:
            mt = json.loads(meta.read_text())
            if mt["rows"] == len(ids) and mt.get("version") == ANN_FIXTURE_VERSION:
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)

    cent = _train_coarse_centroids(str(sf_dir))
    en = m / np.linalg.norm(m, axis=1, keepdims=True)
    assign = np.argmax(en @ cent.T, axis=1)              # (n,)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :IVF_NPROBE]
    q_col, v_col = [], []
    for j in range(len(q_ids)):
        sel = np.flatnonzero(np.isin(assign, probes[j]))
        q_col.append(np.full(len(sel), q_ids[j], dtype=np.int64))
        v_col.append(ids[sel].astype(np.int64))
    return _write_pairs_fixture(
        out, len(ids), ANN_FIXTURE_VERSION,
        np.concatenate(q_col) if q_col else np.empty(0, dtype=np.int64),
        np.concatenate(v_col) if v_col else np.empty(0, dtype=np.int64))


def pq_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side expected artifacts for ``emb_pq_ann``, re-derived
    serially from constants only (the ``minhash_pairs_expected``
    independence standard — no engine classes imported): normalize +
    floor-scale the corpus to int64, run the fixed-point Lloyd loop
    inline for the coarse quantizer and each PQ sub-codebook, encode,
    and emit three tables —

    * ``pairs.parquet``   (query_vec_id, vec_id) probe topology
    * ``recon.parquet``   (vec_id, recon: list<int64>) PQ reconstructions
    * ``qint.parquet``    (query_vec_id, qint: list<int64>) integer queries

    DuckDB then does ALL the scoring (``list_inner_product`` — exact,
    the values are integer sums < 2^53) and ranking itself."""
    from .ops.ann import (PQ_ITERS, PQ_KSUB, PQ_M, PQ_NLIST, PQ_NPROBE,
                          PQ_SAMPLE, PQ_SCALE, TOP_K)  # constants only

    label = label_for_sf_dir(sf_dir)
    out = FIXTURE_ROOT / label / "pq_expected"
    # freshness is keyed on the PQ constants too — a parameter change
    # must regenerate, not silently reuse a stale topology. Checked
    # from the parquet FOOTER before any corpus load (ADVICE r4: the
    # old order paid a full driver-side table read per invocation even
    # when the fixture was already fresh).
    params = [PQ_M, PQ_KSUB, PQ_NLIST, PQ_NPROBE, PQ_SAMPLE, PQ_ITERS,
              PQ_SCALE]
    rows = pq.read_metadata(Path(sf_dir) / "embeddings.parquet").num_rows
    meta = out / "_FIXTURE.json"
    if meta.exists():
        try:
            mt = json.loads(meta.read_text())
            if (mt["rows"] == rows
                    and mt.get("version") == ANN_FIXTURE_VERSION
                    and mt.get("pq_params") == params):
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)
    ids, m, q_ids, q = _ann_corpus_queries(sf_dir)

    def to_int(x: np.ndarray) -> np.ndarray:
        return np.floor(x / np.linalg.norm(x, axis=1, keepdims=True)
                        * PQ_SCALE).astype(np.int64)

    def score_int(e: np.ndarray, c: np.ndarray) -> np.ndarray:
        return 2 * (e @ c.T) - (c * c).sum(axis=1)

    def lloyd(s: np.ndarray, k: int) -> np.ndarray:
        cents = s[:min(k, len(s))].copy()
        for _ in range(PQ_ITERS):
            a = np.argmax(score_int(s, cents), axis=1)
            counts = np.bincount(a, minlength=len(cents))
            sums = np.zeros((len(cents), s.shape[1]), dtype=np.int64)
            np.add.at(sums, a, s)
            nz = counts > 0
            cents[nz] = sums[nz] // counts[nz, None]
        return cents

    x = to_int(m)                            # ids already vec_id-sorted
    samp = x[ids < PQ_SAMPLE]
    coarse = lloyd(samp, PQ_NLIST)
    sub = x.shape[1] // PQ_M
    books = [lloyd(np.ascontiguousarray(samp[:, i * sub:(i + 1) * sub]),
                   PQ_KSUB) for i in range(PQ_M)]
    codes = np.stack([
        np.argmax(score_int(np.ascontiguousarray(
            x[:, i * sub:(i + 1) * sub]), books[i]), axis=1)
        for i in range(PQ_M)], axis=1)
    recon = np.concatenate([books[i][codes[:, i]] for i in range(PQ_M)],
                           axis=1)
    assign = np.argmax(score_int(x, coarse), axis=1)
    qi = to_int(q)
    probes = np.argsort(-score_int(qi, coarse), axis=1,
                        kind="stable")[:, :PQ_NPROBE]
    q_col, v_col = [], []
    for j in range(len(q_ids)):
        sel = np.flatnonzero(np.isin(assign, probes[j]))
        q_col.append(np.full(len(sel), q_ids[j], dtype=np.int64))
        v_col.append(ids[sel].astype(np.int64))

    dim = x.shape[1]
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    pq.write_table(pa.table({
        "query_vec_id": pa.array(np.concatenate(q_col)
                                 if q_col else np.empty(0, np.int64)),
        "vec_id": pa.array(np.concatenate(v_col)
                           if v_col else np.empty(0, np.int64)),
    }), tmp / "pairs.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(ids.astype(np.int64)),
        "recon": pa.FixedSizeListArray.from_arrays(
            pa.array(recon.reshape(-1)), dim),
    }), tmp / "recon.parquet")
    pq.write_table(pa.table({
        "query_vec_id": pa.array(q_ids.astype(np.int64)),
        "qint": pa.FixedSizeListArray.from_arrays(
            pa.array(qi.reshape(-1)), dim),
    }), tmp / "qint.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": len(ids), "version": ANN_FIXTURE_VERSION,
         "pq_params": params}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


# ---------------------------------------------------------------------------
# Multimodal media fixture (binary payload columns + typed metadata)
# ---------------------------------------------------------------------------

#: rows per label for the media table (payloads are KBs, keep it small)
MEDIA_ROWS_BY_LABEL = {"sf0.001": 800, "sf0.01": 4_000, "sf0.1": 20_000}

#: toy deterministic container formats (this sandbox has no image/audio
#: codec libraries; real JPEG/WAV decode is stubbed in ops/media.py
#: behind an import-try — the engine-side plumbing is identical):
#:   image: b"RAI1" + u16le width + u16le height + width*height u8 pixels
#:   audio: b"RAA1" + u32le sample_rate + u32le n_samples + n int16le samples
MEDIA_MAGIC_IMAGE = b"RAI1"
MEDIA_MAGIC_AUDIO = b"RAA1"
#:   video: b"RAV1" + u16le width + u16le height + u16le n_frames +
#:          n_frames × width*height u8 frames
MEDIA_MAGIC_VIDEO = b"RAV1"


#: every k-th media row carries a corrupt payload (truncated / unknown
#: magic), deterministically — so "decoded == n" can never silently
#: hold by construction and the oracles must reason about failures
MEDIA_CORRUPT_EVERY = 97

#: expected-output parameters baked into the fixture columns; MUST
#: mirror the defaults of the matching ops/media.py stages
MEDIA_RESIZE_WH = 16          # ImageResizeStage(out_w=16, out_h=16)
MEDIA_AUDIO_STRIDE = 64       # AudioFrameSampleStage(stride=64, n_keep=8)
MEDIA_AUDIO_KEEP = 8
MEDIA_VIDEO_STRIDE = 4        # VideoFrameSampleStage(stride=4, n_keep=4)
MEDIA_VIDEO_KEEP = 4


def _resize16_sum(px: np.ndarray, w: int, h: int) -> int:
    """Nearest-neighbour 16x16 resize pixel sum — the generator-side
    twin of ImageResizeStage's grid, used as the oracle expectation."""
    o = MEDIA_RESIZE_WH
    xs = np.arange(o) * w // o
    ys = np.arange(o) * h // o
    return int(px[(ys[:, None] * w + xs[None, :]).ravel()].sum())


def _gen_media_chunk(chunk_idx: int, n: int) -> pa.Table:
    import struct

    base = chunk_idx * CHUNK_ROWS
    rng = np.random.default_rng([SEED + 7, chunk_idx])
    kind = rng.choice(3, size=n, p=(0.6, 0.25, 0.15))   # image / audio / video
    is_img, is_aud, is_vid = kind == 0, kind == 1, kind == 2
    widths = np.where(is_img | is_vid, 8 + rng.integers(0, 56, size=n), 0).astype(np.int32)
    heights = np.where(is_img | is_vid, 8 + rng.integers(0, 56, size=n), 0).astype(np.int32)
    srates = np.where(is_aud, np.asarray([8000, 16000, 44100])[rng.integers(0, 3, size=n)], 0).astype(np.int32)
    nsamp = np.where(is_aud, 256 + rng.integers(0, 1792, size=n), 0).astype(np.int32)
    nframes = np.where(is_vid, 4 + rng.integers(0, 28, size=n), 0).astype(np.int32)

    payloads = []
    rsums = np.zeros(n, dtype=np.int64)
    previews: list[list[int]] = []
    vf_nos: list[list[int]] = []
    vf_means: list[list[int]] = []
    for i in range(n):
        if is_img[i]:
            w, h = int(widths[i]), int(heights[i])
            px = rng.integers(0, 256, size=w * h, dtype=np.uint8)
            payloads.append(MEDIA_MAGIC_IMAGE + struct.pack("<HH", w, h) + px.tobytes())
            rsums[i] = _resize16_sum(px, w, h)
            previews.append([])
            vf_nos.append([]); vf_means.append([])
        elif is_aud[i]:
            sr, ns = int(srates[i]), int(nsamp[i])
            samples = rng.integers(-32768, 32768, size=ns, dtype=np.int16)
            payloads.append(MEDIA_MAGIC_AUDIO + struct.pack("<II", sr, ns) + samples.tobytes())
            previews.append(samples[::MEDIA_AUDIO_STRIDE][:MEDIA_AUDIO_KEEP]
                            .astype(np.int32).tolist())
            vf_nos.append([]); vf_means.append([])
        else:
            w, h, nf = int(widths[i]), int(heights[i]), int(nframes[i])
            frames = rng.integers(0, 256, size=w * h * nf, dtype=np.uint8)
            payloads.append(MEDIA_MAGIC_VIDEO + struct.pack("<HHH", w, h, nf) + frames.tobytes())
            previews.append([])
            fr = frames.reshape(nf, w * h)
            kept = list(range(0, nf, MEDIA_VIDEO_STRIDE))[:MEDIA_VIDEO_KEEP]
            vf_nos.append(kept)
            vf_means.append([int(fr[f].mean() * 1000) for f in kept])

    # corrupt every k-th payload AFTER generation (same RNG stream as
    # v2: clean rows keep byte-identical payloads); three failure
    # shapes rotate: empty, truncated header, unknown container magic
    corrupt = np.zeros(n, dtype=bool)
    for i in range(n):
        if (base + i) % MEDIA_CORRUPT_EVERY == 0:
            corrupt[i] = True
            payloads[i] = (b"", b"RA", b"XXX1" + payloads[i][4:])[(base + i) % 3]

    doc_id = [f"media/part-{(base + i) // 257:05d}/doc-{base + i:08d}" for i in range(n)]
    mt = np.where(is_img, "image", np.where(is_aud, "audio", "video"))
    return pa.table({
        "doc_id": pa.array(doc_id, type=pa.string()),
        "media_type": pa.array(mt),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(widths),
        "height": pa.array(heights),
        "sample_rate": pa.array(srates),
        "n_samples": pa.array(nsamp),
        "n_frames": pa.array(nframes),
        "n_bytes": pa.array([len(p) for p in payloads], type=pa.int32()),
        "corrupt": pa.array(corrupt),
        # expected-output columns for the DuckDB oracles (computed from
        # the SAME drawn payload bytes the stages will decode)
        "resized16_pixel_sum": pa.array(rsums, type=pa.int64()),
        "preview64": pa.array(previews, type=pa.list_(pa.int32())),
        "vf_frame_nos": pa.array(vf_nos, type=pa.list_(pa.int32())),
        "vf_mean_milli": pa.array(vf_means, type=pa.list_(pa.int64())),
    })


MEDIA_FIXTURE_VERSION = 3  # bump when the generator's content changes


def media_dir(label: str) -> Path:
    """Materialize (once) the media-table fixture for a label."""
    n_rows = MEDIA_ROWS_BY_LABEL.get(label, 800)
    out = FIXTURE_ROOT / label / "media"
    meta = out / "_FIXTURE.json"
    if meta.exists():
        try:
            m = json.loads(meta.read_text())
            if m["rows"] == n_rows and m.get("version") == MEDIA_FIXTURE_VERSION:
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    n_chunks = (n_rows + CHUNK_ROWS - 1) // CHUNK_ROWS
    for c in range(n_chunks):
        n = min(CHUNK_ROWS, n_rows - c * CHUNK_ROWS)
        pq.write_table(_gen_media_chunk(c, n), tmp / f"part-{c:05d}.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": n_rows, "seed": SEED + 7, "version": MEDIA_FIXTURE_VERSION}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


def media_files(label: str) -> list[str]:
    return sorted(str(p) for p in media_dir(label).glob("*.parquet"))


# ---------------------------------------------------------------------------
# Expected sequence-packing fixture (the seq_pack oracle side)
# ---------------------------------------------------------------------------

PACK_FIXTURE_VERSION = 1


def seq_pack_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side expected output for ``seq_pack``: an INDEPENDENT
    single-process recompute of the greedy first-fit-decreasing packer
    over the sequences corpus. The packing plan is fully deterministic
    — groups are stable doc_idx ranges (``doc_idx // PACK_GROUP``),
    rows order by doc_id within a group, placement order is length-desc
    with doc_id order breaking ties — so this is an exact differential
    oracle (the ``minhash_pairs_expected_dir`` recipe). The placement
    below is a flat per-sequence first-fit scan over an open-bin
    remaining-capacity array, re-derived independently of the engine's
    groupby plan. Bit-equality of engine vs recompute is pinned by
    tests/test_ops_tokens.py."""
    from .ops.tokens import PACK_CAPACITY, PACK_GROUP

    label = label_for_sf_dir(sf_dir)
    out = FIXTURE_ROOT / label / "seq_pack_expected"
    meta = out / "_FIXTURE.json"
    t = pq.read_table(sequences_files(label), columns=["doc_id", "n_tok"])
    if meta.exists():
        try:
            m = json.loads(meta.read_text())
            if (m["rows"] == len(t)
                    and m.get("version") == PACK_FIXTURE_VERSION):
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)

    import pandas as pd
    df = t.to_pandas().sort_values("doc_id")
    idx = df["doc_id"].str.extract(r"doc-(\d+)", expand=False).astype("int64")
    df["pack_group"] = idx // PACK_GROUP

    cols: dict[str, list] = {"bin_id": [], "n_seqs": [], "used_tok": [],
                             "capacity": [], "pack_group": []}
    for grp, g in df.groupby("pack_group", sort=True):
        lens = g["n_tok"].to_numpy().astype(np.int64)
        rem = np.empty(len(lens), dtype=np.int64)     # open-bin remaining cap
        counts = np.zeros(len(lens), dtype=np.int64)
        n_bins = 0
        for i in np.argsort(-lens, kind="stable"):
            length = int(lens[i])
            if length > PACK_CAPACITY:        # over-long: dedicated bin
                rem[n_bins] = 0
                counts[n_bins] = 1
                n_bins += 1
                continue
            fits = rem[:n_bins] >= length
            if n_bins and fits.any():
                b = int(np.argmax(fits))      # first open bin with room
                rem[b] -= length
                counts[b] += 1
            else:
                rem[n_bins] = PACK_CAPACITY - length
                counts[n_bins] = 1
                n_bins += 1
        anchor = g["doc_id"].iloc[0]          # min doc_id (group is sorted)
        cols["bin_id"].extend(f"{anchor}#{b:06d}" for b in range(n_bins))
        cols["n_seqs"].extend(counts[:n_bins].tolist())
        cols["used_tok"].extend((PACK_CAPACITY - rem[:n_bins]).tolist())
        cols["capacity"].extend([PACK_CAPACITY] * n_bins)
        cols["pack_group"].extend([int(grp)] * n_bins)

    exp = pa.table({
        "bin_id": pa.array(cols["bin_id"], type=pa.string()),
        "n_seqs": pa.array(cols["n_seqs"], type=pa.int64()),
        "used_tok": pa.array(cols["used_tok"], type=pa.int64()),
        "capacity": pa.array(cols["capacity"], type=pa.int64()),
        "pack_group": pa.array(cols["pack_group"], type=pa.int64()),
    })
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    pq.write_table(exp, tmp / "expected.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": len(t), "version": PACK_FIXTURE_VERSION}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


# ---------------------------------------------------------------------------
# PII documents fixture (planted emails / phone numbers / IPv4s)
# ---------------------------------------------------------------------------

PII_FIXTURE_VERSION = 1
PII_SEED = 4242

_PII_WORDS = ("report", "meeting", "notes", "draft", "summary", "agenda",
              "update", "review", "plan", "status", "follow", "action")
_PII_NAMES = ("alex", "sam", "jordan", "casey", "riley", "quinn")
_PII_DOMAINS = ("example.com", "mail.test", "corp.example.org")


def pii_rows_for_label(label: str) -> int:
    return max(500, rows_for_label(label) // 50)


def pii_documents_dir(label: str) -> Path:
    """Synthetic corpus with PLANTED PII spans (emails, 555-prefixed
    phone numbers, private-range IPv4s) mixed into word salad — the
    documents tables carry no PII-shaped strings, and a redaction op
    verified only on zero-match inputs would prove nothing. Planting
    is seeded + deterministic, so the engine's Arrow-RE2 redaction and
    the DuckDB-RE2 oracle both read THIS corpus and must agree
    span-for-span (both engines compile the same RE2 syntax)."""
    n_rows = pii_rows_for_label(label)
    out = FIXTURE_ROOT / label / "pii_documents"
    meta = out / "_FIXTURE.json"
    if meta.exists():
        try:
            m = json.loads(meta.read_text())
            if (m["rows"] == n_rows
                    and m.get("version") == PII_FIXTURE_VERSION):
                return out
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)

    rng = np.random.default_rng(PII_SEED)
    texts = []
    for i in range(n_rows):
        words = list(rng.choice(_PII_WORDS, size=int(rng.integers(8, 40))))
        for _ in range(int(rng.integers(0, 3))):       # emails
            who = _PII_NAMES[int(rng.integers(len(_PII_NAMES)))]
            dom = _PII_DOMAINS[int(rng.integers(len(_PII_DOMAINS)))]
            words.insert(int(rng.integers(len(words) + 1)),
                         f"{who}.{int(rng.integers(100))}@{dom}")
        for _ in range(int(rng.integers(0, 3))):       # phones
            words.insert(int(rng.integers(len(words) + 1)),
                         f"555-{int(rng.integers(1000)):03d}-"
                         f"{int(rng.integers(10000)):04d}")
        for _ in range(int(rng.integers(0, 3))):       # IPv4s
            words.insert(int(rng.integers(len(words) + 1)),
                         f"10.{int(rng.integers(256))}."
                         f"{int(rng.integers(256))}.{int(rng.integers(256))}")
        texts.append(" ".join(words))
    t = pa.table({
        "doc_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    })
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    pq.write_table(t, tmp / "part-00000.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": n_rows, "version": PII_FIXTURE_VERSION}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


def _kmeans_serial(sf_dir: str | os.PathLike):
    """INDEPENDENT single-process recompute of the fixed-point Lloyd
    plan — load the whole embeddings table, floor-scale to int64,
    iterate assignment (argmin L2 via the integer 2·e·c − ||c||² form)
    and integer centroid update ``Σe // n``. Every step is integer
    arithmetic, so this serial recompute and the engine's distributed
    partial-sum plan are bit-identical BY CONSTRUCTION — oracle
    compares are exact, not statistical. Only the constants (k, iters,
    scale) are shared with the engine; the loop below is re-derived
    with plain numpy, not the engine's fold.

    Returns (row_count, sorted vec_ids, final-pass assignments,
    per-cluster counts, per-cluster coordinate sums, and the centroid
    matrix USED for the final assignment — i.e. after exactly
    KMEANS_ITERS updates, matching the engine's ``kmeans_fit``
    output; the loop's last update below is stats-only)."""
    from .ops.ann import KMEANS_ITERS, KMEANS_K, KMEANS_SCALE

    t = pq.read_table(Path(sf_dir) / "embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[order]
    e = np.floor(emb * KMEANS_SCALE).astype(np.int64)
    cents = e[:KMEANS_K].copy()
    for _ in range(KMEANS_ITERS + 1):          # last pass = final stats
        final_cents = cents.copy()
        scores = 2 * (e @ cents.T) - (cents * cents).sum(axis=1)[None, :]
        a = np.argmax(scores, axis=1)
        counts = np.bincount(a, minlength=KMEANS_K).astype(np.int64)
        sums = np.zeros((KMEANS_K, e.shape[1]), dtype=np.int64)
        np.add.at(sums, a, e)
        nz = counts > 0
        new = cents.copy()
        new[nz] = sums[nz] // counts[nz, None]
        cents = new
    return len(t), ids[order], a, counts, sums, final_cents


def _write_fixture_dir(out: Path, tbl: pa.Table, rows: int,
                       params: list | None = None) -> Path:
    tmp = out.with_name(out.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    pq.write_table(tbl, tmp / "expected.parquet")
    (tmp / "_FIXTURE.json").write_text(json.dumps(
        {"rows": rows, "version": ANN_FIXTURE_VERSION,
         "params": params}))
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        os.replace(tmp, out)
    return out


def _fixture_fresh(out: Path, rows: int,
                   params: list | None = None) -> bool:
    """Freshness keys on row count + fixture version + the generator's
    PARAMETER list (ADVICE r4: a KMEANS_K/ITERS/SCALE change must
    regenerate, not silently reuse a stale partition — pq_expected
    already keyed on its constants)."""
    meta = out / "_FIXTURE.json"
    if meta.exists():
        try:
            m = json.loads(meta.read_text())
            if (m["rows"] == rows
                    and m.get("version") == ANN_FIXTURE_VERSION
                    and m.get("params") == params):
                return True
        except Exception:
            pass
        shutil.rmtree(out, ignore_errors=True)
    return False


def kmeans_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side expected output for ``emb_kmeans``: per-cluster
    sizes and member-coordinate checksums under the final centroids of
    the serial fixed-point recompute (see ``_kmeans_serial``)."""
    from .ops.ann import KMEANS_ITERS, KMEANS_K, KMEANS_SCALE

    out = FIXTURE_ROOT / label_for_sf_dir(sf_dir) / "kmeans_expected"
    rows = pq.read_metadata(Path(sf_dir) / "embeddings.parquet").num_rows
    params = [KMEANS_K, KMEANS_ITERS, KMEANS_SCALE]
    if _fixture_fresh(out, rows, params):
        return out
    n, _, _, counts, sums, _ = _kmeans_serial(sf_dir)
    tbl = pa.table({
        "cluster": pa.array(np.arange(KMEANS_K, dtype=np.int64)),
        "n": pa.array(counts),
        "csum_e6": pa.array(sums.sum(axis=1)),
    })
    return _write_fixture_dir(out, tbl, n, params)


def kmeans_assign_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side (vec_id, cluster) assignment table under the
    serial recompute's final centroids — the differential topology for
    ``emb_cluster_sample`` (DuckDB independently re-derives the salted
    order and per-cluster quota draw on top of it)."""
    from .ops.ann import KMEANS_ITERS, KMEANS_K, KMEANS_SCALE

    out = FIXTURE_ROOT / label_for_sf_dir(sf_dir) / "kmeans_assign_expected"
    rows = pq.read_metadata(Path(sf_dir) / "embeddings.parquet").num_rows
    params = [KMEANS_K, KMEANS_ITERS, KMEANS_SCALE]
    if _fixture_fresh(out, rows, params):
        return out
    n, ids, a, _, _, _ = _kmeans_serial(sf_dir)
    tbl = pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                    "cluster": pa.array(a.astype(np.int64))})
    return _write_fixture_dir(out, tbl, n, params)


def power_direction_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side expected output for ``emb_top_direction``: a
    serial single-process recompute of the fixed-point power iteration
    (identical integer arithmetic — per-row floor-rescaled dots,
    exact Python-int normalize — so the distributed fold must land on
    the same integers exactly)."""
    from .ops.ann import (GRAM_TARGET_BITS, KMEANS_SCALE, POWER_ITERS,
                          _power_iterate_gram)

    out = FIXTURE_ROOT / label_for_sf_dir(sf_dir) / "power_direction_expected"
    rows = pq.read_metadata(Path(sf_dir) / "embeddings.parquet").num_rows
    params = [POWER_ITERS, GRAM_TARGET_BITS, KMEANS_SCALE]
    if _fixture_fresh(out, rows, params):
        return out
    t = pq.read_table(Path(sf_dir) / "embeddings.parquet",
                      columns=["embedding"])
    e = np.floor(np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
                 * KMEANS_SCALE).astype(np.int64)
    e = e - e.sum(axis=0, dtype=np.int64) // len(e)
    d = e.shape[1]
    # serial Gram in one shot — the distributed op folds per-batch
    # partials of the SAME integer products (associative, so exact);
    # the driver-side iteration helper is shared deliberately (it is
    # not part of the distributed plan under test)
    v = _power_iterate_gram(e.T @ e)
    tbl = pa.table({"dim": pa.array(np.arange(d, dtype=np.int64)),
                    "v_e6": pa.array(v)})
    return _write_fixture_dir(out, tbl, rows, params)


def kmeans_centroids_expected_dir(sf_dir: str | os.PathLike) -> Path:
    """Generator-side LONG-FORMAT centroid table (cluster, i, cv) —
    one row per (cluster, 1-based dimension) of the serially-recomputed
    final centroids (k×d rows, a few hundred ints). Long format so the
    ``emb_outliers`` oracle joins it against DuckDB's
    ``generate_subscripts(embedding, 1)`` positions without relying on
    list/array kernel parity; the distances DuckDB re-derives from it
    are integer-exact by the fixed-point construction."""
    from .ops.ann import KMEANS_ITERS, KMEANS_K, KMEANS_SCALE

    out = FIXTURE_ROOT / label_for_sf_dir(sf_dir) / "kmeans_centroids_expected"
    rows = pq.read_metadata(Path(sf_dir) / "embeddings.parquet").num_rows
    params = [KMEANS_K, KMEANS_ITERS, KMEANS_SCALE]
    if _fixture_fresh(out, rows, params):
        return out
    n, _, _, _, _, cents = _kmeans_serial(sf_dir)
    k, d = cents.shape
    tbl = pa.table({
        "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
        "i": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
        "cv": pa.array(cents.reshape(-1)),
    })
    return _write_fixture_dir(out, tbl, n, params)
