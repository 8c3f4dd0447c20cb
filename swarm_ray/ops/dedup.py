"""Deduplication operators over the ``documents`` table.

The scale-critical family for training-data pipelines. Four levels:

* exact      — content-hash groupby (hash-partitioned, first-wins)
* simhash    — 32-bit md5-derived sign-sum sketch, SQL-reproducible
* jaccard    — exact word-set Jaccard pairs (the small-N oracle)
* minhash    — MinHash+LSH banding (shingle → signature → band-bucket
               groupby → candidate pairs → exact-Jaccard verify): the
               100 TB path, where the only all-to-all is the band-bucket
               groupby of (band, hash, doc_id) triples — tiny rows,
               never the documents themselves.

All SQL-checked outputs are integers/strings (hashes, ids, milli-scaled
ratios) — float-hash-safe by construction.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min
from ..util import read_parquet_clean

DOC_COLS = ["doc_id", "text"]


def _doc_files(sf_dir: str) -> list[str]:
    from pathlib import Path
    single = Path(sf_dir) / "documents.parquet"
    if single.exists():
        return [str(single)]
    # multi-file documents corpora (e.g. the synthetic scaling fixture)
    parts = sorted(str(p) for p in Path(sf_dir).glob("documents-*.parquet"))
    return parts or [str(single)]


def _read_docs(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_clean(_doc_files(sf_dir), columns=DOC_COLS)


def _docs_count(sf_dir: str) -> int:
    """Corpus row count from parquet FOOTERS only (no data read) —
    sizes the keyed partition counts below so a partition stays under
    the block-split threshold at corpus scale (ADVICE r2). Shares
    ``_doc_files`` with every reader so the counted corpus and the
    read corpus can never diverge (review finding: a duplicated glob
    here let multi-file-aware counts pair with single-file reads)."""
    import pyarrow.parquet as pq
    return sum(pq.read_metadata(f).num_rows for f in _doc_files(sf_dir))


# ------------------------------------------------------------ exact dedup

def _hash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, md5(text)) pairs — ARROW block out (pandas blocks make
    the downstream sort aggregate ~20x slower, measured), md5 over
    zero-copy buffer slices via the id stage's hasher."""
    from ..stages.ids import md5_hex
    return pa.table({"doc_id": batch["doc_id"],
                     "text_md5": md5_hex(batch["text"])})


def q_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: hash-partition on content md5, keep min doc_id per
    group (first-wins). Only (hash, id) pairs move, never the text —
    and because content hashes are mostly UNIQUE, a sort-based groupby
    is pure overhead (no combining happens): a keyed hash repartition
    + block-local Arrow aggregate measured 2.6x faster at 1.2M docs
    and scales with partitions instead of sort width."""
    from ..util import enable_hash_shuffle, keyed_partition_count

    hashed = _read_docs(sf_dir).map_batches(
        _hash_batch, batch_format="pyarrow", zero_copy_batch=True)
    # partition count scales with CPUs AND bytes entering the shuffle
    # (~56 B per (md5-hex, id) pair) so one partition never nears the
    # block-split threshold that would break block_agg's one-whole-
    # partition-per-call invariant (batch_size=None below)
    n_parts = keyed_partition_count(_docs_count(sf_dir) * 56)
    enable_hash_shuffle(hashed, n_parts)

    def block_agg(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("text_md5", pa.string()),
                              ("keeper_doc_id", pa.int64()),
                              ("dup_count", pa.int64())]).empty_table()
        return pa.TableGroupBy(t, ["text_md5"]).aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        ).rename_columns(["text_md5", "keeper_doc_id", "dup_count"])

    return (hashed.repartition(n_parts, keys=["text_md5"])
            .map_batches(block_agg, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None))


# ------------------------------------------------------------ simhash

def word_hash32(word: str) -> int:
    """First 8 hex chars of md5 → uint32 — chosen so DuckDB can
    reproduce it (``CAST(CONCAT('0x', substr(md5(w),1,8)) AS UINTEGER)``)."""
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16)


class SimHash:
    """32-bit SimHash over whitespace words (occurrence-weighted).
    Actor state: the word→hash32 cache — the corpus vocabulary is far
    smaller than the corpus, so hashing amortizes to ~zero."""

    BITS = 32

    def __init__(self):
        self._cache: dict[str, int] = {}
        self._shifts = np.arange(self.BITS, dtype=np.uint32)

    def _h(self, w: str) -> int:
        v = self._cache.get(w)
        if v is None:
            v = self._cache[w] = word_hash32(w)
        return v

    def simhash(self, text: str) -> int:
        words = text.split(" ")
        hs = np.fromiter((self._h(w) for w in words), dtype=np.uint64, count=len(words))
        ones = ((hs[:, None] >> self._shifts) & 1).sum(axis=0)  # per-bit ones
        bits = (2 * ones > len(words)).astype(np.uint64)         # strict majority
        return int((bits << self._shifts).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = batch["text"].map(self.simhash).astype("int64")
        return batch[["doc_id", "simhash"]]


def q_simhash(sf_dir: str) -> ray.data.Dataset:
    from ..util import autoscaling_pool
    return _read_docs(sf_dir).map_batches(
        SimHash, batch_format="pandas", batch_size=2048,
        concurrency=autoscaling_pool())


SIMHASH_HAM = 3          # near-dup pair threshold (bits)
SIMHASH_BANDS = 4        # 4 bands × 8 bits: ham ≤ 3 ⇒ ≥1 identical band


def q_simhash_pairs(sf_dir: str) -> ray.data.Dataset:
    """SimHash NEAR-DUP PAIRING — completes the SimHash family beyond
    the bare sketch (``q_simhash``): all doc pairs within hamming
    distance ``SIMHASH_HAM`` of each other's 32-bit sketch, found
    WITHOUT an all-pairs scan via band bucketing (Charikar 2002 /
    Manku et al. 2007): split the sketch into ``SIMHASH_BANDS`` 8-bit
    bands — a pair differing in ≤3 bits leaves ≥1 band untouched
    (pigeonhole), so candidates are exactly the same-(band, bits)
    groups; each candidate is then popcount-verified, so false
    positives never survive and the oracle is plain SQL.

    Scale shape: the corpus collapses to 4 fixed-width band rows per
    doc; ONE keyed exchange on (band, bits) co-locates candidates;
    pair fan-out is O(g²) per bucket (hot-bucket bound shared with the
    exact-dup keeper group); a doc_a-keyed DISTINCT dedups pairs found
    in several bands. Popcount is a 16-bit LUT (numpy 1.26 has no
    bitwise_count — measured unavailable here)."""
    from ..util import (autoscaling_pool, cluster_cpus,
                        enable_hash_shuffle, keyed_partition_count)

    sketches = _read_docs(sf_dir).map_batches(
        SimHash, batch_format="pandas", batch_size=2048,
        concurrency=autoscaling_pool())

    def band_rows(df_: pd.DataFrame) -> pd.DataFrame:
        h = df_["simhash"].to_numpy(dtype=np.int64)
        n = len(df_)
        bands = np.repeat(np.arange(SIMHASH_BANDS, dtype=np.int64), n)
        hh = np.tile(h, SIMHASH_BANDS)
        return pd.DataFrame({
            "band": bands,
            "bits": (hh >> (8 * bands)) & 0xFF,
            "doc_id": np.tile(df_["doc_id"].to_numpy(), SIMHASH_BANDS),
            "simhash": hh,
        })

    _POP16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                      dtype=np.uint8)

    def hamming32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        x = (a ^ b).astype(np.uint64)
        return (_POP16[x & 0xFFFF] + _POP16[(x >> 16) & 0xFFFF]) \
            .astype(np.int64)

    def bucket_pairs(df_: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        if df_.empty:
            return empty
        sizes = df_.groupby(["band", "bits"], sort=False)["doc_id"] \
            .transform("size")
        df_ = df_[sizes >= 2]
        if df_.empty:
            return empty
        aa, bb, ha, hb = [], [], [], []
        for _, g in df_.groupby(["band", "bits"], sort=False):
            ids = g["doc_id"].to_numpy()
            hs = g["simhash"].to_numpy(dtype=np.int64)
            iu, ju = np.triu_indices(len(ids), k=1)
            lo = np.minimum(ids[iu], ids[ju])
            hi = np.maximum(ids[iu], ids[ju])
            aa.append(lo)
            bb.append(hi)
            ha.append(hs[iu])
            hb.append(hs[ju])
        ham = hamming32(np.concatenate(ha), np.concatenate(hb))
        out = pd.DataFrame({"doc_a": np.concatenate(aa),
                            "doc_b": np.concatenate(bb),
                            "hamming": ham})
        return out[out["hamming"] <= SIMHASH_HAM]

    rows = sketches.map_batches(band_rows, batch_format="pandas",
                                batch_size=4096)
    nparts = keyed_partition_count(_docs_count(sf_dir) * SIMHASH_BANDS * 28)
    enable_hash_shuffle(rows, nparts)
    cands = (rows.repartition(nparts, keys=["band", "bits"])
             .map_batches(bucket_pairs, batch_format="pandas",
                          batch_size=None))
    # a pair within ham ≤ 3 can match in up to 4 bands → DISTINCT,
    # exact after the doc_a-keyed repartition
    eparts = max(8, cluster_cpus())
    enable_hash_shuffle(cands, eparts)
    return (cands.repartition(eparts, keys=["doc_a"])
            .map_batches(lambda d: d.drop_duplicates(),
                         batch_format="pandas", batch_size=None))


# ------------------------------------------------------------ exact jaccard (oracle-scale)

JACCARD_N = 300          # doc_id < N pairs — bounded all-pairs for the oracle
JACCARD_TAU_MILLI = 300  # keep pairs with word-set Jaccard ≥ 0.3


def q_jaccard_pairs(sf_dir: str) -> "pd.DataFrame":
    """Exact word-set Jaccard over the bounded doc_id<N prefix: the
    ground-truth generator the probabilistic dedupers are tested
    against. All-pairs is deliberately NOT the scale path (that's
    minhash); N is fixed so the driver-side cost is constant."""
    # predicate pushdown: only the bounded prefix leaves storage
    docs = read_parquet_clean(
        _doc_files(sf_dir), columns=DOC_COLS,
        filter=pc.field("doc_id") < JACCARD_N,
    ).to_pandas()
    ids = docs["doc_id"].to_numpy()
    sets = [frozenset(t.split(" ")) for t in docs["text"]]
    out = []
    for i in range(len(ids)):
        si = sets[i]
        for j in range(i + 1, len(ids)):
            sj = sets[j]
            inter = len(si & sj)
            union = len(si) + len(sj) - inter
            jm = (1000 * inter) // union
            if jm >= JACCARD_TAU_MILLI:
                a, b = int(ids[i]), int(ids[j])
                if a > b:
                    a, b = b, a
                out.append((a, b, jm))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard_milli"]) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ------------------------------------------------------------ minhash + LSH

NUM_PERM = 64
BANDS = 16               # 16 bands × 4 rows
ROWS_PER_BAND = NUM_PERM // BANDS
MERSENNE = (1 << 61) - 1
SHINGLE_K = 3


def _perm_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Deterministic 61-bit hashes of word k-shingles (blake2b-based —
    stable across processes, unlike Python's hash())."""
    words = text.split(" ")
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                                "little") % MERSENNE
    return out


class MinHashBands:
    """Stage 1: doc → minhash signature → one row per band:
    (band_id, band_hash, doc_id). Emits BANDS× the input rows, but each
    row is 3 small integers — the groupby that follows shuffles only
    these, which is what makes MinHash-LSH viable at corpus scale."""

    def __init__(self, num_perm: int = NUM_PERM, bands: int = BANDS):
        self.a, self.b = _perm_params(num_perm)
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text)
        # (n_shingles, num_perm) universal hash, min over shingles
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = self.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows:(b + 1) * self.rows]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                doc_ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(h)
        # ARROW block out: the band-bucket groupby that follows is a
        # sort aggregate, ~20x slower over pandas blocks (measured)
        return pa.table({"doc_id": pa.array(doc_ids, type=pa.int64()),
                         "band_id": pa.array(band_ids, type=pa.int64()),
                         "band_hash": pa.array(band_hashes, type=pa.string())})


#: buckets up to this size emit all pairs; larger ones fall back to
#: star pairs (see bucket_pairs_from_ids)
MAX_FULL_BUCKET = 200

_LOG = logging.getLogger("swarm_ray.dedup")


def bucket_pairs_from_ids(ids, max_full: int = MAX_FULL_BUCKET):
    """Candidate pairs for one LSH band bucket → (pairs, is_mega).

    Buckets ≤ ``max_full`` members emit all pairs. A boilerplate-heavy
    corpus puts its WORST duplicates into mega-buckets, so those must
    not be dropped (VERDICT r1 finding 3) — but all-pairs would emit
    O(m²) rows for one bucket. Oversized buckets emit instead:

    * all pairs WITHIN consecutive ``max_full``-sized chunks of the
      sorted member list (every member still gets full enumeration
      against ``max_full`` peers), plus
    * STAR pairs from the bucket-min representative to every member
      outside its chunk (cross-chunk connectivity).

    Total O(m·max_full/2 + m) — linear in the bucket. Honest recall
    limit: a cross-chunk member-member near-dup pair is surfaced only
    transitively (both ends verify against the representative or a
    chunk peer); if neither end resembles the representative, that
    single pair is missed. Exact whole-bucket enumeration at any size
    is the quadratic cost this cap exists to avoid."""
    ids = sorted(ids)
    if len(ids) < 2:
        return [], False
    if len(ids) <= max_full:
        return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]], False
    rep = ids[0]
    pairs = [(rep, b) for b in ids[max_full:]]      # cross-chunk star
    for start in range(0, len(ids), max_full):
        chunk = ids[start:start + max_full]
        pairs.extend((a, b) for i, a in enumerate(chunk) for b in chunk[i + 1:])
    return pairs, True


_PAIRS_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _block_pairs(t: pa.Table) -> pa.Table:
    """Stage 2: candidate pairs for EVERY bucket in one hash-partitioned
    block, vectorized. A ``groupby.map_groups`` here measured 43 s of
    UDF time at sf0.1 — per-group Python slicing over ~80k
    mostly-singleton buckets — vs < 0.1 s for this: factorize the
    (band, hash) key once, count bucket sizes with ``np.bincount``,
    and run Python only over the (rare) buckets with ≥2 members."""
    if len(t) == 0:
        return _PAIRS_SCHEMA.empty_table()
    band = t["band_id"].to_numpy(zero_copy_only=False)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    key = pd.factorize(
        pd.Series(t["band_hash"].to_pandas()).str.cat(band.astype(str), sep="#")
    )[0]
    sizes = np.bincount(key)
    order = np.argsort(key, kind="stable")
    starts = np.concatenate([[0], np.cumsum(sizes)])
    out_a, out_b = [], []
    for k in np.flatnonzero(sizes >= 2):
        ids = doc[order[starts[k]:starts[k + 1]]]
        pairs, is_mega = bucket_pairs_from_ids(ids.tolist())
        if is_mega:
            _LOG.warning(
                "minhash LSH mega-bucket (size=%d): emitting %d star pairs "
                "instead of %d full pairs",
                len(ids), len(pairs), len(ids) * (len(ids) - 1) // 2)
        for a, b in pairs:
            out_a.append(a)
            out_b.append(b)
    if not out_a:
        return _PAIRS_SCHEMA.empty_table()
    return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                     "doc_b": pa.array(out_b, type=pa.int64())})


def minhash_candidate_pairs(sf_dir: str) -> ray.data.Dataset:
    from ..util import (autoscaling_pool, enable_hash_shuffle,
                        keyed_partition_count)
    bands = _read_docs(sf_dir).map_batches(
        MinHashBands, batch_format="pandas", batch_size=1024,
        concurrency=autoscaling_pool())
    # co-locate each (band, hash) bucket with a HASH repartition, then
    # generate pairs block-vectorized; batch_size=None is load-bearing
    # (one whole block per call, so buckets never straddle a batch).
    # Partition count sized to the band-triple bytes (~50 B × BANDS per
    # doc) as well as CPUs — see keyed_partition_count (ADVICE r2).
    n_bucket_parts = keyed_partition_count(_docs_count(sf_dir) * BANDS * 50)
    enable_hash_shuffle(bands, n_bucket_parts)
    bucketed = bands.repartition(n_bucket_parts,
                                 keys=["band_id", "band_hash"])
    pairs = bucketed.map_batches(_block_pairs, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)

    # same pair may collide in several bands — dedup by co-locating
    # each pair with one more keyed repartition, then a block-local
    # np.unique (sized to the cluster; a default groupby here spun 200
    # aggregate partitions for a few thousand rows)
    def block_unique(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _PAIRS_SCHEMA.empty_table()
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"doc_a": pa.array(u[:, 0]), "doc_b": pa.array(u[:, 1])})

    # pair volume is the candidate frontier (not derivable from footers
    # pre-execution); the CPU-floor count documents that bound — a
    # frontier big enough to overflow it would already have tripped the
    # verify stage onto the repartition path, which re-keys by doc
    return (pairs.repartition(keyed_partition_count(None, floor=4),
                              keys=["doc_a", "doc_b"])
            .map_batches(block_unique, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None))


class VerifyJaccard:
    """Stage-3 verifier actor: holds the broadcast (doc_id → sorted
    unique shingle hashes) dict; per candidate-pair batch computes the
    exact k-shingle Jaccard with ``np.intersect1d``."""

    def __init__(self, sets_ref):
        self.sets = ray.get(sets_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        jm = np.empty(len(a), dtype=np.int64)
        for i in range(len(a)):
            sa, sb = self.sets[a[i]], self.sets[b[i]]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            jm[i] = (1000 * inter) // (len(sa) + len(sb) - inter)
        out = pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b),
                        "jaccard_milli": pa.array(jm)})
        return out.filter(pc.greater_equal(out["jaccard_milli"],
                                           JACCARD_TAU_MILLI))


#: above this many candidate pairs, q_minhash_pairs("auto") switches
#: from the broadcast shingle dict to the two-round repartition join
#: (each candidate doc's shingle set is ~0.7 KB, so the broadcast dict
#: stays well under ~150 MB below this bound; a boilerplate-heavy
#: corpus blows past it and must never build a driver-side dict)
VERIFY_BROADCAST_MAX_PAIRS = 100_000

_VERIFIED_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                              ("jaccard_milli", pa.int64())])
_TAGGED_SCHEMA = pa.schema([("key", pa.int64()), ("other", pa.int64()),
                            ("shingles", pa.list_(pa.uint64())),
                            ("kind", pa.int8())])


def _shingle_sets_ds(sf_dir: str, need_arr: pa.Array) -> ray.data.Dataset:
    """(doc_id, sorted unique shingle hashes) for the candidate docs —
    a broadcast SEMI-JOIN on the (small, integer) id set; shingle sets
    are computed in parallel over corpus batches and never all leave a
    worker unless a caller collects them."""

    def shingles_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["doc_id"], value_set=need_arr))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sh = [np.unique(shingle_hashes(x)) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "shingles": pa.array([s.tolist() for s in sh],
                                              type=pa.list_(pa.uint64()))})

    return _read_docs(sf_dir).map_batches(
        shingles_batch, batch_format="pyarrow", zero_copy_batch=True)


def _verify_broadcast(cand_ds: ray.data.Dataset, sf_dir: str) -> pd.DataFrame:
    """Small-frontier verify: collect the candidate pairs, build the
    shingle-set dict on the driver, ``ray.put`` it once, and verify in
    an actor pool. Right when the frontier fits one machine; q_minhash
    _pairs("auto") bounds that by VERIFY_BROADCAST_MAX_PAIRS."""
    from ..util import autoscaling_pool
    cand = cand_ds.to_pandas()
    if cand.empty:
        return _VERIFIED_SCHEMA.empty_table().to_pandas()
    need = set(cand["doc_a"]) | set(cand["doc_b"])
    need_arr = pa.array(sorted(need), type=pa.int64())
    sets_df = _shingle_sets_ds(sf_dir, need_arr).to_pandas()
    sets = {int(r.doc_id): np.asarray(r.shingles, dtype=np.uint64)
            for r in sets_df.itertuples(index=False)}
    sets_ref = ray.put(sets)

    verified = (ray.data.from_arrow(
                    pa.Table.from_pandas(cand, preserve_index=False))
                .map_batches(VerifyJaccard, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=4096,
                             concurrency=autoscaling_pool(),
                             fn_constructor_kwargs={"sets_ref": sets_ref})
                .to_pandas())
    return verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _shingles_np(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets, flat values) view of the shingles column."""
    col = t["shingles"].combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False)
    vals = col.values.to_numpy(zero_copy_only=False)
    return offs, vals


def _gather_lists(offs: np.ndarray, vals: np.ndarray,
                  idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Gather list rows ``idx`` out of a (offsets, values) list layout →
    new (lengths, flat values)."""
    lens = (offs[idx + 1] - offs[idx]).astype(np.int64)
    out = np.empty(int(lens.sum()), dtype=vals.dtype)
    pos = 0
    for i, n in zip(idx, lens):
        out[pos:pos + n] = vals[offs[i]:offs[i] + n]
        pos += n
    return lens, out


def _join_round1(t: pa.Table) -> pa.Table:
    """Block-local half of repartition-join round 1: each block holds
    complete key groups (key = doc_a for pair rows, doc_id for shingle
    rows). Attach shingles_a to every pair and RE-KEY it by doc_b for
    round 2; pass shingle rows through unchanged (round 2 needs them
    under the same keys)."""
    if len(t) == 0:
        return _TAGGED_SCHEMA.empty_table()
    kind = t["kind"].to_numpy(zero_copy_only=False)
    key = t["key"].to_numpy(zero_copy_only=False)
    other = t["other"].to_numpy(zero_copy_only=False)
    offs, vals = _shingles_np(t)
    set_rows = np.flatnonzero(kind == 1)
    pair_rows = np.flatnonzero(kind == 0)
    # doc_a → its shingle row index, block-local (the repartition key
    # guarantees the pair's doc_a row is in THIS block)
    row_of = {int(key[i]): i for i in set_rows}
    src = np.fromiter((row_of[int(a)] for a in key[pair_rows]),
                      dtype=np.int64, count=len(pair_rows))
    lens, flat = _gather_lists(offs, vals, src)
    pair_offs = np.zeros(len(pair_rows) + 1, dtype=np.int32)
    np.cumsum(lens, out=pair_offs[1:])
    pairs_out = pa.table({
        "key": pa.array(other[pair_rows]),            # re-key by doc_b
        "other": pa.array(key[pair_rows]),            # carry doc_a
        "shingles": pa.ListArray.from_arrays(
            pa.array(pair_offs, type=pa.int32()),
            pa.array(flat, type=pa.uint64())),
        "kind": pa.array(np.zeros(len(pair_rows), dtype=np.int8)),
    }).cast(_TAGGED_SCHEMA)
    sets_out = t.take(pa.array(set_rows)).cast(_TAGGED_SCHEMA)
    return pa.concat_tables([pairs_out, sets_out])


def _join_round2(t: pa.Table) -> pa.Table:
    """Round 2: block holds pairs keyed by doc_b (carrying shingles_a)
    next to doc_b's shingle row; compute the exact k-shingle Jaccard
    block-locally and keep pairs ≥ the threshold."""
    if len(t) == 0:
        return _VERIFIED_SCHEMA.empty_table()
    kind = t["kind"].to_numpy(zero_copy_only=False)
    key = t["key"].to_numpy(zero_copy_only=False)
    other = t["other"].to_numpy(zero_copy_only=False)
    offs, vals = _shingles_np(t)
    set_rows = np.flatnonzero(kind == 1)
    pair_rows = np.flatnonzero(kind == 0)
    row_of = {int(key[i]): i for i in set_rows}
    out_a, out_b, out_j = [], [], []
    for i in pair_rows:
        sa = vals[offs[i]:offs[i + 1]]
        j = row_of[int(key[i])]
        sb = vals[offs[j]:offs[j + 1]]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        jm = (1000 * inter) // (len(sa) + len(sb) - inter)
        if jm >= JACCARD_TAU_MILLI:
            out_a.append(int(other[i]))
            out_b.append(int(key[i]))
            out_j.append(jm)
    return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                     "doc_b": pa.array(out_b, type=pa.int64()),
                     "jaccard_milli": pa.array(out_j, type=pa.int64())})


def _verify_repartition(cand_ds: ray.data.Dataset,
                        sf_dir: str) -> pd.DataFrame:
    """Large-frontier verify: the documented two-round repartition join
    on doc_id — NO driver-side shingle dict, no driver pair loop. Only
    the candidate DOC IDS (integers) touch the driver, for the corpus
    semi-join filter; pairs and shingle sets flow through two keyed
    hash repartitions, each verified block-locally. Pair rows carry
    shingles_a through the second exchange (~0.7 KB/pair) — the price
    of joining without a broadcast, linear in the candidate set."""
    from ..util import enable_hash_shuffle, keyed_partition_count

    # unique candidate doc ids: per-block unique → tiny driver union
    def block_ids(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["doc_a"].to_numpy(zero_copy_only=False),
            t["doc_b"].to_numpy(zero_copy_only=False)]))
        return pa.table({"doc_id": pa.array(u, type=pa.int64())})

    ids = (cand_ds.map_batches(block_ids, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas())
    if ids.empty:
        return _VERIFIED_SCHEMA.empty_table().to_pandas()
    need_arr = pa.array(np.unique(ids["doc_id"].to_numpy()), type=pa.int64())

    def tag_pairs(t: pa.Table) -> pa.Table:
        n = len(t)
        empty = pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32), type=pa.int32()),
            pa.array([], type=pa.uint64()))
        return pa.table({"key": t["doc_a"], "other": t["doc_b"],
                         "shingles": empty,
                         "kind": pa.array(np.zeros(n, dtype=np.int8)),
                         }).cast(_TAGGED_SCHEMA)

    def tag_sets(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["doc_id"],
                         "other": pa.array(np.zeros(len(t), dtype=np.int64)),
                         "shingles": t["shingles"],
                         "kind": pa.array(np.ones(len(t), dtype=np.int8)),
                         }).cast(_TAGGED_SCHEMA)

    sets_tagged = _shingle_sets_ds(sf_dir, need_arr).map_batches(
        tag_sets, batch_format="pyarrow", zero_copy_batch=True)
    pairs_tagged = cand_ds.map_batches(
        tag_pairs, batch_format="pyarrow", zero_copy_batch=True)

    # sized to the shingle payload each pair carries (~0.75 KB) so a
    # partition stays under the block-split threshold (ADVICE r2);
    # cand_ds is materialized by the caller, so count() is metadata
    n_parts = keyed_partition_count(cand_ds.count() * 750)
    merged = pairs_tagged.union(sets_tagged)
    enable_hash_shuffle(merged, n_parts)
    # round 1: co-locate each pair with doc_a's shingle set; batch_size
    # =None is load-bearing (one whole partition per call, so a key
    # group never straddles a batch — same invariant as _block_pairs)
    round1 = (merged.repartition(n_parts, keys=["key"])
              .map_batches(_join_round1, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None))
    # round 2: pairs are now keyed by doc_b, shingle rows ride along
    verified = (round1.repartition(n_parts, keys=["key"])
                .map_batches(_join_round2, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
                .to_pandas())
    return verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_minhash_pairs(sf_dir: str, verify_mode: str = "auto") -> pd.DataFrame:
    """Stage 3: exact-Jaccard verify of the LSH candidates, with the
    SAME similarity the LSH approximates (k-shingle Jaccard; the
    unigram variant lives in q_jaccard_pairs).

    Two verify plans, switched by the candidate-pair count
    (``verify_mode="auto"``, the default):

    * ``broadcast`` — the dedup frontier is small (the common case):
      shingle sets of candidate docs are computed in parallel,
      collected once, and ``ray.put`` broadcast to a verify actor pool.
    * ``repartition`` — adversarially large frontiers (boilerplate-
      heavy corpora, exactly the case mega-bucket handling exists for):
      a two-round repartition join on doc_id; nothing but integer doc
      ids ever materializes on the driver (VERDICT r2 finding 2).
    """
    cand_ds = minhash_candidate_pairs(sf_dir).materialize()
    if verify_mode == "auto":
        verify_mode = ("broadcast"
                       if cand_ds.count() <= VERIFY_BROADCAST_MAX_PAIRS
                       else "repartition")
    if verify_mode == "broadcast":
        return _verify_broadcast(cand_ds, sf_dir)
    if verify_mode == "repartition":
        return _verify_repartition(cand_ds, sf_dir)
    raise ValueError(f"unknown verify_mode: {verify_mode!r}")


def q_minhash_pairs_checked(sf_dir: str) -> pd.DataFrame:
    """Driver-facing ``doc_minhash_pairs``: same engine pipeline, plus
    it materializes the generator-side expected-pairs fixture so the
    DuckDB oracle (an independent single-process recompute of the whole
    LSH plan — ``fixtures.minhash_pairs_expected_dir``) has its table
    on disk. Deterministic given the published permutation seed, so the
    oracle compare is exact, not statistical."""
    from .. import fixtures
    fixtures.minhash_pairs_expected_dir(sf_dir)
    return q_minhash_pairs(sf_dir)


# ------------------------------------------------- sketch-error audit

def q_doc_minhash_est(sf_dir: str) -> pd.DataFrame:
    """MinHash SKETCH-ERROR audit — for every verified near-dup pair
    the LSH pipeline emits, the floor-milli Jaccard ESTIMATE from
    signature agreement (matching components / NUM_PERM, the standard
    MinHash estimator) next to the exact k-shingle Jaccard, plus the
    absolute error: the measurement run before trusting the sketch's
    similarity values downstream (threshold tuning, cluster weighting).
    Completes the audit family next to ``emb_pq_recall`` (lossy-ANN
    recall) with the lossy-DEDUP error twin.

    Scale shape: the pair frontier is LSH-bounded; signatures of only
    the involved docs are computed in one actor-pool pass over the
    id-filtered corpus scan (permutation params built once per actor),
    and the ≤ 2×#pairs signature rows (64 ints each) fold on the
    driver — the corpus itself never leaves the scan.

    Oracle: differential — ``fixtures.minhash_est_expected_dir``
    recomputes signatures with plain Python integer arithmetic over
    the expected-pairs fixture's topology; deterministic under the
    published permutation seed, so the compare is exact."""
    from ..util import autoscaling_pool

    pairs = q_minhash_pairs(sf_dir)
    cols = {"doc_a": "int64", "doc_b": "int64", "jaccard_milli": "int64",
            "est_milli": "int64", "err_milli": "int64"}
    if pairs.empty:
        return pd.DataFrame({c: pd.Series([], dtype=d)
                             for c, d in cols.items()})
    need = np.unique(np.concatenate([pairs["doc_a"].to_numpy(),
                                     pairs["doc_b"].to_numpy()]))
    need_arr = pa.array(need, type=pa.int64())

    class SigBatch:
        def __init__(self):
            self.mh = MinHashBands()

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t["doc_id"], value_set=need_arr))
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pa.table({
                    "doc_id": pa.array([], type=pa.int64()),
                    "sig": pa.array([], type=pa.list_(pa.int64()))})
            sigs = np.stack([self.mh.signature(x)
                             for x in t["text"].to_pylist()])
            return pa.table({
                "doc_id": pa.array(ids, type=pa.int64()),
                "sig": pa.array(sigs.astype(np.int64).tolist(),
                                type=pa.list_(pa.int64()))})

    sig_df = (_read_docs(sf_dir)
              .map_batches(SigBatch, batch_format="pyarrow",
                           zero_copy_batch=True,
                           concurrency=autoscaling_pool())
              .to_pandas())
    sig = {int(i): np.asarray(s, dtype=np.int64)
           for i, s in zip(sig_df["doc_id"], sig_df["sig"])}
    a_m = np.stack([sig[int(a)] for a in pairs["doc_a"]])
    b_m = np.stack([sig[int(b)] for b in pairs["doc_b"]])
    est = (1000 * (a_m == b_m).sum(axis=1)) // NUM_PERM
    exact = pairs["jaccard_milli"].to_numpy()
    return pd.DataFrame({
        "doc_a": pairs["doc_a"].to_numpy(),
        "doc_b": pairs["doc_b"].to_numpy(),
        "jaccard_milli": exact,
        "est_milli": est,
        "err_milli": np.abs(est - exact),
    }).sort_values(["doc_a", "doc_b"]).reset_index(drop=True).astype(cols)


def q_doc_minhash_est_checked(sf_dir: str) -> pd.DataFrame:
    """Driver-facing ``doc_minhash_est``: materializes the serial
    estimate fixture so the DuckDB oracle has its table."""
    from .. import fixtures
    fixtures.minhash_est_expected_dir(sf_dir)
    return q_doc_minhash_est(sf_dir)


# ------------------------------------------------------------ dup clusters

def union_find_clusters(pairs: pd.DataFrame) -> pd.DataFrame:
    """Driver-side union-find over an edge DataFrame — the small-N
    reference implementation the distributed version is tested against
    (and a fine choice when the edge set fits one machine)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((d, find(d)) for d in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"]) \
        .astype({"doc_id": "int64", "cluster_id": "int64"})


def _propagate_group(g: pa.Table) -> pa.Table:
    """Group = one node's label row (kind=1, aux=label) + its outgoing
    edges (kind=0, aux=dst). Offer the node's label to itself and to
    every neighbor."""
    kind = g["kind"].to_numpy(zero_copy_only=False)
    aux = g["aux"].to_numpy(zero_copy_only=False)
    lab = int(aux[kind == 1][0])
    nodes = np.concatenate([[g["key"][0].as_py()], aux[kind == 0]]).astype(np.int64)
    return pa.table({"node": pa.array(nodes, type=pa.int64()),
                     "label": pa.array(np.full(len(nodes), lab, dtype=np.int64))})


def _jump_group(g: pa.Table) -> pa.Table:
    """Group = one label value's OWN label row (kind=1, aux=its label)
    + the nodes currently pointing at it (kind=0, aux=node). Rewrites
    each pointer one hop up: label(n) ← label(label(n))."""
    kind = g["kind"].to_numpy(zero_copy_only=False)
    aux = g["aux"].to_numpy(zero_copy_only=False)
    p = int(aux[kind == 1][0])
    nodes = aux[kind == 0].astype(np.int64)
    return pa.table({"node": pa.array(nodes, type=pa.int64()),
                     "label": pa.array(np.full(len(nodes), p, dtype=np.int64))})


_NODE_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _block_label_lookup(t: pa.Table, missing_msg: str):
    """Shared blocks-mode kernel: kind=1 rows (key, aux=value) form a
    block-local lookup table; kind=0 rows resolve their key against it
    (one argsort + searchsorted, no per-group Python). Returns
    ``(k1, v1, aux0, looked_up)`` — the lookup rows as-is plus each
    kind=0 row's aux and resolved value. One implementation keeps the
    "every key has its lookup row in this hash partition" invariant
    (and its assert) in one place for both the propagate and the
    pointer-jump rounds."""
    kind = t["kind"].to_numpy(zero_copy_only=False)
    key = t["key"].to_numpy(zero_copy_only=False)
    aux = t["aux"].to_numpy(zero_copy_only=False)
    m1 = kind == 1
    m0 = ~m1
    k1, v1 = key[m1], aux[m1]
    order = np.argsort(k1)
    k1s, v1s = k1[order], v1[order]
    pos = np.searchsorted(k1s, key[m0])
    assert len(pos) == 0 or (k1s[pos] == key[m0]).all(), missing_msg
    return k1, v1, aux[m0], v1s[pos]


def _offer_block(t: pa.Table) -> pa.Table:
    """Blocks-mode propagate: one hash-partitioned block holds label
    rows (kind=1: key=node, aux=label) next to outgoing edges (kind=0:
    key=src, aux=dst) for every key in the block — each edge offers
    src's label to dst."""
    if len(t) == 0:
        return _NODE_LABEL_SCHEMA.empty_table()
    k1, v1, dst, src_label = _block_label_lookup(
        t, "edge src without a label row in its hash partition")
    return pa.table({
        "node": pa.array(np.concatenate([k1, dst]), type=pa.int64()),
        "label": pa.array(np.concatenate([v1, src_label]), type=pa.int64()),
    })


def _jump_block(t: pa.Table) -> pa.Table:
    """Blocks-mode pointer jump: kind=0 rows (key=label(n), aux=n)
    look up kind=1 rows (key=node, aux=label) block-locally —
    label(n) ← label(label(n)) in one vectorized lookup."""
    if len(t) == 0:
        return _NODE_LABEL_SCHEMA.empty_table()
    _, _, node, new_label = _block_label_lookup(
        t, "label value without its own label row in its hash partition")
    return pa.table({"node": pa.array(node, type=pa.int64()),
                     "label": pa.array(new_label, type=pa.int64())})


def _min_label_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _NODE_LABEL_SCHEMA.empty_table()
    return pa.TableGroupBy(t, ["node"]).aggregate([("label", "min")]) \
        .rename_columns(["node", "label"])


_EDGES_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _star_forest_block(df: pd.DataFrame) -> pd.DataFrame:
    """Contract-mode kernel: union-find over ONE block's edges, emit
    the STAR FOREST (node → min-of-local-component) — same components,
    ≤ one edge per distinct node. The union of per-block spanning
    forests preserves global connectivity, so levels can keep
    shrinking the edge set without ever resolving transitivity
    globally until the final single block."""
    if df.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    lab = union_find_clusters(df)
    return pd.DataFrame({"doc_a": lab["doc_id"], "doc_b": lab["cluster_id"]})


def _cc_contract(edges: ray.data.Dataset, n_parts: int) -> pd.DataFrame:
    """Spanning-forest contraction CC: per-block union-find → star
    forest, shrinking the partition count geometrically (fan-in 8), so
    the whole resolution is ~log8(n_parts) SINGLE keyed exchanges —
    versus 3 exchanges × O(log n) pointer-jumping rounds. The final
    level is one block whose star forest IS the exact component map
    (min-doc_id representative, byte-identical to union_find_clusters).

    Scale bound, stated: the final merge holds one row per distinct
    node in the dup frontier on one worker (~16 B/node — 10^8 nodes ≈
    1.6 GB). For frontiers beyond that, ``mode="blocks"`` (pointer
    jumping, never materializes more than a hash partition) remains
    the escape hatch; below it, contraction wins by an order of
    magnitude (see BASELINE.md §round-3)."""
    from ..util import enable_hash_shuffle
    enable_hash_shuffle(edges, n_parts)
    ds = edges
    n = n_parts
    while True:
        ds = (ds.repartition(n, keys=["doc_a"])
                .map_batches(_star_forest_block, batch_format="pandas",
                             batch_size=None)
                .materialize())
        if n == 1:
            break
        n = max(1, n // 8)
    out = ds.to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    out = out.rename(columns={"doc_a": "doc_id", "doc_b": "cluster_id"})
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "cluster_id": "int64"})


#: auto-mode switch: above this many distinct nodes in the edge set,
#: per-key map_groups Python (O(nodes) per round) loses to whole-block
#: vectorized rounds. Measured (32 CPUs, random graphs): at 5k nodes
#: blocks already wins 4.9x (54.8 s vs 269.8 s); at 300 nodes (the
#: sf0.01 dup frontier) groups wins ~4x (per-round fixed cost ~1.5 s
#: vs ~4 s for the 3 keyed repartitions). Extrapolated crossover
#: ~700-1000 nodes — see the mode docstring for the full curve.
CC_BLOCKS_MIN_NODES = 1_000


def connected_components(edges: ray.data.Dataset,
                         max_iters: int = 64,
                         mode: str = "auto") -> pd.DataFrame:
    """DISTRIBUTED connected components over an (doc_a, doc_b) edge
    Dataset: iterative min-label propagation plus pointer-jumping label
    compression (label ← label(label)) each round, so convergence is
    O(log n) rounds rather than O(component diameter). Labels are
    monotonically non-increasing; the fixpoint test is the (cheap)
    global label sum.

    The per-round joins are expressed as tagged-union GROUPBYS
    (repartition-join): label rows and edge rows union into one
    dataset keyed by the join column, and ``map_groups`` sees each
    key's label next to its edges. (Ray's native ``Dataset.join``
    rejects groupby-aggregate outputs as join inputs — empty untyped
    partitions — so the groupby form is both portable and one fewer
    exchange per round.) Every block stays ARROW: pandas blocks make
    Ray's sort aggregate ~20x slower (measured 27 s vs 1.3 s on the
    same 85k rows).

    THREE implementations behind the same interface, picked by
    ``mode="auto"`` on the DISTINCT NODE COUNT of the edge set (free
    metadata off the materialized initial labels):

    * ``"groups"`` — per-key ``map_groups`` rounds. Cheap per round
      (~1.5 s fixed at 32 CPUs: sort-aggregate, no repartition pool
      spin-up) but the UDF cost is O(nodes) Python per round — right
      for small dup frontiers (the sf0.01 cluster query, 300 nodes:
      ~6.4 s total vs ~43 s for the repartition shape).
    * ``"contract"`` — spanning-forest contraction (``_cc_contract``):
      per-block union-find emits a star forest, partition count
      shrinks geometrically, ~log8(parts) SINGLE keyed exchanges
      total instead of 3 exchanges × O(log n) rounds. The default for
      any non-tiny frontier; its one stated bound is the final merge
      block (one row per distinct node on one worker, ~16 B/node —
      fine to ~10^8 nodes).
    * ``"blocks"`` — keyed hash repartition + WHOLE-BLOCK vectorized
      pointer-jumping rounds (argsort + searchsorted label lookup per
      block, zero per-group Python). Node-count-independent UDF cost
      and never holds more than a hash partition anywhere — the
      escape hatch beyond contract's final-merge bound.

    Measured (32 CPUs, seeded random graphs, all modes pinned against
    union-find): 5k nodes/100k edges — groups 269.8 s, blocks 54.8 s;
    50k nodes/100k edges — groups exceeds a 600 s cap (one propagate
    round alone measured 149 s), blocks 169.1 s; 500k nodes/1M edges —
    both per-round modes exceed a 900 s cap (rounds × exchanges is the
    structural cost, not Python). Contract replaces rounds with a
    geometric fan-in — see BASELINE.md §round-3 for its numbers at the
    same sizes. Groups-mode per-round Python cost fits ~3.5 ms/node on
    top of its fixed cost, putting the groups↔distributed crossover
    near ~10^3 nodes (``CC_BLOCKS_MIN_NODES``).

    Scale shape: every round shuffles only (key, aux, kind) integer
    triples bounded by |edges| + |nodes| — the edge set, which for
    near-dup pairs is orders of magnitude smaller than the corpus; the
    corpus itself never enters this computation. The label table is
    materialized per round (bounded by #nodes ≤ 2·|edges|). Output:
    (doc_id, cluster_id = min doc_id in component) for every node
    with ≥1 edge.
    """
    from ray.data.aggregate import Min as _Min

    if mode not in ("auto", "groups", "blocks", "contract"):
        raise ValueError(f"unknown connected_components mode: {mode!r}")

    if mode == "contract":
        from ..util import cluster_cpus
        return _cc_contract(edges, max(8, cluster_cpus()))

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "cluster_id": pd.Series([], dtype="int64")})

    def sym_edges(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(np.concatenate([a, b])),
            "aux": pa.array(np.concatenate([b, a])),
            "kind": pa.array(np.zeros(2 * len(a), dtype=np.int8)),
        })

    # the edge table is re-read every round — materialize once
    edges_sym = edges.map_batches(sym_edges, batch_format="pyarrow").materialize()
    if edges_sym.count() == 0:
        return empty

    def as_label_rows(t: pa.Table, key_col: str, aux_col: str) -> pa.Table:
        return pa.table({
            "key": t[key_col].combine_chunks().cast(pa.int64()),
            "aux": t[aux_col].combine_chunks().cast(pa.int64()),
            "kind": pa.array(np.ones(len(t), dtype=np.int8)),
        })

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["key"], "label": t["key"]})

    labels = (edges_sym
              .map_batches(init_labels, batch_format="pyarrow")
              .groupby("node").aggregate(_Min("label", alias_name="label"))
              .materialize())

    if mode == "auto":
        # groups-mode per-round UDF cost is O(nodes) Python; the node
        # count is free metadata off the materialized initial labels.
        # Above the crossover, CONTRACT (geometric fan-in, no rounds)
        # is the measured winner — blocks stays the explicit escape
        # hatch for frontiers past contract's final-merge bound.
        if labels.count() >= CC_BLOCKS_MIN_NODES:
            from ..util import cluster_cpus
            return _cc_contract(edges, max(8, cluster_cpus()))
        mode = "groups"
    if mode == "blocks":
        from ..util import cluster_cpus, enable_hash_shuffle
        enable_hash_shuffle(edges_sym)
        n_parts = max(8, cluster_cpus())
    prev_sum = None
    for _ in range(max_iters):
        # propagate: node's label offered to itself + every neighbor
        lab_rows = labels.map_batches(
            lambda t: as_label_rows(t, "node", "label"), batch_format="pyarrow")
        # materialized: BOTH the jump queries and parents read `merged`,
        # and Ray re-executes un-materialized common sub-plans — without
        # this the round's dominant propagate shuffle runs twice
        if mode == "groups":
            merged = (edges_sym.union(lab_rows)
                      .groupby("key").map_groups(_propagate_group,
                                                 batch_format="pyarrow")
                      .groupby("node").aggregate(_Min("label", alias_name="label"))
                      .materialize())
        else:
            merged = (edges_sym.union(lab_rows)
                      .repartition(n_parts, keys=["key"])
                      .map_batches(_offer_block, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None)
                      .repartition(n_parts, keys=["node"])
                      .map_batches(_min_label_block, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None)
                      .materialize())
        # compress: label(node) ← label(label(node)) — pointer jumping.
        # kind=0 rows: (key=label, aux=node); kind=1: (key=node, aux=label)
        queries = merged.map_batches(
            lambda t: pa.table({
                "key": t["label"].combine_chunks().cast(pa.int64()),
                "aux": t["node"].combine_chunks().cast(pa.int64()),
                "kind": pa.array(np.zeros(len(t), dtype=np.int8))}),
            batch_format="pyarrow")
        parents = merged.map_batches(
            lambda t: as_label_rows(t, "node", "label"), batch_format="pyarrow")
        if mode == "groups":
            labels = (queries.union(parents)
                      .groupby("key").map_groups(_jump_group,
                                                 batch_format="pyarrow")
                      .materialize())
        else:
            labels = (queries.union(parents)
                      .repartition(n_parts, keys=["key"])
                      .map_batches(_jump_block, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None)
                      .materialize())
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    out = labels.to_pandas().rename(columns={"node": "doc_id",
                                             "label": "cluster_id"})
    if out.empty:
        return empty
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "cluster_id": "int64"})


def q_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate CLUSTER assignment: DISTRIBUTED connected
    components (``connected_components`` min-label rounds) over the
    verified Jaccard pair set; cluster_id = min doc_id in the
    component. Output is discrete ids — SQL-checked against a DuckDB
    recursive-CTE closure; the same components over MINHASH-verified
    pairs are pytest-pinned against union-find."""
    pairs = q_jaccard_pairs(sf_dir)
    if pairs.empty:
        return union_find_clusters(pairs)
    return connected_components(
        ray.data.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False)))


def q_dup_clusters_minhash(sf_dir: str) -> pd.DataFrame:
    """Cluster assignment over the MinHash-LSH verified pairs — the
    corpus-scale flow (LSH candidates → verify → distributed CC), not
    the bounded Jaccard prefix. Pytest-pinned vs union-find."""
    pairs = q_minhash_pairs(sf_dir)[["doc_a", "doc_b"]]
    if pairs.empty:
        return union_find_clusters(pairs)
    return connected_components(
        ray.data.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False)))


# ------------------------------------------------- end-to-end near-dup dedup

def q_dedup_near(sf_dir: str) -> ray.data.Dataset:
    """The END-TO-END near-dup dedup pass — what a curation pipeline
    actually ships: verified pair set → distributed connected
    components → keep each cluster's representative (min doc_id) →
    the kept corpus. Output: per-source kept/removed counts,
    SQL-checked against the recursive-CTE closure + anti-join oracle.

    Scale shape: the REMOVAL list (cluster members minus their
    representative) is bounded by the dup frontier, not the corpus —
    but it is still applied as a keyed repartition anti-join on doc_id
    (the ``q_dedup_incremental`` shape), never a driver broadcast set,
    so a boilerplate-heavy corpus with a huge dup fraction degrades to
    one more exchange instead of OOMing the driver."""
    import numpy as np

    from ray.data.aggregate import Sum as _Sum

    from ..util import enable_hash_shuffle, keyed_partition_count

    clusters = q_dup_clusters(sf_dir)
    removed_ids = clusters.loc[clusters["doc_id"] != clusters["cluster_id"],
                               "doc_id"].to_numpy(dtype=np.int64)
    removal = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(removed_ids, type=pa.int64()),
        "source": pa.array([""] * len(removed_ids), type=pa.string()),
        "is_removal": pa.array(np.ones(len(removed_ids), dtype=np.int8)),
    }))

    def tag(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "is_removal": pa.array(np.zeros(len(t), dtype=np.int8)),
        })

    corpus = read_parquet_clean(
        _doc_files(sf_dir), columns=["doc_id", "source"]
    ).map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    _OUT = pa.schema([("source", pa.string()), ("kept", pa.int64()),
                      ("removed", pa.int64())])

    def fold_block(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _OUT.empty_table().to_pandas()
        gone = set(df_.loc[df_["is_removal"] == 1, "doc_id"])
        docs = df_[df_["is_removal"] == 0]
        hit = docs["doc_id"].isin(gone)
        out = docs.assign(removed=hit.astype("int64"),
                          kept=(~hit).astype("int64"))
        return out.groupby("source", as_index=False)[["kept", "removed"]].sum()

    both = corpus.union(removal)
    n_parts = keyed_partition_count(_docs_count(sf_dir) * 24)
    enable_hash_shuffle(both, n_parts)
    return (both.repartition(n_parts, keys=["doc_id"])
            .map_batches(fold_block, batch_format="pandas", batch_size=None)
            .groupby("source")
            .aggregate(_Sum("kept", alias_name="kept"),
                       _Sum("removed", alias_name="removed")))


# ------------------------------------------------------------ incremental dedup

def q_dedup_incremental(sf_dir: str) -> ray.data.Dataset:
    """Dedup an INCOMING batch against an existing corpus — the
    standard "new crawl vs. what we already have" pass an ingest
    pipeline runs before admitting documents. Corpus membership is
    deterministic for the oracle: ``doc_id % 3 == 0`` plays the
    incoming batch, the rest the existing corpus. Output, per incoming
    doc: ``dup_of`` = min corpus doc_id sharing its content md5 (−1 if
    none — null coalesced to a sentinel so the compare is
    dtype-stable) and ``is_new`` 0/1.

    Scale shape: a hash anti-join, not a broadcast — the corpus side
    at 100 TB is billions of hashes, far too large for a driver set.
    Both sides' (doc_id, md5, side) triples flow through ONE keyed
    repartition on the hash; matching is block-local (corpus min per
    hash mapped onto the incoming rows). Only fixed-width triples
    move, never text. In production the corpus side reads its hash
    manifest instead of re-hashing (same plan from the second stage
    on)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.ids import md5_hex
    from ..util import enable_hash_shuffle, keyed_partition_count

    def hash_tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks()
        incoming = (ids.to_numpy(zero_copy_only=False) % 3 == 0)
        return pa.table({
            "doc_id": ids,
            "content_md5": md5_hex(t["text"]),
            "incoming": pa.array(incoming.astype(np.int8), type=pa.int8()),
        })

    _OUT = pa.schema([("doc_id", pa.int64()), ("dup_of", pa.int64()),
                      ("is_new", pa.int64())])

    def match_block(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _OUT.empty_table().to_pandas()
        prior = df_[df_["incoming"] == 0].groupby("content_md5")["doc_id"].min()
        inc = df_[df_["incoming"] == 1]
        dup_of = inc["content_md5"].map(prior).fillna(-1).astype("int64")
        return pd.DataFrame({
            "doc_id": inc["doc_id"].to_numpy(),
            "dup_of": dup_of.to_numpy(),
            "is_new": (dup_of.to_numpy() == -1).astype("int64"),
        })

    hashed = _read_docs(sf_dir).map_batches(
        hash_tag, batch_format="pyarrow", zero_copy_batch=True)
    n_parts = keyed_partition_count(_docs_count(sf_dir) * 57)
    enable_hash_shuffle(hashed, n_parts)
    return (hashed.repartition(n_parts, keys=["content_md5"])
            .map_batches(match_block, batch_format="pandas",
                         batch_size=None))


# --------------------------------------------- PageRank over the dup graph

PR_ITERS = 3
PR_SCALE = 1_000_000       # rank fixed-point scale
PR_DAMP_MILLI = 850        # damping 0.85 in milli units
PR_SHINGLE_PREFIXES = ("0", "1")   # 1/8 shingle sample forms the keys


def q_doc_pagerank(sf_dir: str) -> ray.data.Dataset:
    """Fixed-point PageRank over the duplicate-similarity graph —
    the iterative WEIGHTED propagation family beyond connected
    components (CC says "which docs are related", PageRank says "which
    doc is the hub of its duplication neighborhood" — the canonical
    pick for cluster representatives / takedown priority). Nodes are
    docs sharing a min-shingle fingerprint with ≥1 other doc; edges
    are within-fingerprint pairs (both directions).

    Integer-exact recurrence (all floor divisions, so DuckDB unrolls
    the same three iterations bit-for-bit):

        share_t(u) = r_t(u) // deg(u)
        r_{t+1}(v) = (1000−850)·SCALE//1000
                     + (850 · Σ_{u∼v} share_t(u)) // 1000,  r_0 = SCALE

    Collision keys are a deterministic 1/8 SAMPLE of each doc's word
    5-gram md5s (first hex digit ∈ {0, 1}) — NOT the single min
    fingerprint: a single-key graph is a union of disjoint cliques,
    which are regular, and PageRank on a regular component is the
    constant vector (measured exactly that on two drafts: min-only and
    min+max both came out every-node-1.000000 at sf0.01; the sampled
    keys measure deg 1–2, non-regular). The same pair can collide on
    several sampled shingles, so edges are DISTINCT'd (s-keyed,
    block-local = globally exact after the s-repartition). Docs
    shorter than one shingle carry no keys.

    Scale shape: the graph is bounded by the DUP FRONTIER (docs whose
    fingerprint collides), never the corpus — fingerprint keys ride
    one keyed exchange, edges/degrees materialize frontier-sized, and
    each iteration is TWO keyed repartitions with block-local merges
    (the union-tag co-partition shape used by every anti-join here):
    shares spread along edges co-partitioned on source, contributions
    fold and re-meet deg co-partitioned on target. No ``Dataset.join``
    in the loop — the Ray hash-join finalizer intermittently raised
    ArrowInvalid on the tiny frontier-sized right side under load
    (empty hash partitions present a schema-less table to the acero
    join), and the repartition+merge path has no such finalize step.
    The per-key pair fan-out is O(g²) for a hot key — same bound as
    the exact-dup keeper group; group iteration is a Python loop over
    COLLIDING groups only (frontier-rare). Reference analogue: none
    (swarm has no graph ops) — north-star addition; recipe follows
    Page et al. 1999 with integer clocks."""
    from .agg import grouped_count
    from ..util import cluster_cpus, enable_hash_shuffle

    edges = _dup_edges(sf_dir)
    deg = grouped_count(edges, ["s"], alias="deg").materialize()

    base = (1000 - PR_DAMP_MILLI) * PR_SCALE // 1000
    n_parts = max(8, cluster_cpus())

    def init_rank(t: pa.Table) -> pa.Table:
        return t.append_column(
            "r", pa.array(np.full(t.num_rows, PR_SCALE, dtype=np.int64)))

    ranks = deg.map_batches(init_rank, batch_format="pyarrow",
                            zero_copy_batch=True)

    def share_tag(t: pa.Table) -> pa.Table:
        # dim rows: t = -1 marks "this is node s's share", never an edge
        return pa.table({
            "s": t["s"],
            "t": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
            "share": pa.array(t["r"].to_numpy(zero_copy_only=False)
                              // t["deg"].to_numpy(zero_copy_only=False)),
        })

    def edge_tag(t: pa.Table) -> pa.Table:
        return pa.table({
            "s": pc.cast(t["s"], pa.int64()),
            "t": pc.cast(t["t"], pa.int64()),
            "share": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        })

    _SPREAD = pa.schema([("t", pa.int64()), ("csum", pa.int64()),
                         ("deg", pa.int64())])

    def spread(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _SPREAD.empty_table().to_pandas()
        dim = df_[df_["t"] < 0]
        m = dict(zip(dim["s"].to_numpy(), dim["share"].to_numpy()))
        fact = df_[df_["t"] >= 0]
        out = fact.assign(csum=fact["s"].map(m)) \
            .groupby("t", as_index=False)["csum"].sum()
        out["deg"] = np.int64(-1)  # fact marker for the target merge
        return out.astype({"t": "int64", "csum": "int64", "deg": "int64"})

    def deg_tag(t: pa.Table) -> pa.Table:
        return pa.table({
            "t": t["s"],
            "csum": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "deg": pc.cast(t["deg"], pa.int64()),
        })

    _RANK = pa.schema([("s", pa.int64()), ("deg", pa.int64()),
                       ("r", pa.int64())])

    def step(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _RANK.empty_table().to_pandas()
        dim = df_[df_["deg"] >= 0]
        cs = df_[df_["deg"] < 0].groupby("t")["csum"].sum()
        dim = dim[dim["t"].isin(cs.index)]  # inner-join semantics
        r = base + (PR_DAMP_MILLI * cs.loc[dim["t"]].to_numpy()) // 1000
        return pd.DataFrame({"s": dim["t"].to_numpy(),
                             "deg": dim["deg"].to_numpy(),
                             "r": r}).astype(
            {"s": "int64", "deg": "int64", "r": "int64"})

    edges_tagged = edges.map_batches(edge_tag, batch_format="pyarrow",
                                     zero_copy_batch=True)
    deg_tagged = deg.map_batches(deg_tag, batch_format="pyarrow",
                                 zero_copy_batch=True)
    for _ in range(PR_ITERS):
        shares = ranks.map_batches(share_tag, batch_format="pyarrow",
                                   zero_copy_batch=True)
        both_s = edges_tagged.union(shares)
        enable_hash_shuffle(both_s, n_parts)
        contrib = (both_s.repartition(n_parts, keys=["s"])
                   .map_batches(spread, batch_format="pandas",
                                batch_size=None))
        both_t = contrib.union(deg_tagged)
        enable_hash_shuffle(both_t, n_parts)
        ranks = (both_t.repartition(n_parts, keys=["t"])
                 .map_batches(step, batch_format="pandas",
                              batch_size=None)).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"doc_id": t["s"], "deg": t["deg"],
                            "rank_e6": t["r"]}),
        batch_format="pyarrow", zero_copy_batch=True)


def q_doc_dup_triangles(sf_dir: str) -> ray.data.Dataset:
    """Per-doc TRIANGLE counts over the duplicate-similarity graph —
    the local-clustering diagnostic that separates genuine dup
    CLUSTERS (triangle-dense: boilerplate families, mirror sets) from
    chance pairwise collisions (triangle-free): the standard next
    question after PageRank's "who is the hub". A doc's count is the
    number of closed wedges at that apex, which equals its triangle
    memberships exactly.

    Scale shape: reuses the frontier-bounded ``_dup_edges`` substrate;
    wedges are generated block-locally after the edges' existing
    s-keyed partitioning (per-node O(deg²) fan-out — the same
    documented bound as the pair fan-out that built the edges), and
    closure is tested against a BROADCAST set of the undirected edges
    (frontier-bounded, the doc_source_overlap cluster-map recipe; an
    outgrown frontier switches to the two-round repartition-join
    verify exactly as q_minhash_pairs does). One keyed exchange, one
    broadcast, one bounded partial-sum fold."""
    import pandas as pd

    from .agg import grouped_sum
    from ..util import cluster_cpus, enable_hash_shuffle

    edges = _dup_edges(sf_dir)
    und = edges.map_batches(
        lambda t: t.filter(pc.less(t["s"], t["t"])),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    eset = set(zip(und["s"].tolist(), und["t"].tolist()))
    eref = ray.put(eset)

    class WedgeClose:
        def __init__(self, eref):
            self.eset = ray.get(eref)

        def __call__(self, df_: pd.DataFrame) -> pa.Table:
            rows = []
            for apex, g in df_.groupby("s", sort=False):
                nb = np.unique(g["t"].to_numpy())
                if len(nb) < 2:
                    continue
                n = 0
                for i in range(len(nb) - 1):
                    for j in range(i + 1, len(nb)):
                        if (int(nb[i]), int(nb[j])) in self.eset:
                            n += 1
                if n:
                    rows.append((int(apex), n))
            # ARROW block out (see shingle_keys): pandas through the
            # groupby shuffle trips the schema-dedup hash warning
            return pa.table({
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "tri": pa.array([r[1] for r in rows], type=pa.int64())})

    eparts = max(8, cluster_cpus())
    enable_hash_shuffle(edges, eparts)
    from ..util import autoscaling_pool
    parts = (edges.repartition(eparts, keys=["s"])
             .map_batches(WedgeClose, batch_format="pandas",
                          batch_size=None,
                          concurrency=autoscaling_pool(),
                          fn_constructor_kwargs={"eref": eref}))
    return grouped_sum(parts, ["doc_id"], "tri", alias="tri")


def _dup_edges(sf_dir: str) -> ray.data.Dataset:
    """Directed distinct edge set (s, t) of the duplicate-similarity
    graph — the shared substrate of the graph-analytics family
    (``q_doc_pagerank``, ``q_doc_dup_triangles``). See the PageRank
    docstring for why the collision keys are a 1/8 shingle SAMPLE and
    for the frontier/skew bounds; this helper is that op's edge
    pipeline moved verbatim (keys → one keyed exchange → within-key
    pair fan-out → s-keyed block-local DISTINCT), materialized
    frontier-sized."""
    import hashlib

    import pandas as pd

    from ..util import (cluster_cpus, enable_hash_shuffle,
                        keyed_partition_count)

    docs = read_parquet_clean(_doc_files(sf_dir), columns=["doc_id", "text"])

    def shingle_keys(batch: pd.DataFrame) -> pd.DataFrame:
        md5, K = hashlib.md5, 5

        def keys(text: str) -> list:
            w = text.split(" ")
            if len(w) < K:
                return []
            return sorted({
                h for i in range(len(w) - K + 1)
                if (h := md5(" ".join(w[i:i + K]).encode()).hexdigest())[0]
                in PR_SHINGLE_PREFIXES})

        ks = batch["text"].map(keys)
        n = ks.str.len().to_numpy(dtype=np.int64)
        # ARROW block out: pandas blocks through the keyed hash shuffle
        # trip Ray's schema-dedup hash ("unhashable type: 'dict'") once
        # per aggregator task — the same log-noise class the r4 fixture
        # fix removed from the bench tail (measured here too)
        if n.sum() == 0:
            return pa.table({"key": pa.array([], type=pa.string()),
                             "doc_id": pa.array([], type=pa.int64())})
        return pa.table({
            "key": pa.array(np.concatenate(
                [np.asarray(x, dtype=object) for x in ks if x]),
                type=pa.string()),
            "doc_id": pa.array(
                np.repeat(batch["doc_id"].to_numpy(), n), type=pa.int64()),
        })

    fps = docs.map_batches(shingle_keys, batch_format="pandas",
                           batch_size=4096)
    # ~54/8 sampled shingles per doc × ~44 B per (md5-hex, id) row
    nparts = keyed_partition_count(_docs_count(sf_dir) * 7 * 44)
    enable_hash_shuffle(fps, nparts)

    def block_edges(df_: pd.DataFrame) -> pa.Table:
        empty = pa.table({"s": pa.array([], type=pa.int64()),
                          "t": pa.array([], type=pa.int64())})
        if df_.empty:
            return empty
        sizes = df_.groupby("key", sort=False)["doc_id"].transform("size")
        df_ = df_[sizes >= 2]
        if df_.empty:
            return empty
        ss, ts = [], []
        for _, g in df_.groupby("key", sort=False):
            ids = g["doc_id"].to_numpy()
            a = np.repeat(ids, len(ids))
            b = np.tile(ids, len(ids))
            m = a != b
            ss.append(a[m])
            ts.append(b[m])
        return pa.table({"s": pa.array(np.concatenate(ss), type=pa.int64()),
                         "t": pa.array(np.concatenate(ts), type=pa.int64())})

    raw = (fps.repartition(nparts, keys=["key"])
           .map_batches(block_edges, batch_format="pandas",
                        batch_size=None))
    # frontier-bounded: materializing edges/degrees pins only the dup
    # frontier, never the corpus. The s-keyed repartition makes the
    # block-local DISTINCT globally exact (a pair emitted by both the
    # min- and max-key groups lands in one block).
    eparts = max(8, cluster_cpus())
    enable_hash_shuffle(raw, eparts)

    def distinct_block(d: pd.DataFrame) -> pa.Table:
        d = d.drop_duplicates()
        return pa.table({"s": pa.array(d["s"].to_numpy(), type=pa.int64()),
                         "t": pa.array(d["t"].to_numpy(), type=pa.int64())})

    return (raw.repartition(eparts, keys=["s"])
            .map_batches(distinct_block, batch_format="pandas",
                         batch_size=None)
            .materialize())
