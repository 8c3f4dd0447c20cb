"""Substring-level (span) dedup + cross-source contamination ops.

Document-LEVEL dedup (ops/dedup.py) misses the dominant duplication
mode of web corpora: long spans repeated across otherwise-distinct
documents (boilerplate, licenses, quoted passages). The published
remedy is substring dedup over fixed-width windows (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — suffix
arrays there; the scalable shuffle form used here is the hashed
fixed-width-window variant). Reference analogue: swarm has no span
ops — this family comes from the LLM-data brief, sitting beside the
rule engine the way swarm's enrichment sits beside its parser
(pkg/usecase/load.go:271-281 is the pluggable surface).

Ops (all over the ``documents`` table, all SQL-checked):

* ``q_doc_dup_spans``     — per-doc duplicated-span coverage stats
* ``q_doc_dedup_spans``   — the REWRITE pass: covered words removed
* ``q_doc_source_overlap``— cross-source shared-shingle matrix (the
                            train/test leakage audit between sources)
* ``q_doc_split_leakfree``— cluster-aware train/eval split: every
                            near-dup cluster lands whole in one split

Scale shape shared by the family: documents never ride a shuffle
except in the rewrite op (where the output IS the corpus, so one
corpus-sized keyed exchange is inherent — same as the oracle's own
join). Everything else moves fixed-width (hash, id, pos) triples
through keyed repartitions sized by ``keyed_partition_count``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import _doc_files, _docs_count
from ..util import read_parquet_clean

#: span window width in WORDS. Lee et al. use 50 BPE tokens; the
#: synthetic corpus' docs are 20-100 words, so 8 keeps test signal
#: while the machinery is width-agnostic.
SPAN_W = 8
#: a shingle is "duplicated" when it appears in >= this many DISTINCT
#: documents.
SPAN_MIN_DOCS = 2
#: avg shingles/doc x bytes per (md5-hex, id, pos, n) shuffle row —
#: sizes the keyed partition counts below.
_SHINGLE_ROW_BYTES = 60 * 56


def _explode_shingles(t: pa.Table, cols: dict[str, bool]) -> pa.Table:
    """Vectorized fixed-width shingle exploder: one output row per
    ``SPAN_W``-word window of each doc — (g = md5 of the joined
    window) plus any of doc_id / pos / n_words / source the caller
    asks for. The window join is ONE take-index gather + ListArray +
    ``binary_join`` (the q_doc_chunks recipe, ops/text.py) — no
    Python per doc or per window."""
    from ..stages.ids import md5_hex

    W = SPAN_W
    words = pc.split_pattern(t["text"].combine_chunks(), pattern=" ")
    flat = words.values
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.diff(off)
    k = np.maximum(n - W + 1, 0)                    # shingles per doc
    doc_of_sh = np.repeat(np.arange(len(t), dtype=np.int64), k)
    pos = np.arange(int(k.sum()), dtype=np.int64) - \
        np.repeat(np.cumsum(k) - k, k)              # 0-based window start
    starts = off[doc_of_sh] + pos
    take_idx = (np.arange(int(k.sum()) * W, dtype=np.int64)
                - np.repeat(np.arange(int(k.sum()), dtype=np.int64) * W, W)
                + np.repeat(starts, W))
    taken = flat.take(pa.array(take_idx))
    windows = pa.ListArray.from_arrays(
        pa.array(np.arange(int(k.sum()) + 1, dtype=np.int64) * W,
                 type=pa.int32()), taken)
    out: dict[str, pa.Array] = {
        "g": md5_hex(pc.binary_join(windows, pa.scalar(" ")))}
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    if cols.get("doc_id"):
        out["doc_id"] = pa.array(ids[doc_of_sh], type=pa.int64())
    if cols.get("pos"):
        # 1-based to match the oracle's UNNEST(range(1, ...)) positions
        out["pos"] = pa.array(pos + 1, type=pa.int64())
    if cols.get("n_words"):
        out["n_words"] = pa.array(n[doc_of_sh], type=pa.int64())
    if cols.get("source"):
        src = t["source"].combine_chunks()
        out["source"] = src.take(pa.array(doc_of_sh))
    return pa.table(out)


def _mark_duplicated(t: pa.Table) -> pa.Table:
    """Block-local (one whole g-partition per call): keep only rows
    whose shingle appears in >= SPAN_MIN_DOCS distinct docs, then drop
    the hash column — downstream only needs (doc_id, pos[, n_words]).
    Distinct-doc counting is two factorizations + one np.unique over
    packed pair codes (no pandas groupby / Python rows)."""
    keep_cols = [c for c in t.column_names if c != "g"]
    if len(t) == 0:
        return t.select(keep_cols)
    g_codes = pc.dictionary_encode(t["g"].combine_chunks()) \
        .indices.to_numpy(zero_copy_only=False).astype(np.int64)
    d_codes = pc.dictionary_encode(
        t["doc_id"].combine_chunks().cast(pa.string())) \
        .indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = int(d_codes.max()) + 1
    pair = np.unique(g_codes * n_docs + d_codes)
    docs_per_g = np.bincount(pair // n_docs,
                             minlength=int(g_codes.max()) + 1)
    mask = docs_per_g[g_codes] >= SPAN_MIN_DOCS
    return t.filter(pa.array(mask)).select(keep_cols)


def _covered_rows(sf_dir: str, carry_n: bool) -> ray.data.Dataset:
    """Shared front half: (doc_id, pos[, n_words]) rows of every
    duplicated-shingle occurrence. One keyed exchange on the shingle
    hash; only fixed-width triples move."""
    from ..util import enable_hash_shuffle, keyed_partition_count

    cols = ["doc_id", "text"]
    want = {"doc_id": True, "pos": True, "n_words": carry_n}
    sh = read_parquet_clean(_doc_files(sf_dir), columns=cols) \
        .map_batches(lambda t: _explode_shingles(t, want),
                     batch_format="pyarrow", zero_copy_batch=True)
    n_parts = keyed_partition_count(_docs_count(sf_dir) * _SHINGLE_ROW_BYTES)
    enable_hash_shuffle(sh, n_parts)
    return (sh.repartition(n_parts, keys=["g"])
            .map_batches(_mark_duplicated, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None))


def q_doc_dup_spans(sf_dir: str) -> ray.data.Dataset:
    """Per-doc duplicated-span coverage: for every doc containing at
    least one shingle that also appears in another doc, the count of
    word positions covered by such shingles and the floor-milli
    coverage fraction. This is the AUDIT pass a curation pipeline runs
    before deciding to cut spans (the Lee-et-al measurement step).

    Output: (doc_id, n_words, covered_words, covered_milli) — only
    covered docs, so no corpus-side join is needed and the result is
    bounded by the dup frontier.

    Scale: two keyed exchanges of fixed-width triples (shingle-hash,
    then doc_id); coverage union is one np.unique over packed
    (doc, position) codes per block."""
    from ..util import enable_hash_shuffle, keyed_partition_count

    _OUT = pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64()),
                      ("covered_words", pa.int64()),
                      ("covered_milli", pa.int64())])

    def coverage(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        nw = t["n_words"].to_numpy(zero_copy_only=False)
        d_codes, uniq_ids = pd.factorize(ids)
        # explode each window to its SPAN_W positions, then distinct
        # (doc, position) via one unique over packed codes
        p = (np.repeat(pos, SPAN_W)
             + np.tile(np.arange(SPAN_W, dtype=np.int64), len(t)))
        keys = np.unique(np.repeat(d_codes.astype(np.int64), SPAN_W)
                         * (int(nw.max()) + SPAN_W + 1) + p)
        covered = np.bincount(keys // (int(nw.max()) + SPAN_W + 1),
                              minlength=len(uniq_ids)).astype(np.int64)
        first = np.zeros(len(uniq_ids), dtype=np.int64)
        first[d_codes[::-1]] = np.arange(len(t))[::-1]   # first row per doc
        n_doc = nw[first]
        return pa.table({
            "doc_id": pa.array(uniq_ids, type=pa.int64()),
            "n_words": pa.array(n_doc, type=pa.int64()),
            "covered_words": pa.array(covered, type=pa.int64()),
            "covered_milli": pa.array((1000 * covered) // n_doc,
                                      type=pa.int64()),
        })

    rows = _covered_rows(sf_dir, carry_n=True)
    n_parts = keyed_partition_count()     # frontier-bounded input
    enable_hash_shuffle(rows, n_parts)
    return (rows.repartition(n_parts, keys=["doc_id"])
            .map_batches(coverage, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None))


def q_doc_dedup_spans(sf_dir: str) -> ray.data.Dataset:
    """The span-REMOVAL rewrite: every word position covered by a
    duplicated shingle is cut, and the surviving words are re-joined —
    the actual corpus transform of substring dedup (Lee et al. 2022
    §4: cut the repeated span, keep the remainder).

    Output: (doc_id, n_kept, kept_md5) for docs with >= 1 surviving
    word (a fully-covered doc is exactly what this pass deletes). The
    md5 stands in for the rewritten text so the oracle compare stays
    compact while pinning content bit-for-bit (the q_doc_chunks
    convention).

    Scale: the corpus itself must ride ONE keyed exchange here — the
    output is a rewritten corpus, so that movement is inherent (the
    SQL oracle does the same join). Covered positions are unioned with
    the tagged corpus and co-partitioned by doc_id; the rewrite is one
    arrow-split + boolean-mask gather per block."""
    from ..util import enable_hash_shuffle, keyed_partition_count

    covered = _covered_rows(sf_dir, carry_n=False).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"], "pos": t["pos"],
            "text": pa.nulls(len(t), pa.string()).fill_null(""),
            "is_cov": pa.array(np.ones(len(t), dtype=np.int8))}),
        batch_format="pyarrow", zero_copy_batch=True)

    corpus = read_parquet_clean(
        _doc_files(sf_dir), columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "pos": pa.nulls(len(t), pa.int64()).fill_null(0),
            "text": t["text"],
            "is_cov": pa.array(np.zeros(len(t), dtype=np.int8))}),
        batch_format="pyarrow", zero_copy_batch=True)

    _OUT = pa.schema([("doc_id", pa.int64()), ("n_kept", pa.int64()),
                      ("kept_md5", pa.string())])

    def rewrite(t: pa.Table) -> pa.Table:
        from ..stages.ids import md5_hex
        if len(t) == 0:
            return _OUT.empty_table()
        is_cov = t["is_cov"].to_numpy(zero_copy_only=False)
        docs = t.filter(pa.array(is_cov == 0))
        covs = t.filter(pa.array(is_cov == 1))
        words = pc.split_pattern(docs["text"].combine_chunks(),
                                 pattern=" ")
        off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.diff(off)
        keep = np.ones(int(off[-1]) - int(off[0]), dtype=bool)
        base = off - off[0]
        if len(covs) > 0:
            doc_ids = docs["doc_id"].to_numpy(zero_copy_only=False)
            order = np.argsort(doc_ids, kind="stable")
            row_of = order[np.searchsorted(doc_ids[order],
                                           covs["doc_id"].to_numpy(
                                               zero_copy_only=False))]
            # window start (1-based) -> flat word indices of the span
            p0 = base[row_of] + covs["pos"].to_numpy(
                zero_copy_only=False) - 1
            cut = (np.repeat(p0, SPAN_W)
                   + np.tile(np.arange(SPAN_W, dtype=np.int64), len(covs)))
            keep[cut] = False
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), base[:-1]) \
            if len(docs) else np.zeros(0, dtype=np.int64)
        kept_per_doc = np.where(n == 0, 0, kept_per_doc)
        flat_kept = words.values.take(
            pa.array(np.nonzero(keep)[0] + off[0]))
        new_off = np.concatenate([[0], np.cumsum(kept_per_doc)])
        kept_lists = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()), flat_kept)
        texts = pc.binary_join(kept_lists, pa.scalar(" "))
        alive = kept_per_doc >= 1
        out = pa.table({
            "doc_id": docs["doc_id"],
            "n_kept": pa.array(kept_per_doc, type=pa.int64()),
            "kept_md5": md5_hex(texts),
        })
        return out.filter(pa.array(alive))

    both = corpus.union(covered)
    n_parts = keyed_partition_count(_docs_count(sf_dir) * 500)
    enable_hash_shuffle(both, n_parts)
    return (both.repartition(n_parts, keys=["doc_id"])
            .map_batches(rewrite, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None))


def q_doc_source_overlap(sf_dir: str) -> ray.data.Dataset:
    """Cross-source contamination matrix: for every pair of sources,
    the number of distinct shingles appearing in BOTH — the audit that
    catches train/test leakage between supposedly-independent slices
    of a corpus (the DataComp/Dolma decontamination matrix, applied
    source-to-source instead of corpus-to-benchmark).

    Output: (source_a, source_b, shared_shingles), source_a < source_b.

    Scale: (hash, source) pairs — deduped per batch before the
    shuffle — through one keyed exchange on the hash; pair expansion
    is per-distinct-k vectorized (k = sources sharing a shingle,
    bounded by #sources, never by corpus); the final (src, src) count
    is a key-space-bounded groupby."""
    from ..util import enable_hash_shuffle, keyed_partition_count
    from .agg import grouped_count

    def explode(t: pa.Table) -> pa.Table:
        sh = _explode_shingles(t, {"source": True})
        # batch-local distinct (g, source) to shrink the shuffle
        g_codes = pc.dictionary_encode(sh["g"].combine_chunks())
        s_enc = pc.dictionary_encode(sh["source"].combine_chunks())
        gi = g_codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        si = s_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ns = len(s_enc.dictionary)
        uniq = np.unique(gi * ns + si)
        return pa.table({
            "g": g_codes.dictionary.take(pa.array(uniq // ns)),
            "source": s_enc.dictionary.take(pa.array(uniq % ns)),
        })

    _OUT = pa.schema([("source_a", pa.string()), ("source_b", pa.string()),
                      ("n", pa.int64())])

    def pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        g_codes = pc.dictionary_encode(t["g"].combine_chunks()) \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        s_enc = pc.dictionary_encode(t["source"].combine_chunks())
        si = s_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ns = len(s_enc.dictionary)
        # distinct (g, source) across the whole partition, sources
        # sorted within g by dictionary order
        srcs = np.asarray(s_enc.dictionary.to_pylist())
        s_order = np.argsort(srcs, kind="stable")
        s_rank = np.empty(ns, dtype=np.int64)
        s_rank[s_order] = np.arange(ns)
        uniq = np.unique(g_codes * ns + s_rank[si])
        gs, sr = uniq // ns, uniq % ns
        multi = np.isin(gs, np.nonzero(np.bincount(gs) >= 2)[0])
        gs, sr = gs[multi], sr[multi]
        if len(gs) == 0:
            return _OUT.empty_table()
        # per-distinct-k vectorized pair expansion: reshape the sorted
        # members of all k-sized groups to (n_k, k), gather the
        # precomputed i<j index pairs — the loop is over DISTINCT k
        # values (<= #sources), never over groups or rows
        out_a, out_b = [], []
        sizes = np.bincount(gs)[np.unique(gs)]
        group_start = np.concatenate([[0], np.cumsum(sizes)])
        for kk in np.unique(sizes):
            sel = np.nonzero(sizes == kk)[0]
            idx = (group_start[sel][:, None]
                   + np.arange(kk)[None, :]).ravel()
            mat = sr[idx].reshape(len(sel), kk)
            iu, ju = np.triu_indices(kk, k=1)
            out_a.append(mat[:, iu].ravel())
            out_b.append(mat[:, ju].ravel())
        # partial count per rank pair (integer codes, no string concat)
        ra = np.concatenate(out_a)
        rb = np.concatenate(out_b)
        uniqp, cnt = np.unique(ra * ns + rb, return_counts=True)
        by_rank = srcs[s_order]
        return pa.table({
            "source_a": pa.array(by_rank[uniqp // ns], type=pa.string()),
            "source_b": pa.array(by_rank[uniqp % ns], type=pa.string()),
            "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
        })

    sh = read_parquet_clean(_doc_files(sf_dir),
                               columns=["doc_id", "text", "source"]) \
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    n_parts = keyed_partition_count(_docs_count(sf_dir) * _SHINGLE_ROW_BYTES)
    enable_hash_shuffle(sh, n_parts)
    from .agg import tree_fold_sum
    return tree_fold_sum(
        sh.repartition(n_parts, keys=["g"])
        .map_batches(pairs, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None),
        ["source_a", "source_b"], ["n"], out_names=["shared_shingles"])


# ------------------------------------------------------ leak-free split

SPLIT_SALT = ":split1"
#: train share: coin < this 4-hex literal -> 'train' (the mixture op's
#: string-compare coin, ops/tokens.py:_mix_threshold_hex) = 0.875
SPLIT_TRAIN_HEX = "e000"


def q_doc_split_leakfree(sf_dir: str) -> ray.data.Dataset:
    """Cluster-aware train/eval split: the split coin is tossed on the
    doc's near-dup CLUSTER representative (its own id when unclustered),
    so every near-duplicate family lands whole in one split — the
    standard guard against eval contamination by near-copies of
    training docs (every serious curation pipeline splits on cluster,
    not doc). Output: (doc_id, split) over the full corpus.

    Scale: the cluster map is bounded by the dup FRONTIER (cluster
    members only), broadcast once via ray.put and looked up with a
    sorted-array searchsorted per batch — the corpus itself streams
    through one map, no shuffle. A boilerplate-heavy corpus whose
    frontier outgrows broadcast would move to the q_dedup_near keyed
    anti-join shape (same two-exchange plan as q_doc_dedup_spans)."""
    from ..stages.ids import md5_hex
    from ..util import autoscaling_pool
    from .dedup import q_dup_clusters

    clusters = q_dup_clusters(sf_dir)
    member = clusters["doc_id"].to_numpy(dtype=np.int64)
    rep = clusters["cluster_id"].to_numpy(dtype=np.int64)
    order = np.argsort(member)
    ref = ray.put((member[order], rep[order]))

    class Split:
        def __init__(self, r):
            self.member, self.rep = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            j = np.searchsorted(self.member, ids)
            j = np.clip(j, 0, max(len(self.member) - 1, 0))
            basis = ids.copy()
            if len(self.member):
                hit = self.member[j] == ids
                basis[hit] = self.rep[j[hit]]
            salted = pc.binary_join_element_wise(
                pa.array(basis.astype("U"), type=pa.string()),
                pa.scalar(SPLIT_SALT), pa.scalar(""))
            coin = pc.utf8_slice_codeunits(md5_hex(salted), 0, 4)
            split = pc.if_else(pc.less(coin, pa.scalar(SPLIT_TRAIN_HEX)),
                               pa.scalar("train"), pa.scalar("eval"))
            return pa.table({"doc_id": t["doc_id"], "split": split})

    return read_parquet_clean(
        _doc_files(sf_dir), columns=["doc_id"]
    ).map_batches(Split, fn_constructor_args=(ref,),
                  batch_format="pyarrow", zero_copy_batch=True,
                  concurrency=autoscaling_pool())
