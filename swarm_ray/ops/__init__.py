"""Training-data operators (dedup / similarity / text / multimodal /
relational) over the driver's TPC-H-ish tables. Each op registers a
``queries()`` entry and, where SQL-expressible, an ``oracle_sql()``
entry; probabilistic / float-heavy ops are rows-only here and verified
by pytest instead."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# Driver-window rotation (VERDICT r4 item 1): the driver's CORRECTNESS
# check samples only the FIRST ~50 entries of __ray_entry__.queries()
# (12 core seq_* entries + the first ~38 of this registry). Insertion
# order used to be text→dedup→spans→relational→ann→media→tokens→embed,
# which left the entire ann/media/tokens/embed tail permanently outside
# the window. This list forces the queries that have never (or least
# recently) had a driver row to the FRONT; everything else keeps its
# family order behind them and stays covered by `make oracle-all`.
_DRIVER_FRONT = [
    # never had a green driver row in any round (r3/r4 additions)
    "emb_kmeans", "emb_pq_ann", "emb_semdedup", "emb_cluster_sample",
    "emb_knn_classify", "seq_mixture", "seq_mixture_temp",
    "seq_bigram_topk", "seq_curriculum", "seq_token_budget",
    "seq_stratified", "seq_shuffle", "seq_pack",
    "doc_embed", "doc_embed_knn",
    # round-5 additions (need their first driver rows)
    "emb_semdedup_keep", "events_retention_salted", "seq_distinct_hll",
    "tpch_bloom_semijoin", "seq_ngram_cms", "seq_gram_dupfrac",
    "seq_distinct_hll_incr", "doc_quality_rank", "doc_source_drift",
    "events_spikes", "doc_source_terms", "doc_weighted_sample",
    "emb_cluster_purity", "tpch_rollup_revenue", "events_hourly_users",
    "emb_label_dispersion", "doc_pagerank", "doc_simhash_pairs",
    "media_dedup", "emb_pq_recall", "events_rate_limit",
    # round-5 final-session additions (never driver-sampled; the
    # window cuts at ~38 ops, so only the leading few land — the rest
    # stay covered by `make oracle-all` / ORACLE_ALL_r5.txt)
    "emb_dim_stats", "emb_outliers", "emb_top_direction",
    "events_value_quantiles", "events_user_features",
    "events_transitions", "events_trend", "doc_minhash_est",
    "tpch_segment_topk", "tpch_brand_share", "tpch_supplier_stats",
    "doc_dup_triangles", "events_running_total", "events_interarrival",
    "events_dau_wau", "doc_source_entropy", "tpch_customer_rfm",
    # last driver row r3 or earlier
    "emb_knn", "emb_lsh_ann", "emb_ivf_ann", "emb_near_dup",
    "emb_dedup_semantic", "emb_centroids",
    "media_stats", "media_resize", "media_frames", "media_video_frames",
    "seq_token_topk", "seq_pack_stats", "seq_sample",
    "tpch_priority_revenue",
]


def _rotate(d: dict[str, Any]) -> dict[str, Any]:
    """Priority entries first (those present), rest in family order."""
    out = {k: d[k] for k in _DRIVER_FRONT if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from . import dedup, text

    out: dict[str, Callable[[str], Any]] = {
        # text analysis
        "doc_token_count": text.q_doc_token_count,
        "doc_quality": text.q_doc_quality,
        "doc_fingerprint": text.q_doc_fingerprint,
        "doc_langid": text.q_doc_langid,
        "doc_curation": text.q_doc_curation,
        "doc_tokenize": text.q_doc_tokenize,
        "doc_split": text.q_doc_split,
        "doc_decontaminate": text.q_doc_decontaminate,
        "doc_repetition": text.q_doc_repetition,
        "doc_tfidf_top": text.q_doc_tfidf_top,
        "doc_chunks": text.q_doc_chunks,
        "doc_common_frac": text.q_doc_common_frac,
        "doc_lm_score": text.q_doc_lm_score,
        "doc_quality_topp": text.q_doc_quality_topp,
        "doc_quality_rank": text.q_doc_quality_rank,
        "doc_source_drift": text.q_doc_source_drift,
        "doc_source_terms": text.q_doc_source_terms,
        "doc_weighted_sample": text.q_doc_weighted_sample,
        "doc_source_entropy": text.q_doc_source_entropy,
        "doc_pii_redact": text.q_doc_pii,
        # dedup family
        "doc_dedup_exact": dedup.q_dedup_exact,
        "doc_dedup_incremental": dedup.q_dedup_incremental,
        "doc_simhash": dedup.q_simhash,
        "doc_jaccard_pairs": dedup.q_jaccard_pairs,
        "doc_minhash_pairs": dedup.q_minhash_pairs_checked,
        "doc_dup_clusters": dedup.q_dup_clusters,
        "doc_dedup_near": dedup.q_dedup_near,
        "doc_pagerank": dedup.q_doc_pagerank,
        "doc_simhash_pairs": dedup.q_simhash_pairs,
        "doc_minhash_est": dedup.q_doc_minhash_est_checked,
        "doc_dup_triangles": dedup.q_doc_dup_triangles,
    }
    try:
        from . import spans
        out.update({
            "doc_dup_spans": spans.q_doc_dup_spans,
            "doc_dedup_spans": spans.q_doc_dedup_spans,
            "doc_source_overlap": spans.q_doc_source_overlap,
            "doc_split_leakfree": spans.q_doc_split_leakfree,
        })
    except ImportError:
        pass
    try:
        from . import relational
        out.update(relational.queries())
    except ImportError:
        pass
    try:
        from . import ann
        out.update(ann.queries())
    except ImportError:
        pass
    try:
        from . import media as multimodal
        out.update(multimodal.queries())
    except ImportError:
        pass
    try:
        from . import tokens
        out.update(tokens.queries())
    except ImportError:
        pass
    try:
        from . import embed
        out.update(embed.queries())
    except ImportError:
        pass
    return _rotate(out)


def oracle_sql() -> dict[str, str]:
    from . import sql, text

    out: dict[str, str] = {
        "doc_token_count": sql.SQL_DOC_TOKEN_COUNT,
        "doc_quality": sql.SQL_DOC_QUALITY,
        "doc_fingerprint": sql.SQL_DOC_FINGERPRINT,
        "doc_langid": sql.SQL_DOC_LANGID,
        "doc_curation": sql.SQL_DOC_CURATION,
        "doc_tokenize": sql.SQL_DOC_TOKENIZE,
        "doc_split": sql.SQL_DOC_SPLIT,
        "doc_decontaminate": sql.SQL_DOC_DECON,
        "doc_repetition": sql.SQL_DOC_REPETITION,
        "doc_tfidf_top": sql.SQL_DOC_TFIDF_TOP,
        "doc_chunks": sql.SQL_DOC_CHUNKS,
        "doc_common_frac": sql.SQL_DOC_COMMON_FRAC,
        "doc_lm_score": sql.SQL_DOC_LM_SCORE,
        "doc_quality_topp": sql.SQL_DOC_QUALITY_TOPP,
        "doc_quality_rank": sql.SQL_DOC_QUALITY_RANK,
        "doc_source_drift": sql.SQL_DOC_SOURCE_DRIFT,
        "doc_source_terms": sql.SQL_DOC_SOURCE_TERMS,
        "doc_weighted_sample": sql.SQL_DOC_WEIGHTED_SAMPLE,
        "doc_source_entropy": sql.SQL_DOC_SOURCE_ENTROPY,
        "doc_pii_redact": text.pii_oracle_sql(),
        "doc_dedup_exact": sql.SQL_DEDUP_EXACT,
        "doc_dedup_incremental": sql.SQL_DEDUP_INCREMENTAL,
        "doc_simhash": sql.SQL_SIMHASH,
        "doc_jaccard_pairs": sql.SQL_JACCARD_PAIRS,
        "doc_dup_clusters": sql.SQL_DUP_CLUSTERS,
        "doc_dedup_near": sql.SQL_DEDUP_NEAR,
        "doc_pagerank": sql.SQL_DOC_PAGERANK,
        "doc_simhash_pairs": sql.SQL_SIMHASH_PAIRS,
        "doc_dup_triangles": sql.SQL_DOC_TRIANGLES,
        "doc_dup_spans": sql.SQL_DOC_DUP_SPANS,
        "doc_dedup_spans": sql.SQL_DOC_DEDUP_SPANS,
        "doc_source_overlap": sql.SQL_DOC_SOURCE_OVERLAP,
        "doc_split_leakfree": sql.SQL_DOC_SPLIT_LEAKFREE,
    }
    # doc_minhash_pairs: differential oracle — the generator-side
    # independent LSH recompute (fixtures.minhash_pairs_expected_dir,
    # materialized by the queries() wrapper; deterministic under the
    # published permutation seed). Recall vs exact Jaccard additionally
    # pinned by tests/test_ops_dedup.py.
    from pathlib import Path as _Path

    from .. import fixtures as _fx
    _glob = str(_Path(_fx.FIXTURE_ROOT) /
                _fx.label_for_sf_dir(_fx.oracle_sf_dir()) /
                "minhash_pairs_expected" / "*.parquet")
    out["doc_minhash_pairs"] = (
        f"SELECT doc_a, doc_b, jaccard_milli FROM read_parquet('{_glob}')")
    # doc_minhash_est: same evidence class — the generator-side serial
    # signature recompute (fixtures.minhash_est_expected_dir)
    _est_glob = str(_Path(_fx.FIXTURE_ROOT) /
                    _fx.label_for_sf_dir(_fx.oracle_sf_dir()) /
                    "minhash_est_expected" / "*.parquet")
    out["doc_minhash_est"] = (
        "SELECT doc_a, doc_b, jaccard_milli, est_milli, err_milli "
        f"FROM read_parquet('{_est_glob}')")
    try:
        from . import relational
        out.update(relational.oracle_sql())
    except ImportError:
        pass
    try:
        from . import ann
        out.update(ann.oracle_sql())
    except ImportError:
        pass
    try:
        from . import media as multimodal
        out.update(multimodal.oracle_sql())
    except ImportError:
        pass
    try:
        from . import tokens
        out.update(tokens.oracle_sql())
    except ImportError:
        pass
    try:
        from . import embed
        out.update(embed.oracle_sql())
    except ImportError:
        pass
    return _rotate(out)


def bench_queries(sf_dir: str) -> dict[str, float]:
    """Timed secondary pipelines for bench.py.

    Discipline (VERDICT r3 item 3 — the r3 snapshot's unattributed
    secondary swings): every secondary gets ONE untimed warmup run
    (worker imports, page cache) and reports the MIN of two timed
    reps — steady-state, the same rule the flagship uses — plus a
    per-stage split for the two ops that swung (exact dedup,
    events_hourly), so a future regression pins to read+map vs
    shuffle+reduce instead of 'the VM was slow'."""
    import time

    def timed(fn) -> float:
        fn()                                  # warmup (untimed)
        reps = []
        for _ in range(2):
            t0 = time.time()
            fn()
            reps.append(time.time() - t0)
        return round(min(reps), 3)

    def consume(res) -> None:
        if hasattr(res, "to_pandas"):
            res.to_pandas()

    out: dict[str, float] = {}
    from . import dedup
    out["doc_dedup_exact"] = timed(
        lambda: consume(dedup.q_dedup_exact(sf_dir)))
    # stage split: read+md5 map only (no shuffle) — the full op minus
    # this is the keyed repartition + block aggregate
    import pyarrow as _pa

    def _force(ds) -> None:
        ds.map_batches(
            lambda t: _pa.table({"n": _pa.array([len(t)], type=_pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).sum("n")

    out["doc_dedup_exact_hash"] = timed(lambda: _force(
        dedup._read_docs(sf_dir).map_batches(
            dedup._hash_batch, batch_format="pyarrow", zero_copy_batch=True)))
    out["doc_dedup_exact_shuffle_incr"] = round(
        out["doc_dedup_exact"] - out["doc_dedup_exact_hash"], 3)

    out["doc_minhash_pairs"] = timed(lambda: dedup.q_minhash_pairs(sf_dir))

    for name, fn in (("emb_knn", "ann.q_knn_bruteforce"),
                     ("emb_pq_ann", "ann.q_knn_pq"),
                     ("seq_mixture_temp", "tokens.q_seq_mixture_temp"),
                     ("seq_distinct_hll", "tokens.q_seq_distinct_hll"),
                     ("media_stats", "media.q_media_stats"),
                     ("events_hourly", "relational.q_events_hourly"),
                     # round-5 additions: the zero-shuffle global rank
                     # (two corpus passes + 8 KB broadcast) and the
                     # pair-dedup distinct-users exchange
                     ("doc_quality_rank", "text.q_doc_quality_rank"),
                     ("events_hourly_users",
                      "relational.q_events_hourly_users"),
                     # round-5 final batch: the hash co-partitioned
                     # join family's bench row (broadcast bitmap +
                     # pre-aggregated fact join + head fold)
                     ("tpch_segment_topk",
                      "relational.q_tpch_segment_topk")):
        try:
            mod_name, fn_name = fn.split(".")
            import importlib
            mod = importlib.import_module(f".{mod_name}", __package__)
            out[name] = timed(lambda: consume(getattr(mod, fn_name)(sf_dir)))
        except Exception:
            pass

    try:
        from . import relational
        # read-vs-rest split: the r3 swing hypothesis was IO/VM drift,
        # so pin the pruned read by itself; the full op minus this is
        # window-map + aggregate shuffle
        out["events_hourly_read"] = timed(lambda: _force(
            relational._read_events(sf_dir, ["ts", "event_type", "value"])))
        out["events_hourly_rest_incr"] = round(
            out["events_hourly"] - out["events_hourly_read"], 3)
    except Exception:
        pass
    return out
