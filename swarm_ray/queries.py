"""Ray-side query implementations — one per SURVEY.md §2 operator.

Each function takes ``sf_dir`` (a testdata scale directory; its
basename selects the matching deterministic sequences fixture) and
returns a ``ray.data.Dataset`` / pandas DataFrame whose columns match
the generated oracle SQL in ``oracle.py`` name-for-name.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from . import fixtures
from .pipelines.flagship import build_routed
from .rules.spec import default_ruleset
from .stages.enrich import EnrichStage
from .stages.parse import ParseStage
from .util import read_parquet_clean

ROUTED_COLS = ["doc_id", "source", "n_tok", "rule_name", "sink_dataset",
               "sink_table", "sink_partition", "log_id", "timestamp"]


def _seq_files(sf_dir: str) -> list[str]:
    return fixtures.sequences_files(fixtures.label_for_sf_dir(sf_dir))


def q_source_counts(sf_dir: str) -> ray.data.Dataset:
    """A1 — per-source input counts. Partial per-batch counts collapse
    each block to ≤#sources rows BEFORE the shuffle (ops/agg.py), so
    the exchange moves #blocks × #keys partials, not 10^12 rows — also
    the skew treatment for the 55%-hot source key."""
    from .ops.agg import grouped_count
    ds = read_parquet_clean(_seq_files(sf_dir), columns=["source"])
    return grouped_count(ds, ["source"], bounded_groups=True)


def q_parse(sf_dir: str) -> ray.data.Dataset:
    """M1/S5 — event filter + vectorized regex parse of doc_id.
    Token payload pruned at the read — parse touches metadata only."""
    ds = read_parquet_clean(
        _seq_files(sf_dir), columns=["doc_id", "source", "n_tok"],
    ).map_batches(
        ParseStage(default_ruleset()), batch_format="pyarrow", zero_copy_batch=True)
    return ds.select_columns(["doc_id", "source", "n_tok", "part_no", "doc_idx", "ext"])


def q_parse_json(sf_dir: str) -> ray.data.Dataset:
    """S4/S5 literally — the gzipped-NDJSON serialization of the same
    corpus streamed through ``sources.json_source`` (codec inferred
    from the extension, schema canonicalized) into the SAME parse
    stage as the Parquet path. No column pruning is possible on a JSON
    source (each row is one opaque line) — the documented reason the
    engine stores Parquet and keeps JSON for ingestion edges."""
    from .sources.json_source import read_sequences_json
    files = fixtures.sequences_ndjson_files(fixtures.label_for_sf_dir(sf_dir))
    ds = read_sequences_json(files).map_batches(
        ParseStage(default_ruleset()), batch_format="pyarrow", zero_copy_batch=True)
    return ds.select_columns(["doc_id", "source", "n_tok", "part_no", "doc_idx", "ext"])


def q_route_counts(sf_dir: str) -> ray.data.Dataset:
    """A2 — exact per-sink routed counts, via per-batch partials
    (shuffle moves #blocks × #sinks rows only)."""
    from .ops.agg import grouped_count
    return grouped_count(build_routed(_seq_files(sf_dir)),
                         ["sink_dataset", "sink_table"],
                         bounded_groups=True)


def q_routed_rows(sf_dir: str) -> ray.data.Dataset:
    """M2/M5/M6 — full routed surface (sans token payload)."""
    return build_routed(_seq_files(sf_dir)).select_columns(ROUTED_COLS)


def q_routed_tokens(sf_dir: str) -> ray.data.Dataset:
    """Per-row invariant: byte-for-byte token-array equality on one sink."""
    def pick(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["sink_dataset"], "my_dataset"),
                       pc.equal(t["sink_table"], "cloudtrail"))
        return t.filter(mask).select(["log_id", "doc_id", "tokens", "n_tok"])
    return build_routed(_seq_files(sf_dir)).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True)


def q_patched_audit(sf_dir: str) -> ray.data.Dataset:
    """Field-patch surface (Action.null_fields ≙ json.patch removal):
    the audit fan-out twin must carry a NULL token payload while its
    log_id hashes the patched record."""
    def pick(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["sink_table"], "access_audit")
        return t.filter(mask).select(["log_id", "doc_id", "tokens", "n_tok"])
    return build_routed(_seq_files(sf_dir)).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True)


def q_enrich_counts(sf_dir: str) -> ray.data.Dataset:
    """ST2 — broadcast left-join enrichment over the RAW input (no event
    filter) so the miss path (null severity/tag) is part of the check."""
    from .util import autoscaling_pool
    intel_ref = ray.put(fixtures.intel_table())
    ds = read_parquet_clean(_seq_files(sf_dir), columns=["source"]).map_batches(
        EnrichStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=autoscaling_pool(),
        fn_constructor_kwargs={"intel_ref": intel_ref})

    # coalesce the miss-path nulls to sentinels so the result schema is
    # null-free and type-stable across block orders (pandas conversion
    # of nullable ints is otherwise nondeterministic across runs)
    def stabilize(t: pa.Table) -> pa.Table:
        sev = pc.fill_null(pc.cast(t["severity"], pa.int64()), -1)
        tag = pc.fill_null(t["tag"], "")
        return t.set_column(t.schema.get_field_index("severity"), "severity", sev) \
                .set_column(t.schema.get_field_index("tag"), "tag", tag)

    ds = ds.map_batches(stabilize, batch_format="pyarrow", zero_copy_batch=True)
    from .ops.agg import grouped_count
    return grouped_count(ds, ["source", "severity", "tag"],
                         bounded_groups=True)


def q_drop_stats(sf_dir: str) -> ray.data.Dataset:
    """0-match drop accounting (≙ drop-with-warning, load.go:216-219)."""
    def classify(t: pa.Table) -> pa.Table:
        is_tmp = pc.ends_with(t["doc_id"], pattern=".tmp")
        unknown = pc.is_in(t["source"], value_set=pa.array(["debug", "unknown_src"]))
        reason = pc.if_else(is_tmp, "tmp_object",
                            pc.if_else(unknown, "unknown_source", "routed"))
        return pa.table({"reason": reason})
    from .ops.agg import grouped_count
    return grouped_count(
        read_parquet_clean(_seq_files(sf_dir), columns=["doc_id", "source"])
        .map_batches(classify, batch_format="pyarrow", zero_copy_batch=True),
        ["reason"], bounded_groups=True)


def q_ntok_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact per-source n_tok p50/p90/p99 via the same salted-histogram
    plan (ops/agg.py:salted_quantiles); oracle-checked against DuckDB
    quantile_disc."""
    from .ops.agg import salted_quantiles
    ds = read_parquet_clean(_seq_files(sf_dir),
                               columns=["doc_id", "source", "n_tok"])
    return salted_quantiles(ds, "source", "n_tok", domain=512)


def q_ntok_median(sf_dir: str) -> ray.data.Dataset:
    """Exact per-source n_tok median via salted partial histograms
    (ops/agg.py:salted_median) — the skewed-key / non-associative
    group-op pattern, oracle-checked against SQL median()."""
    from .ops.agg import salted_median
    # prune at the read: the shuffle must move (doc_id, source, n_tok)
    # triples, never the token payload
    ds = read_parquet_clean(_seq_files(sf_dir),
                               columns=["doc_id", "source", "n_tok"])
    return salted_median(ds, "source", "n_tok", domain=512)


def q_log_id_unique(sf_dir: str) -> ray.data.Dataset:
    """Idempotency: routed rows vs distinct log_ids per sink. Exact
    distributed distinct via HEX-PREFIX BUCKETING: ids are md5 hex, so
    the first two chars partition id-space uniformly into 256 disjoint
    buckets per sink; each (sink, bucket) group computes an exact local
    distinct (ids can't repeat across buckets) and a tiny fold sums
    them. One shuffle keyed on ~256×#sinks groups — measured 3.5×
    faster than a groupby on the full (sink, log_id) key space."""
    import pandas as pd

    def bucketize(t: pa.Table) -> pa.Table:
        b = pc.utf8_slice_codeunits(
            t["log_id"].combine_chunks().cast(pa.large_string()), 0, 2)
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import pandas as pd
        return pd.DataFrame({
            "sink_dataset": [g["sink_dataset"].iloc[0]],
            "sink_table": [g["sink_table"].iloc[0]],
            "rows": [len(g)],
            "distinct": [g["log_id"].nunique()],
        })

    return (build_routed(_seq_files(sf_dir))
            .select_columns(["sink_dataset", "sink_table", "log_id"])
            .map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["sink_dataset", "sink_table", "bucket"])
            .map_groups(per_bucket, batch_format="pandas")
            .groupby(["sink_dataset", "sink_table"])
            .aggregate(Sum("rows", alias_name="row_count"),
                       Sum("distinct", alias_name="distinct_ids")))
