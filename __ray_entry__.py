"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in swarm_ray) calls ``ray.init()`` / ``ray.shutdown()``.

The flagship pipeline's input is the deterministic pre-tokenized
sequences corpus mandated by BASELINE.json ``input_hint``; it is
synthesized (seeded) on first use under /tmp/swarm_ray_fixtures and the
oracle SQL reads the *same* Parquet files via DuckDB ``read_parquet``.
Queries over the driver's TPC-H-ish tables (documents / embeddings /
events / lineitem …) cover the training-data operators.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

def _oracle_sf_dir() -> str:
    from swarm_ray.fixtures import oracle_sf_dir
    return oracle_sf_dir()


ORACLE_SF_DIR = _oracle_sf_dir()  # the driver's correctness scale


def entry() -> Any:
    """Flagship pipeline (parse → enrich → route → write sinks +
    metrics + checkpoint) on the sf0.001 sequences corpus; returns the
    per-sink metrics table (stable schema, ≥1 row)."""
    import shutil
    import pandas as pd
    from swarm_ray import fixtures
    from swarm_ray.pipelines.flagship import run_job
    from swarm_ray.state.checkpoint import read_manifests

    files = fixtures.sequences_files("sf0.001")
    out = "/tmp/swarm_ray_entry_out"
    shutil.rmtree(out, ignore_errors=True)
    run_job(files, out)
    rows = []
    for m in read_manifests(out):
        for sink, n in sorted(m["sink_counts"].items()):
            rows.append({"partition_id": m["partition_id"], "sink": sink,
                         "row_count": n, "ingest_id": m["ingest_id"]})
    return pd.DataFrame(rows)


def _core_queries() -> dict[str, Callable[[str], Any]]:
    from swarm_ray import queries as q
    return {
        "seq_source_counts": q.q_source_counts,
        "seq_parse": q.q_parse,
        "seq_parse_json": q.q_parse_json,
        "seq_route_counts": q.q_route_counts,
        "seq_routed_rows": q.q_routed_rows,
        "seq_routed_tokens": q.q_routed_tokens,
        "seq_patched_audit": q.q_patched_audit,
        "seq_enrich_counts": q.q_enrich_counts,
        "seq_drop_stats": q.q_drop_stats,
        "seq_log_id_unique": q.q_log_id_unique,
        "seq_ntok_median": q.q_ntok_median,
        "seq_ntok_quantiles": q.q_ntok_quantiles,
    }


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    out.update(_core_queries())
    try:
        from swarm_ray import ops
        out.update(ops.queries())
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from swarm_ray import fixtures, oracle
    from swarm_ray.rules.spec import default_ruleset

    # materialize the fixture the SQL reads (idempotent, cached)
    label = fixtures.label_for_sf_dir(ORACLE_SF_DIR)
    glob = str(fixtures.sequences_dir(label) / "*.parquet")
    rs = default_ruleset()

    json_glob = str(fixtures.sequences_ndjson_dir(label) / "*.jsonl.gz")
    out = {
        "seq_source_counts": oracle.sql_source_counts(glob),
        "seq_parse": oracle.sql_parse(glob, rs),
        "seq_parse_json": oracle.sql_parse(
            glob, rs, cte=oracle.seq_cte_json(json_glob)),
        "seq_route_counts": oracle.sql_route_counts(glob, rs),
        "seq_routed_rows": oracle.sql_routed_rows(glob, rs),
        "seq_routed_tokens": oracle.sql_routed_tokens(glob, rs),
        "seq_patched_audit": oracle.sql_routed_tokens(glob, rs, "logs", "access_audit"),
        "seq_enrich_counts": oracle.sql_enrich_counts(glob, fixtures.INTEL_ROWS),
        "seq_drop_stats": oracle.sql_drop_stats(glob),
        "seq_log_id_unique": oracle.sql_log_id_unique(glob, rs),
        "seq_ntok_median": (
            f"WITH seq AS (SELECT * FROM read_parquet('{glob}')) "
            "SELECT source, COUNT(*)::BIGINT AS n, "
            "median(n_tok)::DOUBLE AS median FROM seq GROUP BY source"),
        "seq_ntok_quantiles": (
            f"WITH seq AS (SELECT * FROM read_parquet('{glob}')) "
            "SELECT source, COUNT(*)::BIGINT AS n, "
            "CAST(quantile_disc(n_tok, 0.5) AS BIGINT) AS q500, "
            "CAST(quantile_disc(n_tok, 0.9) AS BIGINT) AS q900, "
            "CAST(quantile_disc(n_tok, 0.99) AS BIGINT) AS q990 "
            "FROM seq GROUP BY source"),
    }
    try:
        from swarm_ray import ops
        out.update(ops.oracle_sql())
    except ImportError:
        pass
    return out
