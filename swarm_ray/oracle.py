"""Oracle-SQL generator — DuckDB SQL equivalent to the Ray data plane.

The same ``Ruleset`` object that compiles to pyarrow kernels
(``rules/compile.py``) renders here to ANSI SQL, so the declarative
spec is the single source of truth and the Ray pipeline and the DuckDB
oracle cannot drift apart. The generated SQL reproduces, exactly:

* the event-level accept filter (OR of event rules),
* per-(rule, action) routing with UNION ALL fan-out,
* the deterministic ``log_id`` (md5 of the canonical record string —
  see ``stages/ids.py``),
* the synthetic event timestamp and strftime partition labels.

These queries are what the grading driver runs side-by-side with the
Ray pipeline (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from .rules.spec import Action, Rule, Ruleset
from .stages.ids import PARTITION_FORMATS

#: must match stages/ids.py BASE_TS_US
TS_EXPR = ("TIMESTAMP '2024-01-01 00:00:00' + "
           "CAST(regexp_extract(doc_id, 'doc-(\\d+)', 1) AS BIGINT) * INTERVAL 1 SECOND")

#: canonical record string — must match stages/ids.canonical_string
#: (tokens are fixed-width 5-digit decimals each followed by a comma)
CANON_EXPR = (
    "doc_id || '|' || source || '|' || CAST(n_tok AS VARCHAR) || '|' || "
    "COALESCE(array_to_string("
    "list_transform(tokens, x -> lpad(CAST(x AS VARCHAR), 5, '0') || ','), "
    "''), '')")

MD5_ID_EXPR = f"md5({CANON_EXPR})"


def seq_cte(seq_glob: str) -> str:
    return (f"WITH seq AS (SELECT doc_id, tokens, n_tok, source "
            f"FROM read_parquet('{seq_glob}'))")


def seq_cte_json(ndjson_glob: str) -> str:
    """Sequences CTE over the gzipped-NDJSON serialization of the same
    corpus (S4/S5). JSON carries no Arrow types, so the CTE casts the
    inferred BIGINTs back to the canonical input schema — exactly the
    cast the engine's JSON source applies."""
    return ("WITH seq AS (SELECT doc_id, "
            "CAST(tokens AS INTEGER[]) AS tokens, "
            "CAST(n_tok AS INTEGER) AS n_tok, source "
            f"FROM read_json_auto('{ndjson_glob}', "
            "format='newline_delimited'))")


def event_filter_sql(ruleset: Ruleset) -> str:
    if not ruleset.event_rules:
        return "TRUE"
    return " OR ".join(f"({r.where_sql()})" for r in ruleset.event_rules)


#: SQL types of patchable columns (Action.null_fields)
_NULLABLE_TYPES = {"tokens": "INTEGER[]", "severity": "INTEGER",
                   "tag": "VARCHAR", "ext": "VARCHAR"}


def _action_select(rule: Rule, action: Action) -> str:
    # field patches (≙ json.patch removal): project typed NULLs and —
    # because the generated id hashes the PATCHED record — blank the
    # token segment of the canonical string when tokens are patched
    tokens_expr = "tokens"
    canon = CANON_EXPR
    for name in action.null_fields:
        if name == "tokens":
            tokens_expr = f"CAST(NULL AS {_NULLABLE_TYPES['tokens']})"
            canon = ("doc_id || '|' || source || '|' || "
                     "CAST(n_tok AS VARCHAR) || '|' || ''")
        # other patchable columns don't appear in the canonical string
    if action.id_field is None:
        id_expr = f"md5({canon})"
    else:
        id_expr = f"CAST({action.id_field} AS VARCHAR)"
    if action.partition:
        part_expr = f"strftime({TS_EXPR}, '{PARTITION_FORMATS[action.partition]}')"
    else:
        part_expr = "''"
    return (
        f"SELECT doc_id, {tokens_expr} AS tokens, n_tok, source, "
        f"'{rule.name}' AS rule_name, "
        f"'{action.dataset}' AS sink_dataset, "
        f"'{action.table}' AS sink_table, "
        f"{part_expr} AS sink_partition, "
        f"{id_expr} AS log_id, "
        f'{TS_EXPR} AS "timestamp" '
        f"FROM eligible WHERE {rule.where_sql()}"
    )


def routed_ctes(seq_glob: str, ruleset: Ruleset) -> str:
    """CTE prelude: seq → eligible (event filter) → routed (fan-out)."""
    branches = []
    for rule in ruleset.schema_rules:
        for action in rule.actions:
            branches.append(_action_select(rule, action))
    union = "\n  UNION ALL\n  ".join(branches)
    return (
        f"{seq_cte(seq_glob)},\n"
        f"eligible AS (SELECT * FROM seq WHERE {event_filter_sql(ruleset)}),\n"
        f"routed AS (\n  {union}\n)"
    )


# ---------------------------------------------------------------- queries

def sql_source_counts(seq_glob: str) -> str:
    """A1 — per-source input row counts (SourceLog.RowCount)."""
    return (f"{seq_cte(seq_glob)} "
            "SELECT source, COUNT(*) AS row_count FROM seq "
            "GROUP BY source ORDER BY source")


def sql_parse(seq_glob: str, ruleset: Ruleset, *, cte: str | None = None) -> str:
    """M1/S5 — event filter + vectorized path parse. ``cte`` overrides
    the sequences CTE (e.g. ``seq_cte_json`` for the NDJSON source)."""
    return (
        f"{cte or seq_cte(seq_glob)} "
        "SELECT doc_id, source, n_tok, "
        "CAST(regexp_extract(doc_id, 'part-(\\d+)', 1) AS INTEGER) AS part_no, "
        "CAST(regexp_extract(doc_id, 'doc-(\\d+)', 1) AS BIGINT) AS doc_idx, "
        "regexp_extract(doc_id, '(\\.\\w+)$', 1) AS ext "
        f"FROM seq WHERE {event_filter_sql(ruleset)} "
        "ORDER BY doc_id"
    )


def sql_route_counts(seq_glob: str, ruleset: Ruleset) -> str:
    """A2 — exact per-sink routed counts (the correctness-critical aggregate)."""
    return (f"{routed_ctes(seq_glob, ruleset)} "
            "SELECT sink_dataset, sink_table, COUNT(*) AS row_count "
            "FROM routed GROUP BY sink_dataset, sink_table "
            "ORDER BY sink_dataset, sink_table")


def sql_routed_rows(seq_glob: str, ruleset: Ruleset) -> str:
    """M2/M5/M6 — the full routed surface (sans token payload)."""
    return (f"{routed_ctes(seq_glob, ruleset)} "
            'SELECT doc_id, source, n_tok, rule_name, sink_dataset, sink_table, '
            'sink_partition, log_id, "timestamp" FROM routed')


def sql_routed_tokens(seq_glob: str, ruleset: Ruleset,
                      dataset: str = "my_dataset", table: str = "cloudtrail") -> str:
    """Byte-for-byte token-array equality through the whole pipeline
    (the BASELINE.json per-row invariant), pinned on one sink."""
    return (f"{routed_ctes(seq_glob, ruleset)} "
            "SELECT log_id, doc_id, tokens, n_tok FROM routed "
            f"WHERE sink_dataset = '{dataset}' AND sink_table = '{table}'")


def sql_enrich_counts(seq_glob: str, intel_rows: list[dict]) -> str:
    """ST2 — broadcast left-join enrichment incl. the miss path (rows
    whose source has no intel entry keep NULL severity/tag)."""
    values = ", ".join(
        f"('{r['source']}', {r['severity']}, '{r['tag']}')" for r in intel_rows
    )
    return (
        f"{seq_cte(seq_glob)}, "
        f"intel(source, severity, tag) AS (SELECT * FROM (VALUES {values})) "
        "SELECT seq.source AS source, "
        "COALESCE(CAST(intel.severity AS BIGINT), -1) AS severity, "
        "COALESCE(intel.tag, '') AS tag, "
        "COUNT(*) AS row_count "
        "FROM seq LEFT JOIN intel ON seq.source = intel.source "
        "GROUP BY seq.source, intel.severity, intel.tag "
        "ORDER BY source"
    )


def sql_drop_stats(seq_glob: str) -> str:
    """M2 0-match drop accounting: why each input row was or wasn't routed."""
    return (
        f"{seq_cte(seq_glob)} "
        "SELECT CASE WHEN ends_with(doc_id, '.tmp') THEN 'tmp_object' "
        "WHEN source IN ('debug', 'unknown_src') THEN 'unknown_source' "
        "ELSE 'routed' END AS reason, COUNT(*) AS row_count "
        "FROM seq GROUP BY 1 ORDER BY 1"
    )


def sql_log_id_unique(seq_glob: str, ruleset: Ruleset) -> str:
    """Idempotency surface: per sink, routed rows vs distinct log_ids
    (≙ LogID determinism test, reference pkg/domain/types/types_test.go:90-121)."""
    return (f"{routed_ctes(seq_glob, ruleset)} "
            "SELECT sink_dataset, sink_table, COUNT(*) AS row_count, "
            "COUNT(DISTINCT log_id) AS distinct_ids "
            "FROM routed GROUP BY sink_dataset, sink_table "
            "ORDER BY sink_dataset, sink_table")
