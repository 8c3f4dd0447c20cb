"""Pure-Python row-at-a-time oracle for the routing semantics — a third,
independent implementation (vs the pyarrow kernels and the DuckDB SQL)
used only by tests. Mirrors the reference's per-record loop
(pkg/usecase/load.go:207-248): event filter, 0-match drop, N-match
fan-out, rule-or-generated log_id."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from swarm_ray.rules.spec import Ruleset

BASE = datetime(2024, 1, 1)


def _cond_ok(cond, row) -> bool:
    v = row[cond.field]
    if cond.op == "eq":
        return v == cond.value
    if cond.op == "ne":
        return v != cond.value
    if cond.op == "prefix":
        return v.startswith(cond.value)
    if cond.op == "suffix":
        return v.endswith(cond.value)
    if cond.op == "not_suffix":
        return not v.endswith(cond.value)
    if cond.op == "contains":
        return cond.value in v
    if cond.op == "isin":
        return v in cond.value
    if cond.op == "gt":
        return v > cond.value
    if cond.op == "ge":
        return v >= cond.value
    if cond.op == "lt":
        return v < cond.value
    if cond.op == "le":
        return v <= cond.value
    import re
    if cond.op == "regex":
        return re.search(cond.value, v) is not None
    raise ValueError(cond.op)


def log_id_of(row) -> str:
    toks = "".join(f"{t:05d}," for t in (row["tokens"] or []))
    canon = f"{row['doc_id']}|{row['source']}|{row['n_tok']}|{toks}"
    return hashlib.md5(canon.encode()).hexdigest()


def doc_ts(row) -> datetime:
    import re
    idx = int(re.search(r"doc-(\d+)", row["doc_id"]).group(1))
    return BASE + timedelta(seconds=idx)


def route_rows(rows: list[dict], ruleset: Ruleset) -> list[dict]:
    out = []
    for row in rows:
        if ruleset.event_rules and not any(
                all(_cond_ok(c, row) for c in r.where) for r in ruleset.event_rules):
            continue  # object rejected at event level
        for rule in ruleset.schema_rules:
            if all(_cond_ok(c, row) for c in rule.where):
                for action in rule.actions:
                    rec = dict(row)
                    # field patches first (json.patch analogue); the
                    # generated id hashes the PATCHED record
                    for name in action.null_fields:
                        rec[name] = None
                    rec["rule_name"] = rule.name
                    rec["sink_dataset"] = action.dataset
                    rec["sink_table"] = action.table
                    rec["log_id"] = (str(rec[action.id_field])
                                     if action.id_field else log_id_of(rec))
                    rec["timestamp"] = doc_ts(row)
                    out.append(rec)
    return out
