"""Declarative rule spec — the engine's analogue of swarm's Rego policies.

Swarm's entire transform logic is user-supplied Rego (reference
``docs/rule.md:1-11``): *event* rules decide whether/how an object is
read (``pkg/usecase/event.go:11-21``) and *schema* rules map each
record to zero or more ``log{dataset, table, partition, id,
timestamp, data}`` outputs (``pkg/usecase/load.go:210-247``,
``pkg/domain/model/policy.go:54-71``). We keep the same two-level,
0-match-drop / N-match-fan-out semantics but express rules as plain
dataclasses that compile to

* vectorized ``pyarrow.compute`` masks (``compile.py``) for the Ray
  data plane, and
* equivalent ANSI SQL (``to_sql`` methods here) so a DuckDB oracle can
  replay the exact routing for correctness checks.

One spec, two backends — the spec itself is the single source of truth.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal

import hashlib
import json

Op = Literal["eq", "ne", "prefix", "suffix", "not_suffix", "contains", "regex",
             "gt", "ge", "lt", "le", "isin"]

#: epoch for the synthetic per-document timestamps (timestamp = BASE_TS
#: + doc_index seconds) — ≙ the schema rule computing ``timestamp`` from
#: record fields (reference pkg/usecase/testdata/policy/schema.rego:8).
BASE_TS = "2024-01-01 00:00:00"


def _sql_quote(v: object) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


@dataclass(frozen=True)
class Cond:
    """One predicate conjunct over an input column."""

    field: str
    op: Op
    value: object

    def to_sql(self) -> str:
        f, v = self.field, self.value
        if self.op == "eq":
            return f"{f} = {_sql_quote(v)}"
        if self.op == "ne":
            return f"{f} <> {_sql_quote(v)}"
        if self.op == "prefix":
            return f"starts_with({f}, {_sql_quote(v)})"
        if self.op == "suffix":
            return f"ends_with({f}, {_sql_quote(v)})"
        if self.op == "not_suffix":
            return f"NOT ends_with({f}, {_sql_quote(v)})"
        if self.op == "contains":
            return f"contains({f}, {_sql_quote(v)})"
        if self.op == "regex":
            return f"regexp_matches({f}, {_sql_quote(v)})"
        if self.op == "gt":
            return f"{f} > {_sql_quote(v)}"
        if self.op == "ge":
            return f"{f} >= {_sql_quote(v)}"
        if self.op == "lt":
            return f"{f} < {_sql_quote(v)}"
        if self.op == "le":
            return f"{f} <= {_sql_quote(v)}"
        if self.op == "isin":
            vals = ", ".join(_sql_quote(x) for x in self.value)
            return f"{f} IN ({vals})"
        raise ValueError(f"unknown op {self.op!r}")


@dataclass(frozen=True)
class Action:
    """One routed output for a matching row — ≙ one ``log`` result of a
    schema rule (reference pkg/domain/model/policy.go:64-71).

    ``id_field=None`` means the engine generates the deterministic
    ``log_id`` = md5 of the canonical record encoding (reference
    pkg/domain/types/types.go:27-34, applied pkg/usecase/load.go:228-234);
    otherwise ``log_id`` is taken from the named column.
    """

    dataset: str
    table: str
    partition: Literal["", "hour", "day", "month", "year"] = ""
    id_field: str | None = None
    #: fields blanked (set to typed NULL) in this action's output — the
    #: analogue of swarm rules patching fields out of ``log.data`` via
    #: ``json.patch`` (reference README.md:56). Restricted to payload /
    #: enrichment columns; routing keys (doc_id, source, n_tok) must
    #: survive. The generated ``log_id`` hashes the PATCHED record, as
    #: the reference hashes the rule's emitted data.
    null_fields: tuple[str, ...] = ()

    def validate(self) -> None:
        # ≙ model.Log.Validate: dataset/table required
        # (reference pkg/domain/model/policy.go:73-89)
        if not self.dataset:
            raise ValueError("action missing dataset")
        if not self.table:
            raise ValueError("action missing table")
        banned = {"doc_id", "source", "n_tok"} & set(self.null_fields)
        if banned:
            raise ValueError(f"null_fields may not patch routing keys: {banned}")

    @property
    def sink(self) -> str:
        return f"{self.dataset}.{self.table}"


@dataclass(frozen=True)
class Rule:
    """Conjunction of conds → list of actions. N actions = fan-out."""

    name: str
    where: tuple[Cond, ...]
    actions: tuple[Action, ...] = ()

    def validate(self) -> None:
        for a in self.actions:
            a.validate()

    def where_sql(self) -> str:
        if not self.where:
            return "TRUE"
        return " AND ".join(c.to_sql() for c in self.where)


@dataclass(frozen=True)
class Ruleset:
    """Event rules (object accept filter) + schema rules (record router).

    Event semantics (reference ``pkg/usecase/event.go:11-21``): an input
    row is *eligible* iff at least one event rule matches; otherwise the
    object is rejected before parsing. Schema semantics (reference
    ``pkg/usecase/load.go:210-247``): each eligible row is routed once
    per matching (rule, action); zero matches drop the row with a
    warning count.
    """

    event_rules: tuple[Rule, ...]
    schema_rules: tuple[Rule, ...]

    def validate(self) -> None:
        for r in self.schema_rules:
            r.validate()

    def spec_hash(self) -> str:
        """Stable hash of the ruleset — recorded in checkpoint manifests
        so a resume under a different ruleset is detected (lineage)."""
        blob = json.dumps(
            {
                "event": [[r.name, [[c.field, c.op, c.value] for c in r.where]] for r in self.event_rules],
                "schema": [
                    [
                        r.name,
                        [[c.field, c.op, c.value] for c in r.where],
                        [[a.dataset, a.table, a.partition, a.id_field,
                          list(a.null_fields)] for a in r.actions],
                    ]
                    for r in self.schema_rules
                ],
            },
            sort_keys=True,
            default=str,
        ).encode()
        return hashlib.md5(blob).hexdigest()


def default_ruleset() -> Ruleset:
    """The F2 fixture ruleset (FIXTURES.md) — the declarative analogue of
    the reference's shipped test policies
    (pkg/usecase/testdata/policy/{event,schema}.rego,
    examples/readme/policy/{event,schema}.rego). Jointly exercises:
    single-match route, two event rules → one schema, generated-id path,
    2-way fan-out, predicate negation, and 0-match drop.
    """
    known = ("cloudtrail", "github_audit", "access_log", "vpc_flow")
    event_rules = (
        # ≙ event rules matching on bucket/object name
        # (reference pkg/usecase/testdata/policy/event.rego:3-20):
        # scratch ".tmp" objects and unknown buckets get no source → rejected.
        Rule("known_sources", (
            Cond("source", "isin", known),
            Cond("doc_id", "not_suffix", ".tmp"),
        )),
    )
    schema_rules = (
        # R1/R2: two object forms (.log / .gz) of cloudtrail → one sink
        Rule("cloudtrail_log", (
            Cond("source", "eq", "cloudtrail"),
            Cond("doc_id", "suffix", ".log"),
        ), (Action("my_dataset", "cloudtrail", partition="month", id_field="doc_id"),)),
        Rule("cloudtrail_gz", (
            Cond("source", "eq", "cloudtrail"),
            Cond("doc_id", "suffix", ".gz"),
        ), (Action("my_dataset", "cloudtrail", partition="month", id_field="doc_id"),)),
        # R3: generated md5 log_id (auto-ID path)
        Rule("github_audit", (
            Cond("source", "eq", "github_audit"),
        ), (Action("my_log_dataset", "my_github_audit"),)),
        # R4: one row → two sinks (fan-out ≙ Records[_] explode)
        Rule("access_fanout", (
            Cond("source", "eq", "access_log"),
        ), (
            Action("logs", "access_raw"),
            # audit twin carries no payload — ≙ json.patch field removal
            # (reference README.md:56); its generated id therefore
            # differs from the raw twin's (hash of the patched record)
            Action("logs", "access_audit", null_fields=("tokens",)),
        )),
        # R5: negated predicate + day partition
        Rule("vpc_flow", (
            Cond("source", "eq", "vpc_flow"),
            Cond("doc_id", "not_suffix", ".tmp"),
        ), (Action("logs", "vpc_flow", partition="day"),)),
    )
    rs = Ruleset(event_rules=event_rules, schema_rules=schema_rules)
    rs.validate()
    return rs
