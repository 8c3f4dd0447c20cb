"""Rule loading — files / dirs / dicts → ``Ruleset``.

The reference loads its user-supplied transform logic (Rego policies)
from directories, individual files, or inline strings
(``pkg/infra/policy/client.go:35-60``); event rules live in
``package event``, schema rules in ``package schema.<name>``
(``docs/rule.md:17-124``). Our declarative equivalent loads YAML or
JSON documents of the shape::

    event_rules:
      - name: known_sources
        where:
          - {field: source, op: isin, value: [cloudtrail, access_log]}
    schema_rules:
      - name: cloudtrail_log
        where:
          - {field: source, op: eq, value: cloudtrail}
        actions:
          - {dataset: my_dataset, table: cloudtrail, partition: month,
             id_field: doc_id}
          - {dataset: logs, table: audit, null_fields: [tokens]}

A directory loads every ``*.yaml`` / ``*.yml`` / ``*.json`` inside
(sorted) and concatenates their rule lists — the analogue of swarm
merging all policy files into one compiled set.
"""

from __future__ import annotations

import json
from pathlib import Path

from .spec import Action, Cond, Rule, Ruleset


def _cond_from(d: dict) -> Cond:
    value = d["value"]
    if isinstance(value, list):
        value = tuple(value)
    return Cond(field=d["field"], op=d["op"], value=value)


def _action_from(d: dict) -> Action:
    return Action(
        dataset=d["dataset"],
        table=d["table"],
        partition=d.get("partition", ""),
        id_field=d.get("id_field"),
        null_fields=tuple(d.get("null_fields", ())),
    )


def _rule_from(d: dict) -> Rule:
    return Rule(
        name=d["name"],
        where=tuple(_cond_from(c) for c in d.get("where", ())),
        actions=tuple(_action_from(a) for a in d.get("actions", ())),
    )


def ruleset_from_dict(doc: dict) -> Ruleset:
    rs = Ruleset(
        event_rules=tuple(_rule_from(r) for r in doc.get("event_rules", ())),
        schema_rules=tuple(_rule_from(r) for r in doc.get("schema_rules", ())),
    )
    rs.validate()
    return rs


def ruleset_to_dict(rs: Ruleset) -> dict:
    def cond(c: Cond) -> dict:
        v = list(c.value) if isinstance(c.value, tuple) else c.value
        return {"field": c.field, "op": c.op, "value": v}

    def action(a: Action) -> dict:
        d: dict = {"dataset": a.dataset, "table": a.table}
        if a.partition:
            d["partition"] = a.partition
        if a.id_field is not None:
            d["id_field"] = a.id_field
        if a.null_fields:
            d["null_fields"] = list(a.null_fields)
        return d

    def rule(r: Rule) -> dict:
        return {"name": r.name,
                "where": [cond(c) for c in r.where],
                "actions": [action(a) for a in r.actions]}

    return {"event_rules": [rule(r) for r in rs.event_rules],
            "schema_rules": [rule(r) for r in rs.schema_rules]}


def _load_doc(path: Path) -> dict:
    text = path.read_text()
    if path.suffix == ".json":
        return json.loads(text)
    try:
        import yaml
    except ImportError as e:  # pragma: no cover — yaml ships here
        raise RuntimeError(f"YAML rules need pyyaml: {path}") from e
    return yaml.safe_load(text) or {}


def load_ruleset(path: str | Path) -> Ruleset:
    """Load one rules file, or every rules file in a directory
    (concatenated in sorted filename order)."""
    p = Path(path)
    if p.is_dir():
        docs = [_load_doc(f) for f in sorted(p.iterdir())
                if f.suffix in (".yaml", ".yml", ".json")]
        if not docs:
            raise FileNotFoundError(f"no rule files under {p}")
        merged: dict = {"event_rules": [], "schema_rules": []}
        for d in docs:
            merged["event_rules"].extend(d.get("event_rules", ()))
            merged["schema_rules"].extend(d.get("schema_rules", ()))
        return ruleset_from_dict(merged)
    return ruleset_from_dict(_load_doc(p))
