"""Widen-only schema unification — the dynamic-schema contract.

≙ the reference's infer → pairwise-merge → create-or-widen flow
(``bqs.Infer``/``bqs.Merge`` at ``pkg/usecase/bigquery.go:47-62``;
``createOrUpdateTable`` at ``:15-45``): a sink table's schema only ever
GAINS fields or widens a field's type; two records disagreeing
incompatibly on one field's type is an error (pinned by the reference's
"conflict schema" test, ``pkg/usecase/migrate_test.go:115-132``).

For Arrow, "widen" means: new fields append; nullability relaxes; types
promote along the numeric ladder int8→…→int64→float32→float64; a
string/number (or list/scalar, struct/scalar …) disagreement raises
``SchemaConflictError``. Each Parquet sink directory persists its
unified schema as ``_schema.json``; appends re-unify against it —
the per-sink analogue of BigQuery table DDL.
"""

from __future__ import annotations

import json

import pyarrow as pa


class SchemaConflictError(TypeError):
    """Two schemas require incompatible types for the same field."""


_NUMERIC_LADDER = [
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.float32(), pa.float64(),
]


def _widen_type(a: pa.DataType, b: pa.DataType, path: str) -> pa.DataType:
    if a.equals(b):
        return a
    if a in _NUMERIC_LADDER and b in _NUMERIC_LADDER:
        return max(a, b, key=_NUMERIC_LADDER.index)
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(_widen_type(a.value_type, b.value_type, path + "[]"))
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        sub = unify_widen([pa.schema(list(a)), pa.schema(list(b))], path=path + ".")
        return pa.struct(list(sub))
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        # finer unit wins
        order = ["s", "ms", "us", "ns"]
        return a if order.index(a.unit) >= order.index(b.unit) else b
    raise SchemaConflictError(f"field {path!r}: {a} vs {b} cannot be widened")


def unify_widen(schemas: list[pa.Schema], path: str = "") -> pa.Schema:
    """Merge schemas left-to-right, widen-only, conflict = error."""
    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    for s in schemas:
        for f in s:
            if f.name not in fields:
                fields[f.name] = f
                order.append(f.name)
            else:
                cur = fields[f.name]
                typ = _widen_type(cur.type, f.type, path + f.name)
                fields[f.name] = pa.field(f.name, typ, nullable=cur.nullable or f.nullable)
    return pa.schema([fields[n] for n in order])


def schema_to_json(schema: pa.Schema) -> str:
    def enc(t: pa.DataType):
        return str(t)

    return json.dumps([{"name": f.name, "type": enc(f.type), "nullable": f.nullable}
                       for f in schema], indent=1)


def schema_from_json(text: str) -> pa.Schema:
    _BY_NAME = {
        "string": pa.string(), "large_string": pa.large_string(),
        "binary": pa.binary(), "bool": pa.bool_(),
        "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(),
        "float": pa.float32(), "double": pa.float64(),
        "timestamp[us]": pa.timestamp("us"), "timestamp[ns]": pa.timestamp("ns"),
        "timestamp[ms]": pa.timestamp("ms"), "timestamp[s]": pa.timestamp("s"),
        "date32[day]": pa.date32(),
    }

    def dec(s: str) -> pa.DataType:
        if s in _BY_NAME:
            return _BY_NAME[s]
        if s.startswith("list<") and s.endswith(">"):
            inner = s[5:-1]
            if ":" in inner:  # "item: int32" / "element: float"
                inner = inner.split(":", 1)[1].strip()
            return pa.list_(dec(inner))
        raise ValueError(f"cannot decode type {s!r}")

    items = json.loads(text)
    return pa.schema([pa.field(d["name"], dec(d["type"]), nullable=d["nullable"])
                      for d in items])
