"""Widen-only schema unification (SURVEY §1.2 / §2.5 A3) — mirrors the
reference's schema-merge matrix incl. conflict-is-error
(pkg/usecase/migrate_test.go:15-155)."""

import pyarrow as pa
import pytest

from swarm_ray.sinks.schema import (SchemaConflictError, schema_from_json,
                                    schema_to_json, unify_widen)


def test_new_fields_append():
    a = pa.schema([("x", pa.int64())])
    b = pa.schema([("x", pa.int64()), ("y", pa.string())])
    m = unify_widen([a, b])
    assert m.names == ["x", "y"]


def test_numeric_widening():
    a = pa.schema([("x", pa.int32())])
    b = pa.schema([("x", pa.int64())])
    assert unify_widen([a, b]).field("x").type == pa.int64()
    c = pa.schema([("x", pa.float64())])
    assert unify_widen([a, c]).field("x").type == pa.float64()
    # widen is symmetric and never narrows
    assert unify_widen([c, a]).field("x").type == pa.float64()


def test_conflict_is_error():
    a = pa.schema([("x", pa.string())])
    b = pa.schema([("x", pa.int64())])
    with pytest.raises(SchemaConflictError, match="x"):
        unify_widen([a, b])


def test_list_and_timestamp_widening():
    a = pa.schema([("t", pa.list_(pa.int32())), ("ts", pa.timestamp("s"))])
    b = pa.schema([("t", pa.list_(pa.int64())), ("ts", pa.timestamp("us"))])
    m = unify_widen([a, b])
    assert m.field("t").type == pa.list_(pa.int64())
    assert m.field("ts").type == pa.timestamp("us")


def test_json_roundtrip():
    s = pa.schema([
        ("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()), ("ts", pa.timestamp("us")),
    ])
    assert schema_from_json(schema_to_json(s)).equals(s)
