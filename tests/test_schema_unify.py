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


def test_concurrent_schema_widens_both_survive(tmp_path):
    """V7: two jobs widening the same sink concurrently must not lose
    either widen (≙ the reference's ETag optimistic-concurrency loop,
    pkg/usecase/bigquery.go:36-44) — the O_EXCL lockfile serializes the
    read-merge-write."""
    import threading
    import pyarrow as pa
    from swarm_ray.sinks.parquet_sink import update_sink_schema

    base = pa.schema([("a", pa.int64())])
    update_sink_schema(tmp_path, base)

    n_threads, reps = 8, 10
    errs = []

    def widen(i):
        try:
            for r in range(reps):
                update_sink_schema(
                    tmp_path, pa.schema([("a", pa.int64()),
                                         (f"col_{i}_{r}", pa.string())]))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=widen, args=(i,)) for i in range(n_threads)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    from swarm_ray.sinks.schema import schema_from_json
    final = schema_from_json((tmp_path / "_schema.json").read_text())
    got = set(final.names)
    assert {"a"} | {f"col_{i}_{r}" for i in range(n_threads)
                    for r in range(reps)} <= got


def test_sink_file_schema_projection():
    import pyarrow as pa
    from swarm_ray.sinks.parquet_sink import sink_file_schema
    routed = pa.schema([("doc_id", pa.string()), ("sink_dataset", pa.string()),
                        ("sink_table", pa.string()), ("n_tok", pa.int32())])
    s = sink_file_schema(routed)
    assert "sink_dataset" not in s.names and "sink_table" not in s.names
    assert s.field("ingest_id").type == pa.string()
    assert s.field("ingested_at").type == pa.timestamp("us")
