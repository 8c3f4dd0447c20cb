"""Deterministic IDs / timestamps (SURVEY §2.2 M5/M6)."""

import hashlib

import pyarrow as pa

from swarm_ray.stages.ids import (canonical_string, derive_timestamp,
                                  generated_log_id, partition_label)


def mk(doc_id="github_audit/part-00000/doc-00000042.log",
       tokens=(5, 6, 7), source="github_audit"):
    return pa.table({
        "doc_id": pa.array([doc_id]),
        "tokens": pa.array([list(tokens)], type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(tokens)], type=pa.int32()),
        "source": pa.array([source]),
    })


def test_canonical_string():
    assert canonical_string(mk()).to_pylist() == [
        b"github_audit/part-00000/doc-00000042.log|github_audit|3|00005,00006,00007,"
    ]


def test_canonical_string_empty_tokens():
    assert canonical_string(mk(tokens=())).to_pylist() == [
        b"github_audit/part-00000/doc-00000042.log|github_audit|0|"
    ]


def test_log_id_idempotent():
    # ≙ LogID determinism (reference pkg/domain/types/types_test.go:90-121):
    # same input → same md5, many iterations
    want = hashlib.md5(
        b"github_audit/part-00000/doc-00000042.log|github_audit|3|00005,00006,00007,"
    ).hexdigest()
    for _ in range(100):
        assert generated_log_id(mk()).to_pylist() == [want]


def test_log_id_changes_with_payload():
    assert generated_log_id(mk()) != generated_log_id(mk(tokens=(5, 6, 8)))


def test_timestamp_and_partition_labels():
    ts = derive_timestamp(mk())
    assert ts.to_pylist()[0].isoformat() == "2024-01-01T00:00:42"
    assert partition_label(ts, "month").to_pylist() == ["2024-01"]
    assert partition_label(ts, "day").to_pylist() == ["2024-01-01"]
    assert partition_label(ts, "hour").to_pylist() == ["2024-01-01-00"]
    assert partition_label(ts, "year").to_pylist() == ["2024"]
    assert partition_label(ts, "").to_pylist() == [""]
