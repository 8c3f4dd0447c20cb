"""Deterministic IDs and timestamps — vectorized over Arrow batches.

``log_id`` semantics follow the reference: when a schema rule supplies
no ID, the ID is the md5 hex digest of the canonically-encoded record
(reference ``pkg/domain/types/types.go:27-34``, applied at
``pkg/usecase/load.go:228-234``) — the idempotency/dedup key. The
reference encodes the record as JSON; our input schema is fixed, so the
canonical encoding is the pipe-joined string

    doc_id|source|n_tok|t0,t1,...,tn

which DuckDB can reproduce exactly
(``md5(doc_id || '|' || source || '|' || n_tok || '|' ||
array_to_string(tokens, ','))``), making the generated IDs part of the
oracle-checked surface rather than an opaque implementation detail.

Everything except the final md5 digest is pyarrow.compute kernels; the
digest itself is a tight hashlib loop (md5 has no vectorized kernel),
amortized across workers by ``map_batches``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: epoch for synthetic per-document timestamps; must match
#: rules.spec.BASE_TS and the oracle SQL.
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs

_DOC_IDX_RE = r"doc-(?P<idx>\d+)"


def canonical_string(batch: pa.Table) -> pa.Array:
    """Pipe-joined canonical encoding of each record (see module doc)."""
    toks_str = pc.binary_join(batch["tokens"].cast(pa.list_(pa.string())), ",")
    return pc.binary_join_element_wise(
        batch["doc_id"],
        batch["source"],
        pc.cast(batch["n_tok"], pa.string()),
        toks_str,
        "|",
    )


def md5_hex(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    md5 = hashlib.md5
    return pa.array([md5(s.encode()).hexdigest() for s in arr.to_pylist()],
                    type=pa.string())


def generated_log_id(batch: pa.Table) -> pa.Array:
    return md5_hex(canonical_string(batch))


def doc_index(batch: pa.Table) -> pa.Array:
    """Extract the numeric document index from the path-shaped doc_id —
    the vectorized-regex 'grok parse' of the object path."""
    ext = pc.extract_regex(batch["doc_id"], _DOC_IDX_RE)
    return pc.cast(pc.struct_field(ext, "idx"), pa.int64())


def derive_timestamp(batch: pa.Table) -> pa.Array:
    """Synthetic event time: BASE_TS + doc_index seconds, as
    timestamp[us] (≙ the schema rule parsing an event-time field,
    reference pkg/usecase/load.go:236-244 float-sec → time.Time)."""
    idx = doc_index(batch)
    us = pc.add(pc.multiply(idx, pa.scalar(1_000_000, type=pa.int64())),
                pa.scalar(BASE_TS_US, type=pa.int64()))
    return pc.cast(us, pa.timestamp("us"))


#: strftime formats per time-partition granularity — identical in Arrow
#: pc.strftime and DuckDB strftime, so partition labels oracle-match.
PARTITION_FORMATS = {
    "hour": "%Y-%m-%d-%H",
    "day": "%Y-%m-%d",
    "month": "%Y-%m",
    "year": "%Y",
}


def partition_label(ts: pa.Array, granularity: str) -> pa.Array:
    """Time-partition label (≙ reference time-partitioning options,
    pkg/domain/types/types.go:51-57): '2024-01' for month etc.;
    empty string when the sink is unpartitioned."""
    if not granularity:
        return pa.repeat(pa.scalar("", type=pa.string()), len(ts))
    return pc.strftime(ts, format=PARTITION_FORMATS[granularity])
