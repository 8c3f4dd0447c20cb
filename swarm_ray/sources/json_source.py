"""NDJSON (+gzip) ingestion source — the reference's actual wire format.

Swarm ingests GCS objects of newline/concatenated JSON documents, with
``Source.Compress == "gzip"`` wrapping the reader in a gunzip stream
(``pkg/usecase/load.go:262-281``). Here both concerns collapse into
``ray.data.read_json``: the Arrow JSON reader streams each file
block-wise and infers the codec from the ``.jsonl.gz`` extension
(S4/S5 literally, not by analogy), and a canonicalizing ``map_batches``
casts the inferred arrow types to the engine's input schema
(``doc_id: string, tokens: list<int32>, n_tok: int32, source: string``
per BASELINE.json ``input_hint``) so every downstream stage —
parse/enrich/route/sinks — is source-agnostic.

Scale note: a JSON source cannot column-prune (every byte of a row is
scanned to find the next), which is exactly why the engine is
Parquet-native and this reader exists for INGESTION of external feeds,
not as the steady-state storage format.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

#: the engine's canonical input schema (BASELINE.json input_hint)
CANONICAL_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])


def _canonicalize(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return CANONICAL_SCHEMA.empty_table()
    return pa.table({
        "doc_id": t["doc_id"].combine_chunks().cast(pa.string()),
        "tokens": t["tokens"].combine_chunks().cast(pa.list_(pa.int32())),
        "n_tok": t["n_tok"].combine_chunks().cast(pa.int32()),
        "source": t["source"].combine_chunks().cast(pa.string()),
    })


def read_sequences_json(paths: list[str] | str,
                        override_num_blocks: int | None = None
                        ) -> ray.data.Dataset:
    """Streamed NDJSON(.gz) → canonical-schema Dataset."""
    ds = ray.data.read_json(paths, override_num_blocks=override_num_blocks)
    return ds.map_batches(_canonicalize, batch_format="pyarrow",
                          zero_copy_batch=True)
