"""CSV (+gzip) ingestion source — the third wire format, completing
the source family (Parquet = steady state, NDJSON(.gz) = the
reference's GCS wire format per ``pkg/usecase/load.go:262-281``, CSV =
the lowest-common-denominator export feeds actually arrive in).

CSV has no list type, so the ``tokens`` column arrives as a
space-separated integer string ("17 4 991") and the canonicalizing
pass rebuilds ``list<int32>`` VECTORIZED — ``pc.split_pattern`` +
list-cast, never a Python loop over rows — and recomputes ``n_tok``
from the parsed list (authoritative over any n_tok column the feed
may carry: CSV feeds lie about derived columns often enough that the
reference recomputes too). Empty/null token cells canonicalize to the
empty list (the i % 997 zero-token edge case survives a CSV
round-trip).

Scale note: like JSON, CSV cannot column-prune or predicate-push —
every byte of a row is scanned. This reader exists for INGESTION of
external feeds; the engine re-lands everything as Parquet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .json_source import CANONICAL_SCHEMA


def _canonicalize_csv(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return CANONICAL_SCHEMA.empty_table()
    raw = t["tokens"].combine_chunks().cast(pa.string())
    # null/empty cells -> "" so split yields a single empty element we
    # then drop; keeps the whole parse one vectorized expression chain
    raw = pc.coalesce(raw, pa.scalar("", pa.string()))
    parts = pc.split_pattern(raw, " ")
    # drop the "" artifacts of empty cells (and of doubled separators)
    tokens = _drop_empty_elements(parts).cast(pa.list_(pa.int32()))
    return pa.table({
        "doc_id": t["doc_id"].combine_chunks().cast(pa.string()),
        "tokens": tokens,
        "n_tok": pc.list_value_length(tokens).cast(pa.int32()),
        "source": t["source"].combine_chunks().cast(pa.string()),
    })


def _drop_empty_elements(parts: pa.Array) -> pa.Array:
    """Remove "" elements from a list<string> array without touching
    Python rows: flatten → boolean mask → rebuild offsets from the
    per-list kept-counts (an exclusive cumsum)."""
    import numpy as np

    parts = parts.combine_chunks() if isinstance(parts,
                                                 pa.ChunkedArray) else parts
    flat = parts.flatten()
    keep = pc.not_equal(flat, "")
    kept_flat = flat.filter(keep)
    # per-list kept counts: sum the keep mask within each list's span
    offs = parts.offsets.to_numpy(zero_copy_only=False)
    keep_np = keep.to_numpy(zero_copy_only=False).astype("int64")
    csum = np.zeros(len(keep_np) + 1, dtype="int64")
    np.cumsum(keep_np, out=csum[1:])
    new_offs = csum[offs - offs[0]]
    return pa.ListArray.from_arrays(
        pa.array(new_offs - new_offs[0], type=pa.int32()), kept_flat)


def read_sequences_csv(paths: list[str] | str,
                       override_num_blocks: int | None = None,
                       counter: "ray.actor.ActorHandle | None" = None
                       ) -> ray.data.Dataset:
    """Streamed CSV(.gz) → canonical-schema Dataset. Mirrors
    ``read_sequences_json``'s contract, including the durable per-block
    RowCounter add (see that docstring for the ray.get rationale)."""
    ps = [paths] if isinstance(paths, str) else list(paths)
    kw = {}
    if any(str(p).endswith(".gz") for p in ps):
        kw["arrow_open_stream_args"] = {"compression": "gzip"}
    ds = ray.data.read_csv(ps, override_num_blocks=override_num_blocks,
                           **kw)

    if counter is None:
        fn = _canonicalize_csv
    else:
        def fn(t: pa.Table) -> pa.Table:
            ray.get(counter.add.remote(len(t)))
            return _canonicalize_csv(t)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
