"""Training-side consumption — stream token batches out of a sink.

The engine's outputs are per-sink Parquet directories; the consumer at
training time is a dataloader that streams token arrays without ever
materializing the corpus. ``iter_token_batches`` is that surface: a
lazy ``ray.data`` read of one sink (column-pruned to the payload),
consumed via ``iter_batches`` with zero-copy Arrow → numpy conversion
and re-chunked to a fixed token budget per yielded batch (what a
trainer's collator wants), all under streaming backpressure.
"""

from __future__ import annotations

from collections.abc import Iterator
from pathlib import Path

import numpy as np

import ray.data
from ..util import read_parquet_clean


def iter_token_batches(sink_dir: str | Path, *, batch_tokens: int = 65_536,
                       rows_per_read_batch: int = 4096,
                       id_col: str = "doc_id") -> Iterator[dict]:
    """Yield dicts ``{"tokens": int32[...], "offsets": int64[...],
    "doc_ids": list[str]}`` where ``tokens`` is the flat concatenation
    of whole sequences totalling ≤ ``batch_tokens`` (a longer single
    sequence yields alone). Streams block-by-block; nothing holds more
    than one read batch plus the accumulating output."""
    files = sorted(str(p) for p in Path(sink_dir).rglob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet under {sink_dir}")
    ds = read_parquet_clean(files, columns=[id_col, "tokens", "n_tok"])

    acc_vals: list[np.ndarray] = []
    acc_offs: list[int] = [0]
    acc_docs: list[str] = []
    acc_total = 0

    def flush():
        nonlocal acc_vals, acc_offs, acc_docs, acc_total
        out = {
            "tokens": (np.concatenate(acc_vals) if acc_vals
                       else np.empty(0, dtype=np.int32)),
            "offsets": np.asarray(acc_offs, dtype=np.int64),
            "doc_ids": acc_docs,
        }
        acc_vals, acc_offs, acc_docs, acc_total = [], [0], [], 0
        return out

    for batch in ds.iter_batches(batch_size=rows_per_read_batch,
                                 batch_format="pyarrow"):
        col = batch["tokens"].combine_chunks()
        vals = col.values.to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        docs = batch[id_col].to_pylist()
        for i in range(len(batch)):
            seq = vals[offs[i]:offs[i + 1]]
            if acc_total and acc_total + len(seq) > batch_tokens:
                yield flush()
            acc_vals.append(seq)
            acc_total += len(seq)
            acc_offs.append(acc_total)
            acc_docs.append(docs[i])
            if acc_total >= batch_tokens:
                yield flush()
    if acc_docs:
        yield flush()
