"""Packed-shard writer — materialize training shards of packed tokens.

Completes the training-output path: ``ops/tokens.q_seq_pack`` plans
bins; this pipeline EXECUTES the packing and writes one Parquet row
per bin with the concatenated token payload plus in-bin sequence
offsets — exactly what a trainer's collator consumes, streamable with
the existing ``pipelines/dataloader.iter_token_batches`` (the packed
shards carry the same ``tokens``/``n_tok`` columns as any sink).

Execution shape: packing groups are STABLE doc_idx ranges
(``PACK_GROUP`` sequences each, never Ray batch boundaries), so output
is identical under any block splitting/parallelism; each group packs
independently inside ``groupby.map_groups`` (per-group work is a full
FFD pass over thousands of sequences — far above the per-group
callback overhead, unlike the cheap-per-group cases rewritten to keyed
repartitions). Per-bin token concatenation is one arrow take + offset
arithmetic — no Python loop over tokens.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..ops.tokens import PACK_CAPACITY, PACK_GROUP, PackBins, _seq_files


def _pack_group_to_shard(df: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """One packing group → one row PER BIN: (bin_id, tokens: flat
    concat, seq_offsets, doc_ids, n_seqs, n_tok)."""
    df = df.sort_values("doc_id").reset_index(drop=True)
    n_tok = df["n_tok"].to_numpy().astype(np.int64)
    packer = PackBins(capacity)
    bin_idx, n_bins, _rem, _counts = packer.assign(n_tok)

    # order rows by (bin, original position): one stable argsort, then
    # a single arrow take of the list column concatenates every bin's
    # tokens contiguously
    order = np.argsort(bin_idx, kind="stable")
    toks = pa.array(list(df["tokens"]), type=pa.list_(pa.int32()))
    taken = toks.take(pa.array(order))
    flat = taken.combine_chunks() if isinstance(taken, pa.ChunkedArray) else taken
    values = flat.flatten()

    lens_sorted = n_tok[order]
    bins_sorted = bin_idx[order]
    bin_tok = np.bincount(bins_sorted, weights=lens_sorted,
                          minlength=n_bins).astype(np.int64)
    bin_offsets = np.zeros(n_bins + 1, dtype=np.int64)
    np.cumsum(bin_tok, out=bin_offsets[1:])
    # int32 offsets always fit: a group is PACK_GROUP sequences of
    # ≤ ~2^8 tokens — orders of magnitude under 2^31 tokens
    packed = pa.ListArray.from_arrays(
        pa.array(bin_offsets.astype(np.int32)), values)

    # per-bin sequence boundary offsets + member doc ids
    grp = int(df["pack_group"].iloc[0])
    seq_offsets: list[list[int]] = [[] for _ in range(n_bins)]
    doc_lists: list[list[str]] = [[] for _ in range(n_bins)]
    pos = np.zeros(n_bins, dtype=np.int64)
    ids_sorted = df["doc_id"].to_numpy()[order]
    for L, b, d in zip(lens_sorted, bins_sorted, ids_sorted):
        seq_offsets[b].append(int(pos[b]))
        doc_lists[b].append(d)
        pos[b] += L

    return pd.DataFrame({
        "bin_id": [f"{grp:08d}#{b:06d}" for b in range(n_bins)],
        "pack_group": grp,
        "tokens": packed.to_pylist(),
        "n_tok": bin_tok,
        "seq_offsets": seq_offsets,
        "doc_ids": doc_lists,
        "n_seqs": np.bincount(bins_sorted, minlength=n_bins).astype(np.int64),
    })


def write_packed_shards(sf_dir: str, out_dir: str | Path,
                        capacity: int = PACK_CAPACITY) -> dict:
    """Pack the sequences corpus into fixed-capacity bins and write the
    packed shards (hive-partitioned by a shard key of the pack group so
    a failed run resumes per shard). Returns totals for reconciliation."""
    from ..stages.ids import doc_index

    def add_group(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        idx = doc_index(t)
        return t.append_column(
            "pack_group", pc.cast(pc.divide(idx, PACK_GROUP), pa.int64()))

    out_dir = Path(out_dir)
    ds = (ray.data.read_parquet(_seq_files(sf_dir),
                                columns=["doc_id", "tokens", "n_tok"])
          .map_batches(add_group, batch_format="pyarrow", zero_copy_batch=True)
          .groupby("pack_group")
          .map_groups(lambda g: _pack_group_to_shard(g, capacity),
                      batch_format="pandas"))

    def add_shard(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column(
            "shard", pc.cast(pc.divide(t["pack_group"], 16), pa.int64()))

    (ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
       .write_parquet(str(out_dir), partition_cols=["shard"],
                      compression="zstd", compression_level=1))

    import pyarrow.parquet as pq
    files = sorted(out_dir.rglob("*.parquet"))
    n_bins = sum(pq.read_metadata(f).num_rows for f in files)
    return {"bins": n_bins, "files": len(files), "out_dir": str(out_dir)}
