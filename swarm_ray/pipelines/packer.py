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
from ..util import read_parquet_clean


def _pack_group_to_shard(df: pd.DataFrame, capacity: int) -> pa.Table:
    """One packing group → one row PER BIN: (bin_id, tokens: flat
    int32 concat, seq_offsets, doc_ids, n_seqs, n_tok)."""
    df = df.sort_values("doc_id").reset_index(drop=True)
    n_tok = df["n_tok"].to_numpy().astype(np.int64)
    packer = PackBins(capacity)
    bin_idx, n_bins, _rem, _counts = packer.assign(n_tok)

    # order rows by (bin, original position): one stable argsort, then
    # a single arrow take of the list column concatenates every bin's
    # tokens contiguously — the output stays an Arrow int32 ListArray
    # end to end (to_pylist would box every token AND widen the column
    # to list<int64> on the pandas round trip)
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
    if bin_offsets[-1] >= 2**31:
        raise ValueError(
            f"packing group token mass {bin_offsets[-1]} overflows int32 "
            "list offsets — lower PACK_GROUP or use LargeListArray here")
    packed = pa.ListArray.from_arrays(
        pa.array(bin_offsets.astype(np.int32)), values)

    # per-bin sequence boundary offsets + member doc ids, fully
    # vectorized: rows are already in bin order, so the within-bin
    # position is the global running sum minus the bin's start
    grp = int(df["pack_group"].iloc[0])
    global_cum = np.cumsum(lens_sorted) - lens_sorted
    pos_in_bin = global_cum - bin_offsets[bins_sorted]
    n_seqs = np.bincount(bins_sorted, minlength=n_bins).astype(np.int64)
    seq_list_offsets = np.zeros(n_bins + 1, dtype=np.int64)
    np.cumsum(n_seqs, out=seq_list_offsets[1:])
    seq_offsets = pa.ListArray.from_arrays(
        pa.array(seq_list_offsets.astype(np.int32)),
        pa.array(pos_in_bin.astype(np.int32)))
    ids_sorted = df["doc_id"].to_numpy()[order]
    doc_lists = pa.ListArray.from_arrays(
        pa.array(seq_list_offsets.astype(np.int32)),
        pa.array(ids_sorted, type=pa.string()))

    return pa.table({
        "bin_id": pa.array([f"{grp:08d}#{b:06d}" for b in range(n_bins)]),
        "pack_group": pa.array(np.full(n_bins, grp, dtype=np.int64)),
        "tokens": packed,
        "n_tok": pa.array(bin_tok),
        "seq_offsets": seq_offsets,
        "doc_ids": doc_lists,
        "n_seqs": pa.array(n_seqs),
    })


def write_packed_shards(sf_dir: str, out_dir: str | Path,
                        capacity: int = PACK_CAPACITY) -> dict:
    """Pack the sequences corpus into fixed-capacity bins and write the
    packed shards (hive-partitioned by a shard key of the pack group).
    Reruns start clean and are idempotent (deterministic packing).
    Returns totals for reconciliation."""
    from ..ops.tokens import add_pack_group

    out_dir = Path(out_dir)
    # clean start: write_parquet APPENDS, so leftovers from a crashed
    # attempt would double every bin; deterministic packing makes the
    # full rerun byte-identical
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = (read_parquet_clean(_seq_files(sf_dir),
                                columns=["doc_id", "tokens", "n_tok"])
          .map_batches(add_pack_group, batch_format="pyarrow",
                       zero_copy_batch=True)
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
