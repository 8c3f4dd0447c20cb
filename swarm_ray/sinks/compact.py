"""Sink compaction — coalesce a sink directory's small part files.

The streaming write path deliberately does NOT floor file sizes
(``write_routed``: a ``min_rows_per_file`` floor collapses the stream
into few fat write tasks, measured 30× slower); the flip side is many
small part files per sink when partitions are small. This is the
promised follow-up pass: an offline maintenance job that rewrites one
sink directory into ~``target_rows_per_file``-sized files.

Swap protocol (atomic-enough for a maintenance job, documented):
write the compacted files + copied sidecars into ``<sink>._compact``,
verify row counts match exactly, then two directory renames
(``sink → sink._pre`` then ``._compact → sink``) and remove the old
dir. A crash between the renames leaves ``<sink>._pre`` intact and the
sink absent — recovery is renaming ``._pre`` back (never data loss,
never double rows; ``recover_compaction`` does it).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow.parquet as pq

import ray.data
from ..util import read_parquet_clean


def compact_sink(sink_dir: str | Path,
                 target_rows_per_file: int = 512_000) -> dict:
    """Rewrite a sink dir's parquet into ~target-sized files.
    Returns {rows, files_before, files_after}."""
    sink_dir = Path(sink_dir)
    files = sorted(str(p) for p in sink_dir.glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet directly under {sink_dir}")
    rows_before = sum(pq.read_metadata(f).num_rows for f in files)

    tmp = sink_dir.with_name(sink_dir.name + "._compact")
    pre = sink_dir.with_name(sink_dir.name + "._pre")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(pre, ignore_errors=True)

    (read_parquet_clean(files)
     .write_parquet(str(tmp), min_rows_per_file=target_rows_per_file,
                    compression="zstd", compression_level=1))

    new_files = sorted(tmp.glob("*.parquet"))
    rows_after = sum(pq.read_metadata(f).num_rows for f in new_files)
    if rows_after != rows_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch under {sink_dir}: "
            f"{rows_before} in, {rows_after} out — aborted, sink untouched")

    # carry sidecars (schema registry etc.) into the new dir
    for side in sink_dir.iterdir():
        if side.is_file() and side.suffix != ".parquet":
            shutil.copy2(side, tmp / side.name)

    sink_dir.rename(pre)
    # offline-only contract, now ENFORCED: if an ingest wrote new part
    # files between the initial glob and the rename, they are sitting
    # in ._pre and the rmtree below would destroy them — verify ._pre
    # holds exactly the file set we compacted, else restore and abort
    # (nothing lost; the sink is back verbatim, extras included).
    expected = sorted(Path(f).name for f in files)
    got = sorted(p.name for p in pre.glob("*.parquet"))
    if got != expected:
        pre.rename(sink_dir)
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"concurrent writer detected under {sink_dir}: part files "
            f"changed during compaction ({len(got)} now vs {len(expected)} "
            f"compacted) — sink restored untouched; re-run when idle")
    tmp.rename(sink_dir)
    shutil.rmtree(pre, ignore_errors=True)
    return {"rows": rows_before, "files_before": len(files),
            "files_after": len(new_files)}


def recover_compaction(sink_dir: str | Path) -> bool:
    """Recover from a crash anywhere in the swap:

    * sink missing + ``._pre`` present → crash BETWEEN the renames:
      restore the original (the compacted copy in ``._compact`` is
      discarded — it will be rebuilt).
    * sink present + ``._pre`` present → crash AFTER the second rename
      but before cleanup: the sink is already the compacted copy; the
      leftover ``._pre`` duplicate must be removed or any
      ``sink_table=*`` glob double-counts every row.

    Returns True if a recovery happened."""
    sink_dir = Path(sink_dir)
    pre = sink_dir.with_name(sink_dir.name + "._pre")
    tmp = sink_dir.with_name(sink_dir.name + "._compact")
    if not sink_dir.exists() and pre.exists():
        pre.rename(sink_dir)
        shutil.rmtree(tmp, ignore_errors=True)
        return True
    if sink_dir.exists() and pre.exists():
        shutil.rmtree(pre, ignore_errors=True)
        return True
    return False
