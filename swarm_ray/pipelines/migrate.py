"""Migrate — copy one sink's rows into another with widen-only schema merge.

≙ ``swarm migrate``: BigQuery-side ``INSERT ... SELECT`` of the shared
fields plus a schema copy/merge into the destination table
(``pkg/usecase/migrate.go:14-75``, ``pkg/controller/cmd/migrate.go:68-116``).
The Ray restatement: stream the source sink's Parquet through
``write_parquet`` into the destination sink directory, after unifying
the source schema into the destination's persisted ``_schema.json``
(widen-only; a type conflict raises, pinned by the reference's
"conflict schema" case ``pkg/usecase/migrate_test.go:115-132``).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

import ray.data

from ..sinks.parquet_sink import update_sink_schema
from ..util import read_parquet_clean


def migrate_sink(src_dir: str | Path, dst_dir: str | Path) -> dict:
    """Append every row of sink ``src_dir`` into sink ``dst_dir``.
    Returns {rows, src_files, dst_schema_fields}."""
    src_dir, dst_dir = Path(src_dir), Path(dst_dir)
    files = sorted(str(p) for p in src_dir.rglob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet under {src_dir}")

    # schema first (≙ migrate's copy-schema-then-insert order): widen
    # the destination schema or fail on conflict BEFORE moving data
    src_schema = pq.read_schema(files[0])
    merged = update_sink_schema(dst_dir, src_schema)

    ds = read_parquet_clean(files)
    ds.write_parquet(str(dst_dir))

    rows = sum(pq.read_metadata(f).num_rows for f in files)
    dst_rows = sum(pq.read_metadata(f).num_rows
                   for f in dst_dir.rglob("*.parquet"))
    if dst_rows < rows:  # append-count reconciliation (≙ Finalize check)
        raise RuntimeError(f"migrate wrote {dst_rows} < {rows} source rows")
    return {"rows": rows, "src_files": len(files),
            "dst_schema_fields": len(merged.names)}
