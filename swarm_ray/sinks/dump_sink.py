"""Dry-run dump sink — NDJSON + schema files instead of Parquet sinks.

≙ the reference's dump client used by ``swarm ingest --dry-run``:
writes ``{dataset}.{table}.log`` NDJSON and
``{dataset}.{table}.schema.json`` instead of touching BigQuery
(``pkg/infra/dump/client.go:47-68, 80-104``). Here each sink gets a
directory of NDJSON part files (concurrent distributed writers cannot
safely append one shared file) plus the schema JSON; pass
``single_file=True`` to repartition each sink to one block and get the
reference's exact one-file-per-sink layout (debug scale only).

This is a DEBUG surface: it materializes the routed dataset once so
the per-sink filters don't re-execute the pipeline N times. Use the
Parquet sink (``parquet_sink.write_routed``) for real runs.
"""

from __future__ import annotations

import json
from pathlib import Path

import ray.data

from .schema import schema_to_json


def write_dump(routed: ray.data.Dataset, out_dir: str | Path,
               *, single_file: bool = False) -> dict[str, int]:
    """Write per-sink NDJSON + schema.json; returns per-sink row counts."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    mat = routed.materialize()  # debug sink: one execution, N sink filters

    # distinct sinks — tiny aggregate
    sinks = sorted(
        (r["sink_dataset"], r["sink_table"])
        for r in mat.groupby(["sink_dataset", "sink_table"]).count().take_all()
    )
    counts: dict[str, int] = {}
    for dataset, table in sinks:
        name = f"{dataset}.{table}"

        # predicate on the Arrow batch, NOT string interpolation into a
        # filter expression — sink names come from user-supplied rules
        # and may contain quotes/metacharacters (ADVICE r1)
        def match(t, _ds=dataset, _tb=table):
            import pyarrow.compute as pc
            return t.filter(pc.and_(pc.equal(t["sink_dataset"], _ds),
                                    pc.equal(t["sink_table"], _tb)))

        sub = mat.map_batches(match, batch_format="pyarrow",
                              zero_copy_batch=True)
        if single_file:
            sub = sub.repartition(1)
        sink_dir = out_dir / f"{name}.log"
        sub.write_json(str(sink_dir))
        (out_dir / f"{name}.schema.json").write_text(
            schema_to_json(sub.schema().base_schema))
        n = 0
        for d in sink_dir.glob("*.json"):
            with open(d) as fh:
                n += sum(1 for _ in fh)
        counts[name] = n
    (out_dir / "_dump_counts.json").write_text(json.dumps(counts, indent=1))
    return counts
