"""Flagship pipeline: read → parse → enrich → route → sinks + metrics.

The Ray-Data restatement of the reference's core DAG
(``Load``, ``pkg/usecase/load.go:59-136``):

    reference                               here
    ---------                               ----
    32 reader goroutines over a channel     read_parquet → streaming executor
    per-record Rego schema-rule loop        map_batches(ParseStage/RouteStage), Arrow kernels
    once-compiled policy client (ST1)       compiled ruleset, once per worker
    policy `data.*` lookup documents        EnrichStage actor pool + ray.put broadcast
    LogRecordSet merge barrier (shuffle)    write_parquet(partition_cols=[sink])
    per-sink ingest workers                 (same single streaming pass)
    IngestLog counts                        groupby(sink).count() → _metrics
    Firestore message state                 per-partition manifest + _DONE marker

Every stage is lazy; nothing materializes the full dataset. The only
all-to-all exchanges are the partitioned write (keyed by sink) and the
tiny per-sink count groupby.
"""

from __future__ import annotations

import time
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..rules.spec import Ruleset, default_ruleset
from ..stages.enrich import EnrichStage
from ..stages.parse import ParseStage
from ..stages.route import RouteStage
from ..sinks.parquet_sink import update_sink_schema, write_routed
from ..state.checkpoint import (PartitionPlan, commit_partition, pending_partitions,
                                plan_incremental, plan_partitions)
from .. import fixtures
from ..util import read_parquet_clean

#: input columns the pipeline needs — prune at the read. (All four are
#: needed here; listed explicitly so adding input columns later doesn't
#: silently widen the scan.)
INPUT_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def _is_json_input(paths: list[str] | str) -> bool:
    ps = [paths] if isinstance(paths, str) else list(paths)
    return bool(ps) and all(str(p).endswith((".jsonl", ".jsonl.gz", ".json",
                                             ".json.gz")) for p in ps)


def _is_csv_input(paths: list[str] | str) -> bool:
    ps = [paths] if isinstance(paths, str) else list(paths)
    return bool(ps) and all(str(p).endswith((".csv", ".csv.gz"))
                            for p in ps)


def _read_input(paths: list[str] | str,
                override_num_blocks: int | None = None,
                json_row_counter=None) -> ray.data.Dataset:
    """Source dispatch by extension: Parquet (column-pruned — the
    steady-state format), NDJSON/+gzip via ``sources.json_source``
    (the reference's wire format, S4/S5), or CSV/+gzip via
    ``sources.csv_source`` (tokens as a space-separated string,
    rebuilt vectorized). All feed the identical parse→enrich→route
    stages."""
    if _is_json_input(paths):
        from ..sources.json_source import read_sequences_json
        return read_sequences_json(paths, override_num_blocks=override_num_blocks,
                                   counter=json_row_counter)
    if _is_csv_input(paths):
        from ..sources.csv_source import read_sequences_csv
        return read_sequences_csv(paths, override_num_blocks=override_num_blocks,
                                  counter=json_row_counter)
    return read_parquet_clean(paths, columns=INPUT_COLUMNS,
                                 override_num_blocks=override_num_blocks)


def build_routed(paths: list[str] | str,
                 ruleset: Ruleset | None = None,
                 intel: pa.Table | None = None,
                 *,
                 enrich_concurrency: int | tuple[int, int] | None = None,
                 batch_size: int = 32_768,
                 override_num_blocks: int | None = None,
                 json_row_counter=None) -> ray.data.Dataset:
    """Lazy routed dataset: read → parse(filter) → enrich → route."""
    ruleset = ruleset or default_ruleset()
    ruleset.validate()  # fail fast on the driver (≙ eager rule-output
    # validation, reference pkg/domain/model/policy.go:73-89)
    intel = intel if intel is not None else fixtures.intel_table()
    intel_ref = ray.put(intel)  # broadcast once; actors fetch in __init__

    if enrich_concurrency is None:
        # The lookup itself is ~2 ms per 32k batch; what matters is NOT
        # fusing the (expensive) parse map into this pool — fused, the
        # pool size caps parse parallelism and the job pays a large
        # actor-pool spin-up every execution. num_cpus=0.9 below breaks
        # fusion (operators with different resource requests don't
        # fuse), so parse runs as tasks on every CPU and a small pool
        # absorbs the lookups (measured at sf0.1/32 CPUs: median 7.4 s
        # unfused-small vs 9.1 s fused-large, faster in every paired
        # round). frac=0.25 = the shared cluster-derived sizing.
        from ..util import autoscaling_pool
        enrich_concurrency = autoscaling_pool(frac=0.25)

    ds = _read_input(paths, override_num_blocks, json_row_counter)
    ds = ds.map_batches(
        ParseStage(ruleset), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size,
    )
    ds = ds.map_batches(
        EnrichStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=enrich_concurrency,
        num_cpus=0.9,  # fusion breaker — see the comment above
        fn_constructor_kwargs={"intel_ref": intel_ref},
    )
    ds = ds.map_batches(
        RouteStage(ruleset), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size,
    )
    return ds


def run_partition(plan: PartitionPlan, out_dir: str | Path,
                  ruleset: Ruleset, intel: pa.Table | None = None,
                  **build_kwargs) -> dict:
    """Process one checkpoint partition end-to-end and commit it."""
    out_dir = Path(out_dir)
    started = time.time()
    ingest_id = uuid.uuid4().hex
    part_out = out_dir / f"partition={plan.partition_id}"

    # an uncommitted partition dir can only hold leftovers from a
    # crashed attempt (file names embed that run's ingest uuid, so they
    # would NOT be overwritten and would double the partition's rows) —
    # re-execution starts clean (≙ the state store letting a timed-out
    # message be re-processed from scratch)
    import shutil
    shutil.rmtree(part_out, ignore_errors=True)

    counter = None
    if _is_json_input(plan.input_files) or _is_csv_input(plan.input_files):
        # neither serialization carries row-count metadata — count
        # during the one streaming pass (see RowCounter docstring)
        from ..sources.json_source import RowCounter
        counter = RowCounter.remote()

    routed = build_routed(plan.input_files, ruleset, intel,
                          json_row_counter=counter, **build_kwargs)
    # heartbeat claim file for the long-running execution: a sibling
    # job's clean_stale_partitions keys on the dir's newest mtime, and
    # a long shuffle can go >30 min before the first parquet lands —
    # the beat keeps a live run unreclaimable (ADVICE r2). The short
    # count/metrics/commit steps after this leave fresh parquet mtimes.
    from ..state.checkpoint import partition_heartbeat
    with partition_heartbeat(part_out):
        write_routed(routed, part_out, ingest_id=ingest_id)

    # ONE streaming pass executed; per-sink counts + schemas come from
    # the written Parquet footers — metadata-only, no re-execution, and
    # doubling as the append-count reconciliation (≙ Finalize() rows vs
    # expected, reference pkg/infra/bq/client.go:240-248).
    counts: dict[str, int] = {}
    for sink_dir in sorted(part_out.glob("sink_dataset=*/sink_table=*")):
        files = sorted(sink_dir.rglob("*.parquet"))
        n = sum(pq.read_metadata(f).num_rows for f in files)
        dataset = sink_dir.parent.name.split("=", 1)[1]
        table = sink_dir.name.split("=", 1)[1]
        counts[f"{dataset}.{table}"] = counts.get(f"{dataset}.{table}", 0) + n
        if files:
            # widen-only schema registration (≙ createOrUpdateTable);
            # hive-partitioned files already exclude the partition cols.
            update_sink_schema(sink_dir, pq.read_schema(files[0]))
    rows_routed = sum(counts.values())
    if counter is not None:
        # JSON carries no row-count metadata — the canonicalize stage
        # reported per-block counts to the side-channel actor during
        # the ONE streaming pass above (no re-read / re-gunzip)
        rows_in = ray.get(counter.total.remote())
        ray.kill(counter)
    else:
        rows_in = sum(pq.read_metadata(f).num_rows for f in plan.input_files)

    # metrics rows (≙ LoadLog/SourceLog/IngestLog,
    # reference pkg/domain/model/bigquery.go:9-39)
    metrics_dir = out_dir / "_metrics"
    metrics_dir.mkdir(parents=True, exist_ok=True)
    sinks = sorted(counts)
    finished = time.time()
    mrows = pa.table({
        "partition_id": pa.array([plan.partition_id] * len(sinks)),
        "sink_dataset": pa.array([s.split(".", 1)[0] for s in sinks]),
        "sink_table": pa.array([s.split(".", 1)[1] for s in sinks]),
        "row_count": pa.array([counts[s] for s in sinks], type=pa.int64()),
        "ingest_id": pa.array([ingest_id] * len(sinks)),
        "started_at": pa.array([started] * len(sinks)),
        "finished_at": pa.array([finished] * len(sinks)),
        "success": pa.array([True] * len(sinks)),
    })
    pq.write_table(mrows, metrics_dir / f"partition-{plan.partition_id}.parquet")

    commit_partition(out_dir, plan, ruleset_hash=ruleset.spec_hash(),
                     ingest_id=ingest_id, sink_counts=counts,
                     rows_in=rows_in, rows_routed=rows_routed,
                     started_at=started)
    return {"partition_id": plan.partition_id, "rows_in": rows_in,
            "rows_routed": rows_routed, "sink_counts": counts}


def run_job(input_files: list[str], out_dir: str | Path,
            ruleset: Ruleset | None = None, intel: pa.Table | None = None,
            *, files_per_partition: int = 64, incremental: bool = False,
            **build_kwargs) -> list[dict]:
    """Checkpointed job: plan partitions, skip committed ones, run the
    rest. Each partition is one streaming Dataset execution sized to
    keep the whole cluster busy; the driver loop is control-plane only.

    ``incremental=True`` uses content-addressed partition ids and plans
    only files no committed partition covers — the continuous-ingest
    mode where the input file list grows between invocations (≙ the
    reference's serve/job message loop)."""
    ruleset = ruleset or default_ruleset()
    if incremental:
        plans = plan_incremental(out_dir, input_files, files_per_partition)
    else:
        plans = plan_partitions(input_files, files_per_partition)
    # drop aborted-attempt dirs whose pid the current plan no longer
    # covers (incremental re-chunking can shift content-addressed pids
    # — see clean_stale_partitions) so no consumer double-counts them
    from ..state.checkpoint import clean_stale_partitions
    clean_stale_partitions(out_dir, {p.partition_id for p in plans})
    # lineage guard: a resume must run the SAME ruleset the committed
    # partitions ran, or the output mixes two routing semantics (the
    # manifest records the hash for exactly this check)
    current = ruleset.spec_hash()
    from ..state.checkpoint import read_manifests
    for m in read_manifests(out_dir):
        if m.get("ruleset_hash") not in (None, current):
            raise RuntimeError(
                f"resume lineage conflict: partition {m['partition_id']} was "
                f"committed under ruleset {m['ruleset_hash'][:8]}…, current is "
                f"{current[:8]}… — use a fresh out_dir or the original rules")
    results = []
    for plan in pending_partitions(out_dir, plans):
        results.append(run_partition(plan, out_dir, ruleset, intel, **build_kwargs))
    return results
