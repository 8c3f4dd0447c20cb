"""Checkpoint / resume — per-partition lineage manifests + done-markers.

≙ the reference's exactly-once message state machine (Firestore
transactional acquire with expiry/TTL, ``pkg/infra/firestore/client.go:24-91``,
``pkg/domain/model/state.go:19-31``) re-based on what a batch engine on
a shared filesystem / object store actually has: ATOMIC RENAME. A job
is split into partitions (groups of input files — ≙ one Pub/Sub
message carrying ≤128 objects, ``pkg/usecase/enqueue.go:20``); each
partition writes its outputs under ``out/partition=<pid>/``, then a
manifest (lineage: input files, ruleset hash, per-sink counts, output
stats, timings) and finally an atomic ``_DONE`` marker. Resume = skip
partitions whose marker exists; deterministic ``log_id``s make
re-execution of an uncommitted partition idempotent (same rows, same
IDs — ≙ the reference's BigQuery-side dedup contract, README.md:65).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from pathlib import Path


@dataclass
class PartitionPlan:
    partition_id: str
    input_files: list[str]


def plan_partitions(input_files: list[str], files_per_partition: int = 8) -> list[PartitionPlan]:
    """Deterministic partitioning of the input file list. At cluster
    scale ``files_per_partition`` is sized so one partition saturates
    the cluster for a few minutes — the checkpoint granularity /
    blast-radius tradeoff (finer than the reference's one-object
    granularity, same idea)."""
    files = sorted(input_files)
    plans = []
    for i in range(0, len(files), files_per_partition):
        chunk = files[i:i + files_per_partition]
        plans.append(PartitionPlan(f"{i // files_per_partition:05d}", chunk))
    return plans


def _part_dir(out_dir: str | Path, pid: str) -> Path:
    return Path(out_dir) / "_manifest" / f"partition-{pid}"


def is_done(out_dir: str | Path, pid: str) -> bool:
    return (_part_dir(out_dir, pid) / "_DONE").exists()


def pending_partitions(out_dir: str | Path, plans: list[PartitionPlan]) -> list[PartitionPlan]:
    return [p for p in plans if not is_done(out_dir, p.partition_id)]


def commit_partition(out_dir: str | Path, plan: PartitionPlan, *,
                     ruleset_hash: str, ingest_id: str,
                     sink_counts: dict[str, int],
                     rows_in: int, rows_routed: int,
                     started_at: float, extra: dict | None = None) -> Path:
    """Write the lineage manifest then the atomic done-marker. The
    marker is a separate rename-created file so a crash between
    manifest and marker re-runs the partition (safe: idempotent)."""
    d = _part_dir(out_dir, plan.partition_id)
    d.mkdir(parents=True, exist_ok=True)
    manifest = {
        "partition_id": plan.partition_id,
        "input_files": plan.input_files,
        "ruleset_hash": ruleset_hash,
        "ingest_id": ingest_id,
        "rows_in": rows_in,
        "rows_routed": rows_routed,
        "sink_counts": sink_counts,
        "started_at": started_at,
        "finished_at": time.time(),
        **(extra or {}),
    }
    tmp = d / "manifest.json.tmp"
    tmp.write_text(json.dumps(manifest, indent=1))
    os.replace(tmp, d / "manifest.json")
    marker_tmp = d / "_DONE.tmp"
    marker_tmp.write_text(ingest_id)
    os.replace(marker_tmp, d / "_DONE")
    return d / "manifest.json"


def read_manifests(out_dir: str | Path) -> list[dict]:
    root = Path(out_dir) / "_manifest"
    out = []
    if root.exists():
        for m in sorted(root.glob("partition-*/manifest.json")):
            out.append(json.loads(m.read_text()))
    return out


def enqueue_stats(plans: list[PartitionPlan]) -> dict:
    """Work-queue totals for a planned job — ≙ the reference's enqueue
    accounting (count/size of listed objects batched into messages of
    ≤128 objects / ≤4 MiB, ``pkg/usecase/enqueue.go:15-73``). Here a
    "message" is a partition; the totals feed the job log (≙ LoadLog)."""
    n_files = sum(len(p.input_files) for p in plans)
    n_bytes = 0
    for p in plans:
        for f in p.input_files:
            try:
                n_bytes += os.path.getsize(f)
            except OSError:
                pass
    return {"partitions": len(plans), "files": n_files, "bytes": n_bytes}


def committed_files(out_dir: str | Path) -> set[str]:
    """Input files covered by COMMITTED partitions (done-marker present)."""
    done = set()
    for m in read_manifests(out_dir):
        if is_done(out_dir, m["partition_id"]):
            done.update(m["input_files"])
    return done


#: a partition dir is only reclaimed once untouched this long —
#: ≙ the reference's 30 m state expiry before another worker may take
#: over a message (pkg/usecase/usecase.go:39, stateTimeout)
STALE_GRACE_S = 1800

#: claim file a live run keeps touching inside its partition dir
HEARTBEAT_NAME = "_HEARTBEAT"
HEARTBEAT_INTERVAL_S = 60.0


def partition_heartbeat(part_dir: str | Path,
                        interval_s: float = HEARTBEAT_INTERVAL_S):
    """Context manager: drop a ``_HEARTBEAT`` claim file in the
    partition dir and touch it from a daemon thread every
    ``interval_s`` while the partition runs. Closes the ADVICE r2 gap
    where ``clean_stale_partitions`` could reclaim a LIVE sibling's
    in-flight partition that goes >30 min without any file mtime
    changing (e.g. a long shuffle before the first parquet lands) —
    the heartbeat keeps the dir's newest mtime fresh, and reclamation
    already keys on that. Removed on clean exit; an abandoned dir's
    heartbeat goes quiet and ages out like any other file."""
    import contextlib
    import threading

    @contextlib.contextmanager
    def _ctx():
        d = Path(part_dir)
        d.mkdir(parents=True, exist_ok=True)
        hb = d / HEARTBEAT_NAME
        stop = threading.Event()

        def beat():
            while not stop.wait(interval_s):
                try:
                    hb.touch()
                except OSError:
                    pass                    # dir raced away; next beat retries

        hb.touch()
        t = threading.Thread(target=beat, daemon=True,
                             name=f"heartbeat-{d.name}")
        t.start()
        try:
            yield hb
        finally:
            stop.set()
            t.join(timeout=2)
            hb.unlink(missing_ok=True)

    return _ctx()


def clean_stale_partitions(out_dir: str | Path,
                           planned_pids: set[str],
                           grace_s: float = STALE_GRACE_S) -> list[str]:
    """Remove output dirs of UNCOMMITTED partitions that the current
    plan does not re-execute.

    Why (ADVICE r1): ``run_partition`` wipes a crashed partition's dir
    only when the plan re-plans the SAME pid. In incremental mode the
    pid is content-addressed over the chunk's file list, and newly
    arrived files shift the sorted chunk boundaries — so a crashed
    partition's files can re-chunk under a NEW pid, leaving the stale
    ``partition=<old-pid>`` dir (parquet written, no done marker)
    forever. Consumers that glob parquet under out_dir (migrate,
    dataloader) would then double-count those rows. A partition dir
    with no done marker and no place in the plan is an aborted attempt
    — deterministic log_ids mean its rows are exactly re-produced by
    whichever new partitions now cover its files.

    Concurrent-job guard: a CURRENTLY-RUNNING sibling job's in-flight
    partition also has no marker and a foreign pid, so reclamation
    additionally requires the dir to be UNTOUCHED for ``grace_s``
    (default 30 min ≙ the reference's state expiry window) — a live
    writer keeps refreshing its files' mtimes; only an abandoned dir
    goes quiet that long."""
    import shutil
    removed: list[str] = []
    root = Path(out_dir)
    if not root.exists():
        return removed
    now = time.time()
    for d in sorted(root.glob("partition=*")):
        pid = d.name.split("=", 1)[1]
        if pid in planned_pids or is_done(out_dir, pid):
            continue
        try:
            newest = max((p.stat().st_mtime for p in d.rglob("*")),
                         default=d.stat().st_mtime)
        except OSError:
            continue                        # raced a concurrent writer
        if now - newest < grace_s:
            continue                        # possibly a live sibling job
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(_part_dir(out_dir, pid), ignore_errors=True)
        (Path(out_dir) / "_metrics" / f"partition-{pid}.parquet").unlink(
            missing_ok=True)                # orphan ops-log row
        removed.append(pid)
    return removed


def plan_incremental(out_dir: str | Path, input_files: list[str],
                     files_per_partition: int = 8) -> list[PartitionPlan]:
    """Incremental / continuous-ingest planning (≙ the reference's
    serve/job modes processing objects as they arrive). Positional
    chunk ids break when the file list grows between runs (sorted
    interleaving shifts chunk boundaries, so a committed id could map
    to different files and resume would silently skip them). Here:

    * only files NOT covered by a committed manifest are planned;
    * partition ids are CONTENT-ADDRESSED — md5 of the chunk's file
      list — so a partition is only ever skipped for exactly the file
      set it committed.
    """
    import hashlib
    done = committed_files(out_dir)
    todo = [f for f in sorted(input_files) if f not in done]
    plans = []
    for i in range(0, len(todo), files_per_partition):
        chunk = todo[i:i + files_per_partition]
        pid = hashlib.md5(json.dumps(chunk).encode()).hexdigest()[:12]
        plans.append(PartitionPlan(pid, chunk))
    return plans
