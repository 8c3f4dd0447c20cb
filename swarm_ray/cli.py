"""CLI — the ``ray job submit`` entrypoint for the engine.

Mirrors the reference's command surface (``pkg/controller/cmd``):

    swarm ingest   → python -m swarm_ray ingest  --input ... --out ...
    swarm schema   → python -m swarm_ray schema  --input ... --out ...
    swarm migrate  → python -m swarm_ray migrate --src ... --dst ...
    (dry-run dump) → python -m swarm_ray ingest --dry-run ...

On a cluster, submit exactly these commands::

    ray job submit --working-dir . -- python -m swarm_ray ingest \
        --input '/data/sequences/*.parquet' --out /data/out

The CLI owns the Ray session (guarded — a pre-initialised session is
reused, so it also works inside ``ray job submit`` drivers that init
first). Library code never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import glob as globmod
import json
import sys


def _ray_init(num_cpus: int | None) -> bool:
    """Init Ray if nobody has; returns True iff WE own the session
    (a pre-existing session — e.g. under ray job submit or pytest —
    must not be shut down by the CLI)."""
    import ray
    owned = not ray.is_initialized()
    if owned:
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    return owned


def _input_files(pattern: str) -> list[str]:
    files = sorted(globmod.glob(pattern))
    if not files:
        raise SystemExit(f"no input files match {pattern!r}")
    return files


def cmd_ingest(args) -> dict:
    from .pipelines.flagship import build_routed, run_job
    from .rules.load import load_ruleset
    from .rules.spec import default_ruleset

    ruleset = load_ruleset(args.rules) if args.rules else default_ruleset()
    files = _input_files(args.input)
    if args.dry_run:
        from .sinks.dump_sink import write_dump
        routed = build_routed(files, ruleset)
        counts = write_dump(routed, args.out)
        return {"mode": "dry-run", "sinks": counts}
    results = run_job(files, args.out, ruleset,
                      files_per_partition=args.files_per_partition,
                      incremental=args.incremental)
    return {"mode": "ingest", "partitions": len(results),
            "rows_in": sum(r["rows_in"] for r in results),
            "rows_routed": sum(r["rows_routed"] for r in results)}


def cmd_schema(args) -> dict:
    """Infer + register sink schemas without ingesting — ≙ ``swarm
    schema`` (apply DDL only, no insert: ``pkg/usecase/schema.go:13-90``).
    Routes a sample (one batch per input file) to discover sink schemas,
    then create-or-widens each sink's ``_schema.json``."""
    from pathlib import Path
    from .pipelines.flagship import build_routed
    from .rules.load import load_ruleset
    from .rules.spec import default_ruleset

    ruleset = load_ruleset(args.rules) if args.rules else default_ruleset()
    files = _input_files(args.input)
    routed = build_routed(files, ruleset).limit(args.sample_rows)
    from .sinks.parquet_sink import sink_file_schema, update_sink_schema
    # register the ON-DISK file schema (partition cols stripped, ingest
    # stamps added) so a later ingest into the same out dir widens
    # cleanly instead of conflicting (ADVICE r1)
    schema = sink_file_schema(routed.schema().base_schema)
    out = Path(args.out)
    sinks = sorted({(a.dataset, a.table)
                    for r in ruleset.schema_rules for a in r.actions})
    for dataset, table in sinks:
        update_sink_schema(out / f"sink_dataset={dataset}" / f"sink_table={table}",
                           schema)
    return {"mode": "schema", "sinks": [f"{d}.{t}" for d, t in sinks],
            "fields": schema.names}


def cmd_migrate(args) -> dict:
    from .pipelines.migrate import migrate_sink
    return {"mode": "migrate", **migrate_sink(args.src, args.dst)}


def cmd_compact(args) -> dict:
    from .sinks.compact import compact_sink, recover_compaction
    recovered = recover_compaction(args.sink)
    out = compact_sink(args.sink, args.target_rows_per_file)
    return {"mode": "compact", "recovered": recovered, **out}


def cmd_report(args) -> dict:
    """Summarize a job's ops log (≙ reading the reference's meta table
    of LoadLog/IngestLog rows, pkg/domain/model/bigquery.go:9-39):
    per-sink routed totals from the _metrics table plus partition /
    lineage status from the manifests."""
    from pathlib import Path
    import pyarrow.parquet as pq
    from .state.checkpoint import is_done, read_manifests

    out = Path(args.out)
    sinks: dict[str, int] = {}
    mdir = out / "_metrics"
    for f in sorted(mdir.glob("*.parquet")) if mdir.exists() else []:
        for r in pq.read_table(f).to_pylist():
            # only COMMITTED partitions count: a crash between the
            # metrics write and the done marker (or a stale pid) must
            # not inflate the totals past rows_routed
            if not is_done(out, r["partition_id"]):
                continue
            key = f"{r['sink_dataset']}.{r['sink_table']}"
            sinks[key] = sinks.get(key, 0) + r["row_count"]
    ms = read_manifests(out)
    done = [m for m in ms if is_done(out, m["partition_id"])]
    secs = [m["finished_at"] - m["started_at"] for m in done]
    return {
        "mode": "report",
        "partitions_committed": len(done),
        "partitions_total": len(ms),
        "rows_in": sum(m["rows_in"] for m in done),
        "rows_routed": sum(m["rows_routed"] for m in done),
        "sinks": dict(sorted(sinks.items())),
        "ruleset_hashes": sorted({m["ruleset_hash"][:12] for m in done}),
        "partition_seconds": {
            "min": round(min(secs), 3) if secs else None,
            "max": round(max(secs), 3) if secs else None,
            "mean": round(sum(secs) / len(secs), 3) if secs else None,
        },
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="swarm_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--auth-rules", default=None,
                   help="auth policy file (M7): default-allow, any "
                        "matching deny rule rejects the invocation")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="parse → enrich → route → sinks")
    pi.add_argument("--input", required=True,
                    help="input glob: .parquet, .jsonl(.gz) or .csv(.gz)")
    pi.add_argument("--out", required=True)
    pi.add_argument("--rules", help="rules file/dir (YAML or JSON)")
    pi.add_argument("--files-per-partition", type=int, default=64)
    pi.add_argument("--dry-run", action="store_true",
                    help="dump sink (NDJSON + schema.json) instead of Parquet")
    pi.add_argument("--incremental", action="store_true",
                    help="continuous-ingest mode: content-addressed partitions, "
                         "only files not yet committed are processed")
    pi.set_defaults(fn=cmd_ingest)

    ps = sub.add_parser("schema", help="infer + register sink schemas only")
    ps.add_argument("--input", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--rules")
    ps.add_argument("--sample-rows", type=int, default=10_000)
    ps.set_defaults(fn=cmd_schema)

    pm = sub.add_parser("migrate", help="copy a sink into another (widen-only)")
    pm.add_argument("--src", required=True)
    pm.add_argument("--dst", required=True)
    pm.set_defaults(fn=cmd_migrate)

    pc_ = sub.add_parser("compact", help="coalesce a sink dir's small part files")
    pc_.add_argument("--sink", required=True)
    pc_.add_argument("--target-rows-per-file", type=int, default=512_000)
    pc_.set_defaults(fn=cmd_compact)

    pr = sub.add_parser("report", help="summarize a job's metrics + manifests")
    pr.add_argument("--out", required=True, help="job output dir")
    pr.set_defaults(fn=cmd_report)

    pv = sub.add_parser(
        "serve", help="push-plane HTTP server: POST /event/pubsub/{cs,swarm} "
                      "envelopes trigger checkpointed ingest")
    pv.add_argument("--out", required=True, help="checkpoint/output dir "
                    "(shared with job mode — push and pull workers may "
                    "drain the same spool)")
    pv.add_argument("--rules", help="rules file/dir (YAML or JSON)")
    pv.add_argument("--host", default="127.0.0.1")
    pv.add_argument("--port", type=int, default=8080)
    pv.add_argument("--max-inflight", type=int, default=4,
                    help="concurrent ingests before shedding 429")
    pv.add_argument("--request-auth-rules", dest="serve_auth_rules",
                    help="per-REQUEST auth policy (M7) evaluated over "
                         "each HTTP request; deny -> 401")
    from .serve import cmd_serve
    pv.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)

    if args.auth_rules:
        # control-plane gate ≙ the reference's auth middleware
        # (pkg/controller/server/middleware.go:17-46): the invocation
        # is the "request" — method = subcommand, path = output target
        import getpass
        from .rules.auth import AuthPolicyInput, Unauthorized, authorize, load_auth_rules
        inp = AuthPolicyInput(
            method=args.cmd,
            path=str(getattr(args, "out", getattr(args, "dst", ""))),
            remote=getpass.getuser(),
            query={k: v for k, v in vars(args).items()
                   if isinstance(v, (str, int)) and v is not None},
        )
        try:
            authorize(inp, load_auth_rules(args.auth_rules))
        except Unauthorized as e:
            print(json.dumps({"error": str(e)}))
            return 77                      # EX_NOPERM ≙ HTTP 401

    owned = _ray_init(args.num_cpus)
    try:
        out = args.fn(args)
        print(json.dumps(out))
        return 0
    finally:
        if owned:
            import ray
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
