"""End-to-end flagship pipeline vs the pure-Python oracle, plus
checkpoint/resume and idempotency (SURVEY §3.1, §7 steps 2-7)."""

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from swarm_ray import fixtures
from swarm_ray.pipelines.flagship import build_routed, run_job
from swarm_ray.rules.spec import default_ruleset
from swarm_ray.state.checkpoint import read_manifests

from .oracle_py import route_rows


@pytest.fixture(scope="module")
def oracle_routed(tiny_seq_files):
    rows = []
    for f in tiny_seq_files:
        rows.extend(pq.read_table(f).to_pylist())
    return route_rows(rows, default_ruleset())


@pytest.fixture(scope="module")
def ray_routed(tiny_seq_files):
    return build_routed(tiny_seq_files).to_pandas()


def key_of(df_or_rows):
    if hasattr(df_or_rows, "itertuples"):
        return sorted((r.sink_dataset, r.sink_table, r.log_id)
                      for r in df_or_rows.itertuples())
    return sorted((r["sink_dataset"], r["sink_table"], r["log_id"]) for r in df_or_rows)


def test_routed_row_equality(ray_routed, oracle_routed):
    """Order-insensitive routed-row equality incl. byte-for-byte tokens
    (the BASELINE.json correctness clause)."""
    assert len(ray_routed) == len(oracle_routed)
    assert key_of(ray_routed) == key_of(oracle_routed)
    want_tokens = {(r["sink_dataset"], r["sink_table"], r["log_id"]):
                   list(r["tokens"] or []) for r in oracle_routed}
    got = ray_routed.sample(n=min(2000, len(ray_routed)), random_state=7)
    for r in got.itertuples():
        toks = list(r.tokens) if r.tokens is not None else None
        assert (toks or []) == list(
            want_tokens[(r.sink_dataset, r.sink_table, r.log_id)])
        if toks is not None:  # patched actions null the payload
            assert r.n_tok == len(toks)


def test_per_sink_counts(ray_routed, oracle_routed):
    from collections import Counter
    want = Counter((r["sink_dataset"], r["sink_table"]) for r in oracle_routed)
    got = Counter(zip(ray_routed["sink_dataset"], ray_routed["sink_table"]))
    assert got == want


def test_fanout_double_counts(oracle_routed):
    from collections import Counter
    c = Counter((r["sink_dataset"], r["sink_table"]) for r in oracle_routed)
    assert c[("logs", "access_raw")] == c[("logs", "access_audit")] > 0


def test_job_resume_and_idempotency(tiny_seq_files, tmp_path):
    out = tmp_path / "job_out"
    res1 = run_job(tiny_seq_files, out, files_per_partition=1)
    assert len(res1) == len(tiny_seq_files)

    def sink_files():
        # rows per sink dir (filenames embed a per-run ingest uuid)
        agg = {}
        for p in sorted(out.rglob("*.parquet")):
            if "_metrics" in str(p):
                continue
            key = str(p.parent.relative_to(out))
            agg[key] = agg.get(key, 0) + pq.read_metadata(p).num_rows
        return agg

    first = sink_files()
    # rerun: everything committed → no work, no new files
    assert run_job(tiny_seq_files, out, files_per_partition=1) == []
    assert sink_files() == first

    # crash-recovery: remove one done-marker + its outputs → only that
    # partition reruns, and the final state is identical (idempotent IDs)
    marker = out / "_manifest" / "partition-00000" / "_DONE"
    marker.unlink()
    shutil.rmtree(out / "partition=00000")
    res3 = run_job(tiny_seq_files, out, files_per_partition=1)
    assert [r["partition_id"] for r in res3] == ["00000"]
    assert set(sink_files()) == set(first)
    assert sum(sink_files().values()) == sum(first.values())

    # manifests carry lineage
    ms = read_manifests(out)
    assert all(m["ruleset_hash"] == default_ruleset().spec_hash() for m in ms)
    assert all(m["rows_routed"] == sum(m["sink_counts"].values()) for m in ms)


def test_metrics_match_outputs(tiny_seq_files, tmp_path):
    out = tmp_path / "m_out"
    run_job(tiny_seq_files, out)
    metrics = pq.read_table(sorted((out / "_metrics").glob("*.parquet"))[0]).to_pylist()
    for m in metrics:
        sink_dir = (out / f"partition={m['partition_id']}"
                    / f"sink_dataset={m['sink_dataset']}" / f"sink_table={m['sink_table']}")
        n = sum(pq.read_metadata(p).num_rows for p in sink_dir.rglob("*.parquet"))
        assert n == m["row_count"]
        # persisted sink schema exists (≙ table DDL)
        assert (sink_dir / "_schema.json").exists()


def test_enqueue_stats(tiny_seq_files):
    from swarm_ray.state.checkpoint import enqueue_stats, plan_partitions
    plans = plan_partitions(tiny_seq_files, 1)
    st = enqueue_stats(plans)
    assert st["partitions"] == len(tiny_seq_files)
    assert st["files"] == len(tiny_seq_files)
    assert st["bytes"] > 0


def test_write_routed_shuffle_sinks(tiny_seq_files, tmp_path):
    """Many-sinks plan: hash-repartition by sink before the partitioned
    write — same rows, far fewer files (≈ blocks ≥ sinks)."""
    from swarm_ray.sinks.parquet_sink import write_routed

    direct = tmp_path / "direct"
    shuffled = tmp_path / "shuffled"
    write_routed(build_routed(tiny_seq_files), direct)
    write_routed(build_routed(tiny_seq_files), shuffled, shuffle_sinks=8)

    def stats(d):
        files = [p for p in d.rglob("*.parquet")]
        return len(files), sum(pq.read_metadata(p).num_rows for p in files)

    nf_d, rows_d = stats(direct)
    nf_s, rows_s = stats(shuffled)
    assert rows_d == rows_s
    assert nf_s <= nf_d


def test_resume_ruleset_lineage_conflict(tiny_seq_files, tmp_path):
    """Resuming under a different ruleset must fail loudly (manifests
    record the ruleset hash for exactly this check)."""
    from swarm_ray.rules.spec import Action, Cond, Rule, Ruleset

    out = tmp_path / "lineage_out"
    run_job(tiny_seq_files[:1], out)
    other = Ruleset(event_rules=(), schema_rules=(
        Rule("only", (Cond("source", "eq", "cloudtrail"),),
             (Action("d", "t"),)),))
    with pytest.raises(RuntimeError, match="lineage conflict"):
        run_job(tiny_seq_files, out, ruleset=other)


def test_malformed_doc_ids_propagate_nulls_not_drops():
    """Rows whose doc_id doesn't match the path grok keep routing:
    parse fields and timestamp go NULL (typed), partition label is
    empty, and the content-hash log_id stays deterministic. (The
    reference would reject a record its schema rule can't timestamp;
    here timestamps are derived, so null marks 'underivable' without
    losing the payload — checked so the behavior is pinned, not
    accidental.)"""
    import pyarrow as pa
    from swarm_ray.rules.compile import CompiledRuleset
    from swarm_ray.stages.parse import parse_batch
    from swarm_ray.stages.route import route_batch

    rows = pa.table({
        "doc_id": ["github_audit/weird-no-pattern"],
        "tokens": pa.array([[1, 2]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([2], type=pa.int32()),
        "source": ["github_audit"],
    })
    c = CompiledRuleset(default_ruleset())
    routed = route_batch(parse_batch(rows, c), c)
    assert len(routed) == 1
    r = routed.to_pylist()[0]
    assert r["timestamp"] is None and r["sink_partition"] == ""
    assert len(r["log_id"]) == 32
    routed2 = route_batch(parse_batch(rows, c), c)
    assert routed2["log_id"].to_pylist() == [r["log_id"]]


def test_hundred_sinks_end_to_end(tiny_seq_files, tmp_path):
    """Many-sinks stress: a generated 100-action ruleset fans each
    github_audit row into bucketed sinks; the shuffle_sinks write path
    produces one directory per sink with exact counts."""
    from swarm_ray.rules.spec import Action, Cond, Rule, Ruleset
    from swarm_ray.sinks.parquet_sink import write_routed

    n_sinks = 100
    rules = tuple(
        Rule(f"bucket_{i}", (
            Cond("source", "eq", "github_audit"),
            Cond("doc_id", "suffix", ".log"),
            Cond("n_tok", "ge" if i % 2 == 0 else "gt", i % 7),
        ), (Action("fan", f"t{i:03d}"),))
        for i in range(n_sinks)
    )
    rs = Ruleset(event_rules=(), schema_rules=rules)
    routed = build_routed(tiny_seq_files[:1], rs)
    write_routed(routed, tmp_path / "fan", shuffle_sinks=8)
    sink_dirs = list((tmp_path / "fan").glob("sink_dataset=fan/sink_table=*"))
    assert len(sink_dirs) == n_sinks
    total = sum(pq.read_metadata(p).num_rows
                for p in (tmp_path / "fan").rglob("*.parquet"))
    assert total == build_routed(tiny_seq_files[:1], rs).count()


def test_crash_leftovers_do_not_double_rows(tiny_seq_files, tmp_path):
    """A crashed attempt leaves uuid-named part files but no _DONE
    marker; re-execution must start the partition clean instead of
    accumulating the stale files into the counts."""
    out = tmp_path / "crash_out"
    res1 = run_job(tiny_seq_files, out, files_per_partition=len(tiny_seq_files))
    want = res1[0]["sink_counts"]

    # simulate the crash: drop the marker, leave ALL output files, and
    # plant an extra stale file from the "crashed" attempt
    (out / "_manifest" / "partition-00000" / "_DONE").unlink()
    sink_dir = next((out / "partition=00000").glob("sink_dataset=*/sink_table=*"))
    stale = next(sink_dir.glob("*.parquet"))
    import shutil as _sh
    _sh.copy(stale, sink_dir / "crashed-leftover.parquet")

    res2 = run_job(tiny_seq_files, out, files_per_partition=len(tiny_seq_files))
    assert res2[0]["sink_counts"] == want
    total = sum(pq.read_metadata(p).num_rows
                for p in (out / "partition=00000").rglob("*.parquet"))
    assert total == sum(want.values())


def test_incremental_ingest_new_files_only(tiny_seq_files, tmp_path):
    """Continuous-ingest mode: files arriving between runs are planned
    with content-addressed partition ids; committed files are never
    reprocessed even though sorting interleaves the new arrivals."""
    out = tmp_path / "inc_out"
    first = tiny_seq_files[1:]          # hold one file back ("arrives later")
    res1 = run_job(first, out, files_per_partition=2, incremental=True)
    rows1 = sum(r["rows_in"] for r in res1)

    # the held-back file sorts BEFORE the committed ones — positional
    # chunking would shift every boundary; incremental must plan just it
    res2 = run_job(tiny_seq_files, out, files_per_partition=2, incremental=True)
    assert len(res2) == 1  # exactly one new partition (the 1 new file)
    rows2 = sum(r["rows_in"] for r in res2)

    total_rows = sum(pq.read_metadata(f).num_rows for f in tiny_seq_files)
    assert rows1 + rows2 == total_rows

    # a third run: nothing new
    assert run_job(tiny_seq_files, out, files_per_partition=2,
                   incremental=True) == []


def test_all_rejected_partition_commits_empty(tmp_path):
    """A partition whose rows all fail the event filter still commits
    (zero routed rows, empty sink counts) and resumes as done — the
    0-match object-reject path at partition granularity."""
    t = pa.table({
        "doc_id": [f"cloudtrail/part-00000/doc-{i:08d}.tmp" for i in range(50)],
        "tokens": pa.array([[1, 2]] * 50, type=pa.list_(pa.int32())),
        "n_tok": pa.array([2] * 50, type=pa.int32()),
        "source": ["cloudtrail"] * 50,
    })
    src = tmp_path / "all_rejected.parquet"
    pq.write_table(t, src)
    res = run_job([str(src)], tmp_path / "out")
    assert res == [{"partition_id": "00000", "rows_in": 50,
                    "rows_routed": 0, "sink_counts": {}}]
    assert run_job([str(src)], tmp_path / "out") == []


def test_dataloader_streams_sink(tiny_seq_files, tmp_path):
    """Training-side consumption: stream fixed-token-budget batches out
    of a written sink; every sequence appears exactly once, whole."""
    from swarm_ray.pipelines.dataloader import iter_token_batches

    out = tmp_path / "dl_out"
    run_job(tiny_seq_files[:1], out)
    sink = next((out / "partition=00000").glob("sink_dataset=my_dataset/sink_table=*"))

    total_docs = 0
    total_tokens = 0
    for b in iter_token_batches(sink, batch_tokens=4096):
        assert b["offsets"][0] == 0 and b["offsets"][-1] == len(b["tokens"])
        widths = b["offsets"][1:] - b["offsets"][:-1]
        assert len(widths) == len(b["doc_ids"])
        # budget respected unless a single long sequence forced it
        assert len(b["tokens"]) <= 4096 or len(b["doc_ids"]) == 1
        total_docs += len(b["doc_ids"])
        total_tokens += len(b["tokens"])

    n = sum(pq.read_metadata(p).num_rows for p in sink.rglob("*.parquet"))
    t = sum(sum(r["n_tok"] for r in pq.read_table(p, columns=["n_tok"]).to_pylist())
            for p in sink.rglob("*.parquet"))
    assert total_docs == n
    assert total_tokens == t


def test_incremental_crash_rechunk_cleans_stale_partition(tiny_seq_files, tmp_path):
    """ADVICE r1: in incremental mode a crashed partition's files can
    re-chunk under a NEW content-addressed pid (new files shift sorted
    chunk boundaries), so the stale partition=<old-pid> dir would never
    be cleaned by run_partition — clean_stale_partitions must remove it
    before execution or consumers globbing parquet double-count."""
    import shutil as _sh

    # carve the single-file fixture into 4 files so incremental
    # re-chunking is non-degenerate
    t = pq.read_table(tiny_seq_files[0])
    files = []
    for i in range(4):
        f = tmp_path / f"in-{i:02d}.parquet"
        pq.write_table(t.slice(i * 2500, 2500), f)
        files.append(str(f))

    out = tmp_path / "inc_crash"
    first = files[1:]
    tiny_seq_files = files

    # run 1: commit the first batch, then simulate a crashed SECOND
    # attempt that wrote parquet under a pid the next plan won't have
    run_job(first, out, files_per_partition=2, incremental=True)
    committed = {d.name for d in out.glob("partition=*")}

    def plant(pid):
        d = out / f"partition={pid}"
        src_sink = next(out.glob("partition=*/sink_dataset=*/sink_table=*"))
        dst_sink = d / src_sink.parent.name / src_sink.name
        dst_sink.mkdir(parents=True)
        _sh.copy(next(src_sink.glob("*.parquet")), dst_sink / "orphan.parquet")
        return d

    import os as _os
    import time as _time
    stale_dir = plant("deadbeefcafe")          # crashed long ago
    old = _time.time() - 3600
    for p in [stale_dir, *stale_dir.rglob("*")]:
        _os.utime(p, (old, old))
    live_dir = plant("cafebabef00d")           # a SIBLING job mid-write

    # run 2: new file arrives; plan re-chunks — the aged stale dir must
    # go, the freshly-touched sibling dir must survive the grace window
    run_job(tiny_seq_files, out, files_per_partition=2, incremental=True)
    assert not stale_dir.exists()
    assert live_dir.exists()
    _sh.rmtree(live_dir)                       # exclude from row count below
    # committed dirs are untouched
    assert committed <= {d.name for d in out.glob("partition=*")}
    # and total on-disk rows equal the input exactly (no double count)
    total = sum(pq.read_metadata(p).num_rows
                for p in out.rglob("partition=*/**/*.parquet"))
    want = sum(pq.read_metadata(f).num_rows for f in tiny_seq_files)
    # rows_in includes rejected .tmp rows which are dropped before sinks
    routed = sum(n for m in __import__("swarm_ray.state.checkpoint",
                                       fromlist=["read_manifests"])
                 .read_manifests(out) for n in m["sink_counts"].values())
    assert total == routed


def test_packed_shards_write_and_stream(tiny_seq_files, tmp_path):
    """Pack the corpus into fixed-capacity bins, write the packed
    shards, check conservation invariants, and stream them back with
    the dataloader (the complete training-output path)."""
    import numpy as np
    import pandas as pd
    from swarm_ray.ops.tokens import PACK_CAPACITY
    from swarm_ray.pipelines.dataloader import iter_token_batches
    from swarm_ray.pipelines.packer import write_packed_shards

    out = tmp_path / "packed"
    res = write_packed_shards("/ignored/sf0.001", out)
    assert res["bins"] > 0

    shards = pd.concat([pd.read_parquet(f) for f in out.rglob("*.parquet")],
                       ignore_index=True)
    src = pd.concat([pd.read_parquet(f) for f in tiny_seq_files],
                    ignore_index=True)
    # every token conserved, exactly once
    assert shards["n_tok"].sum() == src["n_tok"].sum()
    assert sum(len(t) for t in shards["tokens"]) == src["n_tok"].sum()
    # bins respect capacity unless a single over-long sequence
    over = shards[shards["n_tok"] > PACK_CAPACITY]
    assert (over["n_seqs"] == 1).all()
    # every source doc appears exactly once across bins
    all_docs = [d for lst in shards["doc_ids"] for d in lst]
    assert sorted(all_docs) == sorted(src["doc_id"])
    # in-bin sequence offsets are consistent with member lengths
    r = shards.iloc[int(np.argmax(shards["n_seqs"]))]
    lens = dict(zip(src["doc_id"], src["n_tok"]))
    offs = list(r["seq_offsets"])
    expect = 0
    for d, o in zip(r["doc_ids"], offs):
        assert o == expect
        expect += lens[d]
    assert expect == r["n_tok"]

    # the dataloader streams packed shards directly (id_col=bin_id)
    got_tokens = 0
    for b in iter_token_batches(out, batch_tokens=8192, id_col="bin_id"):
        got_tokens += len(b["tokens"])
        assert b["offsets"][-1] == len(b["tokens"])
    assert got_tokens == src["n_tok"].sum()
