"""Rule-file loading, dump sink, migrate, and the CLI surface."""

import json

import pyarrow.parquet as pq
import pytest

from swarm_ray import fixtures
from swarm_ray.rules.load import load_ruleset, ruleset_from_dict, ruleset_to_dict
from swarm_ray.rules.spec import default_ruleset


def test_ruleset_roundtrip_dict():
    rs = default_ruleset()
    rs2 = ruleset_from_dict(ruleset_to_dict(rs))
    assert rs2 == rs
    assert rs2.spec_hash() == rs.spec_hash()


def test_load_ruleset_yaml_json_and_dir(tmp_path):
    doc = ruleset_to_dict(default_ruleset())
    (tmp_path / "rules.json").write_text(json.dumps(doc))
    assert load_ruleset(tmp_path / "rules.json") == default_ruleset()

    import yaml
    (tmp_path / "d").mkdir()
    (tmp_path / "d" / "a_event.yaml").write_text(
        yaml.safe_dump({"event_rules": doc["event_rules"]}))
    (tmp_path / "d" / "b_schema.yaml").write_text(
        yaml.safe_dump({"schema_rules": doc["schema_rules"]}))
    assert load_ruleset(tmp_path / "d") == default_ruleset()


def test_load_ruleset_validates(tmp_path):
    bad = {"schema_rules": [{"name": "x", "where": [],
                             "actions": [{"dataset": "", "table": "t"}]}]}
    (tmp_path / "bad.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError):
        load_ruleset(tmp_path / "bad.json")


def test_dump_sink(ray_session, tiny_seq_files, tmp_path):
    from swarm_ray.pipelines.flagship import build_routed
    from swarm_ray.sinks.dump_sink import write_dump

    routed = build_routed(tiny_seq_files[:1])
    counts = write_dump(routed, tmp_path / "dump")
    assert counts  # at least one sink
    for name, n in counts.items():
        assert n > 0
        assert (tmp_path / "dump" / f"{name}.schema.json").exists()
        parts = list((tmp_path / "dump" / f"{name}.log").glob("*.json"))
        assert parts
        row = json.loads(open(parts[0]).readline())
        assert row["sink_dataset"] + "." + row["sink_table"] == name


def test_migrate_widen_and_conflict(ray_session, tmp_path):
    import pyarrow as pa
    from swarm_ray.pipelines.migrate import migrate_sink
    from swarm_ray.sinks.schema import SchemaConflictError

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), src / "p.parquet")
    pq.write_table(pa.table({"a": [3]}), dst / "p.parquet")

    res = migrate_sink(src, dst)
    assert res["rows"] == 2
    merged = json.loads((dst / "_schema.json").read_text())
    assert {f["name"] for f in merged} == {"a", "b"}

    # conflict: same field, different type → error before any data moves
    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(pa.table({"a": ["not-an-int"]}), bad / "p.parquet")
    with pytest.raises(SchemaConflictError):
        migrate_sink(bad, dst)


def test_cli_ingest_and_dry_run(ray_session, tmp_path, capsys):
    from swarm_ray.cli import main

    files = fixtures.sequences_files("sf0.001")
    pattern = str(fixtures.sequences_dir("sf0.001") / "*.parquet")

    rc = main(["ingest", "--input", pattern, "--out", str(tmp_path / "out")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "ingest" and out["rows_routed"] > 0

    rc = main(["ingest", "--dry-run", "--input", pattern,
               "--out", str(tmp_path / "dump")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "dry-run" and out["sinks"]


def test_cli_schema_command(ray_session, tmp_path, capsys):
    from swarm_ray.cli import main

    pattern = str(fixtures.sequences_dir("sf0.001") / "*.parquet")
    rc = main(["schema", "--input", pattern, "--out", str(tmp_path / "s")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "schema" and out["sinks"]
    for sink in out["sinks"]:
        ds_name, table = sink.split(".")
        f = tmp_path / "s" / f"sink_dataset={ds_name}" / f"sink_table={table}" / "_schema.json"
        assert f.exists()


def test_cli_schema_then_ingest_same_outdir(ray_session, tmp_path, capsys):
    """ADVICE r1: `schema` must register the ON-DISK file schema (no
    phantom partition cols, ingest stamps present) so a following
    `ingest` into the same out dir widens cleanly and ends with the
    schema the sink files actually carry."""
    from swarm_ray.cli import main
    from swarm_ray.sinks.schema import schema_from_json

    pattern = str(fixtures.sequences_dir("sf0.001") / "*.parquet")
    out = tmp_path / "both"
    assert main(["schema", "--input", pattern, "--out", str(out)]) == 0
    capsys.readouterr()
    assert main(["ingest", "--input", pattern, "--out", str(out)]) == 0
    capsys.readouterr()

    for sink_dir in out.glob("partition=*/sink_dataset=*/sink_table=*"):
        reg = schema_from_json((sink_dir / "_schema.json").read_text())
        f = next(sink_dir.glob("*.parquet"))
        file_names = set(pq.read_schema(f).names)
        assert set(reg.names) == file_names
    # the schema command's own registration has no partition columns
    for d in out.glob("sink_dataset=*/sink_table=*"):
        reg = schema_from_json((d / "_schema.json").read_text())
        assert "sink_dataset" not in reg.names
        assert "ingest_id" in reg.names


def test_compact_sink_roundtrip(ray_session, tmp_path):
    """Compaction must preserve every row + the schema sidecar, shrink
    the file count, and recover from a crash between the swap renames."""
    from swarm_ray.pipelines.flagship import run_job
    from swarm_ray.sinks.compact import compact_sink, recover_compaction

    files = fixtures.sequences_files("sf0.001")
    out = tmp_path / "c"
    run_job(files, out, files_per_partition=len(files))
    sink = next(out.glob("partition=*/sink_dataset=*/sink_table=*"))
    before_files = sorted(sink.glob("*.parquet"))
    rows_before = sum(pq.read_metadata(f).num_rows for f in before_files)
    ids_before = set()
    for f in before_files:
        ids_before.update(pq.read_table(f, columns=["log_id"])["log_id"].to_pylist())

    res = compact_sink(sink, target_rows_per_file=10_000_000)
    assert res["rows"] == rows_before
    after_files = sorted(sink.glob("*.parquet"))
    assert len(after_files) <= len(before_files)
    ids_after = set()
    for f in after_files:
        ids_after.update(pq.read_table(f, columns=["log_id"])["log_id"].to_pylist())
    assert ids_after == ids_before
    assert (sink / "_schema.json").exists()       # sidecar carried over

    # crash between the two renames: sink gone, ._pre present → recover
    pre = sink.with_name(sink.name + "._pre")
    sink.rename(pre)
    assert recover_compaction(sink)
    assert sink.exists() and not pre.exists()
    assert not recover_compaction(sink)           # idempotent no-op

    # crash AFTER the second rename: sink AND ._pre both present — the
    # duplicate must be removed or sink_table=* globs double-count
    import shutil as _sh
    _sh.copytree(sink, pre)
    assert recover_compaction(sink)
    assert sink.exists() and not pre.exists()


def test_compact_sink_aborts_on_concurrent_writer(ray_session, tmp_path,
                                                  monkeypatch):
    """The offline-only contract is enforced: a part file that lands
    between compact's initial glob and the directory swap must abort
    the swap and restore the sink verbatim — extras included."""
    import pyarrow as pa

    from swarm_ray.sinks import compact as compact_mod

    sink = tmp_path / "sink_table=t"
    sink.mkdir()
    t = pa.table({"x": pa.array([1, 2, 3], type=pa.int64())})
    pq.write_table(t, sink / "part-a.parquet")
    pq.write_table(t, sink / "part-b.parquet")
    (sink / "_schema.json").write_text("{}")      # sidecar → copy2 runs

    real_copy2 = compact_mod.shutil.copy2
    hit = {"n": 0}

    def racing_copy2(src, dst):
        # first sidecar copy = the window between glob and rename:
        # a concurrent ingest drops a new part file into the sink
        if hit["n"] == 0:
            pq.write_table(t, sink / "part-concurrent.parquet")
        hit["n"] += 1
        return real_copy2(src, dst)

    monkeypatch.setattr(compact_mod.shutil, "copy2", racing_copy2)
    with pytest.raises(RuntimeError, match="concurrent writer"):
        compact_mod.compact_sink(sink, target_rows_per_file=10)
    # sink restored untouched, concurrent file preserved, no residue
    assert sorted(p.name for p in sink.glob("*.parquet")) == \
        ["part-a.parquet", "part-b.parquet", "part-concurrent.parquet"]
    assert not sink.with_name(sink.name + "._pre").exists()
    assert not sink.with_name(sink.name + "._compact").exists()


def test_cli_report(ray_session, tmp_path, capsys):
    from swarm_ray.cli import main

    pattern = str(fixtures.sequences_dir("sf0.001") / "*.parquet")
    out = tmp_path / "r"
    assert main(["ingest", "--input", pattern, "--out", str(out)]) == 0
    ingest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert main(["report", "--out", str(out)]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["mode"] == "report"
    assert rep["partitions_committed"] == rep["partitions_total"] == 1
    assert rep["rows_in"] == ingest["rows_in"]
    assert rep["rows_routed"] == ingest["rows_routed"]
    assert sum(rep["sinks"].values()) == rep["rows_routed"]
    assert rep["partition_seconds"]["mean"] is not None
    assert len(rep["ruleset_hashes"]) == 1

    # metrics of UNCOMMITTED partitions must not inflate the totals
    (out / "_manifest" / "partition-00000" / "_DONE").unlink()
    assert main(["report", "--out", str(out)]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["partitions_committed"] == 0
    assert rep2["rows_routed"] == 0 and sum(rep2["sinks"].values()) == 0
