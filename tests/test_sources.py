"""NDJSON(+gzip) ingestion source (sources/json_source.py) — S4/S5
literally: codec inference from extension, canonical schema casts, and
record-for-record parity with the Parquet path."""

import pandas as pd
import pyarrow as pa

from swarm_ray import fixtures


def test_json_source_canonical_schema(ray_session):
    from swarm_ray.sources.json_source import CANONICAL_SCHEMA, read_sequences_json
    files = fixtures.sequences_ndjson_files("sf0.001")
    assert files and all(f.endswith(".jsonl.gz") for f in files)  # gzip path
    ds = read_sequences_json(files)
    assert ds.schema().base_schema == CANONICAL_SCHEMA


def test_json_parse_matches_parquet_parse(ray_session):
    """The same records through the same parse stage from either
    serialization must be identical — including the token payload."""
    from swarm_ray.queries import q_parse, q_parse_json
    from swarm_ray.sources.json_source import read_sequences_json

    sf = "/anything/sf0.001"
    a = q_parse(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = q_parse_json(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # token-array byte equality between the two serializations
    pq_rows = (pd.concat([pd.read_parquet(f) for f in
                          fixtures.sequences_files("sf0.001")])
               .sort_values("doc_id").reset_index(drop=True))
    js_rows = (read_sequences_json(fixtures.sequences_ndjson_files("sf0.001"))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(pq_rows) == len(js_rows)
    for x, y in zip(pq_rows["tokens"], js_rows["tokens"]):
        assert list(x) == list(y)


def test_run_job_over_ndjson_matches_parquet(ray_session, tmp_path):
    """Full checkpointed ingest over the NDJSON.gz serialization must
    commit identical per-sink counts to the Parquet-path job."""
    from swarm_ray.pipelines.flagship import run_job

    pq_files = fixtures.sequences_files("sf0.001")
    js_files = fixtures.sequences_ndjson_files("sf0.001")

    r_pq = run_job(pq_files, tmp_path / "out_pq",
                   files_per_partition=len(pq_files))
    r_js = run_job(js_files, tmp_path / "out_js",
                   files_per_partition=len(js_files))
    assert sum(r["rows_in"] for r in r_pq) == sum(r["rows_in"] for r in r_js)
    agg_pq, agg_js = {}, {}
    for r in r_pq:
        for k, v in r["sink_counts"].items():
            agg_pq[k] = agg_pq.get(k, 0) + v
    for r in r_js:
        for k, v in r["sink_counts"].items():
            agg_js[k] = agg_js.get(k, 0) + v
    assert agg_pq == agg_js and sum(agg_pq.values()) > 0


def test_csv_source_canonical_schema_and_tokens(ray_session):
    """CSV(.gz) → canonical schema, token-array byte parity with the
    Parquet rows, and the zero-token edge case (i % 997) surviving the
    empty-string round-trip."""
    from swarm_ray.sources.csv_source import read_sequences_csv
    from swarm_ray.sources.json_source import CANONICAL_SCHEMA

    files = fixtures.sequences_csv_files("sf0.001")
    assert files and all(f.endswith(".csv.gz") for f in files)
    ds = read_sequences_csv(files)
    assert ds.schema().base_schema == CANONICAL_SCHEMA

    pq_rows = (pd.concat([pd.read_parquet(f) for f in
                          fixtures.sequences_files("sf0.001")])
               .sort_values("doc_id").reset_index(drop=True))
    csv_rows = (ds.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
    assert len(pq_rows) == len(csv_rows)
    assert (csv_rows["n_tok"] == 0).any()          # the i % 997 rows
    for x, y in zip(pq_rows["tokens"], csv_rows["tokens"]):
        assert list(x) == list(y)
    assert (pq_rows["n_tok"].to_numpy()
            == csv_rows["n_tok"].to_numpy()).all()


def test_run_job_over_csv_matches_parquet(ray_session, tmp_path):
    """Full checkpointed ingest over the CSV.gz serialization must
    commit identical per-sink counts to the Parquet-path job."""
    from swarm_ray.pipelines.flagship import run_job

    pq_files = fixtures.sequences_files("sf0.001")
    csv_files = fixtures.sequences_csv_files("sf0.001")

    r_pq = run_job(pq_files, tmp_path / "out_pq",
                   files_per_partition=len(pq_files))
    r_csv = run_job(csv_files, tmp_path / "out_csv",
                    files_per_partition=len(csv_files))
    agg_pq, agg_csv = {}, {}
    for r in r_pq:
        for k, v in r["sink_counts"].items():
            agg_pq[k] = agg_pq.get(k, 0) + v
    for r in r_csv:
        for k, v in r["sink_counts"].items():
            agg_csv[k] = agg_csv.get(k, 0) + v
    assert agg_pq == agg_csv and sum(agg_pq.values()) > 0
