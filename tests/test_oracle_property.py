"""Property-based conformance of the SQL ORACLE GENERATOR: for random
rulesets and inputs, the DuckDB execution of ``oracle.sql_routed_rows``
must equal the pure-Python oracle (which test_rules_property.py already
proves equal to the compiled Arrow engine — together the three-way
agreement covers every backend of the rule spec)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings

from swarm_ray.oracle import sql_routed_rows

from .oracle_py import route_rows
from .test_rules_property import _batch_of, input_rows, rulesets


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rs=rulesets, rows=input_rows())
def test_sql_oracle_matches_python_oracle(rs, rows, tmp_path_factory):
    import duckdb

    tmp = tmp_path_factory.mktemp("oracle_prop")
    f = tmp / "seq.parquet"
    pq.write_table(_batch_of(rows), f)

    sql = sql_routed_rows(str(f), rs)
    got = duckdb.connect().execute(sql).df()

    want = route_rows(rows, rs)

    def key(d):
        return (d["sink_dataset"], d["sink_table"], d["log_id"],
                d["rule_name"], d["doc_id"])

    got_keys = sorted(
        key(r) for r in got.to_dict("records"))
    assert got_keys == sorted(key(r) for r in want)

    # timestamps agree (nulls for unparseable doc_ids on both sides)
    got_full = sorted((key(r), r["timestamp"]) for r in got.to_dict("records"))
    want_full = sorted((key(r), r["timestamp"]) for r in want)
    for (gk, gts), (wk, wts) in zip(got_full, want_full):
        assert gk == wk
        if gts is None or (hasattr(gts, "to_pydatetime") and str(gts) == "NaT"):
            assert wts is None
        else:
            g = gts.to_pydatetime() if hasattr(gts, "to_pydatetime") else gts
            assert g == wts
