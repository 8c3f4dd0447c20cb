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


# ---------------- numpy ↔ DuckDB float-kernel parity (ADVICE r4) ----------

def test_lm_score_log_parity_numpy_vs_duckdb():
    """doc_lm_score's only float op is llr_milli = floor(1000·ln(ctf)
    + 0.5); the oracle recomputes it in DuckDB. numpy's SIMD log and
    DuckDB's libm are not a-priori bit-identical, so pin the EXACT
    expression over the whole plausible ctf domain (1..2M — corpus
    term frequencies at oracle scale are orders below the top end)."""
    import duckdb
    import numpy as np
    n = 2_000_000
    con = duckdb.connect()
    sql = con.execute(
        "SELECT CAST(FLOOR(1000*ln(CAST(x AS DOUBLE)) + 0.5) AS BIGINT)"
        " AS v FROM range(1, ?) t(x)", [n + 1]
    ).fetch_arrow_table()["v"].to_numpy()
    npv = np.floor(1000.0 * np.log(np.arange(1, n + 1, dtype=np.float64))
                   + 0.5).astype(np.int64)
    assert int((sql != npv).sum()) == 0


def test_mixture_temp_threshold_parity_numpy_vs_duckdb():
    """seq_mixture_temp derives per-source keep thresholds with
    numpy pow/divide and the oracle re-derives them with DuckDB
    POW/division before discretizing to floor(lift/max·65536). Pin the
    two derivations equal over many random count vectors (plus edge
    shapes: equal counts, 1-vs-huge skew) so a rounding-boundary flip
    would surface here, not as a flaky oracle run."""
    import duckdb
    import numpy as np
    from swarm_ray.ops import tokens
    con = duckdb.connect()
    rng = np.random.default_rng(123)
    cases = [rng.integers(1, 10_000_000,
                          size=int(rng.integers(2, 12))).astype(np.float64)
             for _ in range(60)]
    cases += [np.array([5.0, 5.0, 5.0]),          # all-equal lifts
              np.array([1.0, 9_999_999.0]),       # extreme skew
              np.array([1.0, 1.0, 10_000_000.0])]
    for c in cases:
        p = c / c.sum()
        lift = np.power(p, tokens.TEMP_ALPHA) / p
        rates = lift / lift.max()
        np_thr = [tokens._mix_threshold_hex(float(r)) for r in rates]
        rows = ",".join(f"({i},{int(v)})" for i, v in enumerate(c))
        q = f"""
          WITH cnt AS (SELECT * FROM (VALUES {rows}) t(source, c)),
          lifted AS (SELECT source,
                            POW(c/SUM(c) OVER (), {tokens.TEMP_ALPHA})
                            / (c/SUM(c) OVER ()) AS lift FROM cnt),
          thr AS (SELECT source,
              CASE WHEN lift >= MAX(lift) OVER () THEN 'g000'
                   ELSE lpad(lower(to_hex(CAST(FLOOR(
                          lift / MAX(lift) OVER () * 65536)
                          AS BIGINT))), 4, '0') END AS t4
              FROM lifted)
          SELECT source, t4 FROM thr ORDER BY source"""
        sql_thr = [r[1] for r in con.execute(q).fetchall()]
        assert sql_thr == np_thr, (c, np_thr, sql_thr)


def test_weighted_key_parity_numpy_vs_duckdb():
    """doc_weighted_sample's only float ops are u = (float64(h)+1)/2^64
    and key = FLOOR(−ln(u)·1e12) (then integer // w). The engine uses
    math.log (libm) — numpy's SIMD log was measured 1 ulp off DuckDB's
    ln in ~4e-5 of inputs, flipping the FLOOR. Pin math.log vs DuckDB
    over a large random u64 sample plus the edge values (0, 1, 2^63,
    2^64−1, and near-1 u where −ln(u) → 0), so a libm divergence would
    surface here, not as a flaky oracle run."""
    import math

    import duckdb
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(7)
    h = rng.integers(0, 2 ** 64, size=1_000_000, dtype=np.uint64)
    edges = np.array([0, 1, 2, 2 ** 63, 2 ** 64 - 1, 2 ** 64 - 2,
                      2 ** 64 - 1024], dtype=np.uint64)
    h = np.concatenate([h, edges])

    npk = np.array(
        [math.floor(-math.log((float(x) + 1.0) / 2.0 ** 64) * 1e12)
         for x in h.tolist()], dtype=np.int64)

    con = duckdb.connect()
    con.register("t", pa.table({"h": pa.array(h, type=pa.uint64())}))
    sqlk = con.execute(
        "SELECT CAST(FLOOR(-ln((CAST(h AS DOUBLE) + 1.0)"
        " / 18446744073709551616.0) * 1000000000000.0) AS BIGINT) AS k"
        " FROM t").fetch_arrow_table()["k"].to_numpy()
    assert int((npk != sqlk).sum()) == 0
