"""Partial-aggregation + salting ops (ops/agg.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from swarm_ray.ops.agg import add_salt, grouped_count, grouped_sum


def _tbl():
    return pa.table({
        "k": ["a"] * 7 + ["b"] * 2 + ["c"],
        "v": list(range(10)),
    })


def test_grouped_count_matches_naive(ray_session):
    ds = ray.data.from_arrow(_tbl()).repartition(4)
    got = {r["k"]: r["row_count"] for r in grouped_count(ds, ["k"]).take_all()}
    assert got == {"a": 7, "b": 2, "c": 1}


def test_grouped_sum_matches_naive(ray_session):
    ds = ray.data.from_arrow(_tbl()).repartition(3)
    got = {r["k"]: r["sum_v"] for r in grouped_sum(ds, ["k"], "v").take_all()}
    assert got == {"a": sum(range(7)), "b": 7 + 8, "c": 9}


def test_add_salt_deterministic_and_bounded():
    t = pa.table({"doc_id": [f"src/part-0/doc-{i:08d}.log" for i in range(1000)]})
    s1 = add_salt(t, "doc_id", 8)["_salt"].to_numpy()
    s2 = add_salt(t, "doc_id", 8)["_salt"].to_numpy()
    assert (s1 == s2).all()
    assert s1.min() >= 0 and s1.max() < 8
    # splits a hot key into all buckets, reasonably evenly
    counts = np.bincount(s1, minlength=8)
    assert (counts > 0).all()
    assert counts.max() < 1000 * 0.5


def test_add_salt_short_strings():
    t = pa.table({"doc_id": ["", "a", "ab", "abcdefghij"]})
    s = add_salt(t, "doc_id", 4)["_salt"].to_pylist()
    assert all(0 <= x < 4 for x in s)


def test_salted_median_exact(ray_session):
    import pyarrow.parquet as pq
    from swarm_ray import fixtures
    from swarm_ray.ops.agg import salted_median
    import ray.data
    files = fixtures.sequences_files("sf0.001")
    ds = ray.data.read_parquet(files, columns=["doc_id", "source", "n_tok"])
    got = {r["source"]: (r["n"], r["median"])
           for r in salted_median(ds, "source", "n_tok", domain=512).take_all()}
    import numpy as np
    vals = {}
    for f in files:
        t = pq.read_table(f, columns=["source", "n_tok"]).to_pandas()
        for s, g in t.groupby("source"):
            vals.setdefault(s, []).extend(g["n_tok"])
    for s, v in vals.items():
        assert got[s][0] == len(v)
        assert got[s][1] == float(np.median(v))


def test_salted_median_rejects_out_of_domain(ray_session):
    from swarm_ray.ops.agg import salted_median
    ds = ray.data.from_items(
        [{"k": "a", "doc_id": f"d{i}", "v": i} for i in range(5)]
        + [{"k": "a", "doc_id": "dbad", "v": 700}])
    with pytest.raises(Exception) as ei:
        salted_median(ds, "k", "v", domain=512).take_all()
    assert "salted_median" in str(ei.value) and "700" in str(ei.value)


def test_salted_quantiles_match_duckdb_disc(ray_session):
    """quantile_disc semantics: value at 1-based rank ceil(q*n) —
    including the float-boundary case q*n exactly integral."""
    import duckdb
    import pandas as pd
    from swarm_ray.ops.agg import salted_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": np.repeat(["a", "b"], 110),
        "doc_id": [f"d{i}" for i in range(220)],
        "v": np.concatenate([rng.integers(0, 400, 100), np.arange(10),
                             rng.integers(0, 400, 110)]),
    })
    got = (salted_quantiles(ray.data.from_pandas(df), "k", "v", domain=512)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT k, COUNT(*)::BIGINT AS n,
               CAST(quantile_disc(v, 0.5) AS BIGINT) AS q500,
               CAST(quantile_disc(v, 0.9) AS BIGINT) AS q900,
               CAST(quantile_disc(v, 0.99) AS BIGINT) AS q990
        FROM df GROUP BY k ORDER BY k
    """).df()
    for c in ("n", "q500", "q900", "q990"):
        assert got[c].tolist() == want[c].tolist(), c


def test_bounded_groups_tree_fold_matches_shuffle_path(ray_session):
    """The bounded-group combine tree (tree_fold_sum) must be exactly
    the shuffle groupby, including across many partials and key types."""
    ds = ray.data.from_arrow(_tbl()).repartition(4)
    plain = {r["k"]: r["row_count"] for r in grouped_count(ds, ["k"]).take_all()}
    tree = {r["k"]: r["row_count"]
            for r in grouped_count(ds, ["k"], bounded_groups=True).take_all()}
    assert tree == plain
    plain_s = {r["k"]: r["sum_v"] for r in grouped_sum(ds, ["k"], "v").take_all()}
    tree_s = {r["k"]: r["sum_v"]
              for r in grouped_sum(ds, ["k"], "v",
                                   bounded_groups=True).take_all()}
    assert tree_s == plain_s


def test_tree_fold_sum_schema_stability_and_rename(ray_session):
    """Empty partial blocks and int32 partials must fold to the same
    (widened) schema as populated ones; out_names renames the sums."""
    from swarm_ray.ops.agg import tree_fold_sum

    t = pa.table({"k": ["x", "y", "x"],
                  "n": pa.array([1, 2, 3], pa.int32())})
    empty = t.schema.empty_table()
    ds = ray.data.from_arrow([t, empty, t])   # one block is zero-row
    out = tree_fold_sum(ds, ["k"], ["n"], out_names=["total"]).take_all()
    got = {r["k"]: r["total"] for r in out}
    assert got == {"x": 8, "y": 4}
    tbl = tree_fold_sum(ray.data.from_arrow([t, empty]), ["k"], ["n"])
    sch = tbl.schema()
    assert sch.names == ["k", "n"]
    assert str(sch.types[1]) == "int64"   # int32 partials widen once
