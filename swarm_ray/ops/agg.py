"""Scalable aggregates — partial (combiner) aggregation + salted keys.

Ray Data's ``groupby(keys).aggregate(...)`` is a sort-based all-to-all
exchange of EVERY row. For associative aggregates over low-cardinality
keys (per-sink counts ≙ ``IngestLog.LogCount``, reference
``pkg/usecase/load.go:292``; per-source counts ≙ ``SourceLog.RowCount``,
``:207-208``) that is wasted movement: each block can be collapsed to
at most ``#distinct_keys`` partial rows first, so the shuffle moves
``#blocks × #keys`` rows instead of 10^12. This mirrors the reference's
design, where counts are accumulated per goroutine and merged once
(``pkg/usecase/load.go:175-178``) — except the merge here is itself a
(tiny) distributed groupby, not a single-threaded barrier.

Skew note: partial aggregation is ALSO the skew treatment for
associative aggregates — the 55%-hot ``source`` key (FIXTURES.md F1)
arrives at the final groupby as one row per (block, key), never as 55%
of the corpus on one reducer. For NON-associative per-group work
(``map_groups`` on a hot key) use ``add_salt`` to split hot groups
into ``mod`` subgroups, process per (key, salt), then fold the
subgroup results.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum


def _partial_count(keys: list[str], alias: str):
    def fn(batch: pa.Table) -> pa.Table:
        return pa.TableGroupBy(batch.select(keys), keys).aggregate(
            [([], "count_all")]
        ).rename_columns(keys + [alias])
    return fn


def _block_combine(keys: list[str], vals: list[str], how: str):
    """Block-local ``how`` fold (sum/max/min) over (keys, vals) partial
    rows. Runs the aggregate even on a zero-row block: pyarrow returns
    the AGGREGATE output schema (e.g. int32 partials widen to int64
    sums) either way, so every emitted block carries one stable
    schema."""
    def fn(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(keys + vals), keys)
        return g.aggregate([(v, how) for v in vals]) \
            .rename_columns(keys + vals)
    return fn


def _sum_combine(keys: list[str], vals: list[str]):
    return _block_combine(keys, vals, "sum")


def tree_fold_sum(partials: ray.data.Dataset, keys: list[str],
                  vals: list[str],
                  out_names: list[str] | None = None) -> ray.data.Dataset:
    """Exact SUM-per-group fold for BOUNDED key spaces (per-sink /
    per-source counts, reason codes, score histograms) as a two-level
    combine tree instead of a sort-based ``groupby`` exchange.

    Why not ``groupby``: Ray's sort aggregate keeps one reduce
    partition per input block, so a 64-block partial stream folding to
    6 groups schedules ~58 reduce tasks whose partitions are EMPTY —
    pure scheduling waste, and each empty partition emits a schema-less
    RefBundle that trips the streaming executor's schema-consistency
    warning once per op. The tree is exact for associative SUMs and
    every stage is bounded:

      partials (#blocks × #groups rows)
        → repartition(width)  — coalesce, no key exchange
        → block combine       — ≤ width × #groups rows
        → repartition(1)      — tiny coalesce
        → block combine       — exactly #groups rows

    Callers MUST have a documented group-count bound (the level-2
    block is ≤ width × #groups rows, the output ≤ #groups); unbounded
    keys (doc_id, vocab words) stay on the shuffle path.
    ``out_names`` renames the summed columns in the final block."""
    return _tree_fold(partials, keys, vals, "sum", out_names)


def tree_fold_max(partials: ray.data.Dataset, keys: list[str],
                  vals: list[str],
                  out_names: list[str] | None = None) -> ray.data.Dataset:
    """``tree_fold_sum``'s MAX sibling — same bounded two-level combine
    tree, same caller obligations (documented #groups bound), for
    associative MAX folds: sketch registers (HLL max-rho per
    (source, register) — ≤ #sources × m rows end to end), per-key
    high-water marks."""
    return _tree_fold(partials, keys, vals, "max", out_names)


def tree_fold_or(partials: ray.data.Dataset, key: str,
                 val: str) -> ray.data.Dataset:
    """Bitwise-OR fold over packed bitmask words — the Bloom-filter /
    bitmap-index merge (pyarrow's groupby has no bit_or kernel, so the
    block combine is a numpy sort + ``np.bitwise_or.reduceat``). Rows
    are (``key``: word index int32, ``val``: 64 raw bits as int64);
    output ≤ #distinct-words rows — bounded by the bitmask size by
    construction, never by the corpus."""
    import numpy as np

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([key, val])
        w = t[key].to_numpy(zero_copy_only=False)
        b = t[val].to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="stable")
        w, b = w[order], b[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        return pa.table({key: pa.array(w[starts], type=pa.int32()),
                         val: pa.array(np.bitwise_or.reduceat(b, starts),
                                       type=pa.int64())})

    return _tree_fold(partials, [key], [val], combine)


def _tree_fold(partials: ray.data.Dataset, keys: list[str],
               vals: list[str], how,
               out_names: list[str] | None = None) -> ray.data.Dataset:
    """``how``: a pyarrow aggregate name ("sum"/"max"/...) or a
    callable block-combine (pa.Table → pa.Table) for folds pyarrow's
    groupby can't express (bit_or)."""
    from ..util import cluster_cpus

    width = max(2, cluster_cpus() // 4)
    combine = how if callable(how) else _block_combine(keys, vals, how)

    def finish(t: pa.Table) -> pa.Table:
        return combine(t).rename_columns(keys + (out_names or vals))

    lvl1 = partials.repartition(width).map_batches(
        combine, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    return lvl1.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)


def grouped_count(ds: ray.data.Dataset, keys: list[str],
                  alias: str = "row_count",
                  bounded_groups: bool = False) -> ray.data.Dataset:
    """count(*) per key group, with per-batch partial counts so the
    shuffle moves only ``#blocks × #keys`` partial rows.
    ``bounded_groups=True`` (caller documents a group-count bound)
    folds the partials through ``tree_fold_sum`` — no sort exchange,
    no empty reduce partitions."""
    partial = ds.map_batches(_partial_count(keys, alias),
                             batch_format="pyarrow", zero_copy_batch=True)
    if bounded_groups:
        return tree_fold_sum(partial, keys, [alias])
    return partial.groupby(keys).aggregate(Sum(alias, alias_name=alias))


def grouped_sum(ds: ray.data.Dataset, keys: list[str], value: str,
                alias: str | None = None,
                bounded_groups: bool = False) -> ray.data.Dataset:
    """sum(value) per key group via per-batch partials."""
    alias = alias or f"sum_{value}"

    def fn(batch: pa.Table) -> pa.Table:
        return pa.TableGroupBy(batch.select(keys + [value]), keys).aggregate(
            [(value, "sum")]
        ).rename_columns(keys + [alias])

    partial = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    if bounded_groups:
        return tree_fold_sum(partial, keys, [alias])
    return partial.groupby(keys).aggregate(Sum(alias, alias_name=alias))


def add_salt(batch: pa.Table, basis: str, mod: int,
             salt_col: str = "_salt") -> pa.Table:
    """Append a deterministic ``hash(basis column) % mod`` salt column
    so a hot key group splits into ``mod`` subgroups; callers group by
    ``(key, salt_col)``, process per subgroup, then fold the subgroup
    results (the north rule's salted-key handling for skewed sources).

    Deterministic — derives from stable row content, never random
    state, so re-executed partitions salt identically (idempotent
    resume). Vectorized: one numpy pass over the string bytes."""
    import numpy as np

    b = batch[basis].combine_chunks().cast(pa.large_binary())
    offs = np.frombuffer(b.buffers()[1], dtype=np.int64, count=len(b) + 1,
                         offset=b.offset * 8)
    data = np.frombuffer(b.buffers()[2], dtype=np.uint8)
    widths = offs[1:] - offs[:-1]
    # FNV-ish mix over the last ≤8 bytes of each value — O(8) vectorized
    # passes regardless of string length; plenty uniform for bucketing
    acc = widths.astype(np.uint64) * np.uint64(1099511628211)
    for k in range(1, 9):
        idx = offs[1:] - k
        valid = widths >= k
        acc[valid] = (acc[valid] ^ data[idx[valid]].astype(np.uint64)) * np.uint64(1099511628211)
    salt = pa.array((acc % np.uint64(mod)).astype(np.int32))
    return batch.append_column(salt_col, salt)



def _salted_hist_partials(ds: ray.data.Dataset, key: str, value: str, *,
                          salt_mod: int, basis: str, domain: int,
                          op_name: str) -> "ray.data.Dataset":
    """Shared salted-histogram plan: add a deterministic salt, then one
    bounded-domain ``np.bincount`` histogram per (key, salt) sub-group
    — the associative partial both exact-median and exact-quantiles
    fold. The bounded-domain precondition is validated at the source:
    an out-of-range value would give a ragged histogram and an opaque
    np.stack shape error deep in the fold (ADVICE r1)."""
    import pandas as pd

    salted = ds.map_batches(add_salt, batch_format="pyarrow",
                            zero_copy_batch=True,
                            fn_kwargs={"basis": basis, "mod": salt_mod})

    def partial_hist(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        import pandas as pd
        v = g[value].to_numpy()
        if len(v) and (v.min() < 0 or v.max() >= domain):
            bad = int(v.min()) if v.min() < 0 else int(v.max())
            raise ValueError(
                f"{op_name}: {value!r} value {bad} outside the declared "
                f"domain [0, {domain}) — raise `domain` or clip the input")
        h = np.bincount(v, minlength=domain)
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "hist": [h.astype(np.int64).tolist()]})

    return salted.groupby([key, "_salt"]).map_groups(
        partial_hist, batch_format="pandas")


def salted_median(ds: ray.data.Dataset, key: str, value: str,
                  *, salt_mod: int = 8, basis: str = "doc_id",
                  domain: int = 4096) -> "ray.data.Dataset":
    """Exact per-key median of a bounded-domain int column, computed
    with SALTED sub-groups — the demonstration (and template) for
    non-associative per-group work on a skewed key:

    1. ``add_salt`` splits each (hot) key group into ``salt_mod``
       deterministic sub-groups;
    2. ``groupby(key, salt).map_groups`` builds a VALUE HISTOGRAM per
       sub-group — each reducer sees at most 1/salt_mod of the hot key
       (the 55% ``source`` head never lands on one reducer);
    3. histograms are associative, so a tiny final ``map_groups`` per
       key folds them and reads the exact median off the CDF.

    Output: (key, n, median: double) — median of an even group is the
    mean of the two middle values, matching SQL ``median``.
    """
    import pandas as pd

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        import pandas as pd
        h = np.sum(np.stack([np.asarray(x) for x in g["hist"]]), axis=0)
        n = int(h.sum())
        cdf = np.cumsum(h)
        lo_i = int(np.searchsorted(cdf, (n - 1) // 2 + 1))
        hi_i = int(np.searchsorted(cdf, n // 2 + 1))
        return pd.DataFrame({key: [g[key].iloc[0]], "n": [n],
                             "median": [(lo_i + hi_i) / 2.0]})

    partials = _salted_hist_partials(ds, key, value, salt_mod=salt_mod,
                                     basis=basis, domain=domain,
                                     op_name="salted_median")
    return partials.groupby(key).map_groups(fold, batch_format="pandas")


def salted_quantiles(ds: ray.data.Dataset, key: str, value: str,
                     qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                     *, salt_mod: int = 8, basis: str = "doc_id",
                     domain: int = 4096) -> "ray.data.Dataset":
    """Exact per-key DISCRETE quantiles of a bounded-domain int column
    — the generalization of ``salted_median`` to arbitrary quantile
    sets, same salted-histogram plan (each reducer sees ≤ 1/salt_mod
    of a hot key; histograms are associative partials).

    Semantics match DuckDB ``quantile_disc``: the value at 1-based
    rank ⌈q·n⌉ of the sorted group (boundary computed decimal-safely —
    q·n like 0.9·10 must not overshoot to rank 10 on float error).
    Output: (key, n, q50, q90, q99, ... named per mille).
    """
    import pandas as pd

    col_names = [f"q{int(round(q * 1000)):03d}" for q in qs]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        import pandas as pd
        h = np.sum(np.stack([np.asarray(x) for x in g["hist"]]), axis=0)
        n = int(h.sum())
        cdf = np.cumsum(h)
        row = {key: [g[key].iloc[0]], "n": [n]}
        for q, name in zip(qs, col_names):
            rank = int(np.ceil(np.round(q * n, 9)))  # decimal-safe ⌈q·n⌉
            rank = min(max(rank, 1), n)
            row[name] = [int(np.searchsorted(cdf, rank))]
        return pd.DataFrame(row)

    partials = _salted_hist_partials(ds, key, value, salt_mod=salt_mod,
                                     basis=basis, domain=domain,
                                     op_name="salted_quantiles")
    return partials.groupby(key).map_groups(fold, batch_format="pandas")
