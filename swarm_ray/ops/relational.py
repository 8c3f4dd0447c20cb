"""Event-stream + relational operators over the ``events`` and TPC-H-ish
tables — the windowed-aggregate / sessionization / as-of-join family
the reference lacks natively (SURVEY §2.6/§2.8: swarm has no windows;
these are the north-star additions, built per the documented Ray
pattern: partition by key, sort within group, window in pandas).

Float-safety: all money/value sums are integer cents (``ROUND(x*100)``
per row, exact for 2-decimal inputs) so oracle value-hashes can never
drift on float accumulation order.

Partitioning assumptions (documented per custom-operator rule):
* sessionize / as-of require all rows of one ``user_id`` in one group —
  guaranteed by ``groupby(user_id).map_groups``; ordering inside the
  group is re-established by an explicit sort on (ts, event_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum
from ..util import read_parquet_clean

SESSION_GAP_MIN = 30


def _read_events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=columns)


def _events_count(sf_dir: str) -> int:
    """Events row count from the parquet footer(s) (no data read) —
    sizes the keyed partition counts below (see
    util.keyed_partition_count). Handles events.parquet as a single
    file or as a directory of part files."""
    from pathlib import Path

    import pyarrow.parquet as pq
    p = Path(sf_dir) / "events.parquet"
    if p.is_dir():
        return sum(pq.read_metadata(f).num_rows
                   for f in sorted(p.glob("**/*.parquet")))
    return pq.read_metadata(p).num_rows


# ------------------------------------------------------------ parse (M2 analogue)

def q_events_parse_props(sf_dir: str) -> ray.data.Dataset:
    """Vectorized regex extraction from the JSON-ish props column —
    the events-table twin of the doc_id grok parse."""
    def extract(t: pa.Table) -> pa.Table:
        k = pc.cast(pc.struct_field(
            pc.extract_regex(t["props"], r'"k": (?P<k>\d+)'), "k"), pa.int64())
        return pa.table({"event_id": t["event_id"], "event_type": t["event_type"],
                         "k": k})
    return _read_events(sf_dir, ["event_id", "event_type", "props"]).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ windowed aggregate

def q_events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window aggregate: per (event_type, hour) count +
    value-cents sum. The window assignment is a vectorized map; the
    shuffle only moves per-batch partials of a tiny key space."""
    def add_window(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table({"event_type": t["event_type"], "hour": hour,
                         "value_cents": cents})
    return (_read_events(sf_dir, ["ts", "event_type", "value"])
            .map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["event_type", "hour"])
            .aggregate(Count(alias_name="n"),
                       Sum("value_cents", alias_name="value_cents")))


# ------------------------------------------------------------ sliding window

SLIDE_MIN = 15          # slide step
WINDOW_SLIDES = 4       # window length = 4 slides = 1 h


def q_events_sliding(sf_dir: str) -> ray.data.Dataset:
    """SLIDING-window aggregate (1 h window, 15 min slide): every event
    lands in exactly ``WINDOW_SLIDES`` windows, assigned by a
    vectorized flat-map (``np.repeat`` + epoch arithmetic — fan-out in
    Arrow, no Python loop), then per-(type, window-start) count +
    cents sum via the usual partial-aggregate shuffle. Completes the
    window family next to the tumbling ``events_hourly``."""
    slide_us = SLIDE_MIN * 60 * 1_000_000

    def fan_out(t: pa.Table) -> pa.Table:
        n = len(t)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // slide_us) * slide_us          # newest containing window
        offs = np.tile(np.arange(WINDOW_SLIDES, dtype=np.int64) * slide_us, n)
        starts = np.repeat(base, WINDOW_SLIDES) - offs
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": pa.array(np.repeat(et, WINDOW_SLIDES)),
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            "value_cents": pa.array(np.repeat(cents, WINDOW_SLIDES)),
        })

    return (_read_events(sf_dir, ["ts", "event_type", "value"])
            .map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["event_type", "window_start"])
            .aggregate(Count(alias_name="n"),
                       Sum("value_cents", alias_name="value_cents")))


# ---------------------------------------------- trailing-baseline spikes

SPIKE_FACTOR = 3        # spike when n > FACTOR × trailing hourly mean
SPIKE_WINDOW_H = 24     # trailing baseline window (hours)


def q_events_spikes(sf_dir: str) -> ray.data.Dataset:
    """Trailing-baseline anomaly detection over the event stream — the
    detection-rule shape a monitoring pipeline runs on its own ingest
    (the reference's domain; rule evaluation analogue
    ``pkg/usecase/load.go:271-281`` applies per-event predicates, this
    is the temporal-aggregate complement). Per (event_type, hour), an
    hour is a spike when its count exceeds ``SPIKE_FACTOR`` × the
    trailing-``SPIKE_WINDOW_H``-hour MEAN, integer-cross-multiplied
    (``n·24 > 3·base24`` where ``base24 = Σ n over hours [h−24, h−1]``,
    missing hours contributing 0); an empty baseline is never flagged
    (cold start). Integer-exact, SQL window-frame reproducible.

    Scale shape: events collapse to per-(type, hour) partial counts at
    the map stage (the ``events_hourly`` shuffle — tiny key space);
    the trailing walk runs per event_type over its hour series (years
    of hours ≈ 10^4 rows) as one vectorized prefix-sum range query.
    No per-event exchange, no window fan-out of the raw stream."""
    def hour_counts(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        tbl = pa.table({
            "event_type": t["event_type"],
            "epoch_h": pa.array(us // 3_600_000_000, type=pa.int64()),
        })
        return pa.TableGroupBy(tbl, ["event_type", "epoch_h"]).aggregate(
            [([], "count_all")]).rename_columns(
                ["event_type", "epoch_h", "n"])

    counts = (_read_events(sf_dir, ["ts", "event_type"])
              .map_batches(hour_counts, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["event_type", "epoch_h"])
              .aggregate(Sum("n", alias_name="n")))

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("epoch_h").reset_index(drop=True)
        h = g["epoch_h"].to_numpy()
        n = g["n"].to_numpy()
        cum = np.cumsum(n)
        # base24[i] = Σ n over hours in [h_i − 24, h_i − 1]: two binary
        # searches + prefix-sum difference, fully vectorized
        lo = np.searchsorted(h, h - SPIKE_WINDOW_H, side="left")
        hi = np.searchsorted(h, h - 1, side="right")
        base = (np.where(hi > 0, cum[hi - 1], 0)
                - np.where(lo > 0, cum[lo - 1], 0))
        spike = ((base > 0)
                 & (n * SPIKE_WINDOW_H > SPIKE_FACTOR * base))
        return pd.DataFrame({
            "event_type": g["event_type"],
            "hour": pd.to_datetime(h * 3600, unit="s"),
            "n": n.astype(np.int64),
            "base24": base.astype(np.int64),
            "is_spike": spike.astype(np.int64),
        })

    return counts.groupby("event_type").map_groups(
        walk, batch_format="pandas")


# ------------------------------------------- windowed distinct users

def q_events_hourly_users(sf_dir: str) -> ray.data.Dataset:
    """Exact DISTINCT-per-window aggregate — distinct active users per
    hour, the telemetry metric COUNT(*) can't fake. Distinct is
    non-additive, so the naive plan shuffles every event; here the
    stream collapses to block-distinct (hour, user) pairs first, ONE
    user-keyed exchange co-locates each user's pairs (making the
    block-local dedup globally complete), and per-hour partial counts
    fold through a bounded tree (≤ #hours rows). The exchange moves
    distinct pairs, not events — bounded by users × active-hours, and
    hash-partitioned by user so a hot HOUR (the usual skew: everyone
    online at peak) spreads across all partitions instead of landing
    on one reducer."""
    def pair_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        tbl = pa.table({
            "epoch_h": pa.array(us // 3_600_000_000, type=pa.int64()),
            "user_id": t["user_id"],
        })
        return pa.TableGroupBy(tbl, ["epoch_h", "user_id"]).aggregate(
            [([], "count_all")]).select(["epoch_h", "user_id"])

    def hour_counts(t: pa.Table) -> pa.Table:
        # whole user-keyed block: every (hour, user) pair of these
        # users is here, so block-local dedup is globally exact
        if t.num_rows == 0:
            return pa.table({"epoch_h": pa.array([], type=pa.int64()),
                             "users": pa.array([], type=pa.int64())})
        dedup = pa.TableGroupBy(t, ["epoch_h", "user_id"]).aggregate(
            [([], "count_all")])
        return pa.TableGroupBy(dedup.select(["epoch_h"]), ["epoch_h"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["epoch_h", "users"])

    from .agg import tree_fold_sum
    from ..util import enable_hash_shuffle, keyed_partition_count

    pairs = (_read_events(sf_dir, ["ts", "user_id"])
             .map_batches(pair_partial, batch_format="pyarrow",
                          zero_copy_batch=True))
    nparts = keyed_partition_count(_events_count(sf_dir) * 16)
    enable_hash_shuffle(pairs, nparts)
    partials = (pairs.repartition(nparts, keys=["user_id"])
                .map_batches(hour_counts, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True))
    folded = tree_fold_sum(partials, ["epoch_h"], ["users"])

    def to_ts(t: pa.Table) -> pa.Table:
        h = t["epoch_h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "hour": pa.array(h * 3_600_000_000).cast(pa.timestamp("us")),
            "users": t["users"],
        })

    return folded.map_batches(to_ts, batch_format="pyarrow",
                              zero_copy_batch=True)


# ------------------------------------------------------- rate-limit audit

RATE_LIMIT_PER_MIN = 5   # keep the first R events per (user, minute)


def q_events_rate_limit(sf_dir: str) -> ray.data.Dataset:
    """Alert-throttling audit — the monitoring-pipeline question "how
    much would a per-user rate limit drop?": per user, total events
    and the count beyond the first ``RATE_LIMIT_PER_MIN`` in each
    minute window (order within a window by (ts, event_id) — total and
    SQL-reproducible). The reference's domain runs exactly this class
    of throttle before alert fan-out.

    Scale shape: ONE user-keyed exchange co-locates each user's
    events; ordering + window cumcount + the per-user fold are all
    block-local after it (no second shuffle — the per-user summary is
    complete inside the block by construction). Shares sessionize's
    user-fits-one-block assumption; the salted boundary-stitch recipe
    (``q_events_sessionize_salted``) applies unchanged if a bot user
    outgrows a block."""
    def summarize(df_: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_events": "int64",
                "n_dropped": "int64"}
        if df_.empty:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in cols.items()})
        df_ = df_.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        # dt.floor, not astype(int64)//divisor: the Arrow-backed frame
        # is datetime64[us] (not ns), so a fixed ns divisor silently
        # merges minutes (measured: 28 users over-dropped at sf0.01)
        minute = df_["ts"].dt.floor("min")
        rn = df_.assign(_m=minute).groupby(["user_id", "_m"],
                                           sort=False).cumcount()
        dropped = (rn.to_numpy() >= RATE_LIMIT_PER_MIN).astype(np.int64)
        out = df_.assign(_d=dropped).groupby("user_id", sort=False) \
            .agg(n_events=("_d", "size"), n_dropped=("_d", "sum")) \
            .reset_index()
        return out.astype(cols)

    from ..util import enable_hash_shuffle, keyed_partition_count

    ds = _read_events(sf_dir, ["event_id", "ts", "user_id"])
    nparts = keyed_partition_count(_events_count(sf_dir) * 24)
    enable_hash_shuffle(ds, nparts)
    return (ds.repartition(nparts, keys=["user_id"])
            .map_batches(summarize, batch_format="pandas",
                         batch_size=None))


# ------------------------------------------------------------ top-k

def q_events_top_users(sf_dir: str) -> ray.data.Dataset:
    """Top-10 users by event count (sort + limit after a pre-aggregated
    groupby; ties broken by user_id ascending, mirrored in the SQL)."""
    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "value_cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })
    agg = (_read_events(sf_dir, ["user_id", "value"])
           .map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("user_id")
           .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="value_cents")))
    # two-key sort (n desc, user_id asc) for a deterministic top-k
    return agg.sort(["n", "user_id"], descending=[True, False]).limit(10)


# ------------------------------------------------------------ sessionization

def _sessionize_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"])
    gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
    session = gap.cumsum()  # 0-based session index per user
    sizes = session.value_counts()
    return pd.DataFrame({
        "user_id": [g["user_id"].iloc[0]],
        "n_sessions": [int(session.nunique())],
        "max_session_events": [int(sizes.max())],
        "total_events": [len(g)],
    })


def _sessionize_block(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized sessionization of one hash-partitioned block (every
    user's rows are complete within it): one sort, a cumsum of
    session-break flags, and two C-path groupbys — NO per-user Python.
    (``groupby().map_groups`` costs ~0.5 ms of slicing per group;
    at millions of users that dominates everything.)"""
    if df.empty:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "n_sessions": pd.Series([], dtype="int64"),
                             "max_session_events": pd.Series([], dtype="int64"),
                             "total_events": pd.Series([], dtype="int64")})
    df = df.sort_values(["user_id", "ts", "event_id"])
    new_user = df["user_id"].ne(df["user_id"].shift())
    gap = df["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
    sid = (new_user | gap).cumsum()
    per_sess = df.groupby(sid, sort=False).agg(
        user_id=("user_id", "first"), n=("ts", "size"))
    out = (per_sess.groupby("user_id", sort=False)
           .agg(n_sessions=("n", "size"), max_session_events=("n", "max"),
                total_events=("n", "sum"))
           .reset_index())
    return out.astype({"user_id": "int64", "n_sessions": "int64",
                       "max_session_events": "int64", "total_events": "int64"})


def q_events_sessionize(sf_dir: str) -> ray.data.Dataset:
    """Gap-based sessionization (30-min idle gap): per-user session
    stats. Users are co-located by a keyed hash repartition and each
    block sessionizes ALL its users vectorized (sort + cumsum + C-path
    groupbys) — no global sort, no per-user Python callback.
    ``batch_size=None`` is load-bearing: one whole block per call, so
    a user never straddles a batch.

    Partitioning assumption: one user's events fit one block. For
    bot-grade hot keys that breaks — use ``q_events_sessionize_salted``
    (identical output, bounded groups)."""
    from ..util import enable_hash_shuffle, keyed_partition_count
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"])
    # sized to the (user_id, ts, event_id) triple bytes as well as CPUs
    # so one partition stays under the block-split threshold that would
    # break the one-whole-partition-per-call invariant (ADVICE r2)
    nparts = keyed_partition_count(_events_count(sf_dir) * 40)
    enable_hash_shuffle(ds, nparts)
    return (ds.repartition(nparts, keys=["user_id"])
            .map_batches(_sessionize_block, batch_format="pandas",
                         batch_size=None))


# ---------------------------------------------------- salted sessionization

def _bucket_summary_block(df: pd.DataFrame) -> pd.DataFrame:
    """Summaries for ALL complete (user, day) buckets in one
    hash-partitioned block, fully vectorized (one sort + C-path
    groupbys; no per-bucket Python). Each summary row carries exactly
    what boundary stitching needs: the bucket's session count and
    event total, its first/last session sizes and boundary timestamps,
    and the max size among INTERIOR sessions (which can never merge
    across buckets)."""
    if df.empty:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "day": pd.Series([], dtype="datetime64[us]"),
            "ns": pd.Series([], dtype="int64"),
            "total": pd.Series([], dtype="int64"),
            "first_n": pd.Series([], dtype="int64"),
            "last_n": pd.Series([], dtype="int64"),
            "mid_max": pd.Series([], dtype="int64"),
            "first_start": pd.Series([], dtype="datetime64[us]"),
            "last_end": pd.Series([], dtype="datetime64[us]"),
        })
    df = df.sort_values(["user_id", "day", "ts", "event_id"])
    new_bucket = (df["user_id"].ne(df["user_id"].shift())
                  | df["day"].ne(df["day"].shift()))
    gap = df["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
    sid = (new_bucket | gap).cumsum()
    per = df.groupby(sid, sort=False).agg(
        user_id=("user_id", "first"), day=("day", "first"),
        n=("ts", "size"), start=("ts", "first"), end=("ts", "last"))
    g = per.groupby(["user_id", "day"], sort=False)
    summ = g.agg(ns=("n", "size"), total=("n", "sum"),
                 first_n=("n", "first"), last_n=("n", "last"),
                 first_start=("start", "first"), last_end=("end", "last"))
    rank = g.cumcount()
    cnt = g["n"].transform("size")
    mid = per[(rank > 0) & (rank < cnt - 1)]
    mid_max = mid.groupby(["user_id", "day"], sort=False)["n"].max()
    summ["mid_max"] = mid_max.reindex(summ.index).fillna(0)
    out = summ.reset_index()
    return out.astype({"user_id": "int64", "ns": "int64", "total": "int64",
                       "first_n": "int64", "last_n": "int64",
                       "mid_max": "int64"})


def _stitch_user(g: pd.DataFrame) -> pd.DataFrame:
    """Fold a user's per-bucket summaries (in day order) into exact
    whole-history session stats: a bucket's first session merges into
    the running open session iff the actual timestamp gap to the
    previous bucket's last event is within the session gap."""
    g = g.sort_values("day")
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)
    n_sessions = 0
    max_ev = 0
    open_n = 0
    prev_end = None
    for r in g.itertuples(index=False):
        if prev_end is not None and (r.first_start - prev_end) <= gap:
            open_n += r.first_n                   # continues the open session
        else:
            if open_n:
                n_sessions += 1
                max_ev = max(max_ev, open_n)
            open_n = r.first_n
        if r.ns >= 2:
            # the open session ends inside this bucket
            n_sessions += 1 + (r.ns - 2)
            max_ev = max(max_ev, open_n, r.mid_max)
            open_n = r.last_n
        prev_end = r.last_end
    if open_n:
        n_sessions += 1
        max_ev = max(max_ev, open_n)
    return pd.DataFrame({
        "user_id": [g["user_id"].iloc[0]],
        "n_sessions": [int(n_sessions)],
        "max_session_events": [int(max_ev)],
        "total_events": [int(g["total"].sum())],
    })


def _stitch_block(df: pd.DataFrame) -> pd.DataFrame:
    """Stitch every complete user in one block (pandas groupby.apply —
    ~10x cheaper per group than a Ray map_groups callback; the input
    here is per-bucket SUMMARY rows, already ~|events|/|user-days|
    smaller than the corpus)."""
    if df.empty:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "n_sessions": pd.Series([], dtype="int64"),
                             "max_session_events": pd.Series([], dtype="int64"),
                             "total_events": pd.Series([], dtype="int64")})
    return (df.sort_values(["user_id", "day"])
            .groupby("user_id", sort=False, group_keys=False)
            .apply(_stitch_user)
            .reset_index(drop=True))


def q_events_sessionize_salted(sf_dir: str) -> ray.data.Dataset:
    """Sessionization with a TIME-BUCKET SALT — the hot-user guard
    (north rule's salted-key handling): a bot user's events split into
    (user, day) partitions, so no block ever materializes more than
    one user-day of the hot key; per-bucket session summaries (one
    tiny row each, computed block-vectorized) are then stitched per
    user, merging sessions that straddle bucket boundaries by their
    actual timestamp gap. Exact — identical output to
    ``q_events_sessionize`` (same DuckDB oracle checks both)."""
    from ..util import enable_hash_shuffle, keyed_partition_count

    def add_day(t: pa.Table) -> pa.Table:
        return t.append_column("day", pc.floor_temporal(t["ts"], unit="day"))

    nparts = keyed_partition_count(_events_count(sf_dir) * 48)
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"])
    enable_hash_shuffle(ds, nparts)
    buckets = (ds.map_batches(add_day, batch_format="pyarrow",
                              zero_copy_batch=True)
               .repartition(nparts, keys=["user_id", "day"])
               .map_batches(_bucket_summary_block, batch_format="pandas",
                            batch_size=None))
    return (buckets.repartition(nparts, keys=["user_id"])
            .map_batches(_stitch_block, batch_format="pandas",
                         batch_size=None))


# ------------------------------------------------------------ as-of join

def _asof_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"])
    click_ids = g["event_id"].where(g["event_type"] == "click").astype("float64")
    # cummax leaves NaN at non-click rows → ffill carries the running
    # max forward; shift(1) makes it strictly-prior
    prior_click = click_ids.cummax().ffill().shift(1)
    err = g[g["event_type"] == "error"]
    out = pd.DataFrame({
        "error_event_id": err["event_id"].astype("int64"),
        "user_id": err["user_id"].astype("int64"),
        "prior_click_id": prior_click[err.index].fillna(-1).astype("int64"),
    })
    return out


def _asof_block(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized as-of join for one hash-partitioned block: grouped
    cummax/ffill/shift are all C-path pandas — no per-user Python."""
    if df.empty:
        return pd.DataFrame({"error_event_id": pd.Series([], dtype="int64"),
                             "user_id": pd.Series([], dtype="int64"),
                             "prior_click_id": pd.Series([], dtype="int64")})
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    click = df["event_id"].where(df["event_type"] == "click").astype("float64")
    g = df.assign(_c=click).groupby("user_id", sort=False)
    running = g["_c"].cummax()
    prior = (df.assign(_m=running).groupby("user_id", sort=False)["_m"]
             .ffill())
    prior = (df.assign(_f=prior).groupby("user_id", sort=False)["_f"]
             .shift(1))
    err = df["event_type"] == "error"
    return pd.DataFrame({
        "error_event_id": df.loc[err, "event_id"].astype("int64"),
        "user_id": df.loc[err, "user_id"].astype("int64"),
        "prior_click_id": prior[err].fillna(-1).astype("int64"),
    }).reset_index(drop=True)


def q_events_asof_click(sf_dir: str) -> ray.data.Dataset:
    """As-of self-join: for every 'error' event, the most recent prior
    'click' of the same user (-1 when none). Semantics pinned as: max
    event_id among clicks strictly earlier in (ts, event_id) order —
    deterministic under timestamp ties, identical in the SQL window.
    Same execution shape as sessionize: keyed hash repartition +
    whole-block vectorized pandas (grouped cummax/ffill/shift)."""
    from ..util import enable_hash_shuffle, keyed_partition_count
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"])
    nparts = keyed_partition_count(_events_count(sf_dir) * 48)
    enable_hash_shuffle(ds, nparts)
    return (ds.repartition(nparts, keys=["user_id"])
            .map_batches(_asof_block, batch_format="pandas",
                         batch_size=None))


# ------------------------------------------------------------ TPC-H-ish

def q_tpch_pricing(sf_dir: str) -> ray.data.Dataset:
    """Q1-style pricing summary over lineitem (groupby + multi-agg,
    integer-cents sums, pre-aggregated per block by Ray's combiner)."""
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate"]

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        t = t.filter(keep)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty_cents": pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)), pa.int64()),
            "price_cents": pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64()),
            "disc_cents": pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()),
        })

    return (read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=cols)
            .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("qty_cents", alias_name="sum_qty_cents"),
                       Sum("price_cents", alias_name="sum_price_cents"),
                       Sum("disc_cents", alias_name="sum_disc_cents"),
                       Count(alias_name="count_order")))


def q_tpch_nation_orders(sf_dir: str) -> ray.data.Dataset:
    """orders ⋈ customer ⋈ nation per-nation totals — implemented as two
    BROADCAST hash lookups (customer→nation key, nation→name) inside one
    map_batches, then a small groupby: the no-shuffle join plan for
    dimension tables (SURVEY §2.4), vs. the SQL's literal joins."""
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = read_parquet_clean(f"{sf_dir}/nation.parquet",
                                   columns=["n_nationkey", "n_name"]).to_pandas()
    cust_arr = np.full(int(cust["c_custkey"].max()) + 1, -1, dtype=np.int64)
    cust_arr[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
    nation_names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust_ref = ray.put(cust_arr)

    class JoinLookup:
        def __init__(self, cust_ref, nation_names):
            self.cust = ray.get(cust_ref)
            self.nation_names = nation_names

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_custkey"].to_numpy()
            nk = self.cust[keys]
            names = pd.Series(nk).map(self.nation_names)
            cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
            return pa.table({"n_name": pa.array(names, type=pa.string()),
                             "total_cents": cents})

    from ..util import autoscaling_pool
    return (read_parquet_clean(f"{sf_dir}/orders.parquet",
                                  columns=["o_custkey", "o_totalprice"])
            .map_batches(JoinLookup, batch_format="pyarrow", zero_copy_batch=True,
                         concurrency=autoscaling_pool(),
                         fn_constructor_kwargs={"cust_ref": cust_ref,
                                                "nation_names": nation_names})
            .groupby("n_name")
            .aggregate(Count(alias_name="order_count"),
                       Sum("total_cents", alias_name="total_cents")))


def q_tpch_rollup_revenue(sf_dir: str) -> ray.data.Dataset:
    """Hierarchical ROLLUP in one pass — region→nation→grand-total
    order revenue (``GROUP BY ROLLUP(r_name, n_name)``), the reporting
    aggregate that naive plans compute with three separate shuffles.
    Here: the dimension chain (customer→nation→region) rides the
    broadcast-lookup join plan (SURVEY §2.4, same as
    q_tpch_nation_orders), the fact stream collapses to per-block
    (region, nation) partials, ONE bounded tree fold (≤ #nations rows
    BY CONSTRUCTION) lands the detail table, and every rollup level is
    derived from that bounded table in a single final task — the
    subtotals are free because the detail key space is tiny. Level
    markers use the 'ALL' sentinel (COALESCE'd identically in the SQL)
    so the output is null-free and hash-stable."""
    from .agg import tree_fold_sum
    from ..util import autoscaling_pool

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = read_parquet_clean(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = read_parquet_clean(f"{sf_dir}/region.parquet",
                                   columns=["r_regionkey", "r_name"]).to_pandas()
    cust_arr = np.full(int(cust["c_custkey"].max()) + 1, -1, dtype=np.int64)
    cust_arr[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
    nation_names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    region_of_nation = dict(zip(
        nation["n_nationkey"],
        nation["n_regionkey"].map(
            dict(zip(region["r_regionkey"], region["r_name"])))))
    cust_ref = ray.put(cust_arr)

    class RollupPartial:
        def __init__(self, cust_ref, nation_names, region_of_nation):
            self.cust = ray.get(cust_ref)
            self.nation_names = nation_names
            self.region_of_nation = region_of_nation

        def __call__(self, t: pa.Table) -> pa.Table:
            nk = self.cust[t["o_custkey"].to_numpy()]
            cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                            pa.int64())
            tbl = pa.table({
                "r_name": pa.array(pd.Series(nk).map(self.region_of_nation),
                                   type=pa.string()),
                "n_name": pa.array(pd.Series(nk).map(self.nation_names),
                                   type=pa.string()),
                "order_count": pa.array(np.ones(len(t), dtype=np.int64)),
                "total_cents": cents,
            })
            return pa.TableGroupBy(tbl, ["r_name", "n_name"]).aggregate(
                [("order_count", "sum"), ("total_cents", "sum")]
            ).rename_columns(["r_name", "n_name", "order_count",
                              "total_cents"])

    detail = tree_fold_sum(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_totalprice"])
        .map_batches(RollupPartial, batch_format="pyarrow",
                     zero_copy_batch=True,
                     concurrency=autoscaling_pool(),
                     fn_constructor_kwargs={
                         "cust_ref": cust_ref,
                         "nation_names": nation_names,
                         "region_of_nation": region_of_nation}),
        ["r_name", "n_name"], ["order_count", "total_cents"])

    def rollup(df_: pd.DataFrame) -> pd.DataFrame:
        # one bounded block: ≤ #nations detail rows
        cols = ["r_name", "n_name", "order_count", "total_cents"]
        reg = (df_.groupby("r_name", as_index=False)
               [["order_count", "total_cents"]].sum())
        reg["n_name"] = "ALL"
        tot = pd.DataFrame({
            "r_name": ["ALL"], "n_name": ["ALL"],
            "order_count": [df_["order_count"].sum()],
            "total_cents": [df_["total_cents"].sum()]})
        out = pd.concat([df_[cols], reg[cols], tot[cols]],
                        ignore_index=True)
        return out.astype({"order_count": "int64", "total_cents": "int64"})

    return detail.repartition(1).map_batches(
        rollup, batch_format="pandas", batch_size=None)


def q_tpch_revenue(sf_dir: str) -> pd.DataFrame:
    """Q6-style filtered revenue — predicate + projection pruned at the
    read (row-group pushdown), integer 1e-4-scale product sum."""
    filt = (
        (pc.field("l_shipdate") >= pd.Timestamp("1994-01-01"))
        & (pc.field("l_shipdate") < pd.Timestamp("1995-01-01"))
        & (pc.field("l_quantity") < 24.0)
    )

    def rev(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        keep = pc.and_(pc.greater_equal(d, 5), pc.less_equal(d, 7))
        t = t.filter(keep)
        e = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        return pa.table({"revenue_e4": pc.multiply(e, d)})

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_shipdate", "l_quantity"],
        filter=filt,
    ).map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    total = ds.sum("revenue_e4")
    return pd.DataFrame({"revenue_e4": [int(total or 0)]})


# ------------------------------------------------------------ funnel

FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_block(df: pd.DataFrame) -> pd.DataFrame:
    """Per-user 3-step funnel over one hash-partitioned block (every
    user's rows complete within it): first qualifying timestamp per
    step — t1 = min ts of step1; t_{i+1} = min ts of step_{i+1}
    STRICTLY after t_i. All three steps are C-path groupby mins on
    filtered frames; no per-user Python."""
    cols = {"step": pd.Series(dtype="int64"),
            "users": pd.Series(dtype="int64")}
    if df.empty:
        return pd.DataFrame(cols)
    t = df[df["event_type"] == FUNNEL_STEPS[0]] \
        .groupby("user_id")["ts"].min()
    counts = [t.size]
    for step in FUNNEL_STEPS[1:]:
        nxt = df[df["event_type"] == step].copy()
        prev = nxt["user_id"].map(t)
        nxt = nxt[nxt["ts"] > prev]          # NaT prev → False → dropped
        t = nxt.groupby("user_id")["ts"].min()
        counts.append(t.size)
    return pd.DataFrame({"step": np.arange(1, len(counts) + 1,
                                           dtype="int64"),
                         "users": np.asarray(counts, dtype="int64")})


def q_events_funnel(sf_dir: str) -> ray.data.Dataset:
    """Conversion FUNNEL (view → click → purchase): users reached per
    step, a step counting only events strictly after the user's first
    qualifying event of the previous step. Same execution shape as
    sessionize — one keyed hash repartition on user_id, block-local
    vectorized pandas, then a 3-row Sum fold. SQL-checked against a
    chained min-filter-join oracle."""
    from ray.data.aggregate import Sum as _Sum

    from ..util import enable_hash_shuffle, keyed_partition_count
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type"])
    nparts = keyed_partition_count(_events_count(sf_dir) * 48)
    enable_hash_shuffle(ds, nparts)
    return (ds.repartition(nparts, keys=["user_id"])
            .map_batches(_funnel_block, batch_format="pandas",
                         batch_size=None)
            .groupby("step")
            .aggregate(_Sum("users", alias_name="users")))


SQL_EVENTS_FUNNEL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id
)
SELECT 1::BIGINT AS step, COUNT(*)::BIGINT AS users FROM s1
UNION ALL SELECT 2, COUNT(*) FROM s2
UNION ALL SELECT 3, COUNT(*) FROM s3
"""


# ------------------------------------------------------------ registry

# ------------------------------------------------------------ retention

def _retention_block(df: pd.DataFrame) -> pd.DataFrame:
    """Per-block cohort partials for ALL users in the block (users are
    co-located by the keyed repartition, so per-user MIN and the
    distinct-offset dedup are complete here and the partial user
    counts fold additively downstream)."""
    day = df["ts"].dt.floor("D")
    cohort = day.groupby(df["user_id"]).transform("min")
    u = pd.DataFrame({
        "user_id": df["user_id"],
        "cohort_day": cohort.dt.strftime("%Y-%m-%d"),
        "offset_d": (day - cohort).dt.days.astype("int64"),
    }).drop_duplicates(["user_id", "offset_d"])
    return (u.groupby(["cohort_day", "offset_d"], sort=False).size()
            .reset_index(name="users_part"))


def q_events_retention(sf_dir: str) -> ray.data.Dataset:
    """Cohort RETENTION matrix — users grouped by first-seen day, and
    for each (cohort, day-offset) the number of distinct users active
    at that offset: the standard telemetry/engagement rollup the
    reference's aggregate plane stops short of (SURVEY §2.5 analogue).

    Scale shape: ONE keyed hash repartition on user_id co-locates each
    user's events, so cohort (global per-user MIN) and the distinct-
    offset dedup are block-local and exact; blocks emit bounded
    (cohort, offset) partial counts (≤ #days² rows per block) and a
    tiny final groupby sums them. COUNT(DISTINCT user) never needs a
    distinct shuffle because a user contributes each offset exactly
    once from exactly one block. Same partitioning assumption as
    q_events_sessionize (a user's events fit one block; hot users →
    the salted-bucket recipe)."""
    from ..util import enable_hash_shuffle, keyed_partition_count
    ds = _read_events(sf_dir, ["user_id", "ts"])
    nparts = keyed_partition_count(_events_count(sf_dir) * 16)
    enable_hash_shuffle(ds, nparts)
    return (ds.repartition(nparts, keys=["user_id"])
            .map_batches(_retention_block, batch_format="pandas",
                         batch_size=None)
            .groupby(["cohort_day", "offset_d"])
            .aggregate(Sum("users_part", alias_name="users")))


def q_events_retention_salted(sf_dir: str) -> ray.data.Dataset:
    """Retention with the HOT-USER guard (VERDICT r4 item 6 — the
    salted analogue q_events_sessionize_salted has, adapted to
    retention's algebra): the row count a single user contributes to
    the user-keyed exchange is bounded by CALENDAR DAYS, not events,
    so a bot user with 10⁹ events costs the same as one with 10³.

    Pass 1 (no shuffle): each batch collapses raw events to distinct
    (user_id, day) pairs via an Arrow group_by — retention only ever
    consumes user-days, and MIN/DISTINCT distribute over them, so no
    boundary stitching is needed (unlike sessionize's gap semantics).
    Pass 2: ONE keyed repartition of those fixed-width pairs on
    user_id; block-local cross-batch dedup + cohort=MIN(day) +
    distinct offsets emit the same additive (cohort, offset) partials
    as ``q_events_retention``; same tiny final fold, same SQL oracle —
    exact, not approximate."""
    from ..util import enable_hash_shuffle, keyed_partition_count

    def user_days(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "day": pc.floor_temporal(t["ts"], unit="day")})
        return tbl.group_by(["user_id", "day"]).aggregate([])

    def fold_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "cohort_day": pd.Series([], dtype="object"),
                "offset_d": pd.Series([], dtype="int64"),
                "users_part": pd.Series([], dtype="int64")})
        df = df.drop_duplicates(["user_id", "day"])
        cohort = df.groupby("user_id")["day"].transform("min")
        u = pd.DataFrame({
            "cohort_day": cohort.dt.strftime("%Y-%m-%d"),
            "offset_d": (df["day"] - cohort).dt.days.astype("int64"),
        })
        return (u.groupby(["cohort_day", "offset_d"], sort=False).size()
                .reset_index(name="users_part"))

    ds = _read_events(sf_dir, ["user_id", "ts"])
    pairs = ds.map_batches(user_days, batch_format="pyarrow",
                           zero_copy_batch=True)
    # exchange volume: distinct user-day pairs (≤ events, typically ≪)
    nparts = keyed_partition_count(_events_count(sf_dir) * 16)
    enable_hash_shuffle(pairs, nparts)
    return (pairs.repartition(nparts, keys=["user_id"])
            .map_batches(fold_block, batch_format="pandas",
                         batch_size=None)
            .groupby(["cohort_day", "offset_d"])
            .aggregate(Sum("users_part", alias_name="users")))


SQL_EVENTS_RETENTION = """
WITH d AS (
  SELECT user_id, date_trunc('day', ts) AS day FROM events
), f AS (
  SELECT user_id, MIN(day) AS cohort FROM d GROUP BY user_id
), j AS (
  SELECT DISTINCT d.user_id, f.cohort,
         date_diff('day', f.cohort, d.day) AS offset_d
  FROM d JOIN f USING (user_id)
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
       CAST(offset_d AS BIGINT) AS offset_d,
       COUNT(*)::BIGINT AS users
FROM j GROUP BY cohort, offset_d ORDER BY cohort, offset_d
"""


# ----------------------------------------------- per-group exact quantiles

QUANTILE_PS = (50, 90, 99)


def q_events_value_quantiles(sf_dir: str) -> ray.data.Dataset:
    """EXACT per-type value percentiles (p50/p90/p99 in cents) — the
    latency/value-distribution rollup behind alert thresholds and SLO
    reports. Exactness without a global sort: the value DOMAIN is
    bounded (cents of a bounded metric), so each block collapses to
    (event_type, cents) partial counts, the bounded histogram folds
    through the combine tree (≤ #types × #distinct-cents rows — a
    DOMAIN bound, independent of corpus size; the q_doc_quality_topp
    recipe), and one final task walks each type's CDF. Percentile
    definition: the value at 0-indexed rank ⌊(n−1)·p/100⌋ of the
    sorted values ("lower" interpolation) — integer-exact and mirrored
    literally in the SQL's ROW_NUMBER arithmetic."""
    from .agg import tree_fold_sum

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
        })
        return pa.TableGroupBy(tbl, ["event_type", "cents"]).aggregate(
            [([], "count_all")]).rename_columns(
                ["event_type", "cents", "c"])

    def cdf_walk(df_: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": "object", "n": "int64"}
        cols.update({f"p{p}_cents": "int64" for p in QUANTILE_PS})
        if df_.empty:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in cols.items()})
        rows = []
        for et, g in df_.sort_values("cents").groupby("event_type"):
            cum = g["c"].to_numpy().cumsum()
            n = int(cum[-1])
            row = {"event_type": et, "n": n}
            for p in QUANTILE_PS:
                idx = int(np.searchsorted(cum, (n - 1) * p // 100 + 1))
                row[f"p{p}_cents"] = int(g["cents"].iloc[idx])
            rows.append(row)
        return pd.DataFrame(rows).astype(cols)

    hist = tree_fold_sum(
        _read_events(sf_dir, ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "cents"], ["c"])
    # per-type loop is over ≤ #event-types rows of a DOMAIN-bounded
    # histogram — runs inside the single folded block, not the driver
    return hist.map_batches(cdf_walk, batch_format="pandas",
                            batch_size=None)


SQL_EVENTS_VALUE_QUANTILES = f"""
WITH c AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT event_type, cents,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type, MAX(n)::BIGINT AS n,
  {", ".join(
      f"MAX(CASE WHEN rn = (n - 1) * {p} // 100 + 1 THEN cents END)"
      f"::BIGINT AS p{p}_cents" for p in QUANTILE_PS)}
FROM r GROUP BY event_type
"""


# ------------------------------------------------------ user featurization

def q_events_user_features(sf_dir: str) -> ray.data.Dataset:
    """Per-user FEATURE VECTOR (event count, distinct types, active
    days, total value cents, activity span in whole minutes) — the
    featurization pass a behavioral model trains on, and the natural
    consumer of the engine's user-keyed exchange. ONE hash repartition
    on user_id co-locates each user's events; every distinct-count and
    min/max is block-local-and-exact after it, and the output is one
    fixed-width row per user (no second shuffle). Same
    user-fits-one-block assumption + salted escape hatch as
    sessionize/rate-limit. Span uses explicit µs floor-division (not
    calendar boundary counting) so the SQL mirrors it exactly."""
    def feats(df_: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_events": "int64",
                "n_types": "int64", "active_days": "int64",
                "value_cents": "int64", "span_min": "int64"}
        if df_.empty:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in cols.items()})
        us = df_["ts"].astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({
            "user_id": df_["user_id"],
            "event_type": df_["event_type"],
            "day": df_["ts"].dt.floor("D"),
            "cents": np.round(df_["value"].to_numpy() * 100.0)
            .astype(np.int64),
            "us": us,
        }).groupby("user_id", sort=False).agg(
            n_events=("us", "size"),
            n_types=("event_type", "nunique"),
            active_days=("day", "nunique"),
            value_cents=("cents", "sum"),
            first_us=("us", "min"),
            last_us=("us", "max"),
        ).reset_index()
        g["span_min"] = (g["last_us"] - g["first_us"]) // 60_000_000
        return g[list(cols)].astype(cols)

    from ..util import enable_hash_shuffle, keyed_partition_count

    ds = _read_events(sf_dir,
                      ["user_id", "ts", "event_type", "value"])
    nparts = keyed_partition_count(_events_count(sf_dir) * 40)
    enable_hash_shuffle(ds, nparts)
    return (ds.repartition(nparts, keys=["user_id"])
            .map_batches(feats, batch_format="pandas", batch_size=None))


SQL_EVENTS_USER_FEATURES = """
SELECT user_id, COUNT(*)::BIGINT AS n_events,
  COUNT(DISTINCT event_type)::BIGINT AS n_types,
  COUNT(DISTINCT date_trunc('day', ts))::BIGINT AS active_days,
  SUM(CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS value_cents,
  ((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 60000000)::BIGINT AS span_min
FROM events GROUP BY 1
"""


# ---------------------------------------------------- inter-arrival gaps

def q_events_interarrival(sf_dir: str) -> ray.data.Dataset:
    """EXACT inter-arrival gap percentiles (whole seconds, p50/p90/p99)
    of consecutive same-user events under the (ts, event_id) order —
    the cadence statistic behind bot detection and session-gap tuning
    (SESSION_GAP_MIN should sit far right of p99; this op is how you
    check). Same recipe stack as q_events_value_quantiles: the gap
    domain is bounded by the OBSERVATION WINDOW in seconds (not the
    corpus), so (gap_s, count) partials fold exactly and one final
    task walks the CDF — but the partials here come AFTER a user-keyed
    exchange + block-local consecutive-pair diff (the transitions
    pairing, numeric twin)."""
    from .agg import tree_fold_sum
    from ..util import enable_hash_shuffle, keyed_partition_count

    def gaps_block(df_: pd.DataFrame) -> pa.Table:
        empty = pa.table({"gap_s": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64())})
        if len(df_) < 2:
            return empty
        df_ = df_.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        uid = df_["user_id"].to_numpy()
        us = df_["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        same = uid[1:] == uid[:-1]
        gaps = (us[1:] - us[:-1])[same] // 1_000_000   # whole seconds
        if len(gaps) == 0:
            return empty
        vals, counts = np.unique(gaps, return_counts=True)
        return pa.table({"gap_s": pa.array(vals, type=pa.int64()),
                         "c": pa.array(counts.astype(np.int64))})

    def cdf_walk(df_: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_gaps": "int64"}
        cols.update({f"p{p}_s": "int64" for p in QUANTILE_PS})
        if df_.empty:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in cols.items()})
        df_ = df_.sort_values("gap_s")
        cum = df_["c"].to_numpy().cumsum()
        n = int(cum[-1])
        row = {"n_gaps": n}
        for p in QUANTILE_PS:
            idx = int(np.searchsorted(cum, (n - 1) * p // 100 + 1))
            row[f"p{p}_s"] = int(df_["gap_s"].iloc[idx])
        return pd.DataFrame([row]).astype(cols)

    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"])
    nparts = keyed_partition_count(_events_count(sf_dir) * 24)
    enable_hash_shuffle(ds, nparts)
    partial = (ds.repartition(nparts, keys=["user_id"])
               .map_batches(gaps_block, batch_format="pandas",
                            batch_size=None))
    return (tree_fold_sum(partial, ["gap_s"], ["c"])
            .repartition(1)
            .map_batches(cdf_walk, batch_format="pandas",
                         batch_size=None))


SQL_EVENTS_INTERARRIVAL = f"""
WITH g AS (
  SELECT (epoch_us(ts) - epoch_us(LAG(ts) OVER (
            PARTITION BY user_id ORDER BY ts, event_id))) // 1000000
         AS gap_s
  FROM events
), v AS (
  SELECT gap_s FROM g WHERE gap_s IS NOT NULL
), r AS (
  SELECT gap_s, ROW_NUMBER() OVER (ORDER BY gap_s) AS rn,
         COUNT(*) OVER () AS n
  FROM v
)
SELECT MAX(n)::BIGINT AS n_gaps,
  {", ".join(
      f"MAX(CASE WHEN rn = (n - 1) * {p} // 100 + 1 THEN gap_s END)"
      f"::BIGINT AS p{p}_s" for p in QUANTILE_PS)}
FROM r
"""


# ------------------------------------------------------------ DAU / WAU

WAU_DAYS = 7


def q_events_dau_wau(sf_dir: str) -> ray.data.Dataset:
    """DAU / WAU / stickiness per calendar day — exact distinct-user
    engagement with a ROLLING 7-day window, the dashboard headline the
    hourly/retention ops bracket. Exactness without a distinct
    shuffle, composing two established recipes: the bot-proof
    user-day collapse (``q_events_retention_salted`` pass 1 — raw
    events never ride the exchange, distinct (user, day) pairs do) and
    the sliding-window fan-out (``q_events_sliding`` — each user-day
    feeds the {WAU_DAYS} window anchors it is visible to). Because the
    exchange is USER-keyed, the per-anchor distinct (a user active 3×
    in a window counts once) is a block-local drop_duplicates — a user
    never straddles blocks, so no distinct ever crosses the wire; the
    (kind, day) partial counts are additive and CALENDAR-bounded
    (≤ 2 × #days rows), and one final task aligns the two series over
    the observed span and derives stickiness = 1000·dau // wau."""
    from .agg import tree_fold_sum
    from ..util import enable_hash_shuffle, keyed_partition_count

    def user_days(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        tbl = pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "day": pa.array(us // 86_400_000_000, type=pa.int64())})
        return tbl.group_by(["user_id", "day"]).aggregate([])

    def window_partials(df_: pd.DataFrame) -> pa.Table:
        empty = pa.table({"kind": pa.array([], type=pa.int64()),
                          "day": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64())})
        if df_.empty:
            return empty
        df_ = df_.drop_duplicates(["user_id", "day"])
        dau = df_.groupby("day").size()
        anchors = pd.DataFrame({
            "user_id": np.repeat(df_["user_id"].to_numpy(), WAU_DAYS),
            "w": (np.repeat(df_["day"].to_numpy(), WAU_DAYS)
                  + np.tile(np.arange(WAU_DAYS, dtype=np.int64),
                            len(df_))),
        }).drop_duplicates()          # block-local = globally exact
        wau = anchors.groupby("w").size()
        return pa.table({
            "kind": pa.array(np.concatenate([
                np.zeros(len(dau), dtype=np.int64),
                np.ones(len(wau), dtype=np.int64)])),
            "day": pa.array(np.concatenate([
                dau.index.to_numpy(), wau.index.to_numpy()])),
            "c": pa.array(np.concatenate([
                dau.to_numpy(), wau.to_numpy()]).astype(np.int64)),
        })

    def align(df_: pd.DataFrame) -> pd.DataFrame:
        cols = {"day": "object", "dau": "int64", "wau": "int64",
                "stickiness_milli": "int64"}
        if df_.empty:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in cols.items()})
        dau = df_[df_["kind"] == 0].set_index("day")["c"]
        wau = df_[df_["kind"] == 1].set_index("day")["c"]
        lo, hi = int(dau.index.min()), int(dau.index.max())
        days = np.arange(lo, hi + 1, dtype=np.int64)
        d = dau.reindex(days, fill_value=0).to_numpy(dtype=np.int64)
        w = wau.reindex(days, fill_value=0).to_numpy(dtype=np.int64)
        stick = np.where(w > 0, (1000 * d) // np.maximum(w, 1), 0)
        return pd.DataFrame({
            "day": pd.to_datetime(days * 86_400_000_000, unit="us")
            .strftime("%Y-%m-%d"),
            "dau": d, "wau": w,
            "stickiness_milli": stick.astype(np.int64),
        }).astype(cols)

    ds = _read_events(sf_dir, ["user_id", "ts"])
    pairs = ds.map_batches(user_days, batch_format="pyarrow",
                           zero_copy_batch=True)
    nparts = keyed_partition_count(_events_count(sf_dir) * 16)
    enable_hash_shuffle(pairs, nparts)
    partial = (pairs.repartition(nparts, keys=["user_id"])
               .map_batches(window_partials, batch_format="pandas",
                            batch_size=None))
    return (tree_fold_sum(partial, ["kind", "day"], ["c"])
            .repartition(1)
            .map_batches(align, batch_format="pandas", batch_size=None))


SQL_EVENTS_DAU_WAU = f"""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), span AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud
), days AS (
  SELECT UNNEST(generate_series((SELECT lo FROM span),
                                (SELECT hi FROM span),
                                INTERVAL 1 DAY)) AS day
), dau AS (
  SELECT day, COUNT(*)::BIGINT AS dau FROM ud GROUP BY 1
), wau AS (
  SELECT d.day, COUNT(DISTINCT u.user_id)::BIGINT AS wau
  FROM days d JOIN ud u
    ON u.day BETWEEN d.day - INTERVAL {WAU_DAYS - 1} DAY AND d.day
  GROUP BY 1
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
  COALESCE(dau.dau, 0)::BIGINT AS dau,
  COALESCE(wau.wau, 0)::BIGINT AS wau,
  CASE WHEN COALESCE(wau.wau, 0) = 0 THEN 0
       ELSE (1000 * COALESCE(dau.dau, 0)) // wau.wau END::BIGINT
    AS stickiness_milli
FROM days d
LEFT JOIN dau ON dau.day = d.day
LEFT JOIN wau ON wau.day = d.day
"""


# ------------------------------------------------------- running total

def q_events_running_total(sf_dir: str) -> ray.data.Dataset:
    """Per-user RUNNING VALUE TOTAL — every event row annotated with
    the cumulative cents of that user's events so far (order:
    ts, event_id): the ROW-LEVEL window function
    (``SUM(...) OVER (PARTITION BY user ORDER BY ...)``) the window
    family was missing — hourly/sliding are grouped aggregates, spikes
    and trend are per-series folds; this one keeps corpus cardinality.
    The budget/spend-tracking shape in a monitoring plane.

    Scale shape: ONE user-keyed exchange; one block-local sort + a
    C-path grouped cumsum; output streams at input cardinality with no
    further exchange (annotate-then-write, the flagship's shape). Same
    user-fits-one-block assumption + salted escape hatch as
    sessionize."""
    def block(df_: pd.DataFrame) -> pa.Table:
        if df_.empty:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             "run_cents": pa.array([], type=pa.int64())})
        df_ = df_.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        cents = np.round(df_["value"].to_numpy() * 100.0).astype(np.int64)
        run = pd.Series(cents).groupby(
            df_["user_id"].to_numpy(), sort=False).cumsum()
        return pa.table({
            "event_id": pa.array(df_["event_id"].to_numpy(),
                                 type=pa.int64()),
            "user_id": pa.array(df_["user_id"].to_numpy(),
                                type=pa.int64()),
            "run_cents": pa.array(run.to_numpy(), type=pa.int64()),
        })

    from ..util import enable_hash_shuffle, keyed_partition_count

    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "value"])
    nparts = keyed_partition_count(_events_count(sf_dir) * 32)
    enable_hash_shuffle(ds, nparts)
    return (ds.repartition(nparts, keys=["user_id"])
            .map_batches(block, batch_format="pandas", batch_size=None))


SQL_EVENTS_RUNNING_TOTAL = """
SELECT event_id, user_id,
  SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING)::BIGINT AS run_cents
FROM events
"""


# ------------------------------------------------------------ customer RFM

def q_tpch_customer_rfm(sf_dir: str) -> ray.data.Dataset:
    """Per-customer R/F/M features (recency in whole days vs the
    corpus's last order date, order frequency, monetary total in
    cents) — the classic segmentation featurization, and the ORDERS-
    side counterpart of ``q_events_user_features`` with a deliberately
    different plan: all three statistics are ASSOCIATIVE (min/count/
    sum), so no keyed co-location is needed at all — each block
    collapses to one fixed-width partial row per customer seen, and
    Ray's sort-based groupby folds the partials; the only scalar pass
    is the global max order date (metadata-small). Contrast: user
    features needs the exchange because nunique does not distribute."""
    from ray.data.aggregate import Max

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    last_us = ds.max("o_orderdate")
    last_day = int(pd.Timestamp(last_us).value // 1000) // 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["o_orderdate"], pa.int64())
        tbl = pa.table({
            "c_custkey": t["o_custkey"],
            "day": pa.array(
                us.to_numpy(zero_copy_only=False) // 86_400_000_000,
                type=pa.int64()),
            "n_orders": pa.array(np.ones(len(t), dtype=np.int64)),
            "total_cents": pc.cast(
                pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                pa.int64()),
        })
        return pa.TableGroupBy(tbl, ["c_custkey"]).aggregate(
            [("day", "max"), ("n_orders", "sum"), ("total_cents", "sum")]
        ).rename_columns(["c_custkey", "day", "n_orders", "total_cents"])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("c_custkey")
           .aggregate(Max("day", alias_name="last_day"),
                      Sum("n_orders", alias_name="n_orders"),
                      Sum("total_cents", alias_name="total_cents")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "recency_days": pa.array(
                last_day - t["last_day"].to_numpy(zero_copy_only=False),
                type=pa.int64()),
            "n_orders": t["n_orders"],
            "total_cents": t["total_cents"],
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_TPCH_CUSTOMER_RFM = """
WITH last AS (
  SELECT MAX(date_trunc('day', o_orderdate)) AS d FROM orders
)
SELECT o_custkey AS c_custkey,
  date_diff('day', MAX(date_trunc('day', o_orderdate)),
            (SELECT d FROM last))::BIGINT AS recency_days,
  COUNT(*)::BIGINT AS n_orders,
  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
FROM orders GROUP BY 1
"""


# ------------------------------------------------- brand share / suppliers

def q_tpch_brand_share(sf_dir: str) -> ray.data.Dataset:
    """Per-brand lineitem volume, revenue and floor-milli REVENUE SHARE
    — the category-mix report (TPC-H Q14's share-of-revenue shape,
    keyed on brand). Covers the ``part`` dimension: partkey→brand is a
    broadcast lookup (dense int8 brand-id array + the ≤ #brands name
    list ride one ``ray.put``; at a 10⁸-part catalog that is ~100 MB —
    still a dimension broadcast, the same plan as customer/nation), the
    fact stream collapses to ≤ #brands partial rows per block, one
    bounded tree fold lands the detail, and the share algebra runs on
    those ≤ #brands rows in the final task."""
    from .agg import tree_fold_sum
    from ..util import autoscaling_pool

    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand"]).to_pandas()
    brands = sorted(part["p_brand"].unique())
    bid = {b: i for i, b in enumerate(brands)}
    lookup = np.full(int(part["p_partkey"].max()) + 1, -1, dtype=np.int16)
    lookup[part["p_partkey"].to_numpy()] = \
        part["p_brand"].map(bid).to_numpy(dtype=np.int16)
    lref = ray.put(lookup)

    class BrandPartial:
        def __init__(self, lref):
            self.lookup = ray.get(lref)

        def __call__(self, t: pa.Table) -> pa.Table:
            b = self.lookup[t["l_partkey"].to_numpy()]
            cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                                 100.0)), pa.int64())
            tbl = pa.table({
                "brand_id": pa.array(b.astype(np.int64)),
                "n_items": pa.array(np.ones(len(t), dtype=np.int64)),
                "price_cents": cents,
            })
            return pa.TableGroupBy(tbl, ["brand_id"]).aggregate(
                [("n_items", "sum"), ("price_cents", "sum")]
            ).rename_columns(["brand_id", "n_items", "price_cents"])

    detail = tree_fold_sum(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_extendedprice"])
        .map_batches(BrandPartial, batch_format="pyarrow",
                     zero_copy_batch=True,
                     concurrency=autoscaling_pool(),
                     fn_constructor_kwargs={"lref": lref}),
        ["brand_id"], ["n_items", "price_cents"])

    def share(df_: pd.DataFrame) -> pd.DataFrame:
        cols = {"p_brand": "object", "n_items": "int64",
                "price_cents": "int64", "share_milli": "int64"}
        if df_.empty:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in cols.items()})
        df_ = df_.assign(
            p_brand=df_["brand_id"].map(dict(enumerate(brands))),
            share_milli=(1000 * df_["price_cents"])
            // df_["price_cents"].sum())
        return df_[list(cols)].astype(cols)

    return detail.repartition(1).map_batches(share, batch_format="pandas",
                                             batch_size=None)


SQL_TPCH_BRAND_SHARE = """
WITH b AS (
  SELECT p_brand, COUNT(*)::BIGINT AS n_items,
    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))::BIGINT
      AS price_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1
)
SELECT p_brand, n_items, price_cents,
  ((1000 * price_cents) // (SELECT SUM(price_cents) FROM b))::BIGINT
    AS share_milli
FROM b
"""


def q_tpch_supplier_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-nation SUPPLIER balance rollup (count, total and max account
    balance in cents) — covers the ``supplier`` table with the
    broadcast-dimension plan (nation names ride the closure; ≤ #nations
    rows end to end) and exercises a MIXED sum+max bounded fold
    (``_tree_fold`` with a callable combine — sums and maxes are both
    associative, so the tree stays exact). Balances can be negative;
    only sums/maxes touch them, so no floor-division emulation is
    needed in the SQL."""
    from .agg import _tree_fold

    nation = read_parquet_clean(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["s_acctbal"], 100.0)),
                        pa.int64())
        tbl = pa.table({
            "n_name": pa.array(
                pd.Series(t["s_nationkey"].to_numpy(zero_copy_only=False))
                .map(names), type=pa.string()),
            "n_suppliers": pa.array(np.ones(len(t), dtype=np.int64)),
            "bal_cents": cents,
            "max_bal_cents": cents,
        })
        return combine(tbl)

    def combine(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(
            ["n_name", "n_suppliers", "bal_cents", "max_bal_cents"]),
            ["n_name"])
        return g.aggregate([("n_suppliers", "sum"), ("bal_cents", "sum"),
                            ("max_bal_cents", "max")]) \
            .rename_columns(["n_name", "n_suppliers", "bal_cents",
                             "max_bal_cents"])

    parts = read_parquet_clean(
        f"{sf_dir}/supplier.parquet",
        columns=["s_nationkey", "s_acctbal"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True)
    return _tree_fold(parts, ["n_name"],
                      ["n_suppliers", "bal_cents", "max_bal_cents"], combine)


SQL_TPCH_SUPPLIER_STATS = """
SELECT n_name, COUNT(*)::BIGINT AS n_suppliers,
  SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT))::BIGINT AS bal_cents,
  MAX(CAST(ROUND(s_acctbal * 100) AS BIGINT))::BIGINT AS max_bal_cents
FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY 1
"""


# ------------------------------------------------------------ daily trend

def q_events_trend(sf_dir: str) -> ray.data.Dataset:
    """Per-type DAILY-VOLUME TREND — the exact integer least-squares
    slope (µ-events/day) of each event type's zero-filled daily count
    series: the drift detector that catches a slow ramp the spike op
    (``q_events_spikes``, trailing baseline) is blind to. Closed-form
    OLS over integers: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) with x =
    days since the global first day, reported as floor(10⁶·slope) so
    both sides stay in exact integer arithmetic.

    Scale shape: each block collapses to (type, epoch-day) partial
    counts; the bounded histogram (≤ #types × #days rows — a CALENDAR
    bound, not a data bound) folds through the combine tree; zero-fill
    and the OLS algebra run on that bounded table in one final task.
    No per-event exchange.

    Oracle: DuckDB rebuilds the zero-filled series with
    generate_series and re-derives the same integers; the floor
    division on the possibly-negative numerator uses the mod-adjusted
    emulation (DuckDB ``//`` truncates, numpy floors)."""
    from .agg import tree_fold_sum

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        tbl = pa.table({
            "event_type": t["event_type"],
            "day": pa.array(us // 86_400_000_000, type=pa.int64()),
        })
        return pa.TableGroupBy(tbl, ["event_type", "day"]).aggregate(
            [([], "count_all")]).rename_columns(["event_type", "day", "y"])

    def ols(df_: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": "object", "n_days": "int64",
                "total": "int64", "slope_e6": "int64"}
        if df_.empty:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in cols.items()})
        lo, hi = int(df_["day"].min()), int(df_["day"].max())
        days = np.arange(0, hi - lo + 1, dtype=np.int64)
        rows = []
        for et, g in df_.groupby("event_type"):
            y = np.zeros(len(days), dtype=np.int64)
            y[g["day"].to_numpy() - lo] = g["y"].to_numpy()
            n = len(days)
            sx, sy = days.sum(), y.sum()
            sxy, sxx = (days * y).sum(), (days * days).sum()
            den = n * sxx - sx * sx
            slope = 0 if den == 0 else \
                (1_000_000 * (n * sxy - sx * sy)) // den  # numpy floor
            rows.append((et, n, int(sy), int(slope)))
        return pd.DataFrame(rows, columns=list(cols)).astype(cols)

    hist = tree_fold_sum(
        _read_events(sf_dir, ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day"], ["y"])
    return hist.map_batches(ols, batch_format="pandas", batch_size=None)


SQL_EVENTS_TREND = """
WITH d AS (
  SELECT event_type,
    date_diff('day',
      (SELECT MIN(date_trunc('day', ts)) FROM events),
      date_trunc('day', ts)) AS x,
    COUNT(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
), span AS (
  SELECT MAX(x) AS mx FROM d
), filled AS (
  SELECT t.event_type, gs.x, COALESCE(d.y, 0) AS y
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT UNNEST(generate_series(0, (SELECT mx FROM span))) AS x) gs
  LEFT JOIN d ON d.event_type = t.event_type AND d.x = gs.x
), s AS (
  SELECT event_type, COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx,
         SUM(y)::BIGINT AS sy, SUM(x*y)::BIGINT AS sxy,
         SUM(x*x)::BIGINT AS sxx
  FROM filled GROUP BY 1
)
SELECT event_type, n AS n_days, sy AS total,
  CASE WHEN n*sxx - sx*sx = 0 THEN 0 ELSE
    ((1000000*(n*sxy - sx*sy))
     - ((((1000000*(n*sxy - sx*sy)) % (n*sxx - sx*sx)) + (n*sxx - sx*sx))
        % (n*sxx - sx*sx))) // (n*sxx - sx*sx)
  END::BIGINT AS slope_e6
FROM s
"""


# ------------------------------------------------------ transition matrix

def q_events_transitions(sf_dir: str) -> ray.data.Dataset:
    """Event-type TRANSITION MATRIX (first-order Markov counts +
    floor-milli probabilities) — consecutive-event (src → dst) pairs
    per user under the total (ts, event_id) order: the
    behavioral-sequence statistic next to the funnel (fixed path) and
    sessionize (gap structure) ops, and the input a next-event model
    trains on.

    Scale shape: ONE user-keyed exchange co-locates each user's
    events; one block-local sort + a vectorized shift pairs
    consecutive rows (a user never straddles blocks, so no boundary
    pairs are lost); each block collapses to ≤ #types² partial counts
    which fold through the bounded combine tree; the probability
    algebra runs on that bounded table. Same user-fits-one-block
    assumption + salted escape hatch as sessionize."""
    from .agg import tree_fold_sum
    from ..util import enable_hash_shuffle, keyed_partition_count

    def trans_block(df_: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "object", "dst": "object", "n": "int64"}
        if len(df_) < 2:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in cols.items()})
        df_ = df_.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        uid = df_["user_id"].to_numpy()
        et = df_["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        out = pd.DataFrame({"src": et[:-1][same], "dst": et[1:][same]})
        return (out.groupby(["src", "dst"], sort=False).size()
                .reset_index(name="n").astype(cols))

    def probs(df_: pd.DataFrame) -> pd.DataFrame:
        # one bounded block: ≤ #types² rows
        if df_.empty:
            return df_.assign(p_milli=pd.Series([], dtype="int64"))
        tot = df_.groupby("src")["n"].transform("sum")
        df_ = df_.assign(p_milli=(1000 * df_["n"]) // tot)
        return df_.sort_values(["src", "dst"]).reset_index(drop=True)

    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"])
    nparts = keyed_partition_count(_events_count(sf_dir) * 32)
    enable_hash_shuffle(ds, nparts)
    partial = (ds.repartition(nparts, keys=["user_id"])
               .map_batches(trans_block, batch_format="pandas",
                            batch_size=None))
    return (tree_fold_sum(partial, ["src", "dst"], ["n"])
            .repartition(1)
            .map_batches(probs, batch_format="pandas", batch_size=None))


SQL_EVENTS_TRANSITIONS = """
WITH o AS (
  SELECT user_id, event_type,
    LEAD(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
  FROM events
), c AS (
  SELECT event_type AS src, nxt AS dst, COUNT(*)::BIGINT AS n
  FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
), s AS (
  SELECT src, SUM(n) AS tot FROM c GROUP BY 1
)
SELECT c.src, c.dst, c.n, ((1000 * c.n) // s.tot)::BIGINT AS p_milli
FROM c JOIN s USING (src)
"""


# ------------------------------------------------------- Q3-style top-k

SEGMENT_TOPK_SEGMENT = "BUILDING"
SEGMENT_TOPK_CUT = "1998-07-01"
SEGMENT_TOPK_K = 10


def q_tpch_segment_topk(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q3 analogue — top-K revenue among orders of one market
    segment placed before the cutoff with lineitems shipped after it:
    the three-table join + global top-k reporting shape. Plan
    composition (each piece is the family's established recipe):
    the filtered customer keys become a broadcast BITMAP (``ray.put``
    once, probed per batch — the dimension side never shuffles); the
    orders scan is date-pruned at the read and bitmap-filtered; the
    lineitem scan is date-pruned and collapsed to per-block
    (orderkey, revenue) partials BEFORE the exchange; the two
    fact streams meet in ONE hash-co-partitioned join; and the top-K
    is the two-level head fold (block heads → ≤ K × #blocks rows →
    one final head), never a global sort. Revenue is the exact integer
    Σ cents·(100 − discount-points) in 10⁻⁴ dollar units."""
    from ..util import autoscaling_pool, cluster_cpus, enable_hash_shuffle

    cut = pd.Timestamp(SEGMENT_TOPK_CUT)
    k = SEGMENT_TOPK_K
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=(pc.field("c_mktsegment") == SEGMENT_TOPK_SEGMENT),
    ).to_pandas()
    keep = np.zeros(int(cust["c_custkey"].max()) + 1, dtype=bool)
    keep[cust["c_custkey"].to_numpy()] = True
    keep_ref = ray.put(keep)

    class SegmentFilter:
        def __init__(self, keep_ref):
            self.keep = ray.get(keep_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t["o_custkey"].to_numpy()
            mask = (ck < len(self.keep)) & self.keep[
                np.minimum(ck, len(self.keep) - 1)]
            t = t.filter(pa.array(mask))
            # ship the date as int64 µs: a timestamp column through the
            # hash exchange round-trips via numpy datetime64 and logs a
            # precision-conversion warning per aggregator task
            return pa.table({
                "o_orderkey": t["o_orderkey"],
                "odate_us": pc.cast(t["o_orderdate"], pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            })

    orders = (read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=(pc.field("o_orderdate") < cut))
        .map_batches(SegmentFilter, batch_format="pyarrow",
                     zero_copy_batch=True,
                     concurrency=autoscaling_pool(),
                     fn_constructor_kwargs={"keep_ref": keep_ref}))

    def rev_partial(t: pa.Table) -> pa.Table:
        e = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                    pa.int64())
        d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                    pa.int64())
        tbl = pa.table({
            "l_orderkey": t["l_orderkey"],
            "rev": pc.multiply(e, pc.subtract(pa.scalar(100, pa.int64()), d)),
        })
        return pa.TableGroupBy(tbl, ["l_orderkey"]).aggregate(
            [("rev", "sum")]).rename_columns(["l_orderkey", "rev"])

    li = (read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate") > cut))
        .map_batches(rev_partial, batch_format="pyarrow",
                     zero_copy_batch=True))
    enable_hash_shuffle(li, max(8, cluster_cpus()))
    j = li.join(orders, join_type="inner",
                num_partitions=max(8, cluster_cpus()),
                on=("l_orderkey",), right_on=("o_orderkey",))
    agg = (j.groupby(["l_orderkey", "odate_us", "o_orderpriority"])
           .aggregate(Sum("rev", alias_name="revenue_e4")))

    def head_block(df_: pd.DataFrame) -> pd.DataFrame:
        return df_.sort_values(["revenue_e4", "l_orderkey"],
                               ascending=[False, True]).head(k)

    def final_head(df_: pd.DataFrame) -> pd.DataFrame:
        df_ = df_.sort_values(["revenue_e4", "l_orderkey"],
                              ascending=[False, True]).head(k)
        out = df_.rename(columns={"l_orderkey": "o_orderkey"})
        out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
        out["o_orderdate"] = pd.to_datetime(out["odate_us"], unit="us") \
            .astype("datetime64[us]")
        return out[["rank", "o_orderkey", "revenue_e4", "o_orderdate",
                    "o_orderpriority"]].reset_index(drop=True)

    return (agg.map_batches(head_block, batch_format="pandas",
                            batch_size=None)
            .repartition(1)
            .map_batches(final_head, batch_format="pandas",
                         batch_size=None))


SQL_TPCH_SEGMENT_TOPK = f"""
WITH r AS (
  SELECT l_orderkey AS o_orderkey, o_orderdate, o_orderpriority,
    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT
      AS revenue_e4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = '{SEGMENT_TOPK_SEGMENT}'
    AND o_orderdate < TIMESTAMP '{SEGMENT_TOPK_CUT}'
    AND l_shipdate > TIMESTAMP '{SEGMENT_TOPK_CUT}'
  GROUP BY 1, 2, 3
)
SELECT ROW_NUMBER() OVER (ORDER BY revenue_e4 DESC, o_orderkey)::BIGINT
         AS rank,
       o_orderkey, revenue_e4, o_orderdate, o_orderpriority
FROM r ORDER BY revenue_e4 DESC, o_orderkey LIMIT {SEGMENT_TOPK_K}
"""


# -------------------------------------------- returned-item revenue (Q10)

RETURNED_TOPK = 20


def q_tpch_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 analogue — top-``RETURNED_TOPK`` customers by revenue
    from RETURNED lineitems, with customer name and nation attached.
    The plan's novelty vs ``q_tpch_segment_topk`` is the LATE DIMENSION
    FETCH: the customer table is never joined at fact scale. The
    returned-lineitem stream (returnflag pruned AT THE READ) collapses
    to per-block (orderkey, revenue) partials, hash-co-partition-joins
    the orders key map, folds to per-customer revenue, and top-K head
    folds (block heads → one final head). Only THEN do the ≤ K winning
    custkeys fetch name/nation via a second pushed-down read of
    customer (`c_custkey isin winners` — row-group pruned); nation is
    a ≤ #nations driver lookup. At a 10⁹-row customer dimension the
    join ships 20 rows, not 10⁹."""
    from ..util import cluster_cpus, enable_hash_shuffle

    def rev_partial(t: pa.Table) -> pa.Table:
        e = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                    pa.int64())
        d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                    pa.int64())
        tbl = pa.table({
            "l_orderkey": t["l_orderkey"],
            "rev": pc.multiply(e, pc.subtract(pa.scalar(100, pa.int64()), d)),
        })
        return pa.TableGroupBy(tbl, ["l_orderkey"]).aggregate(
            [("rev", "sum")]).rename_columns(["l_orderkey", "rev"])

    li = (read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"))
        .map_batches(rev_partial, batch_format="pyarrow",
                     zero_copy_batch=True))
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    enable_hash_shuffle(li, max(8, cluster_cpus()))
    j = li.join(orders, join_type="inner",
                num_partitions=max(8, cluster_cpus()),
                on=("l_orderkey",), right_on=("o_orderkey",))
    agg = j.groupby("o_custkey").aggregate(Sum("rev",
                                               alias_name="revenue_e4"))

    def head_block(df_: pd.DataFrame) -> pd.DataFrame:
        return df_.sort_values(["revenue_e4", "o_custkey"],
                               ascending=[False, True]).head(RETURNED_TOPK)

    top = (agg.map_batches(head_block, batch_format="pandas",
                           batch_size=None)
           .repartition(1)
           .map_batches(head_block, batch_format="pandas",
                        batch_size=None)).to_pandas()

    # late dimension fetch: ≤ K custkeys, pushed down into the read
    winners = top["o_custkey"].tolist()
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filter=(pc.field("c_custkey").isin(winners))).to_pandas()
    nation = read_parquet_clean(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name"]).to_pandas()
    out = (top.rename(columns={"o_custkey": "c_custkey"})
           .merge(cust, on="c_custkey")
           .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
           .sort_values(["revenue_e4", "c_custkey"],
                        ascending=[False, True]).reset_index(drop=True))
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out[["rank", "c_custkey", "c_name", "n_name", "revenue_e4"]]


SQL_TPCH_RETURNED_REVENUE = f"""
WITH r AS (
  SELECT o_custkey AS c_custkey,
    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT
      AS revenue_e4
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' GROUP BY 1
)
SELECT ROW_NUMBER() OVER (ORDER BY revenue_e4 DESC, c_custkey)::BIGINT
         AS rank,
       c_custkey, c_name, n_name, revenue_e4
FROM r JOIN customer USING (c_custkey)
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue_e4 DESC, c_custkey LIMIT {RETURNED_TOPK}
"""


# ----------------------------------------- orders-per-customer dist (Q13)

def q_tpch_order_dist(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q13 analogue — the distribution of orders-per-customer
    INCLUDING the zero-order customers (SQL needs a LEFT JOIN for
    those; here they cost literally nothing): the orders stream
    collapses to per-block custkey-count partials, one keyed groupby
    lands exact per-customer counts, a second per-block histogram fold
    is BOUNDED (≤ max-orders-per-customer distinct values), and the
    zero bucket is computed in the final task as
    ``footer_row_count(customer) − Σ n_custs`` — the customer table
    contributes its parquet FOOTER metadata only; no customer row is
    read, let alone joined, at any scale."""
    from pathlib import Path

    import pyarrow.parquet as pq_

    from .agg import grouped_count, tree_fold_sum

    p = Path(sf_dir) / "customer.parquet"
    files = sorted(p.glob("**/*.parquet")) if p.is_dir() else [p]
    n_customers = sum(pq_.read_metadata(f).num_rows for f in files)

    per_cust = grouped_count(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey"]),
        ["o_custkey"], alias="n_orders")

    def hist(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "n_orders": t["n_orders"],
            "n_custs": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        return pa.TableGroupBy(tbl, ["n_orders"]).aggregate(
            [("n_custs", "sum")]).rename_columns(["n_orders", "n_custs"])

    folded = tree_fold_sum(
        per_cust.map_batches(hist, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["n_orders"], ["n_custs"])

    def add_zero(df_: pd.DataFrame) -> pd.DataFrame:
        zero = n_customers - int(df_["n_custs"].sum())
        if zero > 0:
            df_ = pd.concat([df_, pd.DataFrame({"n_orders": [0],
                                                "n_custs": [zero]})])
        return df_.astype({"n_orders": "int64", "n_custs": "int64"}) \
            .sort_values("n_orders").reset_index(drop=True)

    return folded.repartition(1).map_batches(
        add_zero, batch_format="pandas", batch_size=None)


SQL_TPCH_ORDER_DIST = """
WITH per AS (
  SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1
)
SELECT n_orders, COUNT(*)::BIGINT AS n_custs FROM per GROUP BY 1
"""


# ------------------------------------------- small-quantity revenue (Q17)

SMALL_QTY_BRAND = "Brand#11"


def q_tpch_small_qty_rev(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q17 analogue — revenue from lineitems whose quantity is
    below 0.2 × the part's average quantity, one brand. The correlated
    ``l_quantity < 0.2 * AVG(...) per part`` is made integer-exact as
    ``5 · n_part · qty_cents < sum_qty_cents`` and resolved with TWO
    pruned fact passes instead of a self-join: pass 1 folds per-part
    (Σ qty, n) for the brand's parts (brand membership is a broadcast
    bitmap; the per-part stats array rides ONE ``ray.put``, dense
    int64, ~16 B/part — at a 10⁷-part brand that is 160 MB, the same
    envelope as the brand-share lookup), pass 2 re-streams the pruned
    lineitems and keeps the predicate's survivors. No all-to-all
    exchange at all: both passes are map-only over a bitmap-filtered
    scan and the fold is bounded by #parts-in-brand."""
    from .agg import tree_fold_sum
    from ..util import autoscaling_pool

    part = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=(pc.field("p_brand") == SMALL_QTY_BRAND)).to_pandas()
    keep = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
    keep[part["p_partkey"].to_numpy()] = True
    keep_ref = ray.put(keep)

    def li(columns):
        return read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                                  columns=columns)

    class QtyPartial:
        def __init__(self, keep_ref):
            self.keep = ray.get(keep_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = t["l_partkey"].to_numpy()
            mask = (pk < len(self.keep)) & self.keep[
                np.minimum(pk, len(self.keep) - 1)]
            t = t.filter(pa.array(mask))
            tbl = pa.table({
                "l_partkey": t["l_partkey"],
                "sum_q": pc.cast(pc.round(
                    pc.multiply(t["l_quantity"], 100.0)), pa.int64()),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            })
            return pa.TableGroupBy(tbl, ["l_partkey"]).aggregate(
                [("sum_q", "sum"), ("n", "sum")]
            ).rename_columns(["l_partkey", "sum_q", "n"])

    stats = tree_fold_sum(
        li(["l_partkey", "l_quantity"]).map_batches(
            QtyPartial, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=autoscaling_pool(),
            fn_constructor_kwargs={"keep_ref": keep_ref}),
        ["l_partkey"], ["sum_q", "n"]).to_pandas()
    sum_q = np.zeros(len(keep), dtype=np.int64)
    n_pp = np.zeros(len(keep), dtype=np.int64)
    sum_q[stats["l_partkey"].to_numpy()] = stats["sum_q"].to_numpy()
    n_pp[stats["l_partkey"].to_numpy()] = stats["n"].to_numpy()
    stats_ref = ray.put((sum_q, n_pp))

    class SmallQty:
        def __init__(self, stats_ref):
            self.sum_q, self.n = ray.get(stats_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            raw = t["l_partkey"].to_numpy()
            in_range = raw < len(self.n)
            pk = np.where(in_range, raw, 0)
            q = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)),
                        pa.int64()).to_numpy()
            p = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64()).to_numpy()
            mask = in_range & (5 * self.n[pk] * q < self.sum_q[pk])
            return pa.table({
                "n_items": pa.array([np.int64(mask.sum())]),
                "total_cents": pa.array([p[mask].sum()], type=pa.int64()),
            })

    partials = li(["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(SmallQty, batch_format="pyarrow",
                     zero_copy_batch=True,
                     concurrency=autoscaling_pool(),
                     fn_constructor_kwargs={"stats_ref": stats_ref})

    def total(df_: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_items": [np.int64(df_["n_items"].sum())],
            "total_cents": [np.int64(df_["total_cents"].sum())],
        })

    return partials.repartition(1).map_batches(
        total, batch_format="pandas", batch_size=None)


SQL_TPCH_SMALL_QTY_REV = f"""
WITH l AS (
  SELECT l_partkey,
    CAST(ROUND(l_quantity * 100) AS BIGINT) AS q,
    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{SMALL_QTY_BRAND}'
), a AS (
  SELECT l_partkey, SUM(q)::BIGINT AS s, COUNT(*)::BIGINT AS n
  FROM l GROUP BY 1
)
SELECT COUNT(*)::BIGINT AS n_items,
       COALESCE(SUM(l.p), 0)::BIGINT AS total_cents
FROM l JOIN a USING (l_partkey) WHERE 5 * a.n * l.q < a.s
"""


# ------------------------------------------------- top supplier (Q15)

TOP_SUPPLIER_START = "1997-01-01"
TOP_SUPPLIER_END = "1997-04-01"


def q_tpch_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 analogue — the supplier(s) with MAXIMUM revenue in a
    quarter (ties all reported, as Q15 requires). Date window pruned at
    the read; per-block (suppkey, revenue) partials collapse before the
    one keyed groupby; the max is a scalar fold over the ≤ #suppliers
    aggregate (never the fact table); winners filter-scan that same
    small aggregate; supplier names arrive by LATE DIMENSION FETCH
    (pushed-down ``isin`` read of supplier for the ≤ #ties winners) —
    the supplier dimension never joins at fact scale."""

    def rev_partial(t: pa.Table) -> pa.Table:
        e = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                    pa.int64())
        d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                    pa.int64())
        tbl = pa.table({
            "s_suppkey": t["l_suppkey"],
            "rev": pc.multiply(e, pc.subtract(pa.scalar(100, pa.int64()), d)),
        })
        return pa.TableGroupBy(tbl, ["s_suppkey"]).aggregate(
            [("rev", "sum")]).rename_columns(["s_suppkey", "rev"])

    agg = (read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pc.field("l_shipdate") >= pd.Timestamp(TOP_SUPPLIER_START))
                & (pc.field("l_shipdate") < pd.Timestamp(TOP_SUPPLIER_END))))
        .map_batches(rev_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("s_suppkey").aggregate(Sum("rev", alias_name="total_rev_e4")))
    best = agg.max("total_rev_e4")
    winners = agg.filter(
        expr=f"total_rev_e4 == {best}").to_pandas()

    supp = read_parquet_clean(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filter=(pc.field("s_suppkey").isin(
            winners["s_suppkey"].tolist()))).to_pandas()
    out = winners.merge(supp, on="s_suppkey") \
        .sort_values("s_suppkey").reset_index(drop=True)
    return out[["s_suppkey", "s_name", "total_rev_e4"]] \
        .astype({"s_suppkey": "int64", "total_rev_e4": "int64"})


SQL_TPCH_TOP_SUPPLIER = f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT
      AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOP_SUPPLIER_START}'
    AND l_shipdate < TIMESTAMP '{TOP_SUPPLIER_END}'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_rev_e4
FROM r JOIN supplier USING (s_suppkey)
WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM r)
ORDER BY s_suppkey
"""


# ------------------------------------------------ promo revenue share (Q14)

PROMO_START = "1998-03-01"
PROMO_END = "1998-04-01"


def q_tpch_promo_share(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q14 analogue — share of one month's revenue from PROMO
    parts. The part dimension rides as a broadcast promo BITMAP (1 bit
    per partkey — 12.5 MB at a 10⁸-part catalog); the date window is
    pruned AT THE READ; each block collapses to ONE (promo_e4,
    total_e4) partial row and a scalar fold lands the share. Map-only:
    no exchange of any kind."""
    from .agg import tree_fold_sum
    from ..util import autoscaling_pool

    part = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=(pc.field("p_type") == "PROMO")).to_pandas()
    promo = np.zeros(int(part["p_partkey"].max()) + 2, dtype=bool)
    promo[part["p_partkey"].to_numpy()] = True
    pref = ray.put(promo)

    class PromoPartial:
        def __init__(self, pref):
            self.promo = ray.get(pref)

        def __call__(self, t: pa.Table) -> pa.Table:
            e = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64()).to_numpy()
            d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                        pa.int64()).to_numpy()
            rev = e * (100 - d)
            pk = t["l_partkey"].to_numpy()
            is_promo = (pk < len(self.promo)) & self.promo[
                np.minimum(pk, len(self.promo) - 1)]
            return pa.table({
                "one": pa.array([np.int64(1)]),
                "promo_e4": pa.array([rev[is_promo].sum()], type=pa.int64()),
                "total_e4": pa.array([rev.sum()], type=pa.int64()),
            })

    folded = tree_fold_sum(
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
            filter=((pc.field("l_shipdate") >= pd.Timestamp(PROMO_START))
                    & (pc.field("l_shipdate") < pd.Timestamp(PROMO_END))))
        .map_batches(PromoPartial, batch_format="pyarrow",
                     zero_copy_batch=True,
                     concurrency=autoscaling_pool(),
                     fn_constructor_kwargs={"pref": pref}),
        ["one"], ["promo_e4", "total_e4"])

    def share(df_: pd.DataFrame) -> pd.DataFrame:
        p = np.int64(df_["promo_e4"].sum())
        t = np.int64(df_["total_e4"].sum())
        return pd.DataFrame({
            "promo_e4": [p], "total_e4": [t],
            "promo_milli": [np.int64((1000 * p) // t) if t else np.int64(0)],
        })

    return folded.repartition(1).map_batches(share, batch_format="pandas",
                                             batch_size=None)


SQL_TPCH_PROMO_SHARE = f"""
WITH l AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{PROMO_START}'
    AND l_shipdate < TIMESTAMP '{PROMO_END}'
)
SELECT SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)::BIGINT
         AS promo_e4,
       SUM(rev)::BIGINT AS total_e4,
       ((1000 * SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END))
        // SUM(rev))::BIGINT AS promo_milli
FROM l
"""


# ------------------------------------------ disjunctive predicate (Q19)

DISJ_CLAUSES = [  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 15, 1, 15),
    ("Brand#23", 10, 30, 10, 25),
    ("Brand#34", 20, 50, 25, 50),
]


def q_tpch_disjunctive_rev(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q19 analogue — revenue under an OR of three
    (brand, size-range, quantity-range) clauses. A naïve plan joins
    lineitem⋈part three times (or once plus a row-wise CASE); here the
    part ATTRIBUTES ship as two dense broadcast arrays (brand-id int16
    + size int8, 3 B/part — 300 MB at 10⁸ parts, one ``ray.put``), the
    whole disjunction evaluates as vectorized numpy boolean algebra
    inside each map task, and each block collapses to one (n, rev)
    partial. Map-only; the OR never multiplies passes or joins."""
    from .agg import tree_fold_sum
    from ..util import autoscaling_pool

    part = read_parquet_clean(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    brands = sorted(part["p_brand"].unique())
    bid = {b: i for i, b in enumerate(brands)}
    n_slots = int(part["p_partkey"].max()) + 2
    brand_arr = np.full(n_slots, -1, dtype=np.int16)
    size_arr = np.zeros(n_slots, dtype=np.int16)
    pk = part["p_partkey"].to_numpy()
    brand_arr[pk] = part["p_brand"].map(bid).to_numpy(dtype=np.int16)
    size_arr[pk] = part["p_size"].to_numpy(dtype=np.int16)
    clauses = [(bid.get(b, -2), slo, shi, qlo, qhi)
               for b, slo, shi, qlo, qhi in DISJ_CLAUSES]
    ref = ray.put((brand_arr, size_arr, clauses))

    class DisjPartial:
        def __init__(self, ref):
            self.brand, self.size, self.clauses = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = np.minimum(t["l_partkey"].to_numpy(), len(self.brand) - 1)
            b, s = self.brand[pk], self.size[pk]
            q = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy()
            e = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64()).to_numpy()
            d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                        pa.int64()).to_numpy()
            mask = np.zeros(len(q), dtype=bool)
            for cb, slo, shi, qlo, qhi in self.clauses:
                mask |= ((b == cb) & (s >= slo) & (s <= shi)
                         & (q >= qlo) & (q <= qhi))
            rev = e[mask] * (100 - d[mask])
            return pa.table({
                "one": pa.array([np.int64(1)]),
                "n_items": pa.array([np.int64(mask.sum())]),
                "revenue_e4": pa.array([rev.sum()], type=pa.int64()),
            })

    folded = tree_fold_sum(
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice",
                     "l_discount"])
        .map_batches(DisjPartial, batch_format="pyarrow",
                     zero_copy_batch=True,
                     concurrency=autoscaling_pool(),
                     fn_constructor_kwargs={"ref": ref}),
        ["one"], ["n_items", "revenue_e4"])

    def total(df_: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_items": [np.int64(df_["n_items"].sum())],
            "revenue_e4": [np.int64(df_["revenue_e4"].sum())],
        })

    return folded.repartition(1).map_batches(total, batch_format="pandas",
                                             batch_size=None)


def _disj_sql() -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in DISJ_CLAUSES)
    return f"""
SELECT COUNT(*)::BIGINT AS n_items,
  COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))), 0)::BIGINT
    AS revenue_e4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {ors}
"""


SQL_TPCH_DISJUNCTIVE_REV = _disj_sql()


# ------------------------------------------------- big-order HAVING (Q18)

BIG_ORDER_QTY_CENTS = 300 * 100  # SUM(l_quantity) > 300
BIG_ORDER_TOPK = 100


def q_tpch_big_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 analogue — orders whose total quantity exceeds a
    HAVING threshold, top-``BIG_ORDER_TOPK`` by total price with the
    customer name attached. Per-block (orderkey, qty) partials collapse
    before ONE keyed groupby; the HAVING filter runs on the aggregate
    (the fact table is never re-scanned); the ≤ tail-sized survivor set
    fetches its order rows by a pushed-down ``isin`` read of orders
    (row-group pruned), top-K is a block-head fold, and the ≤ K winning
    customers arrive by late dimension fetch — neither orders nor
    customer ever joins at fact scale."""
    from .agg import tree_fold_sum

    def qty_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "o_orderkey": t["l_orderkey"],
            "qty_cents": pc.cast(pc.round(
                pc.multiply(t["l_quantity"], 100.0)), pa.int64()),
        })
        return pa.TableGroupBy(tbl, ["o_orderkey"]).aggregate(
            [("qty_cents", "sum")]).rename_columns(
                ["o_orderkey", "qty_cents"])

    agg = tree_fold_sum(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow",
                     zero_copy_batch=True),
        ["o_orderkey"], ["qty_cents"])
    big = agg.filter(
        expr=f"qty_cents > {BIG_ORDER_QTY_CENTS}").to_pandas()
    if big.empty:
        return pd.DataFrame({
            "o_orderkey": pd.Series([], dtype="int64"),
            "c_name": pd.Series([], dtype="object"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "totalprice_cents": pd.Series([], dtype="int64"),
            "qty_cents": pd.Series([], dtype="int64"),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        filter=(pc.field("o_orderkey").isin(
            big["o_orderkey"].tolist()))).to_pandas()
    merged = big.merge(orders, on="o_orderkey")
    merged["totalprice_cents"] = np.round(
        merged["o_totalprice"] * 100).astype(np.int64)
    top = merged.sort_values(
        ["totalprice_cents", "o_orderkey"],
        ascending=[False, True]).head(BIG_ORDER_TOPK)

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
        filter=(pc.field("c_custkey").isin(
            top["o_custkey"].tolist()))).to_pandas()
    out = (top.merge(cust, left_on="o_custkey", right_on="c_custkey")
           .sort_values(["totalprice_cents", "o_orderkey"],
                        ascending=[False, True]).reset_index(drop=True))
    return out[["o_orderkey", "c_name", "o_orderdate",
                "totalprice_cents", "qty_cents"]].astype(
        {"o_orderkey": "int64", "totalprice_cents": "int64",
         "qty_cents": "int64"})


SQL_TPCH_BIG_ORDERS = f"""
WITH a AS (
  SELECT l_orderkey AS o_orderkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))::BIGINT AS qty_cents
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
           > {BIG_ORDER_QTY_CENTS}
)
SELECT o_orderkey, c_name, o_orderdate,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       qty_cents
FROM a JOIN orders USING (o_orderkey)
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice_cents DESC, o_orderkey LIMIT {BIG_ORDER_TOPK}
"""


# --------------------------------------------- EXISTS semi-join (Q4)

ORDER_EXISTS_START = "1996-01-01"
ORDER_EXISTS_END = "1996-04-01"


def q_tpch_order_exists(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q4 analogue — per-priority count of one quarter's orders
    for which EXISTS a RETURNED lineitem. The EXISTS becomes a
    SEMI-JOIN: the returned-lineitem stream (returnflag pruned at the
    read, ONE key column) dedupes to distinct orderkeys with a keyed
    groupby, so the subsequent hash-co-partitioned join against the
    date-pruned orders is exactly one row per qualifying order — inner
    join ≡ semi-join once both sides are key-unique. Counts collapse
    per block before one final ≤ #priorities fold; neither fact table
    is ever re-scanned."""
    from .agg import grouped_count, tree_fold_sum
    from ..util import cluster_cpus, enable_hash_shuffle

    returned = grouped_count(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey"],
                           filter=(pc.field("l_returnflag") == "R")),
        ["l_orderkey"], alias="n_ret")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=((pc.field("o_orderdate")
                 >= pd.Timestamp(ORDER_EXISTS_START))
                & (pc.field("o_orderdate")
                   < pd.Timestamp(ORDER_EXISTS_END))))
    enable_hash_shuffle(returned, max(8, cluster_cpus()))
    j = returned.join(orders, join_type="inner",
                      num_partitions=max(8, cluster_cpus()),
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def prio_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "n_orders": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        return pa.TableGroupBy(tbl, ["o_orderpriority"]).aggregate(
            [("n_orders", "sum")]).rename_columns(
                ["o_orderpriority", "n_orders"])

    return tree_fold_sum(
        j.map_batches(prio_partial, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["o_orderpriority"], ["n_orders"])


SQL_TPCH_ORDER_EXISTS = f"""
SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{ORDER_EXISTS_START}'
  AND o_orderdate < TIMESTAMP '{ORDER_EXISTS_END}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1
"""


# ----------------------------------------- dormant-customer anti-join (Q22)

DORMANT_NATIONS = [1, 3, 5, 7, 9, 11, 13]
DORMANT_CUTOFF = "2000-01-01"


def q_tpch_dormant_customers(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q22 analogue — per-nation count and balance of
    above-average-balance customers with NO order since
    ``DORMANT_CUTOFF``. Two exchanges total, both bounded: (1) the
    positive-balance mean is a scalar fold (shipped as the exact
    integer predicate ``bal·n > Σbal`` — no float division anywhere);
    (2) the NOT-EXISTS is the union-tag ANTI-JOIN shape
    (ann._semantic_antijoin_counts): distinct recent-order custkeys
    (keyed groupby of the date-pruned orders KEY COLUMN) union the
    qualifying customers, ONE keyed repartition on custkey,
    block-local ``np.isin`` drops the hit rows — the driver never
    holds a custkey set, so a 10⁹-customer anti-join moves only
    (custkey, nationkey, bal) triples."""
    from .agg import grouped_count, tree_fold_sum
    from ..util import enable_hash_shuffle, keyed_partition_count

    def cust(columns):
        return read_parquet_clean(
            f"{sf_dir}/customer.parquet", columns=columns,
            filter=(pc.field("c_nationkey").isin(DORMANT_NATIONS)))

    def pos_partial(t: pa.Table) -> pa.Table:
        bal = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                      pa.int64()).to_numpy()
        pos = bal[bal > 0]
        return pa.table({"one": pa.array([np.int64(1)]),
                         "s": pa.array([pos.sum()], type=pa.int64()),
                         "n": pa.array([np.int64(len(pos))])})

    avg = tree_fold_sum(
        cust(["c_acctbal"]).map_batches(pos_partial,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True),
        ["one"], ["s", "n"]).to_pandas()
    s, n = np.int64(avg["s"].sum()), np.int64(avg["n"].sum())

    def qualify(t: pa.Table) -> pa.Table:
        bal = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                      pa.int64()).to_numpy()
        keep = bal * n > s
        return pa.table({
            "c_custkey": pc.cast(t["c_custkey"], pa.int64())
            .filter(pa.array(keep)),
            "c_nationkey": pc.cast(t["c_nationkey"], pa.int64())
            .filter(pa.array(keep)),
            "bal": pa.array(bal[keep]),
            "is_active": pa.array(np.zeros(int(keep.sum()),
                                           dtype=np.int8)),
        })

    rich = cust(["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        qualify, batch_format="pyarrow", zero_copy_batch=True)

    def active_keys(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "c_nationkey": pa.array(np.zeros(len(t), dtype=np.int64)),
            "bal": pa.array(np.zeros(len(t), dtype=np.int64)),
            "is_active": pa.array(np.ones(len(t), dtype=np.int8)),
        })

    active = grouped_count(
        read_parquet_clean(
            f"{sf_dir}/orders.parquet", columns=["o_custkey"],
            filter=(pc.field("o_orderdate")
                    >= pd.Timestamp(DORMANT_CUTOFF))),
        ["o_custkey"], alias="n_o").map_batches(
            active_keys, batch_format="pyarrow", zero_copy_batch=True)

    _OUT = pa.schema([("c_nationkey", pa.int64()),
                      ("n_custs", pa.int64()), ("bal_cents", pa.int64())])

    def anti_fold(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _OUT.empty_table().to_pandas()
        gone = df_.loc[df_["is_active"] == 1, "c_custkey"].to_numpy()
        rows = df_[df_["is_active"] == 0]
        rows = rows[~np.isin(rows["c_custkey"].to_numpy(), gone)]
        out = rows.groupby("c_nationkey", as_index=False).agg(
            n_custs=("c_custkey", "size"), bal_cents=("bal", "sum"))
        return out.astype({"c_nationkey": "int64", "n_custs": "int64",
                           "bal_cents": "int64"})

    both = rich.union(active)
    n_parts = keyed_partition_count()
    enable_hash_shuffle(both, n_parts)
    partials = (both.repartition(n_parts, keys=["c_custkey"])
                .map_batches(anti_fold, batch_format="pandas",
                             batch_size=None))
    return tree_fold_sum(partials, ["c_nationkey"],
                         ["n_custs", "bal_cents"])


SQL_TPCH_DORMANT_CUSTOMERS = f"""
WITH sel AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer
  WHERE c_nationkey IN ({', '.join(str(k) for k in DORMANT_NATIONS)})
), a AS (
  SELECT SUM(bal)::BIGINT AS s, COUNT(*)::BIGINT AS n
  FROM sel WHERE bal > 0
)
SELECT c_nationkey, COUNT(*)::BIGINT AS n_custs,
       SUM(bal)::BIGINT AS bal_cents
FROM sel, a
WHERE bal * a.n > a.s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{DORMANT_CUTOFF}')
GROUP BY 1
"""


# ----------------------------------------------- region revenue (Q5)

REGION_REV_NAME = "ASIA"
REGION_REV_START = "1997-01-01"
REGION_REV_END = "1998-01-01"


def q_tpch_region_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 analogue — yearly revenue per nation of one region,
    counting only lineitems whose SUPPLIER and CUSTOMER share that
    nation. The two tiny dims (nation, region) resolve driver-side;
    supplier→nation ships as a dense broadcast array so the fact scan
    filters to region suppliers with zero joins; the remaining plan is
    the genuine Q5 shape — a hash-co-partitioned join at fact scale
    (partials⋈orders on orderkey), then the customer dimension arrives
    by the union-tag CO-PARTITION MERGE (one keyed repartition on
    custkey, block-local map) rather than a second join operator: the
    stream is PRE-AGGREGATED to (custkey, nation, rev) partials before
    the exchange and the customer side is pruned to region nations AT
    THE READ, so the merge moves one partial row per (custkey, nation)
    plus one dim row per region customer — and skips the second join's
    aggregator-pool spin-up entirely. The same-nation filter and final
    ≤ #nations fold run on the merged partials, never on raw
    lineitems."""
    from .agg import tree_fold_sum
    from ..util import autoscaling_pool, cluster_cpus, enable_hash_shuffle

    nation = read_parquet_clean(f"{sf_dir}/nation.parquet").to_pandas()
    region = read_parquet_clean(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(region.loc[region["r_name"] == REGION_REV_NAME,
                          "r_regionkey"].iloc[0])
    nkeys = nation.loc[nation["n_regionkey"] == rkey,
                       "n_nationkey"].astype(int).tolist()
    names = dict(zip(nation["n_nationkey"].astype(int),
                     nation["n_name"]))

    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey",
                                       "s_nationkey"]).to_pandas()
    s_nat = np.full(int(supp["s_suppkey"].max()) + 2, -1, dtype=np.int16)
    s_nat[supp["s_suppkey"].to_numpy()] = \
        supp["s_nationkey"].to_numpy(dtype=np.int16)
    in_region = np.isin(s_nat, np.array(nkeys, dtype=np.int16))
    sref = ray.put((s_nat, in_region))

    class SuppPartial:
        def __init__(self, sref):
            self.s_nat, self.in_region = ray.get(sref)

        def __call__(self, t: pa.Table) -> pa.Table:
            sk = np.minimum(t["l_suppkey"].to_numpy(),
                            len(self.s_nat) - 1)
            keep = self.in_region[sk]
            t = t.filter(pa.array(keep))
            e = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
            d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                        pa.int64())
            tbl = pa.table({
                "l_orderkey": t["l_orderkey"],
                "supp_nation": pa.array(
                    self.s_nat[sk[keep]].astype(np.int64)),
                "rev": pc.multiply(e, pc.subtract(
                    pa.scalar(100, pa.int64()), d)),
            })
            return pa.TableGroupBy(tbl, ["l_orderkey", "supp_nation"]) \
                .aggregate([("rev", "sum")]).rename_columns(
                    ["l_orderkey", "supp_nation", "rev"])

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(
        SuppPartial, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=autoscaling_pool(),
        fn_constructor_kwargs={"sref": sref})

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pc.field("o_orderdate") >= pd.Timestamp(REGION_REV_START))
                & (pc.field("o_orderdate") < pd.Timestamp(REGION_REV_END))))
    n_parts = max(8, cluster_cpus())
    enable_hash_shuffle(li, n_parts)
    j1 = li.join(orders, join_type="inner", num_partitions=n_parts,
                 on=("l_orderkey",), right_on=("o_orderkey",))

    def cust_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "supp_nation": t["supp_nation"],
            "rev": t["rev"],
        })
        return pa.TableGroupBy(tbl, ["o_custkey", "supp_nation"]) \
            .aggregate([("rev", "sum")]).rename_columns(
                ["o_custkey", "supp_nation", "rev"])

    def cust_tag(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "supp_nation": pc.subtract(
                pa.scalar(-1, pa.int64()),
                pc.cast(t["c_nationkey"], pa.int64())),
            "rev": pa.array(np.zeros(len(t), dtype=np.int64)),
        })

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=(pc.field("c_nationkey").isin(nkeys))).map_batches(
        cust_tag, batch_format="pyarrow", zero_copy_batch=True)
    both = j1.map_batches(cust_partial, batch_format="pyarrow",
                          zero_copy_batch=True).union(cust)
    enable_hash_shuffle(both, n_parts)

    _OUT = pa.schema([("n_nationkey", pa.int64()),
                      ("revenue_e4", pa.int64())])

    def merge_block(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _OUT.empty_table().to_pandas()
        dim = df_[df_["supp_nation"] < 0]
        nat = dict(zip(dim["o_custkey"].to_numpy(),
                       (-1 - dim["supp_nation"]).to_numpy()))
        fact = df_[df_["supp_nation"] >= 0]
        same = fact["supp_nation"].to_numpy() == np.fromiter(
            (nat.get(k, -9) for k in fact["o_custkey"].to_numpy()),
            dtype=np.int64, count=len(fact))
        out = fact[same].groupby("supp_nation", as_index=False).agg(
            revenue_e4=("rev", "sum"))
        return out.rename(columns={"supp_nation": "n_nationkey"}).astype(
            {"n_nationkey": "int64", "revenue_e4": "int64"})

    folded = tree_fold_sum(
        both.repartition(n_parts, keys=["o_custkey"])
        .map_batches(merge_block, batch_format="pandas", batch_size=None),
        ["n_nationkey"], ["revenue_e4"]).to_pandas()
    folded["n_name"] = folded["n_nationkey"].map(names)
    return (folded.sort_values("n_nationkey").reset_index(drop=True)
            [["n_nationkey", "n_name", "revenue_e4"]]
            .astype({"n_nationkey": "int64", "revenue_e4": "int64"}))


SQL_TPCH_REGION_REVENUE = f"""
WITH l AS (
  SELECT l_orderkey, s_nationkey AS nk,
    CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey IN (
    SELECT n_nationkey FROM nation
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{REGION_REV_NAME}')
)
SELECT n_nationkey, n_name, SUM(rev)::BIGINT AS revenue_e4
FROM l
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE c_nationkey = l.nk
  AND o_orderdate >= TIMESTAMP '{REGION_REV_START}'
  AND o_orderdate < TIMESTAMP '{REGION_REV_END}'
GROUP BY 1, 2
"""


# -------------------------------------------- waiting suppliers (Q21)

WAITING_TOPK = 100


def q_tpch_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 analogue — suppliers who were the SOLE returning
    supplier in multi-supplier orders (EXISTS another supplier in the
    order + NOT EXISTS another returner), top-``WAITING_TOPK`` by
    count. One exchange resolves both quantifiers: per-block
    (orderkey, suppkey, any_r) max-partials co-locate per ORDER under
    a single keyed repartition, and the block-local pass finishes the
    (ok, sk) fold AND the per-order sole-returner test in one pandas
    groupby chain (both bounded by lineitems-per-order). Per-supplier
    tallies collapse per block, one keyed groupby lands exact counts,
    top-K head folds, and the ≤ K winners late-fetch their names via a
    pushed-down ``isin`` supplier read — no dimension joins at fact
    scale, no driver-side key sets."""
    from .agg import tree_fold_sum
    from ..util import enable_hash_shuffle, keyed_partition_count

    def flag_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_suppkey": t["l_suppkey"],
            "any_r": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64()),
        })
        return pa.TableGroupBy(tbl, ["l_orderkey", "l_suppkey"]) \
            .aggregate([("any_r", "max")]).rename_columns(
                ["l_orderkey", "l_suppkey", "any_r"])

    partials = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"]).map_batches(
        flag_partial, batch_format="pyarrow", zero_copy_batch=True)

    _OUT = pa.schema([("s_suppkey", pa.int64()), ("n_waits", pa.int64())])

    def sole_returner(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _OUT.empty_table().to_pandas()
        f = df_.groupby(["l_orderkey", "l_suppkey"],
                        as_index=False)["any_r"].max()
        per_order = f.groupby("l_orderkey").agg(
            n_supp=("l_suppkey", "size"), n_r=("any_r", "sum"))
        ok = per_order.index[(per_order["n_supp"] > 1)
                             & (per_order["n_r"] == 1)]
        win = f[(f["any_r"] == 1) & f["l_orderkey"].isin(ok)]
        out = win.groupby("l_suppkey", as_index=False).agg(
            n_waits=("l_orderkey", "size"))
        return out.rename(columns={"l_suppkey": "s_suppkey"}).astype(
            {"s_suppkey": "int64", "n_waits": "int64"})

    n_parts = keyed_partition_count()
    enable_hash_shuffle(partials, n_parts)
    per_supp = tree_fold_sum(
        partials.repartition(n_parts, keys=["l_orderkey"])
        .map_batches(sole_returner, batch_format="pandas",
                     batch_size=None),
        ["s_suppkey"], ["n_waits"])

    def head_block(df_: pd.DataFrame) -> pd.DataFrame:
        return df_.sort_values(["n_waits", "s_suppkey"],
                               ascending=[False, True]).head(WAITING_TOPK)

    top = (per_supp.map_batches(head_block, batch_format="pandas",
                                batch_size=None)
           .repartition(1)
           .map_batches(head_block, batch_format="pandas",
                        batch_size=None)).to_pandas()

    supp = read_parquet_clean(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filter=(pc.field("s_suppkey").isin(
            top["s_suppkey"].tolist()))).to_pandas()
    out = (top.merge(supp, on="s_suppkey")
           .sort_values(["n_waits", "s_suppkey"],
                        ascending=[False, True]).reset_index(drop=True))
    return out[["s_suppkey", "s_name", "n_waits"]].astype(
        {"s_suppkey": "int64", "n_waits": "int64"})


SQL_TPCH_WAITING_SUPPLIERS = f"""
WITH f AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
  FROM lineitem GROUP BY 1, 2
), w AS (
  SELECT l_orderkey FROM f GROUP BY 1
  HAVING COUNT(*) > 1 AND SUM(r) = 1
)
SELECT s_suppkey, s_name, COUNT(*)::BIGINT AS n_waits
FROM f JOIN w USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE f.r = 1 GROUP BY 1, 2
ORDER BY n_waits DESC, s_suppkey LIMIT {WAITING_TOPK}
"""


# ------------------------------------------- nation-pair volume (Q7)

PAIR_NATIONS = [5, 20]
PAIR_START = "1996-01-01"
PAIR_END = "1998-01-01"


def q_tpch_nation_pair_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 analogue — shipped revenue between two nations per
    ship-year, in both directions (supplier in one, customer in the
    other). Same plan skeleton as ``q_tpch_region_revenue`` with a
    PAIR key: supplier→nation rides a dense broadcast array so the
    fact scan filters to the two nations' suppliers with no join and
    the ship-year is extracted in the scan task; per-block partials
    keyed (orderkey, supp_nation, year) pre-aggregate before the ONE
    hash-co-partitioned join against orders; the customer side (pruned
    to the two nations AT THE READ) arrives by the union-tag
    co-partition merge on custkey; the cross-nation filter and the
    ≤ 2×#years fold run on merged partials."""
    from .agg import tree_fold_sum
    from ..util import autoscaling_pool, cluster_cpus, enable_hash_shuffle

    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey",
                                       "s_nationkey"]).to_pandas()
    s_nat = np.full(int(supp["s_suppkey"].max()) + 2, -1, dtype=np.int16)
    s_nat[supp["s_suppkey"].to_numpy()] = \
        supp["s_nationkey"].to_numpy(dtype=np.int16)
    in_pair = np.isin(s_nat, np.array(PAIR_NATIONS, dtype=np.int16))
    sref = ray.put((s_nat, in_pair))

    class PairPartial:
        def __init__(self, sref):
            self.s_nat, self.in_pair = ray.get(sref)

        def __call__(self, t: pa.Table) -> pa.Table:
            sk = np.minimum(t["l_suppkey"].to_numpy(),
                            len(self.s_nat) - 1)
            keep = self.in_pair[sk]
            t = t.filter(pa.array(keep))
            e = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
            d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                        pa.int64())
            tbl = pa.table({
                "l_orderkey": t["l_orderkey"],
                "supp_nation": pa.array(
                    self.s_nat[sk[keep]].astype(np.int64)),
                "ship_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "rev": pc.multiply(e, pc.subtract(
                    pa.scalar(100, pa.int64()), d)),
            })
            return pa.TableGroupBy(
                tbl, ["l_orderkey", "supp_nation", "ship_year"]).aggregate(
                [("rev", "sum")]).rename_columns(
                    ["l_orderkey", "supp_nation", "ship_year", "rev"])

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        filter=((pc.field("l_shipdate") >= pd.Timestamp(PAIR_START))
                & (pc.field("l_shipdate") < pd.Timestamp(PAIR_END)))
    ).map_batches(PairPartial, batch_format="pyarrow",
                  zero_copy_batch=True, concurrency=autoscaling_pool(),
                  fn_constructor_kwargs={"sref": sref})

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    n_parts = max(8, cluster_cpus())
    enable_hash_shuffle(li, n_parts)
    j1 = li.join(orders, join_type="inner", num_partitions=n_parts,
                 on=("l_orderkey",), right_on=("o_orderkey",))

    def fact_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "supp_nation": t["supp_nation"],
            "ship_year": t["ship_year"],
            "rev": t["rev"],
        })
        return pa.TableGroupBy(
            tbl, ["o_custkey", "supp_nation", "ship_year"]).aggregate(
            [("rev", "sum")]).rename_columns(
                ["o_custkey", "supp_nation", "ship_year", "rev"])

    def cust_tag(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "supp_nation": pc.subtract(
                pa.scalar(-1, pa.int64()),
                pc.cast(t["c_nationkey"], pa.int64())),
            "ship_year": pa.array(np.zeros(len(t), dtype=np.int64)),
            "rev": pa.array(np.zeros(len(t), dtype=np.int64)),
        })

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=(pc.field("c_nationkey").isin(PAIR_NATIONS))).map_batches(
        cust_tag, batch_format="pyarrow", zero_copy_batch=True)
    both = j1.map_batches(fact_partial, batch_format="pyarrow",
                          zero_copy_batch=True).union(cust)
    enable_hash_shuffle(both, n_parts)

    _OUT = pa.schema([("supp_nation", pa.int64()),
                      ("cust_nation", pa.int64()),
                      ("ship_year", pa.int64()),
                      ("revenue_e4", pa.int64())])

    def merge_block(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _OUT.empty_table().to_pandas()
        dim = df_[df_["supp_nation"] < 0]
        nat = dict(zip(dim["o_custkey"].to_numpy(),
                       (-1 - dim["supp_nation"]).to_numpy()))
        fact = df_[df_["supp_nation"] >= 0].copy()
        fact["cust_nation"] = np.fromiter(
            (nat.get(k, -9) for k in fact["o_custkey"].to_numpy()),
            dtype=np.int64, count=len(fact))
        fact = fact[(fact["cust_nation"] >= 0)
                    & (fact["cust_nation"] != fact["supp_nation"])]
        out = fact.groupby(["supp_nation", "cust_nation", "ship_year"],
                           as_index=False).agg(revenue_e4=("rev", "sum"))
        return out.astype({c: "int64" for c in _OUT.names})

    folded = tree_fold_sum(
        both.repartition(n_parts, keys=["o_custkey"])
        .map_batches(merge_block, batch_format="pandas", batch_size=None),
        ["supp_nation", "cust_nation", "ship_year"],
        ["revenue_e4"]).to_pandas()
    return (folded.sort_values(["supp_nation", "cust_nation", "ship_year"])
            .reset_index(drop=True).astype(
                {c: "int64" for c in ["supp_nation", "cust_nation",
                                      "ship_year", "revenue_e4"]}))


SQL_TPCH_NATION_PAIR_VOLUME = f"""
WITH l AS (
  SELECT l_orderkey, s_nationkey AS supp_nation,
    EXTRACT(year FROM l_shipdate)::BIGINT AS ship_year,
    CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey IN ({PAIR_NATIONS[0]}, {PAIR_NATIONS[1]})
    AND l_shipdate >= TIMESTAMP '{PAIR_START}'
    AND l_shipdate < TIMESTAMP '{PAIR_END}'
)
SELECT supp_nation, c_nationkey AS cust_nation, ship_year,
       SUM(rev)::BIGINT AS revenue_e4
FROM l
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_nationkey IN ({PAIR_NATIONS[0]}, {PAIR_NATIONS[1]})
  AND c_nationkey <> supp_nation
GROUP BY 1, 2, 3
"""


# ------------------------------------------------- market share (Q8)

MKT_REGION = "AMERICA"
MKT_TYPE = "ECONOMY"
MKT_NATION = 21
MKT_START = "1996-01-01"
MKT_END = "1998-01-01"


def q_tpch_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 analogue — one nation's share of a region's market for
    one part type, per ORDER year. Three dimensions collapse into the
    fact scan with zero joins: part-type membership is a broadcast
    bitmap, supplier→target-nation is a broadcast flag array, and the
    tiny nation/region tables resolve driver-side. Per-block partials
    keyed (orderkey, is_target) meet the window-pruned orders (order
    YEAR extracted in the scan task so no timestamp rides the
    exchange — timestamps double hash-exchange wall time and warn per
    aggregator) in ONE hash-co-partitioned join; region customers
    arrive by the union-tag co-partition merge; the share algebra runs
    on the ≤ #years fold."""
    from .agg import tree_fold_sum
    from ..util import autoscaling_pool, cluster_cpus, enable_hash_shuffle

    nation = read_parquet_clean(f"{sf_dir}/nation.parquet").to_pandas()
    region = read_parquet_clean(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(region.loc[region["r_name"] == MKT_REGION,
                          "r_regionkey"].iloc[0])
    nkeys = nation.loc[nation["n_regionkey"] == rkey,
                       "n_nationkey"].astype(int).tolist()

    part = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=(pc.field("p_type") == MKT_TYPE)).to_pandas()
    in_type = np.zeros(int(part["p_partkey"].max()) + 2, dtype=bool)
    in_type[part["p_partkey"].to_numpy()] = True
    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey",
                                       "s_nationkey"]).to_pandas()
    is_target = np.zeros(int(supp["s_suppkey"].max()) + 2, dtype=bool)
    is_target[supp.loc[supp["s_nationkey"] == MKT_NATION,
                       "s_suppkey"].to_numpy()] = True
    ref = ray.put((in_type, is_target))

    class TypePartial:
        def __init__(self, ref):
            self.in_type, self.is_target = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = np.minimum(t["l_partkey"].to_numpy(),
                            len(self.in_type) - 1)
            keep = self.in_type[pk]
            t = t.filter(pa.array(keep))
            sk = np.minimum(t["l_suppkey"].to_numpy(),
                            len(self.is_target) - 1)
            e = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
            d = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                        pa.int64())
            tbl = pa.table({
                "l_orderkey": t["l_orderkey"],
                "is_target": pa.array(
                    self.is_target[sk].astype(np.int64)),
                "rev": pc.multiply(e, pc.subtract(
                    pa.scalar(100, pa.int64()), d)),
            })
            return pa.TableGroupBy(tbl, ["l_orderkey", "is_target"]) \
                .aggregate([("rev", "sum")]).rename_columns(
                    ["l_orderkey", "is_target", "rev"])

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"]).map_batches(
        TypePartial, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=autoscaling_pool(),
        fn_constructor_kwargs={"ref": ref})

    def order_year(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pc.field("o_orderdate") >= pd.Timestamp(MKT_START))
                & (pc.field("o_orderdate") < pd.Timestamp(MKT_END)))
    ).map_batches(order_year, batch_format="pyarrow",
                  zero_copy_batch=True)
    n_parts = max(8, cluster_cpus())
    enable_hash_shuffle(li, n_parts)
    j1 = li.join(orders, join_type="inner", num_partitions=n_parts,
                 on=("l_orderkey",), right_on=("o_orderkey",))

    def fact_partial(t: pa.Table) -> pa.Table:
        tbl = t.select(["o_custkey", "o_year", "is_target", "rev"])
        return pa.TableGroupBy(tbl, ["o_custkey", "o_year", "is_target"]) \
            .aggregate([("rev", "sum")]).rename_columns(
                ["o_custkey", "o_year", "is_target", "rev"])

    def cust_tag(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "o_year": pa.array(np.full(len(t), -1, dtype=np.int64)),
            "is_target": pa.array(np.zeros(len(t), dtype=np.int64)),
            "rev": pa.array(np.zeros(len(t), dtype=np.int64)),
        })

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=(pc.field("c_nationkey").isin(nkeys))).map_batches(
        cust_tag, batch_format="pyarrow", zero_copy_batch=True)
    both = j1.map_batches(fact_partial, batch_format="pyarrow",
                          zero_copy_batch=True).union(cust)
    enable_hash_shuffle(both, n_parts)

    _OUT = pa.schema([("o_year", pa.int64()), ("target_e4", pa.int64()),
                      ("total_e4", pa.int64())])

    def merge_block(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _OUT.empty_table().to_pandas()
        in_region = set(df_.loc[df_["o_year"] < 0, "o_custkey"].to_numpy())
        fact = df_[(df_["o_year"] >= 0)
                   & df_["o_custkey"].isin(in_region)]
        tgt = fact["rev"].to_numpy() * fact["is_target"].to_numpy()
        out = fact.assign(target_e4=tgt).groupby(
            "o_year", as_index=False).agg(
            target_e4=("target_e4", "sum"), total_e4=("rev", "sum"))
        return out.astype({c: "int64" for c in _OUT.names})

    folded = tree_fold_sum(
        both.repartition(n_parts, keys=["o_custkey"])
        .map_batches(merge_block, batch_format="pandas", batch_size=None),
        ["o_year"], ["target_e4", "total_e4"]).to_pandas()
    folded["share_milli"] = (1000 * folded["target_e4"]) \
        // folded["total_e4"]
    return (folded.sort_values("o_year").reset_index(drop=True)
            .astype({c: "int64" for c in
                     ["o_year", "target_e4", "total_e4", "share_milli"]}))


SQL_TPCH_MARKET_SHARE = f"""
WITH l AS (
  SELECT l_orderkey,
    CASE WHEN s_nationkey = {MKT_NATION} THEN 1 ELSE 0 END AS is_target,
    CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{MKT_TYPE}'
), f AS (
  SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
         SUM(rev * is_target)::BIGINT AS target_e4,
         SUM(rev)::BIGINT AS total_e4
  FROM l
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{MKT_REGION}'
    AND o_orderdate >= TIMESTAMP '{MKT_START}'
    AND o_orderdate < TIMESTAMP '{MKT_END}'
  GROUP BY 1
)
SELECT o_year, target_e4, total_e4,
       ((1000 * target_e4) // total_e4)::BIGINT AS share_milli
FROM f
"""


def queries():
    return {
        "events_parse_props": q_events_parse_props,
        "events_hourly": q_events_hourly,
        "events_spikes": q_events_spikes,
        "events_hourly_users": q_events_hourly_users,
        "events_rate_limit": q_events_rate_limit,
        "events_value_quantiles": q_events_value_quantiles,
        "events_user_features": q_events_user_features,
        "events_transitions": q_events_transitions,
        "events_trend": q_events_trend,
        "events_running_total": q_events_running_total,
        "events_interarrival": q_events_interarrival,
        "events_dau_wau": q_events_dau_wau,
        "events_retention": q_events_retention,
        "events_retention_salted": q_events_retention_salted,
        "events_sliding": q_events_sliding,
        "events_top_users": q_events_top_users,
        "events_sessionize": q_events_sessionize,
        "events_sessionize_salted": q_events_sessionize_salted,
        "events_asof_click": q_events_asof_click,
        "events_funnel": q_events_funnel,
        "tpch_pricing": q_tpch_pricing,
        "tpch_nation_orders": q_tpch_nation_orders,
        "tpch_revenue": q_tpch_revenue,
        "tpch_priority_revenue": q_tpch_priority_revenue,
        "tpch_bloom_semijoin": q_tpch_bloom_semijoin,
        "tpch_rollup_revenue": q_tpch_rollup_revenue,
        "tpch_segment_topk": q_tpch_segment_topk,
        "tpch_brand_share": q_tpch_brand_share,
        "tpch_supplier_stats": q_tpch_supplier_stats,
        "tpch_customer_rfm": q_tpch_customer_rfm,
        "tpch_returned_revenue": q_tpch_returned_revenue,
        "tpch_order_dist": q_tpch_order_dist,
        "tpch_small_qty_rev": q_tpch_small_qty_rev,
        "tpch_top_supplier": q_tpch_top_supplier,
        "tpch_promo_share": q_tpch_promo_share,
        "tpch_disjunctive_rev": q_tpch_disjunctive_rev,
        "tpch_big_orders": q_tpch_big_orders,
        "tpch_order_exists": q_tpch_order_exists,
        "tpch_dormant_customers": q_tpch_dormant_customers,
        "tpch_region_revenue": q_tpch_region_revenue,
        "tpch_waiting_suppliers": q_tpch_waiting_suppliers,
        "tpch_nation_pair_volume": q_tpch_nation_pair_volume,
        "tpch_market_share": q_tpch_market_share,
    }


def oracle_sql():
    return {
        "events_funnel": SQL_EVENTS_FUNNEL,
        "events_value_quantiles": SQL_EVENTS_VALUE_QUANTILES,
        "events_user_features": SQL_EVENTS_USER_FEATURES,
        "events_transitions": SQL_EVENTS_TRANSITIONS,
        "events_trend": SQL_EVENTS_TREND,
        "events_running_total": SQL_EVENTS_RUNNING_TOTAL,
        "events_interarrival": SQL_EVENTS_INTERARRIVAL,
        "events_dau_wau": SQL_EVENTS_DAU_WAU,
        "tpch_segment_topk": SQL_TPCH_SEGMENT_TOPK,
        "tpch_brand_share": SQL_TPCH_BRAND_SHARE,
        "tpch_supplier_stats": SQL_TPCH_SUPPLIER_STATS,
        "tpch_customer_rfm": SQL_TPCH_CUSTOMER_RFM,
        "tpch_returned_revenue": SQL_TPCH_RETURNED_REVENUE,
        "tpch_order_dist": SQL_TPCH_ORDER_DIST,
        "tpch_small_qty_rev": SQL_TPCH_SMALL_QTY_REV,
        "tpch_top_supplier": SQL_TPCH_TOP_SUPPLIER,
        "tpch_promo_share": SQL_TPCH_PROMO_SHARE,
        "tpch_disjunctive_rev": SQL_TPCH_DISJUNCTIVE_REV,
        "tpch_big_orders": SQL_TPCH_BIG_ORDERS,
        "tpch_order_exists": SQL_TPCH_ORDER_EXISTS,
        "tpch_dormant_customers": SQL_TPCH_DORMANT_CUSTOMERS,
        "tpch_region_revenue": SQL_TPCH_REGION_REVENUE,
        "tpch_waiting_suppliers": SQL_TPCH_WAITING_SUPPLIERS,
        "tpch_nation_pair_volume": SQL_TPCH_NATION_PAIR_VOLUME,
        "tpch_market_share": SQL_TPCH_MARKET_SHARE,
        "events_retention": SQL_EVENTS_RETENTION,
        "events_retention_salted": SQL_EVENTS_RETENTION,
        "tpch_priority_revenue": """
SELECT o_orderpriority,
       COUNT(*)::BIGINT AS n_items,
       SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT))::BIGINT AS price_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
        "tpch_bloom_semijoin": """
SELECT o_orderstatus,
       COUNT(*)::BIGINT AS n_items,
       SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT))::BIGINT AS price_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
        "tpch_rollup_revenue": """
SELECT COALESCE(r_name, 'ALL') AS r_name,
       COALESCE(n_name, 'ALL') AS n_name,
       COUNT(*)::BIGINT AS order_count,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
""",
        "events_parse_props": """
SELECT event_id, event_type,
  CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
FROM events
""",
        "events_hourly": """
SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
""",
        "events_rate_limit": f"""
WITH w AS (
  SELECT user_id,
    ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('minute', ts)
                       ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, COUNT(*)::BIGINT AS n_events,
       SUM(CASE WHEN rn > {RATE_LIMIT_PER_MIN} THEN 1 ELSE 0 END)::BIGINT
         AS n_dropped
FROM w GROUP BY 1
""",
        "events_hourly_users": """
SELECT date_trunc('hour', ts) AS hour,
       COUNT(DISTINCT user_id)::BIGINT AS users
FROM events GROUP BY 1
""",
        "events_spikes": f"""
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, hour, n,
    COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY hour
      RANGE BETWEEN INTERVAL {SPIKE_WINDOW_H} HOURS PRECEDING
            AND INTERVAL 1 HOUR PRECEDING), 0)::BIGINT AS base24
  FROM h
)
SELECT event_type, hour, n, base24,
  CAST(CASE WHEN base24 > 0 AND n * {SPIKE_WINDOW_H} > {SPIKE_FACTOR} * base24
       THEN 1 ELSE 0 END AS BIGINT) AS is_spike
FROM w
""",
        "events_sliding": """
SELECT event_type,
  make_timestamp((epoch_us(ts) // 900000000) * 900000000
                 - i.i * 900000000) AS window_start,
  COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events, (SELECT unnest(range(4)) AS i) AS i
GROUP BY 1, 2
""",
        "events_top_users": """
SELECT user_id, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
ORDER BY n DESC, user_id ASC LIMIT 10
""",
        "events_sessionize": f"""
WITH o AS (
  SELECT user_id, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
), per AS (
  SELECT user_id, session_id, COUNT(*) AS n FROM s GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n) AS max_session_events,
  CAST(SUM(n) AS BIGINT) AS total_events
FROM per GROUP BY user_id
""",
        "events_sessionize_salted": f"""
WITH o AS (
  SELECT user_id, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
), per AS (
  SELECT user_id, session_id, COUNT(*) AS n FROM s GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n) AS max_session_events,
  CAST(SUM(n) AS BIGINT) AS total_events
FROM per GROUP BY user_id
""",
        "events_asof_click": """
WITH w AS (
  SELECT event_id, user_id, event_type,
    MAX(CASE WHEN event_type = 'click' THEN event_id END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click
  FROM events
)
SELECT event_id AS error_event_id, user_id,
  COALESCE(prior_click, -1) AS prior_click_id
FROM w WHERE event_type = 'error'
""",
        "tpch_pricing": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
  CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "tpch_nation_orders": """
SELECT n_name, COUNT(*) AS order_count,
  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "tpch_revenue": """
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_discount * 100) AS BIGINT)), 0) AS BIGINT) AS revenue_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
""",
    }


# ------------------------------------------------------------ fact-fact join

def q_tpch_priority_revenue(sf_dir: str) -> ray.data.Dataset:
    """Fact-fact equi-join: lineitem ⋈ orders on orderkey (both sides
    big — no broadcast), via Ray's native hash-shuffle join, then
    revenue cents per order priority. Completes the join family:
    dimension joins broadcast (q_tpch_nation_orders); fact joins hash
    co-partition both sides on the key — the 100 TB plan, where
    num_partitions scales with the cluster. Both exchanges stay lean:
    the lineitem side collapses to per-block (orderkey, n, cents)
    partials BEFORE the join (≈4 lineitems/order never leave their
    scan task) and the ≤ #priorities rollup is the bounded tree fold,
    not a second fact-sized hash aggregate (together: the sf0.01
    oracle-sweep entry dropped ~35 s → ~8 s)."""
    from .agg import tree_fold_sum
    from ..util import cluster_cpus, enable_hash_shuffle

    def cents_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "l_orderkey": t["l_orderkey"],
            "n_items": pa.array(np.ones(len(t), dtype=np.int64)),
            "price_cents": pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64()),
        })
        return pa.TableGroupBy(tbl, ["l_orderkey"]).aggregate(
            [("n_items", "sum"), ("price_cents", "sum")]
        ).rename_columns(["l_orderkey", "n_items", "price_cents"])

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice"]).map_batches(
        cents_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderpriority"])
    enable_hash_shuffle(li, max(8, cluster_cpus()))
    j = li.join(orders, join_type="inner",
                num_partitions=max(8, cluster_cpus()),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def prio_partial(t: pa.Table) -> pa.Table:
        tbl = t.select(["o_orderpriority", "n_items", "price_cents"])
        return pa.TableGroupBy(tbl, ["o_orderpriority"]).aggregate(
            [("n_items", "sum"), ("price_cents", "sum")]
        ).rename_columns(["o_orderpriority", "n_items", "price_cents"])

    return tree_fold_sum(
        j.map_batches(prio_partial, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["o_orderpriority"], ["n_items", "price_cents"])


# ------------------------------------------------- bloom semi-join plan

BLOOM_BITS = 1 << 20       # 128 KB packed filter; at a 100 TB build
#                            side size this up (2^30 bits = 128 MB
#                            broadcast) — still orders below the key set
BLOOM_K = 4                # probes per key; fp ≈ (1 − e^(−K·n/m))^K
_BLOOM_WORDS = BLOOM_BITS >> 6
_SPLITMIX_GAMMA = 0x9E3779B97F4A7C15


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, K) bit positions via K rounds of splitmix64 finalization —
    integer hashing only (the bloom is engine-internal: correctness
    needs NO false negatives, which the exact verify join then makes
    sufficient, so no SQL-reproducible md5 is needed here)."""
    x = keys.astype(np.uint64)[:, None] + (
        np.arange(1, BLOOM_K + 1, dtype=np.uint64)
        * np.uint64(_SPLITMIX_GAMMA))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x & np.uint64(BLOOM_BITS - 1)).astype(np.int64)


def _bloom_partial_words(keys: np.ndarray) -> pa.Table:
    """Per-block packed bloom words (nonzero only): the build side's
    exchange payload is ≤ #blocks × 16k fixed-width rows regardless of
    how many keys a block holds."""
    pos = _bloom_positions(keys).ravel()
    words = np.zeros(_BLOOM_WORDS, dtype=np.uint64)
    np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    nz = np.flatnonzero(words)
    return pa.table({"word": pa.array(nz, type=pa.int32()),
                     "bits": pa.array(words[nz].view(np.int64),
                                      type=pa.int64())})


def q_tpch_bloom_semijoin(sf_dir: str) -> ray.data.Dataset:
    """Revenue of lineitems belonging to URGENT orders — the THIRD join
    plan, completing the family: dimension joins broadcast the table
    (q_tpch_nation_orders), fact-fact joins hash co-partition both
    sides in full (q_tpch_priority_revenue), and SELECTIVE fact-fact
    joins ship a fixed-size Bloom filter of the filtered build keys to
    the probe scan so only survivors enter the exchange. Plan: build =
    filtered orders scan → per-block packed bloom words → bitwise-OR
    combine tree (``tree_fold_or``, ≤ 16k fixed rows per level) → one
    128 KB broadcast via ``ray.put``; probe = lineitem scan tests
    K=4 splitmix64 bits per key (zero false negatives by construction)
    and drops ~82% of rows before any shuffle; the survivors then
    hash-join the urgent orders EXACTLY, so the bloom's false positives
    (≈1e-4 here) never reach the output and the SQL oracle is the plain
    join — an exact check for a probabilistic plan. At 100 TB the
    probe-side exchange shrinks by the filter's selectivity while the
    broadcast stays fixed-size; the bloom never depends on the key
    distribution."""
    from ..util import autoscaling_pool, cluster_cpus
    from .agg import tree_fold_or

    # materialize the filtered build side ONCE: the bloom fold executes
    # it eagerly and the verify join reads it again — without this the
    # orders scan+filter would run twice (review finding; same reason
    # q_emb_semdedup materializes its assignment)
    urgent = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    ).drop_columns(["o_orderpriority"]).materialize()

    def build_words(t: pa.Table) -> pa.Table:
        return _bloom_partial_words(t["o_orderkey"].to_numpy())

    folded = tree_fold_or(
        urgent.map_batches(build_words, batch_format="pyarrow",
                           zero_copy_batch=True),
        key="word", val="bits").to_pandas()      # ≤ 16k rows: bounded
    words = np.zeros(_BLOOM_WORDS, dtype=np.uint64)
    words[folded["word"].to_numpy()] = \
        folded["bits"].to_numpy().view(np.uint64)
    bloom_ref = ray.put(words)

    class BloomProbe:
        def __init__(self, bloom_ref):
            self.words = ray.get(bloom_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["l_orderkey"].to_numpy()
            pos = _bloom_positions(keys)
            hit = (self.words[pos >> 6]
                   >> (pos & 63).astype(np.uint64)) & np.uint64(1)
            keep = hit.all(axis=1)
            t = t.filter(pa.array(keep))
            return pa.table({
                "l_orderkey": t["l_orderkey"],
                "price_cents": pc.cast(
                    pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                    pa.int64()),
            })

    survivors = (read_parquet_clean(
                     f"{sf_dir}/lineitem.parquet",
                     columns=["l_orderkey", "l_extendedprice"])
                 .map_batches(BloomProbe, batch_format="pyarrow",
                              zero_copy_batch=True,
                              concurrency=autoscaling_pool(),
                              fn_constructor_kwargs={"bloom_ref": bloom_ref}))
    j = survivors.join(urgent, join_type="inner",
                       num_partitions=max(8, cluster_cpus()),
                       on=("l_orderkey",), right_on=("o_orderkey",))
    return (j.groupby("o_orderstatus")
            .aggregate(Count(alias_name="n_items"),
                       Sum("price_cents", alias_name="price_cents")))
