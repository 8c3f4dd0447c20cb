"""Sessionization / as-of window semantics on hand-built frames."""

import pandas as pd

from swarm_ray.ops.relational import _asof_group, _sessionize_group


def ts(minute):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=minute)


def test_sessionize_gap_semantics():
    g = pd.DataFrame({
        "user_id": [1] * 5,
        "event_id": [10, 11, 12, 13, 14],
        "ts": [ts(0), ts(10), ts(50), ts(70), ts(200)],  # gaps: 10,40,20,130
    })
    out = _sessionize_group(g)
    assert out["n_sessions"].iloc[0] == 3       # {0,10}, {50,70}, {200}
    assert out["max_session_events"].iloc[0] == 2
    assert out["total_events"].iloc[0] == 5


def test_sessionize_boundary_exactly_30min_same_session():
    g = pd.DataFrame({
        "user_id": [1, 1], "event_id": [1, 2], "ts": [ts(0), ts(30)],
    })
    assert _sessionize_group(g)["n_sessions"].iloc[0] == 1  # strict > gap


def test_asof_prior_click():
    g = pd.DataFrame({
        "user_id": [1] * 6,
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": [ts(0), ts(1), ts(2), ts(3), ts(4), ts(5)],
        "event_type": ["error", "click", "view", "error", "click", "error"],
    })
    out = _asof_group(g).set_index("error_event_id")
    assert out.loc[1, "prior_click_id"] == -1   # no prior click
    assert out.loc[4, "prior_click_id"] == 2    # click@2 (view doesn't count)
    assert out.loc[6, "prior_click_id"] == 5


def test_asof_timestamp_tie_uses_event_id_order():
    g = pd.DataFrame({
        "user_id": [1] * 3,
        "event_id": [1, 2, 3],
        "ts": [ts(0), ts(0), ts(0)],            # all tied
        "event_type": ["click", "error", "click"],
    })
    out = _asof_group(g).set_index("error_event_id")
    # order (ts, event_id): click(1), error(2), click(3) → prior = 1
    assert out.loc[2, "prior_click_id"] == 1


def test_sessionize_salted_matches_plain(ray_session):
    from swarm_ray.ops.relational import q_events_sessionize, q_events_sessionize_salted
    sf = "/root/testdata/sf0.001"
    plain = (q_events_sessionize(sf).to_pandas()
             .sort_values("user_id").reset_index(drop=True))
    salted = (q_events_sessionize_salted(sf).to_pandas()
              .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, salted)


def test_sessionize_salted_bot_user(ray_session, tmp_path):
    """Bot-grade hot key: one user with events every few minutes for 30
    days (sessions chain across midnight boundaries) + normal users.
    The salted path must agree with the plain path exactly — including
    sessions that straddle day-bucket boundaries."""
    import numpy as np
    from swarm_ray.ops.relational import q_events_sessionize, q_events_sessionize_salted

    rng = np.random.default_rng(5)
    rows = []
    eid = 0
    # bot: bursts of 10 events 2 min apart, burst gaps alternate 20 min
    # (same session) / 45 min (new session), running for ~30 days
    t = pd.Timestamp("2024-03-01 23:40:00")   # first burst crosses midnight
    for burst in range(600):
        for k in range(10):
            rows.append((1, t, eid)); eid += 1
            t += pd.Timedelta(minutes=2)
        t += pd.Timedelta(minutes=20 if burst % 2 else 45)
    # normal users
    for u in range(2, 12):
        t = pd.Timestamp("2024-03-05") + pd.Timedelta(hours=int(rng.integers(0, 100)))
        for k in range(int(rng.integers(3, 30))):
            rows.append((u, t, eid)); eid += 1
            t += pd.Timedelta(minutes=int(rng.integers(1, 120)))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    sf = tmp_path / "sfbot"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet", index=False)

    plain = (q_events_sessionize(str(sf)).to_pandas()
             .sort_values("user_id").reset_index(drop=True))
    salted = (q_events_sessionize_salted(str(sf)).to_pandas()
              .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, salted)
    bot = plain[plain["user_id"] == 1].iloc[0]
    assert bot["total_events"] == 6000 and bot["n_sessions"] > 100


def test_sliding_window_covers_each_event_four_times(ray_session):
    from swarm_ray.ops.relational import q_events_hourly, q_events_sliding
    sf = "/root/testdata/sf0.001"
    sliding = q_events_sliding(sf).to_pandas()
    hourly = q_events_hourly(sf).to_pandas()
    # every event lands in exactly WINDOW_SLIDES windows
    assert sliding["n"].sum() == 4 * hourly["n"].sum() / 1  # hourly n == total
    assert sliding["value_cents"].sum() == 4 * hourly["value_cents"].sum()
    # window starts are aligned to the slide
    assert (sliding["window_start"].dt.minute % 15 == 0).all()
    assert (sliding["window_start"].dt.second == 0).all()


def test_events_funnel_matches_pandas(ray_session):
    """3-step funnel must match an independent pandas recompute of the
    chained first-qualifying-timestamp semantics."""
    import pandas as pd
    import pyarrow.parquet as pq
    from swarm_ray.ops.relational import FUNNEL_STEPS, q_events_funnel
    sf = "/root/testdata/sf0.001"
    got = q_events_funnel(sf).to_pandas().sort_values("step") \
        .reset_index(drop=True)
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    t = ev[ev.event_type == FUNNEL_STEPS[0]].groupby("user_id")["ts"].min()
    exp = [t.size]
    for step in FUNNEL_STEPS[1:]:
        nxt = ev[ev.event_type == step]
        nxt = nxt[nxt["ts"] > nxt["user_id"].map(t)]
        t = nxt.groupby("user_id")["ts"].min()
        exp.append(t.size)
    assert got["step"].tolist() == [1, 2, 3]
    assert got["users"].tolist() == exp
    # funnel must be monotone non-increasing
    assert exp[0] >= exp[1] >= exp[2] > 0


def test_retention_block_semantics():
    """Cohort = per-user min day; each (user, offset) counts once; the
    partial counts are per (cohort, offset)."""
    from swarm_ray.ops.relational import _retention_block
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": [ts(0), ts(30), ts(60 * 24 * 2),        # u1: day0 ×2, day2
               ts(60 * 24), ts(60 * 24),              # u2: first seen day1
               ts(60 * 24 * 2)],                      # u3: first seen day2
    })
    out = _retention_block(df).sort_values(
        ["cohort_day", "offset_d"]).reset_index(drop=True)
    # u1 cohort 01-01 offsets {0, 2}; u2 cohort 01-02 offset {0} (x2
    # events dedup to one); u3 cohort 01-03 offset {0}
    assert out.values.tolist() == [
        ["2024-01-01", 0, 1], ["2024-01-01", 2, 1],
        ["2024-01-02", 0, 1], ["2024-01-03", 0, 1]]


def test_retention_matches_pandas(ray_session):
    """Distributed retention equals a single-frame pandas recompute on
    the sf0.001 events table."""
    import pyarrow.parquet as pq
    from swarm_ray.ops.relational import q_events_retention
    sf = "/root/testdata/sf0.001"
    got = (q_events_retention(sf).to_pandas()
           .sort_values(["cohort_day", "offset_d"]).reset_index(drop=True))
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    day = ev["ts"].dt.floor("D")
    cohort = day.groupby(ev["user_id"]).transform("min")
    u = pd.DataFrame({
        "user_id": ev["user_id"],
        "cohort_day": cohort.dt.strftime("%Y-%m-%d"),
        "offset_d": (day - cohort).dt.days.astype("int64"),
    }).drop_duplicates(["user_id", "offset_d"])
    exp = (u.groupby(["cohort_day", "offset_d"]).size()
           .reset_index(name="users")
           .sort_values(["cohort_day", "offset_d"]).reset_index(drop=True))
    assert got["cohort_day"].tolist() == exp["cohort_day"].tolist()
    assert got["offset_d"].tolist() == exp["offset_d"].tolist()
    assert got["users"].tolist() == exp["users"].tolist()
    # day-0 retention includes every user exactly once
    n_users = ev["user_id"].nunique()
    assert got[got["offset_d"] == 0]["users"].sum() == n_users


def test_retention_salted_matches_plain(ray_session):
    from swarm_ray.ops.relational import (q_events_retention,
                                          q_events_retention_salted)
    sf = "/root/testdata/sf0.001"
    plain = (q_events_retention(sf).to_pandas()
             .sort_values(["cohort_day", "offset_d"]).reset_index(drop=True))
    salted = (q_events_retention_salted(sf).to_pandas()
              .sort_values(["cohort_day", "offset_d"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, salted)


def test_retention_salted_bot_user(ray_session, tmp_path):
    """Hot-user guard (VERDICT r4 item 6): a bot user active every few
    minutes for 40 days contributes only ~40 (user, day) rows to the
    salted plan's keyed exchange — and the result must equal both the
    plain plan and a pandas recompute, including the cohort row the
    bot anchors."""
    import numpy as np
    from swarm_ray.ops.relational import (q_events_retention,
                                          q_events_retention_salted)

    rng = np.random.default_rng(11)
    rows = []
    t = pd.Timestamp("2024-03-01 00:10:00")
    for k in range(40 * 24 * 6):                 # bot: every 10 min, 40 d
        rows.append((1, t))
        t += pd.Timedelta(minutes=10)
    for u in range(2, 30):                       # sparse normal users
        first = pd.Timestamp("2024-03-01") + pd.Timedelta(
            days=int(rng.integers(0, 10)))
        for d in sorted(set(rng.integers(0, 30, size=6).tolist())):
            rows.append((u, first + pd.Timedelta(days=int(d), hours=3)))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["event_type"] = "view"
    df["value"] = 0.0
    df["props"] = "{}"
    sf = tmp_path / "sfbot_ret"
    sf.mkdir()
    df[["event_id", "ts", "user_id", "event_type", "value", "props"]] \
        .to_parquet(sf / "events.parquet", index=False)

    plain = (q_events_retention(str(sf)).to_pandas()
             .sort_values(["cohort_day", "offset_d"]).reset_index(drop=True))
    salted = (q_events_retention_salted(str(sf)).to_pandas()
              .sort_values(["cohort_day", "offset_d"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, salted)

    # independent pandas recompute
    day = df["ts"].dt.floor("D")
    cohort = day.groupby(df["user_id"]).transform("min")
    u = pd.DataFrame({
        "cohort_day": cohort.dt.strftime("%Y-%m-%d"),
        "offset_d": (day - cohort).dt.days.astype("int64"),
        "user_id": df["user_id"],
    }).drop_duplicates(["user_id", "offset_d"])
    exp = (u.groupby(["cohort_day", "offset_d"]).size()
           .reset_index(name="users")
           .sort_values(["cohort_day", "offset_d"]).reset_index(drop=True))
    got = salted.astype({"users": "int64"})
    pd.testing.assert_frame_equal(
        got, exp.astype({"users": "int64"}), check_dtype=False)


def test_funnel_hot_user_bound(ray_session, tmp_path):
    """Documents q_events_funnel's partitioning assumption (VERDICT r4
    item 6, bound variant): a user's rows must land in ONE block of the
    user-keyed exchange — hash partitioning never splits a key across
    partitions, but a partition above Ray's target block size may split
    into multiple blocks, and a split user would double-count funnel
    steps. The bound is therefore

        max user rows ≈ target_max_block_size / ~48 B/row  (≈2.7 M
        rows at the 128 MiB default)

    This plants a 400k-row hot user (well inside the bound, ~100× the
    sf0.001 mean) plus converting users, and pins exactness against the
    chained pandas recompute."""
    import numpy as np
    from swarm_ray.ops.relational import FUNNEL_STEPS, q_events_funnel

    import ray.data as rd
    bound_rows = (rd.DataContext.get_current().target_max_block_size
                  // 48)
    n_hot = 400_000
    assert n_hot < bound_rows  # the planted user honors the documented bound

    rng = np.random.default_rng(3)
    ts0 = pd.Timestamp("2024-05-01").value // 1000
    hot_ts = ts0 + np.arange(n_hot, dtype=np.int64) * 60_000_000
    hot_types = np.array(FUNNEL_STEPS)[rng.integers(0, 3, size=n_hot)]
    users = [np.full(n_hot, 1, dtype=np.int64)]
    tss = [hot_ts]
    types = [hot_types]
    for u in range(2, 50):                     # normal users, partial funnels
        k = int(rng.integers(1, 8))
        users.append(np.full(k, u, dtype=np.int64))
        tss.append(ts0 + rng.integers(0, 10**9, size=k).astype(np.int64))
        types.append(np.array(FUNNEL_STEPS)[rng.integers(0, 3, size=k)])
    df = pd.DataFrame({
        "user_id": np.concatenate(users),
        "ts": pd.to_datetime(np.concatenate(tss), unit="us"),
        "event_type": np.concatenate(types),
    })
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["value"] = 0.0
    df["props"] = "{}"
    sf = tmp_path / "sfhotfunnel"
    sf.mkdir()
    df[["event_id", "ts", "user_id", "event_type", "value", "props"]] \
        .to_parquet(sf / "events.parquet", index=False)

    got = (q_events_funnel(str(sf)).to_pandas()
           .sort_values("step").reset_index(drop=True))

    # chained min recompute
    steps = []
    thresh = pd.Series(pd.NaT, index=df["user_id"].unique())
    reached = df["user_id"].unique()
    for s, step in enumerate(FUNNEL_STEPS, start=1):
        ev = df[(df["event_type"] == step) & df["user_id"].isin(reached)]
        if s > 1:
            ev = ev[ev["ts"] > thresh.reindex(ev["user_id"]).to_numpy()]
        t = ev.groupby("user_id")["ts"].min()
        reached = t.index.to_numpy()
        thresh = t
        steps.append((s, len(reached)))
    exp = pd.DataFrame(steps, columns=["step", "users"])
    pd.testing.assert_frame_equal(got.astype({"step": "int64",
                                              "users": "int64"}), exp)


# ------------------------------------------------------- bloom semi-join

def test_bloom_no_false_negatives():
    """Every build key must pass its own filter — the property the
    exact-verify plan depends on (a false negative is a LOST row the
    verify join can never recover)."""
    import numpy as np
    from swarm_ray.ops import relational as R
    keys = np.arange(1, 50_001, dtype=np.int64) * 7
    t = R._bloom_partial_words(keys)
    words = np.zeros(R._BLOOM_WORDS, dtype=np.uint64)
    words[t["word"].to_numpy()] = t["bits"].to_numpy().view(np.uint64)
    pos = R._bloom_positions(keys)
    hit = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    assert bool(hit.all())


def test_bloom_verify_removes_false_positives(ray_session, tmp_path):
    """Plant a probe key that passes the bloom but is NOT a build key:
    the final joined result must not contain it — the exact verify is
    what makes the probabilistic prefilter loss-free. The build set is
    sized (150k keys → 44% fill → fp ≈ 3.6%) so a genuine collision is
    findable at the production filter size; shrinking the filter
    instead would not survive Ray's by-reference pickling of the
    module constants into workers."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from swarm_ray.ops import relational as R

    build = np.arange(1, 150_001, dtype=np.int64)
    t = R._bloom_partial_words(build)
    words = np.zeros(R._BLOOM_WORDS, dtype=np.uint64)
    words[t["word"].to_numpy()] = t["bits"].to_numpy().view(np.uint64)

    # search for a colliding non-member (fp ≈ 3.6% at 44% fill)
    fp = None
    for cand in range(300_001, 1_000_000, 13):
        pos = R._bloom_positions(np.array([cand], dtype=np.int64))
        hit = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        if bool(hit.all()):
            fp = cand
            break
    if fp is None:  # pragma: no cover - statistically negligible
        import pytest
        pytest.skip("no false positive found in the scanned range")

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "o_orderkey": pa.array(build.tolist(), type=pa.int64()),
        "o_custkey": pa.array([1] * len(build), type=pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(build)),
        "o_totalprice": pa.array([1.0] * len(build)),
        "o_orderdate": pa.array([0] * len(build), type=pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(build)),
    }), sf / "orders.parquet")
    probe_keys = build.tolist() + [fp]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(probe_keys, type=pa.int64()),
        "l_extendedprice": pa.array([10.0] * len(probe_keys)),
    }), sf / "lineitem.parquet")

    got = R.q_tpch_bloom_semijoin(str(sf)).to_pandas()
    assert got["n_items"].sum() == len(build)          # fp row removed
    assert got["price_cents"].sum() == len(build) * 1000


def test_tree_fold_or_matches_serial(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from swarm_ray.ops.agg import tree_fold_or
    rng = np.random.default_rng(3)
    rows = []
    for _ in range(6):
        w = rng.integers(0, 64, size=50).astype(np.int32)
        b = rng.integers(0, 1 << 62, size=50).astype(np.int64)
        rows.append(pa.table({"word": pa.array(w), "bits": pa.array(b)}))
    ds = ray.data.from_arrow(rows).repartition(5)
    got = tree_fold_or(ds, key="word", val="bits").to_pandas()
    want: dict[int, int] = {}
    for t in rows:
        for w, b in zip(t["word"].to_pylist(), t["bits"].to_pylist()):
            want[w] = want.get(w, 0) | b
    got_map = dict(zip(got["word"], got["bits"]))
    assert got_map == want


# ------------------------------------------------ trailing-baseline spikes

def test_events_spikes_planted_anomaly(ray_session, tmp_path):
    """A 10× burst after a 24 h flat baseline must flag; cold-start
    hours (empty baseline) and post-gap hours (>24 h silence) must
    not, however large."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.relational import q_events_spikes

    rows = []
    # type "login": 1 event/hour for hours 0..23, then 10 at hour 24,
    # then 2 at hour 25
    for h in range(24):
        rows.append(("login", h, 1))
    rows.append(("login", 24, 10))
    rows.append(("login", 25, 2))
    # type "err": bursts at hour 0 (cold start) and hour 30 (>24 h gap)
    rows.append(("err", 0, 50))
    rows.append(("err", 30, 50))

    ts, et = [], []
    for typ, h, n in rows:
        for i in range(n):
            ts.append(pd.Timestamp("2026-01-01") + pd.Timedelta(hours=h, seconds=i))
            et.append(typ)
    t = pa.table({
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_type": pa.array(et),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = (q_events_spikes(str(tmp_path)).to_pandas()
           .sort_values(["event_type", "hour"]).reset_index(drop=True))

    lg = got[got["event_type"] == "login"]
    login = lg.set_index(
        ((lg["hour"] - pd.Timestamp("2026-01-01"))
         .dt.total_seconds() // 3600).astype(int))
    # hour 24: n=10, base24 = 24 ones -> 10*24 > 3*24 -> spike
    assert login.loc[24, "n"] == 10
    assert login.loc[24, "base24"] == 24
    assert login.loc[24, "is_spike"] == 1
    # hour 25: base24 = hours 1..24 = 23 + 10 = 33; 2*24=48 < 99
    assert login.loc[25, "base24"] == 33
    assert login.loc[25, "is_spike"] == 0
    # hour 0 (cold start): never flagged
    assert login.loc[0, "is_spike"] == 0

    err = got[got["event_type"] == "err"]
    assert list(err["is_spike"]) == [0, 0]      # cold start + 30 h gap
    assert list(err["base24"]) == [0, 0]


def test_rollup_revenue_levels_conserve(ray_session):
    """ROLLUP levels must conserve: each region subtotal equals the sum
    of its nation rows, and the grand total equals the region sum."""
    from swarm_ray.ops.relational import q_tpch_rollup_revenue

    df = q_tpch_rollup_revenue("/root/testdata/sf0.001").to_pandas()
    det = df[(df["r_name"] != "ALL") & (df["n_name"] != "ALL")]
    reg = df[(df["r_name"] != "ALL") & (df["n_name"] == "ALL")]
    tot = df[(df["r_name"] == "ALL") & (df["n_name"] == "ALL")]
    assert len(tot) == 1
    for col in ("order_count", "total_cents"):
        per_region = det.groupby("r_name")[col].sum()
        got_region = reg.set_index("r_name")[col]
        assert got_region.sort_index().tolist() == \
            per_region.sort_index().tolist()
        assert int(tot[col].iloc[0]) == int(det[col].sum())


def test_hourly_users_distinct_semantics(ray_session, tmp_path):
    """Distinct users per hour: repeats within an hour count once;
    the same user in two hours counts in both; layout-independent."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.relational import q_events_hourly_users

    base = pd.Timestamp("2026-02-01")
    rows = [
        (1, base), (1, base + pd.Timedelta(minutes=5)),      # u1 h0 ×2
        (2, base + pd.Timedelta(minutes=59)),                # u2 h0
        (1, base + pd.Timedelta(hours=1)),                   # u1 h1
        (3, base + pd.Timedelta(hours=1, minutes=30)),       # u3 h1
        (3, base + pd.Timedelta(hours=1, minutes=31)),       # u3 h1 dup
    ]
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], type=pa.int64()),
        "ts": pa.array([x for _, x in rows], type=pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = (q_events_hourly_users(str(tmp_path)).to_pandas()
           .sort_values("hour").reset_index(drop=True))
    assert list(got["users"]) == [2, 2]
    assert got["hour"].tolist() == [base, base + pd.Timedelta(hours=1)]

    # layout independence: events.parquet as a DIRECTORY of part files
    multi = tmp_path / "multi" / "events.parquet"
    multi.mkdir(parents=True)
    pq.write_table(t.slice(0, 3), multi / "part-000.parquet")
    pq.write_table(t.slice(3, 3), multi / "part-001.parquet")
    got2 = (q_events_hourly_users(str(tmp_path / "multi")).to_pandas()
            .sort_values("hour").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_rate_limit_window_semantics(ray_session, tmp_path):
    """First R per (user, minute) pass; order within a window is
    (ts, event_id); a burst split across two minutes throttles per
    window, not per burst."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray.ops.relational import (RATE_LIMIT_PER_MIN,
                                          q_events_rate_limit)

    base = pd.Timestamp("2026-03-01 10:00:00")
    rows = []
    eid = 0
    # user 1: 8 events in minute 0 (3 dropped), 5 in minute 1 (0)
    for i in range(8):
        rows.append((1, base + pd.Timedelta(seconds=i), eid)); eid += 1
    for i in range(RATE_LIMIT_PER_MIN):
        rows.append((1, base + pd.Timedelta(minutes=1, seconds=i), eid)); eid += 1
    # user 2: 6 events at the SAME timestamp → event_id breaks ties,
    # exactly one dropped
    for i in range(6):
        rows.append((2, base, eid)); eid += 1
    t = pa.table({
        "user_id": pa.array([u for u, _, _ in rows], type=pa.int64()),
        "ts": pa.array([x for _, x, _ in rows], type=pa.timestamp("us")),
        "event_id": pa.array([e for _, _, e in rows], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = (q_events_rate_limit(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert got["user_id"].tolist() == [1, 2]
    assert got["n_events"].tolist() == [8 + RATE_LIMIT_PER_MIN, 6]
    assert got["n_dropped"].tolist() == [3, 1]


def _write_events(tmp_path, **cols):
    import pyarrow as pa
    import pyarrow.parquet as pq
    n = len(next(iter(cols.values())))
    base = {
        "event_id": list(range(n)),
        "user_id": [1] * n,
        "event_type": ["view"] * n,
        "value": [1.0] * n,
    }
    base.update(cols)
    tbl = pa.table({
        "event_id": pa.array(base["event_id"], type=pa.int64()),
        "ts": pa.array(base["ts"]).cast(pa.timestamp("us")),
        "user_id": pa.array(base["user_id"], type=pa.int64()),
        "event_type": pa.array(base["event_type"], type=pa.string()),
        "value": pa.array(base["value"], type=pa.float64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def test_value_quantiles_lower_interpolation(ray_session, tmp_path):
    """Percentile = value at 0-indexed rank floor((n-1)*p/100) of the
    sorted values — pinned on a frame where the answers are by hand."""
    from swarm_ray.ops.relational import q_events_value_quantiles
    sf = _write_events(
        tmp_path,
        ts=[pd.Timestamp("2024-01-01")] * 5,
        event_type=["a", "a", "a", "a", "b"],
        value=[0.10, 0.20, 0.30, 0.40, 0.70],
    )
    out = (q_events_value_quantiles(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    a = out[out.event_type == "a"].iloc[0]
    # n=4: p50 -> idx (3*50)//100 = 1 -> 20; p90 -> idx 2 -> 30; p99 -> idx 2
    assert (a["n"], a["p50_cents"], a["p90_cents"], a["p99_cents"]) \
        == (4, 20, 30, 30)
    b = out[out.event_type == "b"].iloc[0]
    assert (b["n"], b["p50_cents"], b["p90_cents"], b["p99_cents"]) \
        == (1, 70, 70, 70)


def test_user_features_span_is_microsecond_floor(ray_session, tmp_path):
    """span_min floors the REAL elapsed time, never counts calendar
    minute boundaries: 10:00:59 -> 10:01:01 is 2 s = 0 whole minutes."""
    from swarm_ray.ops.relational import q_events_user_features
    sf = _write_events(
        tmp_path,
        ts=[pd.Timestamp("2024-01-01 10:00:59"),
            pd.Timestamp("2024-01-01 10:01:01"),
            pd.Timestamp("2024-02-01 00:00:00"),
            pd.Timestamp("2024-02-01 01:30:30")],
        user_id=[1, 1, 2, 2],
        event_type=["view", "click", "view", "view"],
        value=[1.00, 2.50, 0.10, 0.10],
    )
    out = (q_events_user_features(sf).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    u1 = out[out.user_id == 1].iloc[0]
    assert (u1["n_events"], u1["n_types"], u1["active_days"],
            u1["value_cents"], u1["span_min"]) == (2, 2, 1, 350, 0)
    u2 = out[out.user_id == 2].iloc[0]
    assert (u2["n_events"], u2["n_types"], u2["active_days"],
            u2["value_cents"], u2["span_min"]) == (2, 1, 1, 20, 90)


def test_transitions_user_boundary_and_tie_order(ray_session, tmp_path):
    """Consecutive pairs are within-user only, ordered by (ts,
    event_id); probabilities are floor-milli of the per-src total."""
    from swarm_ray.ops.relational import q_events_transitions
    t0 = pd.Timestamp("2024-01-01")
    sf = _write_events(
        tmp_path,
        ts=[t0, t0, t0 + pd.Timedelta(minutes=1), t0, t0],
        event_id=[1, 2, 3, 10, 11],
        user_id=[1, 1, 1, 2, 2],
        event_type=["view", "click", "view", "view", "error"],
    )
    out = (q_events_transitions(sf).to_pandas()
           .set_index(["src", "dst"]).sort_index())
    # user 1: view->click (tie broken by event_id), click->view;
    # user 2: view->error. NO click->view across the user boundary.
    assert out.loc[("view", "click"), "n"] == 1
    assert out.loc[("click", "view"), "n"] == 1
    assert out.loc[("view", "error"), "n"] == 1
    assert len(out) == 3
    # src=view has 2 outgoing: each p = 1000*1//2 = 500
    assert out.loc[("view", "click"), "p_milli"] == 500
    assert out.loc[("view", "error"), "p_milli"] == 500
    assert out.loc[("click", "view"), "p_milli"] == 1000


def test_trend_zero_fill_and_negative_floor(ray_session, tmp_path):
    """Missing days are zero-filled over the GLOBAL day span, and the
    slope floors (not truncates) on a negative numerator."""
    from swarm_ray.ops.relational import q_events_trend
    d0 = pd.Timestamp("2024-01-01")
    day = pd.Timedelta(days=1)
    # type a: 1,2,3 per day -> slope exactly +1e6 u-events/day
    # type b: days 0 and 2 only (counts 2,_,1) -> y=[2,0,1] ->
    #   num = 3*2-3*3 = -3, den = 6 -> floor(-1e6/2) = -500000
    ts = ([d0] + [d0 + day] * 2 + [d0 + 2 * day] * 3
          + [d0, d0] + [d0 + 2 * day])
    et = ["a"] * 6 + ["b"] * 3
    sf = _write_events(tmp_path, ts=ts, event_type=et,
                       event_id=list(range(9)), user_id=[1] * 9,
                       value=[1.0] * 9)
    out = (q_events_trend(sf).to_pandas()
           .set_index("event_type").sort_index())
    assert out.loc["a", "n_days"] == 3 and out.loc["a", "total"] == 6
    assert out.loc["a", "slope_e6"] == 1_000_000
    assert out.loc["b", "n_days"] == 3 and out.loc["b", "total"] == 3
    assert out.loc["b", "slope_e6"] == -500_000


def test_running_total_per_user_cumulative(ray_session, tmp_path):
    from swarm_ray.ops.relational import q_events_running_total
    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    sf = _write_events(
        tmp_path,
        ts=[t0, t0 + m, t0 + 2 * m, t0, t0 + m],
        event_id=[1, 2, 3, 10, 11],
        user_id=[1, 1, 1, 2, 2],
        value=[1.00, 2.00, 0.50, 5.00, 0.25],
    )
    out = (q_events_running_total(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out["run_cents"].tolist() == [100, 300, 350, 500, 525]


def test_interarrival_user_boundary_and_floor(ray_session, tmp_path):
    """Gaps never cross users; whole-second floor (90s -> 90, 2.5s
    would floor — pinned with a 59s->61s pair = 2 s)."""
    from swarm_ray.ops.relational import q_events_interarrival
    sf = _write_events(
        tmp_path,
        ts=[pd.Timestamp("2024-01-01 10:00:59"),
            pd.Timestamp("2024-01-01 10:01:01"),
            pd.Timestamp("2024-01-01 12:00:00"),
            pd.Timestamp("2024-01-01 12:01:30"),
            pd.Timestamp("2024-01-01 12:02:00")],
        event_id=[1, 2, 10, 11, 12],
        user_id=[1, 1, 2, 2, 2],
        value=[1.0] * 5,
    )
    out = q_events_interarrival(sf).to_pandas()
    # gaps: user1 = [2 s]; user2 = [90 s, 30 s]. If the cross-user 2 h
    # gap leaked in, n would be 4 and every percentile would shift.
    # sorted [2, 30, 90], n=3: p50 idx (2*50)//100=1 -> 30; p90/p99
    # idx 1 -> 30 (the pinned lower-interpolation definition)
    assert out["n_gaps"].iloc[0] == 3
    assert out["p50_s"].iloc[0] == 30
    assert out["p99_s"].iloc[0] == 30


def test_dau_wau_rolling_window_and_gap_day(ray_session, tmp_path):
    """Planted span with a silent day: DAU zero-fills, WAU rolls the
    trailing 7 days, and a user active twice in one window counts
    once."""
    from swarm_ray.ops.relational import q_events_dau_wau
    d = lambda i, h=0: pd.Timestamp("2024-01-01") + pd.Timedelta(days=i, hours=h)
    # user 1 active days 0,1 (twice on day 1); user 2 active days 0, 3
    sf = _write_events(
        tmp_path,
        ts=[d(0), d(1), d(1, 5), d(0, 2), d(3)],
        event_id=[1, 2, 3, 10, 11],
        user_id=[1, 1, 1, 2, 2],
        value=[1.0] * 5,
    )
    out = (q_events_dau_wau(sf).to_pandas()
           .sort_values("day").reset_index(drop=True))
    assert out["day"].tolist() == ["2024-01-01", "2024-01-02",
                                   "2024-01-03", "2024-01-04"]
    assert out["dau"].tolist() == [2, 1, 0, 1]
    # WAU trailing 7d: day0 {1,2}; day1 {1,2}; day2 {1,2}; day3 {1,2}
    assert out["wau"].tolist() == [2, 2, 2, 2]
    assert out["stickiness_milli"].tolist() == [1000, 500, 0, 500]


def test_order_dist_zero_bucket(ray_session, tmp_path):
    """The Q13 zero-order bucket comes from the customer parquet FOOTER
    (never a read, never a join) — the synthetic sf tables have no
    order-less customers, so this path only runs here: 5 customers, 3
    with orders → a (0, 2) bucket must appear, and it must NOT appear
    when every customer has orders."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from swarm_ray.ops.relational import q_tpch_order_dist

    def write(sf, custkeys, order_custkeys):
        pq.write_table(pa.table({
            "c_custkey": pa.array(custkeys, type=pa.int64())}),
            sf / "customer.parquet")
        pq.write_table(pa.table({
            "o_orderkey": pa.array(range(len(order_custkeys)),
                                   type=pa.int64()),
            "o_custkey": pa.array(order_custkeys, type=pa.int64())}),
            sf / "orders.parquet")
        return str(sf)

    sf = tmp_path / "gap"
    sf.mkdir()
    out = q_tpch_order_dist(
        write(sf, [1, 2, 3, 4, 5], [1, 1, 2, 3, 3, 3])).to_pandas()
    assert out.set_index("n_orders")["n_custs"].to_dict() == {
        0: 2, 1: 1, 2: 1, 3: 1}

    sf2 = tmp_path / "full"
    sf2.mkdir()
    out2 = q_tpch_order_dist(write(sf2, [1, 2], [1, 2, 2])).to_pandas()
    assert 0 not in set(out2["n_orders"])
    assert out2.set_index("n_orders")["n_custs"].to_dict() == {1: 1, 2: 1}


def test_waiting_suppliers_quantifier_semantics(ray_session, tmp_path):
    """Q21's two quantifiers on crafted lineitems: a single-supplier
    order never counts (no 'other supplier' exists), a two-returner
    order never counts (the returner was not SOLE), and the sole
    returner in a multi-supplier order counts once per such order."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from swarm_ray.ops.relational import q_tpch_waiting_suppliers

    sf = tmp_path
    # order 1: supplier 7 alone, returned        -> excluded (solo)
    # order 2: suppliers 7, 8 both returned      -> excluded (2 returners)
    # order 3: suppliers 7 (R twice), 9 (clean)  -> supplier 7 counts once
    # order 4: suppliers 8 (R), 9 (clean)        -> supplier 8 counts
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2, 3, 3, 3, 4, 4], type=pa.int64()),
        "l_suppkey": pa.array([7, 7, 8, 7, 7, 9, 8, 9], type=pa.int64()),
        "l_returnflag": pa.array(
            ["R", "R", "R", "R", "R", "N", "R", "N"]),
    }), sf / "lineitem.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([7, 8, 9], type=pa.int64()),
        "s_name": pa.array(["s7", "s8", "s9"]),
    }), sf / "supplier.parquet")

    out = q_tpch_waiting_suppliers(str(sf))
    assert out.set_index("s_suppkey")["n_waits"].to_dict() == {7: 1, 8: 1}
    assert out.set_index("s_suppkey")["s_name"].to_dict() == {
        7: "s7", 8: "s8"}
