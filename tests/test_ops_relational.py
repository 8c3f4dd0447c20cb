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
