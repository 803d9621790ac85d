"""Distributed as-of join: hand-constructed matches, ties, and drops."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from yomitoku_ray.functions.relational import events_asof_orders

US_PER_H = 3_600_000_000


def _ts(hours):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(hours=hours)


def test_asof_semantics(ray_session, tmp_path):
    events = [
        {"event_id": 1, "user_id": 10, "ts": _ts(5)},   # orders at h1, h3 -> h3
        {"event_id": 2, "user_id": 10, "ts": _ts(1)},   # exactly at h1 -> h1 (<=)
        {"event_id": 3, "user_id": 10, "ts": _ts(0)},   # before all -> dropped
        {"event_id": 4, "user_id": 20, "ts": _ts(9)},   # tie orders at h2 -> h2
        {"event_id": 5, "user_id": 30, "ts": _ts(9)},   # no orders -> dropped
    ]
    orders = [
        {"o_custkey": 10, "o_orderdate": _ts(1)},
        {"o_custkey": 10, "o_orderdate": _ts(3)},
        {"o_custkey": 20, "o_orderdate": _ts(2)},
        {"o_custkey": 20, "o_orderdate": _ts(2)},  # duplicate timestamp (tie)
    ]
    pq.write_table(pa.Table.from_pylist(events), str(tmp_path / "events.parquet"))
    pq.write_table(pa.Table.from_pylist(orders), str(tmp_path / "orders.parquet"))

    out = (
        events_asof_orders(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .set_index("event_id")
    )
    assert list(out.index) == [1, 2, 4]  # 3 and 5 dropped (no prior order)
    base = _ts(0).value // 1000  # pandas .value is ns; our columns are us
    assert out.loc[1, "order_t_us"] == base + 3 * US_PER_H
    assert out.loc[1, "lag_hours"] == 2
    assert out.loc[2, "order_t_us"] == base + 1 * US_PER_H
    assert out.loc[2, "lag_hours"] == 0
    assert out.loc[4, "order_t_us"] == base + 2 * US_PER_H  # tie-safe: the time
    assert out.loc[4, "lag_hours"] == 7


def test_range_self_join_band(ray_session, tmp_path):
    from yomitoku_ray.functions.relational import events_close_pairs

    events = [
        {"event_id": 1, "user_id": 10, "ts": _ts(0)},
        {"event_id": 2, "user_id": 10, "ts": _ts(0)},            # tie with 1
        {"event_id": 3, "user_id": 10, "ts": _ts(0.05)},          # 3 min after
        {"event_id": 4, "user_id": 10, "ts": _ts(1)},             # out of band
        {"event_id": 5, "user_id": 20, "ts": _ts(0.04)},          # other user
    ]
    pq.write_table(pa.Table.from_pylist(events), str(tmp_path / "events.parquet"))
    out = (
        events_close_pairs(str(tmp_path), max_gap_minutes=5)
        .to_pandas()
        .sort_values(["event_a", "event_b"])
        .reset_index(drop=True)
    )
    got = list(zip(out["event_a"], out["event_b"], out["gap_seconds"]))
    assert got == [(1, 2, 0), (1, 3, 180), (2, 3, 180)]


def test_events_funnel_manual(ray_session, tmp_path):
    """Hand-built funnel: conversion inside/outside the window, purchase
    before view ignored, sub-second floor semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    from yomitoku_ray.functions.relational import events_funnel

    T = pd.Timestamp("2024-01-01 00:00:00")
    s = pd.Timedelta(seconds=1)
    rows = [
        # u1: view then purchase 90s later -> converted, 90
        {"event_id": 1, "ts": T, "user_id": 1, "event_type": "view"},
        {"event_id": 2, "ts": T + 90 * s, "user_id": 1, "event_type": "purchase"},
        # u2: purchase BEFORE the first view only -> not converted
        {"event_id": 3, "ts": T, "user_id": 2, "event_type": "purchase"},
        {"event_id": 4, "ts": T + s, "user_id": 2, "event_type": "view"},
        # u3: purchase outside the 60-min window -> not converted
        {"event_id": 5, "ts": T, "user_id": 3, "event_type": "view"},
        {"event_id": 6, "ts": T + 3601 * s, "user_id": 3, "event_type": "purchase"},
        # u4: two views; funnel anchors on the FIRST; sub-second convert -> 0
        {"event_id": 7, "ts": T, "user_id": 4, "event_type": "view"},
        {"event_id": 8, "ts": T + 30 * s, "user_id": 4, "event_type": "view"},
        {"event_id": 9, "ts": T + pd.Timedelta(microseconds=900_000), "user_id": 4,
         "event_type": "purchase"},
        # u5: no view at all -> no row
        {"event_id": 10, "ts": T, "user_id": 5, "event_type": "purchase"},
    ]
    df = pd.DataFrame(rows)
    df["value"] = 0.0
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = events_funnel(str(tmp_path)).set_index("user_id")
    assert list(out.index) == [1, 2, 3, 4]
    assert out.loc[1, "converted"] == 1 and out.loc[1, "secs_to_convert"] == 90
    assert out.loc[2, "converted"] == 0 and out.loc[2, "secs_to_convert"] == -1
    assert out.loc[3, "converted"] == 0
    assert out.loc[4, "converted"] == 1 and out.loc[4, "secs_to_convert"] == 0


def test_events_retention_manual(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    from yomitoku_ray.functions.relational import events_retention

    D = pd.Timestamp("2024-03-01")
    day = pd.Timedelta(days=1)
    rows = []
    # u1: cohort day0, active day0 (twice -> dedup), day2
    rows += [
        {"event_id": 1, "ts": D, "user_id": 1},
        {"event_id": 2, "ts": D + pd.Timedelta(hours=5), "user_id": 1},
        {"event_id": 3, "ts": D + 2 * day, "user_id": 1},
    ]
    # u2: cohort day0, active only day0
    rows += [{"event_id": 4, "ts": D + pd.Timedelta(hours=23), "user_id": 2}]
    # u3: cohort day1, active day1 and day9 (outside max_offset 7 -> dropped)
    rows += [
        {"event_id": 5, "ts": D + day, "user_id": 3},
        {"event_id": 6, "ts": D + 9 * day, "user_id": 3},
    ]
    df = pd.DataFrame(rows)
    df["event_type"] = "view"
    df["value"] = 0.0
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = events_retention(str(tmp_path))
    got = {(r.cohort_day, r.day_offset): r.n_users for r in out.itertuples()}
    assert got == {
        (D, 0): 2,        # u1 + u2 on their first day
        (D, 2): 1,        # u1 returns on day 2
        (D + day, 0): 1,  # u3 cohort day1
    }
