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
