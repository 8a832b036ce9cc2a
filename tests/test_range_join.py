"""Bucketed interval join + key-skew profile edge semantics.

The registry gate (events_range_join / skew_profile vs DuckDB) covers
the bulk distribution; these tests pin the boundary rules the bucketing
must not break: window-edge inclusion/exclusion, epoch-boundary pairs,
and no duplicate emission from the 2× click fan-out.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.events import (
    range_join_clicks_before_purchase,
)
from azure_pdf_parser_spark.operators.profile import key_skew_profile

_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"


def _ev(eid, ts, uid, etype):
    return (eid, dt.datetime.fromisoformat(ts), uid, etype, 0.0, "")


def test_range_join_boundaries(spark):
    w = 1800  # seconds
    rows = [
        # purchase at 10:00:00
        _ev(1, "2024-01-01 10:00:00", 7, "purchase"),
        # click exactly W before: ts == p.ts − W → INCLUDED (>= lower)
        _ev(2, "2024-01-01 09:30:00", 7, "click"),
        # click 1 µs inside the lower edge
        _ev(3, "2024-01-01 09:30:00.000001", 7, "click"),
        # click at p.ts exactly → EXCLUDED (strict <)
        _ev(4, "2024-01-01 10:00:00", 7, "click"),
        # click after the purchase → excluded
        _ev(5, "2024-01-01 10:00:01", 7, "click"),
        # click W+1 µs before → excluded
        _ev(6, "2024-01-01 09:29:59.999999", 7, "click"),
        # same times, different user → excluded
        _ev(7, "2024-01-01 09:45:00", 8, "click"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = range_join_clicks_before_purchase(df, window_seconds=w)
    got = {
        (r.purchase_event_id, r.click_event_id, r.gap_us)
        for r in out.collect()
    }
    assert got == {
        (1, 2, w * 1_000_000),
        (1, 3, w * 1_000_000 - 1),
    }


def test_range_join_epoch_straddle_no_duplicates(spark):
    """A (purchase, click) pair that straddles an epoch boundary matches
    exactly once: the click's 2-key fan-out and the purchase's single
    epoch key intersect in one bucket."""
    w = 1800
    rows = [
        # epoch boundary at each multiple of 1800 s from the NTZ epoch;
        # 10:30:00 is a boundary. Purchase just after, click just before.
        _ev(1, "2024-01-01 10:30:01", 7, "purchase"),
        _ev(2, "2024-01-01 10:29:59", 7, "click"),
        # and a same-epoch pair
        _ev(3, "2024-01-01 10:31:00", 7, "purchase"),
        _ev(4, "2024-01-01 10:30:30", 7, "click"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = range_join_clicks_before_purchase(df, window_seconds=w).collect()
    pairs = [(r.purchase_event_id, r.click_event_id) for r in out]
    assert sorted(pairs) == [(1, 2), (3, 2), (3, 4)]
    assert len(pairs) == len(set(pairs)), "duplicate pair emission"


def test_range_join_is_equi_join_plan(spark):
    """The physical plan must contain NO cartesian/broadcast-nested-loop
    node: the range predicate rides an equi-join on (user, epoch)."""
    df = spark.createDataFrame(
        [_ev(1, "2024-01-01 10:00:00", 7, "purchase")], _SCHEMA
    )
    plan = (
        range_join_clicks_before_purchase(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_key_skew_profile_flags_hot_key(spark):
    # 1 user with 60 events, 20 users with 2 each → mean = 100/21 ≈ 4.76;
    # hot threshold 2×mean ≈ 9.5 → exactly one hot key
    rows = []
    eid = 0
    for _ in range(60):
        eid += 1
        rows.append(_ev(eid, "2024-01-01 10:00:00", 999, "click"))
    for u in range(20):
        for _ in range(2):
            eid += 1
            rows.append(_ev(eid, "2024-01-01 10:00:00", u, "view"))
    df = spark.createDataFrame(rows, _SCHEMA)
    row = key_skew_profile(df, "user_id").collect()[0]
    assert row.n_rows == 100
    assert row.n_keys == 21
    assert row.max_cnt == 60
    assert row.p50_cnt == 2
    assert row.p99_cnt == 60
    assert row.top_share_ppm == 600_000
    assert row.skew_x1000 == 60 * 21 * 1000 // 100
    assert row.hot_keys == 1


def test_key_skew_profile_uniform_keys(spark):
    rows = [
        _ev(10 * u + i, "2024-01-01 10:00:00", u, "view")
        for u in range(8)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    row = key_skew_profile(df, "user_id").collect()[0]
    assert (row.n_rows, row.n_keys, row.max_cnt) == (40, 8, 5)
    assert row.p50_cnt == row.p99_cnt == 5
    assert row.skew_x1000 == 1000  # perfectly uniform → ratio 1.0
    assert row.hot_keys == 0
