"""Stream-stream attribution join: bounded-state semantics.

The gate (stream_attribution_join) pins batch parity with a far-behind
watermark; these tests pin what the watermark BUYS: view state is
evicted once the watermark passes the attribution window, and a click
arriving later than the watermark allowance is late-dropped — bounded
state instead of a forever-growing join buffer.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(path, rows):
    # EVENTS shape: (event_id, ts_offset_minutes, user_id, event_type)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_T0 + dt.timedelta(minutes=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, path)
    time.sleep(0.05)  # distinct mtimes → deterministic file pickup order


def test_attribution_matches_inside_window_and_drops_late_clicks(spark):
    from azure_pdf_parser_spark.streaming.stream_join import (
        start_attribution_stream,
    )

    DAY = 24 * 60
    with tempfile.TemporaryDirectory() as tmp:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        os.makedirs(in_dir)
        # t=0: user 1 views
        _write(f"{in_dir}/f0.parquet", [(1, 0, 1, "view")])
        # t=+60min: user 1 clicks — inside the 6 h window → pair emitted
        _write(f"{in_dir}/f1.parquet", [(2, 60, 1, "click")])
        # t=+2 days: unrelated users advance the watermark on BOTH
        # sides (the eviction watermark is the global min across all
        # watermark operators) far past view 1's eviction bound
        # (wm − 6 h window); user 2 never clicks, user 3 never views
        _write(
            f"{in_dir}/f2.parquet",
            [(3, 2 * DAY, 2, "view"), (6, 2 * DAY, 3, "click")],
        )
        # spacer: eviction runs at batch commit
        _write(
            f"{in_dir}/f3.parquet",
            [(4, 2 * DAY + 1, 2, "view"), (7, 2 * DAY + 1, 3, "click")],
        )
        # a click stamped back at t=+2h — inside view 1's window, but
        # LATE past the watermark → dropped, no pair (bounded state)
        _write(f"{in_dir}/f4.parquet", [(5, 120, 1, "click")])

        q = start_attribution_stream(
            spark, in_dir, out_dir, ckpt, watermark_delay="10 minutes"
        )
        assert q.awaitTermination(300)

        pairs = sorted(
            (r.click_id, r.view_id, r.lag_seconds)
            for r in spark.read.parquet(out_dir).collect()
        )
        assert pairs == [(2, 1, 3600)], pairs
