"""Custom stateful streaming operators vs their batch twins.

The input events parquet is split into two time-ordered files so the
availableNow drain runs ≥2 micro-batches (maxFilesPerTrigger=1) — the
session state provably survives the state store between batches.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from tests.conftest import SF_DIR


def _split_events_by_time(spark, tmp: str) -> str:
    """Write events as two plain parquet FILES (the streaming file
    source does not recurse into Spark's output subdirectories):
    first/second half by ts — arrival order = event-time order, the
    operator's documented assumption."""
    import duckdb

    src = f"{SF_DIR}/events.parquet"
    mid = duckdb.sql(
        f"SELECT quantile_disc(ts, 0.5) FROM '{src}'"
    ).fetchone()[0]
    in_dir = os.path.join(tmp, "in")
    os.makedirs(in_dir)
    duckdb.sql(
        f"COPY (SELECT * FROM '{src}' WHERE ts <= TIMESTAMP '{mid}' ORDER BY ts, event_id) "
        f"TO '{in_dir}/f0.parquet' (FORMAT PARQUET)"
    )
    duckdb.sql(
        f"COPY (SELECT * FROM '{src}' WHERE ts > TIMESTAMP '{mid}' ORDER BY ts, event_id) "
        f"TO '{in_dir}/f1.parquet' (FORMAT PARQUET)"
    )
    return in_dir


def test_stateful_sessionize_emits_closed_prefix(spark):
    """Streamed closed sessions == batch sessions minus each user's
    final (still-open) session, matched on every output column."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from azure_pdf_parser_spark.operators.events import sessionize
    from azure_pdf_parser_spark.streaming.stateful import (
        start_stateful_sessionize,
    )

    with tempfile.TemporaryDirectory() as tmp:
        in_dir = _split_events_by_time(spark, tmp)
        out_dir, ckpt = f"{tmp}/out", f"{tmp}/ckpt"

        # huge watermark delay: idle expiry never fires here, so the
        # emitted set is exactly the closed-by-successor prefix
        q = start_stateful_sessionize(
            spark, in_dir, out_dir, ckpt, watermark_delay="3650 days"
        )
        q.awaitTermination(300)

        got = spark.read.parquet(out_dir).select(
            "user_id", "session_start", "n_events", "total_value"
        )

        batch = sessionize(spark.read.parquet(f"{SF_DIR}/events.parquet"))
        last = Window.partitionBy("user_id").orderBy(F.col("session_idx").desc())
        want = (
            batch.withColumn("rn", F.row_number().over(last))
            .where(F.col("rn") > 1)  # drop each user's final session
            .select("user_id", "session_start", "n_events", "total_value")
        )

        assert got.count() == want.count() > 0
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

        # restart from checkpoint with no new data: state replay adds nothing
        q2 = start_stateful_sessionize(
            spark, in_dir, out_dir, ckpt, watermark_delay="3650 days"
        )
        q2.awaitTermination(300)
        assert spark.read.parquet(out_dir).count() == want.count()


def test_stream_windowed_counts_match_batch_for_closed_windows(spark):
    """Every window the watermark closed must match the batch aggregate
    exactly (append mode emits once, values identical)."""
    from azure_pdf_parser_spark.operators.events import windowed_counts
    from azure_pdf_parser_spark.streaming.stateful import start_windowed_counts

    with tempfile.TemporaryDirectory() as tmp:
        in_dir = _split_events_by_time(spark, tmp)
        out_dir, ckpt = f"{tmp}/out", f"{tmp}/ckpt"

        q = start_windowed_counts(spark, in_dir, out_dir, ckpt)
        q.awaitTermination(300)

        got = spark.read.parquet(out_dir)
        want = windowed_counts(spark.read.parquet(f"{SF_DIR}/events.parquet"))

        n_got = got.count()
        assert n_got > 0
        # emitted (closed) windows are a subset of the batch result and
        # agree on every column
        joined = got.join(want, on=["event_type", "window_start", "n_events", "sum_value"])
        assert joined.count() == n_got


def test_sessionize_out_of_order_and_idle_expiry(spark):
    """EventTimeTimeout semantics: an out-of-order (late but within
    watermark) event folds into the open session without regressing its
    clock, and a session idle past gap + watermark is EMITTED by timeout
    and its state removed — the unbounded-state hazard of the round-1
    NoTimeout design."""
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from azure_pdf_parser_spark.streaming.stateful import (
        start_stateful_sessionize,
    )

    T0 = pd.Timestamp("2024-03-01 12:00:00")
    S = pd.Timedelta

    def write(path, rows):
        # (event_id, ts, user_id, value)
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["click"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(table, path)
        time.sleep(0.05)  # distinct mtimes → deterministic file order

    with tempfile.TemporaryDirectory() as tmp:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        os.makedirs(in_dir)
        write(f"{in_dir}/f0.parquet", [(1, T0, 1, 1.0), (2, T0 + S("60s"), 1, 2.0),
                                       (3, T0, 2, 9.0)])
        # out-of-order: 30s event arrives AFTER the 60s event was seen
        write(f"{in_dir}/f1.parquet", [(4, T0 + S("30s"), 1, 4.0)])
        # closes user 1's first session by gap (1800s)
        write(f"{in_dir}/f2.parquet", [(5, T0 + S("3h"), 1, 5.0)])
        # watermark advances past user 2's last + gap → idle expiry
        write(f"{in_dir}/f3.parquet", [(6, T0 + S("30d"), 3, 6.0)])
        # one more batch so f3's watermark gets applied to timeouts
        write(f"{in_dir}/f4.parquet", [(7, T0 + S("31d"), 3, 7.0)])

        q = start_stateful_sessionize(
            spark, in_dir, out_dir, ckpt, watermark_delay="10 minutes"
        )
        assert q.awaitTermination(300)

        rows = {
            (r.user_id, r.session_start): (r.n_events, r.total_value)
            for r in spark.read.parquet(out_dir).collect()
        }
        # user 1 session 1: events at T0, T0+60s, and the FOLDED late
        # T0+30s event → n=3, total=7.0, start unchanged
        assert rows[(1, "2024-03-01 12:00:00")] == (3, 7.0)
        # user 2's only session never saw a successor — emitted by
        # EventTimeTimeout expiry, not by a closing event
        assert rows[(2, "2024-03-01 12:00:00")] == (1, 9.0)
        # user 1's second session expired the same way
        assert rows[(1, "2024-03-01 15:00:00")] == (1, 5.0)
        # user 3's first session closed by its 31d successor
        assert rows[(3, "2024-03-31 12:00:00")] == (1, 6.0)
