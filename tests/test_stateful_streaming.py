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

        q = start_stateful_sessionize(spark, in_dir, out_dir, ckpt)
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
        q2 = start_stateful_sessionize(spark, in_dir, out_dir, ckpt)
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
