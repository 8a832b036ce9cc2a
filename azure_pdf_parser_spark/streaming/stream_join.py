"""Stream-stream watermarked interval join: view→click attribution.

The canonical Structured Streaming join shape the batch `events_asof`
family cannot cover: BOTH sides arrive continuously, and each click
must pair with every view by the same user in the preceding
attribution window. Spark buffers both sides in state; the watermarks
plus the time-range join condition are what let it EVICT — a view
older than (other side's watermark − attribution window) can never
match a future click, so its state is dropped. Without the range
condition the state grows forever; this module exists to pin that
bounded-state contract (eviction is observable: a click arriving
beyond the allowance finds its view gone — tested).

Determinism: inner stream-stream joins emit exactly the relational
join of the drained inputs when no row is late past the watermark —
arrival order and micro-batch boundaries only affect WHEN a pair is
emitted, never WHETHER. The gate therefore replays the events table
with a far-behind watermark and must equal the plain SQL interval join
bit-for-bit.

Scale shape: state is hash-partitioned on the join key (user_id) —
the same one exchange per side a batch join would pay, amortized over
micro-batches; state size is bounded by (event rate × attribution
window), independent of stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from azure_pdf_parser_spark.streaming.stateful import read_event_stream

ATTRIBUTION_WINDOW_MIN = 360  # 6 h: the view→click attribution lookback


def attribution_join(
    clicks_src: DataFrame,
    views_src: DataFrame,
    watermark_delay: str,
    window_min: int = ATTRIBUTION_WINDOW_MIN,
) -> DataFrame:
    """(click_id, view_id, user_id, lag_seconds): every (click, view)
    pair by the same user with the view inside the preceding
    ``window_min`` minutes. Works identically on streaming and batch
    DataFrames (the gate's oracle is the batch run of this exact
    plan)."""
    clicks = (
        clicks_src.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark_delay)
    )
    views = (
        views_src.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark_delay)
    )
    return clicks.join(
        views,
        F.expr(
            f"""
            c_user = v_user
            AND view_ts <= click_ts
            AND view_ts >= click_ts - INTERVAL {window_min} MINUTES
            """
        ),
    ).select(
        "click_id",
        "view_id",
        F.col("c_user").alias("user_id"),
        (
            F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")
        ).cast("bigint").alias("lag_seconds"),
    )


def start_attribution_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark_delay: str,
    window_min: int = ATTRIBUTION_WINDOW_MIN,
) -> StreamingQuery:
    out = attribution_join(
        read_event_stream(spark, input_dir),
        read_event_stream(spark, input_dir),
        watermark_delay,
        window_min,
    )
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


ATTRIBUTION_SQL = f"""
SELECT c.event_id AS click_id,
       v.event_id AS view_id,
       c.user_id,
       CAST(date_diff('second', v.ts, c.ts) AS BIGINT) AS lag_seconds
FROM events c
JOIN events v
  ON c.user_id = v.user_id
 AND c.event_type = 'click' AND v.event_type = 'view'
 AND v.ts <= c.ts
 AND v.ts >= c.ts - INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES
"""
