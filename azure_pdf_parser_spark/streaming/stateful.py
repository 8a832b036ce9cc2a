"""Custom stateful streaming operators.

The reference is batch-only (SURVEY.md §2.4); the engine adds the two
canonical streaming shapes a production event pipeline needs:

* ``stream_windowed_counts`` — the watermarked streaming twin of the
  batch tumbling-window aggregation (operators/events.py). Identical
  groupBy(window(...)); the watermark bounds state and closes windows,
  append mode emits each window exactly once.
* ``stateful_sessionize`` — gap-based sessionization as a CUSTOM
  stateful operator via ``applyInPandasWithState``: per-user session
  state (start, last-seen, count, sum) lives in the state store across
  micro-batches; a session closes — and is emitted — when a later event
  arrives past the gap. This is the engine's
  template for operators Structured Streaming lacks natively.

Scale notes: state is keyed by user_id (high cardinality, uniform);
each micro-batch shuffles only its own rows to the state partitions.
State is BOUNDED by EventTimeTimeout: when the watermark passes an open
session's last event + gap, the session is emitted and its state
removed — without this, every user who stops clicking would live in
the state store forever. Late data tolerance: events older than the
watermark are dropped by Spark before the UDF; events newer than the
watermark but older than the session's last-seen (cross-batch
disorder) fold into the open session without regressing its clock.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_SECONDS = 1800

# matches /root/testdata/sf*/events.parquet
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# state: open session per user — (start_us, last_us, n_events, total_value)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def stream_windowed_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of operators/events.windowed_counts: same groupBy,
    plus the watermark that lets append mode close windows and bound
    state. Emitted rows carry the identical column contract."""
    w = F.window("ts", "1 hour")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("event_type"), w.alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def _emit(user_id, sessions) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [
                pd.Timestamp(s, unit="us").strftime("%Y-%m-%d %H:%M:%S")
                for s, _, _ in sessions
            ],
            "n_events": [c for _, c, _ in sessions],
            "total_value": [round(tv, 6) for _, _, tv in sessions],
        }
    )


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        # watermark passed last_seen + gap with no successor: the idle
        # session expires — emit it and free the state slot
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield _emit(user_id, [(start_us, n, total)])
            return

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()  # ns → µs
        values = rows["value"].tolist()

        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = None
            n, total = 0, 0.0

        closed = []
        for t, v in zip(ts_us, values):
            if start_us is None:
                start_us, last_us, n, total = t, t, 1, float(v)
            elif t <= last_us:
                # cross-batch disorder (late but above the watermark, or
                # a duplicate timestamp): fold into the open session
                # without regressing its clock
                start_us = min(start_us, t)
                n, total = n + 1, total + float(v)
            elif t - last_us > gap_us:
                closed.append((start_us, n, total))
                start_us, last_us, n, total = t, t, 1, float(v)
            else:
                last_us, n, total = t, n + 1, total + float(v)

        state.update((start_us, last_us, n, total))
        # expire the open session when the watermark passes last + gap;
        # the timestamp must stay above the current watermark or Spark
        # rejects it (can happen when a whole batch is late-but-allowed)
        timeout_ms = max(
            last_us // 1000 + gap_seconds * 1000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield _emit(user_id, closed)

    return fn


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator.

    Emits a session row when it CLOSES — either a later event past the
    gap arrives, or the event-time watermark passes its last event +
    gap (idle expiry via EventTimeTimeout, which also bounds the state
    store). ``watermark_delay`` is the late-data allowance: events that
    far behind the max seen event time are dropped by Spark; anything
    newer folds into the open session even if it arrives out of order.
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def start_stateful_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark_delay: str = "1 hour",
) -> StreamingQuery:
    out = stateful_sessionize(
        read_event_stream(spark, input_dir), gap_seconds, watermark_delay
    )
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> StreamingQuery:
    out = stream_windowed_counts(read_event_stream(spark, input_dir), watermark)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
