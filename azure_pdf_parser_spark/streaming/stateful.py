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
The sessionizer assumes micro-batches arrive in event-time order per
key (file source with time-ordered landing, or a watermark-sorted
upstream); events within a batch are sorted inside the UDF, so
intra-batch disorder is handled.
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


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
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
            elif t - last_us > gap_us:
                closed.append((start_us, n, total))
                start_us, last_us, n, total = t, t, 1, float(v)
            else:
                last_us, n, total = t, n + 1, total + float(v)

        state.update((start_us, last_us, n, total))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us").strftime("%Y-%m-%d %H:%M:%S")
                        for s, _, _ in closed
                    ],
                    "n_events": [c for _, c, _ in closed],
                    "total_value": [round(tv, 6) for _, _, tv in closed],
                }
            )

    return fn


def stateful_sessionize(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator.

    Emits a session row the moment it CLOSES (a later event past the
    gap); the open session per user persists in the state store between
    micro-batches. Semantics mirror operators/events.sessionize — the
    batch plan emits every session including still-open ones, the
    stream emits the closed prefix (the tests pin exactly that
    relationship).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def start_stateful_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> StreamingQuery:
    out = stateful_sessionize(read_event_stream(spark, input_dir), gap_seconds)
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
