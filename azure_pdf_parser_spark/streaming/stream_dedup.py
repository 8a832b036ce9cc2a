"""Streaming exact deduplication: emit each distinct document content
exactly once, with state BOUNDED by a watermark.

The batch `dedup_exact` tier's streaming twin: a continuous ingest
pipeline must not re-admit content it has already passed through, and
its dedup state must not grow forever. `dropDuplicatesWithinWatermark`
keys the state on the content hash and expires entries once the
event-time watermark passes — the engineering trade is explicit: a
duplicate arriving later than the watermark allowance is re-emitted
(bounded memory buys bounded lookback, the standard crawl-ingest
contract).

Output rows are (content_md5, text): WINNER-INDEPENDENT by
construction — exact duplicates have identical text, so whichever
arrival the micro-batch scheduler happens to keep, the emitted row is
byte-identical. That is what makes the result comparable against a
deterministic batch/SQL oracle despite parallel, order-free arrival.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from azure_pdf_parser_spark.schemas import FLAT_DOCUMENTS


def read_document_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    # one file per micro-batch: the watermark only advances BETWEEN
    # micro-batches, so state expiry (and the re-admit contract) is only
    # observable when later-landing files form later batches
    return (
        spark.readStream.schema(FLAT_DOCUMENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def stream_dedup_exact(
    documents: DataFrame, watermark_delay: str = "1 hour"
) -> DataFrame:
    """distinct (content_md5, text) within the watermark lookback.

    Event time is the ingest timestamp derived deterministically from
    doc_id (the synthetic corpus' arrival clock); production ingest uses
    the landing time already present on the row.
    """
    # NULL text still has an identity: a NULL dedup key is silently
    # dropped by the stateful operator, so the key coalesces to a
    # sentinel distinct from md5('') — failed-parse docs dedup among
    # themselves instead of vanishing
    with_ts = documents.select(
        F.coalesce(F.md5("text"), F.lit("<null>")).alias("content_md5"),
        "text",
        # +1 day: an event exactly AT the initial watermark (epoch 0) is
        # late-dropped, so doc_id 0 needs headroom above it
        F.to_timestamp(F.from_unixtime(F.col("doc_id") + 86400)).alias("ingest_ts"),
    ).withWatermark("ingest_ts", watermark_delay)
    return with_ts.dropDuplicatesWithinWatermark(["content_md5"]).select(
        "content_md5", "text"
    )


def start_stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "1 hour",
) -> StreamingQuery:
    out = stream_dedup_exact(read_document_stream(spark, input_dir), watermark_delay)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
