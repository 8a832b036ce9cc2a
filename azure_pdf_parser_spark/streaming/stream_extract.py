"""Structured Streaming variant of the extraction pipeline.

The reference is batch-only (SURVEY.md §2.4) — its "streaming" is a
sequential CLI loop over a directory (reference run.py:148). The engine
formalizes continuous ingestion: new parquet files landing in a
directory are picked up by ``readStream``, flow through the SAME
narrow extraction expressions (spanize → strip → assemble are all
stateless per-row, so they are streaming-safe with no watermark), and
append to the output sink with exactly-once file-sink semantics via the
checkpoint location — the streaming twin of the batch manifest.

Because every transform is per-row (no aggregation), the stream runs
in append mode with no state store at all: at production scale this is
the cheapest possible continuous pipeline — each micro-batch is an
independent narrow scan→project job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from azure_pdf_parser_spark.operators.extract_spans import extract
from azure_pdf_parser_spark.schemas import FLAT_DOCUMENTS
from azure_pdf_parser_spark.sources.spanize import derive_spans


def read_document_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of flat documents (schema must be declared —
    streaming sources cannot infer)."""
    return (
        spark.readStream.schema(FLAT_DOCUMENTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def extract_stream(documents: DataFrame) -> DataFrame:
    """The streaming extraction: identical operators to the batch path."""
    return extract(derive_spans(documents))


def start_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the stream; ``available_now=True`` drains what exists and
    stops (the batch-parity mode used by tests and backfills)."""
    out = extract_stream(read_document_stream(spark, input_dir))
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
