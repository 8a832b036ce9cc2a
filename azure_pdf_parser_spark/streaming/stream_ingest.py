"""Continuous ingest with the atomic run-commit protocol: exactly-once
OUTPUT per micro-batch, resumable at the doc level across restarts.

``stream_extract.py`` demonstrates streaming/batch operator parity with
the built-in parquet sink; this module is the production ingest shape:
each micro-batch runs the SAME committed-run protocol as the batch job
(``plans/extract.run_extract`` — run-scoped output dir, manifest
lineage append, single marker rename), driven from ``foreachBatch``.

Exactly-once argument (the reference's analog is skip-on-failure +
rerun, reference run.py:27-39 — per-process, not crash-safe):

* Structured Streaming replays a failed micro-batch with the SAME
  ``batch_id``; run_id is a pure function of batch_id, so a replay
  targets the same run.
* If the replayed run's marker already exists the batch is skipped —
  the crash was after publish, and re-extracting would double-write.
* Otherwise any orphaned output dir from the crashed attempt is
  reclaimed before re-running, so the committed view contains every
  document exactly once no matter where the crash landed.
* A doc re-delivered in a LATER batch (duplicate input file, backfill
  overlap) is dropped by ``run_extract``'s resume anti-join against the
  committed manifest — ingest is idempotent at doc granularity, not
  just batch granularity.

One documented at-least-once corner stays in parquet-dir mode: a crash
BETWEEN the manifest append and the marker rename replays the batch and
re-appends that run's lineage rows. Output stays exactly-once (the run
dir is reclaimed and rewritten; readers see committed runs only) and
``completed_doc_ids`` is distinct-by-construction; only raw lineage-row
counts for that run can double. The Iceberg deployment of the same seam
collapses manifest append + marker into one snapshot commit and closes
the corner entirely (sinks/table_format.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from azure_pdf_parser_spark.plans import manifest as mf
from azure_pdf_parser_spark.plans.extract import run_extract
from azure_pdf_parser_spark.streaming.stream_extract import read_document_stream


def stream_run_id(batch_id: int) -> str:
    """Deterministic run id per micro-batch — replays target the same
    run, which is what makes the marker check idempotent."""
    return f"stream{batch_id:08d}"


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    output_path: str,
    manifest_path: str,
    num_partitions: int | None = None,
) -> str | None:
    """Commit one micro-batch under the atomic run protocol. Returns
    the run_id, or None when the batch was already published (replay
    after a post-commit crash)."""
    run_id = stream_run_id(batch_id)
    if run_id in mf.committed_run_ids(manifest_path):
        return None
    # reclaim the orphan of a crashed attempt of this same batch before
    # re-writing (run_extract's sink uses mode="error" on purpose — an
    # unexpected collision on a FRESH run_id must fail loudly)
    shutil.rmtree(
        os.path.join(output_path, f"run_id={run_id}"), ignore_errors=True
    )
    return run_extract(
        spark,
        batch_df,
        output_path,
        manifest_path,
        run_id=run_id,
        num_partitions=num_partitions,
        spanize=True,
    )


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    manifest_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    num_partitions: int | None = None,
) -> StreamingQuery:
    """Run the committed-run ingest over a file-source document stream.

    ``available_now=True`` drains the backlog and stops (backfill /
    test mode); ``False`` tails the directory continuously. Read the
    result with ``plans.manifest.read_parser_output`` — never the raw
    output dir, which may hold invisible uncommitted orphans.
    """

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark,
            batch_df,
            batch_id,
            output_path,
            manifest_path,
            num_partitions=num_partitions,
        )

    writer = (
        read_document_stream(spark, input_dir)
        .writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
