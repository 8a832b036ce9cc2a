"""Resume / lineage manifest (north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

The reference's resumability is skip-on-failure + rerun (run.py:27-39);
the engine formalizes it: every completed document writes a manifest row
(run_id, partition_id, doc_id, status, span_count, bucket, updated_at).
A restart anti-joins the input against completed doc_ids — only
unfinished work reruns. At production scale the manifest lives in an
Iceberg table (atomic snapshot commits); in this sandbox it is a
parquet directory appended per run, which preserves the same reader
semantics (append-only, idempotent by doc_id via the anti-join).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_pdf_parser_spark.schemas import MANIFEST


def manifest_rows(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-doc lineage rows from an extracted parser_output DataFrame.

    partition_id is captured with spark_partition_id() at write time —
    the lineage of which task produced each document.
    """
    return extracted.select(
        F.lit(run_id).alias("run_id"),
        F.spark_partition_id().alias("partition_id"),
        "doc_id",
        F.when(F.col("status") == "ok", "done").otherwise("failed").alias("status"),
        F.col("span_count").cast("long").alias("span_count"),
        (
            F.col("bucket") if "bucket" in extracted.columns else F.lit(None).cast("string")
        ).alias("bucket"),
        F.current_timestamp().alias("updated_at"),
    )


def append_manifest(extracted: DataFrame, manifest_path: str, run_id: str) -> None:
    manifest_rows(extracted, run_id).write.mode("append").parquet(manifest_path)


def completed_doc_ids(spark: SparkSession, manifest_path: str) -> DataFrame | None:
    if not os.path.exists(manifest_path):
        return None
    mf = spark.read.schema(MANIFEST).parquet(manifest_path)
    return mf.where(F.col("status") == "done").select("doc_id").distinct()


def resume_filter(
    documents: DataFrame, spark: SparkSession, manifest_path: str
) -> DataFrame:
    """Left-anti join input against completed docs — the restart path.

    The done-set is typically small relative to a fresh 100 TB run's
    input and md5-uniform on doc_id; AQE picks broadcast when it fits,
    else a shuffled anti-join on the uniform key.
    """
    done = completed_doc_ids(spark, manifest_path)
    if done is None:
        return documents
    return documents.join(done, on="doc_id", how="left_anti")


def partition_metrics(spark: SparkSession, manifest_path: str) -> DataFrame:
    """Per-partition lineage metrics: docs, failures, spans produced."""
    mf = spark.read.schema(MANIFEST).parquet(manifest_path)
    return mf.groupBy("run_id", "partition_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias("n_failed"),
        F.sum("span_count").alias("total_spans"),
    )
