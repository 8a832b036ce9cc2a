"""Parallelism-shaping helpers shared by operators and plans.

The skew/bucket partitioning used by the extract job lives in
``plans/extract.py``; this module holds the one helper that individual
operators also need — widening an under-parallel scan before CPU-heavy
per-row derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_compute(
    df: DataFrame, num_partitions: int | None = None, key: str = "doc_id"
) -> DataFrame:
    """Widen a NARROW scan before CPU-heavy per-row derivation, only
    when the scan is under-parallel (fewer input splits than cores).

    A small input (one parquet file, a handful of splits) otherwise
    pins the whole derivation stage to one task on an idle cluster —
    the map-side analog of the skew problem. At production scale the
    scan has thousands of splits and this is a NO-OP (the conditional
    never fires), so no shuffle is added where the read is already
    parallel; repartitioning is on the unique ``key`` (doc_id), the
    finest skew-free spread.
    """
    if df.isStreaming:
        # micro-batch parallelism is the source's concern (maxFilesPerTrigger
        # etc.); .rdd is unsupported on a streaming frame anyway
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(num_partitions or sc.defaultParallelism * 2, key)
