"""Resume manifest: restart skips completed docs; lineage metrics add up."""

from __future__ import annotations

import tempfile

from tests.conftest import SF_DIR


def test_run_extract_and_resume(spark):
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.plans import manifest as mf
    from azure_pdf_parser_spark.plans.extract import run_extract
    from azure_pdf_parser_spark.sources.spanize import derive_spans
    from azure_pdf_parser_spark.sources.tables import load_table

    docs = derive_spans(load_table(spark, SF_DIR, "documents"))
    n_total = docs.count()
    half_a = docs.where(F.col("doc_id").cast("long") % 2 == 0)
    half_b = docs.where(F.col("doc_id").cast("long") % 2 == 1)

    with tempfile.TemporaryDirectory() as tmp:
        out, man = f"{tmp}/out.parquet", f"{tmp}/manifest.parquet"

        # run 1: only even docs
        run_extract(spark, half_a, out, man, run_id="run1")
        done1 = mf.completed_doc_ids(spark, man).count()
        assert done1 == half_a.count()

        # run 2 gets the FULL input but must only process the odd half
        todo = mf.resume_filter(docs, spark, man)
        assert todo.count() == half_b.count()
        run_extract(spark, docs, out, man, run_id="run2")

        written = spark.read.parquet(out)
        assert written.count() == n_total
        assert written.select("doc_id").distinct().count() == n_total

        # per-partition lineage metrics cover every doc, spans add up
        metrics = mf.partition_metrics(spark, man)
        totals = metrics.agg(
            F.sum("n_docs").alias("docs"), F.sum("total_spans").alias("spans")
        ).collect()[0]
        assert totals["docs"] == n_total
        span_total = written.agg(F.sum("span_count")).collect()[0][0]
        assert totals["spans"] == span_total

        # manifest rows carry the skew bucket
        buckets = {
            r["bucket"]
            for r in spark.read.parquet(man).select("bucket").distinct().collect()
        }
        assert buckets and None not in buckets


def test_skew_partitioning_spreads_buckets(spark):
    from pyspark.sql import functions as F

    from azure_pdf_parser_spark.plans.extract import with_skew_partitioning
    from azure_pdf_parser_spark.sources.spanize import derive_spans
    from azure_pdf_parser_spark.sources.tables import load_table

    docs = derive_spans(load_table(spark, SF_DIR, "documents"))
    parted = with_skew_partitioning(docs, num_partitions=8)
    sizes = (
        parted.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    # deterministic salt must spread rows: no partition owns >40% of rows
    assert max(counts) / sum(counts) < 0.4
