#!/usr/bin/env python
"""Production entrypoint: spark-submit --py-files pipeline.zip run_extract_job.py

    spark-submit --master <cluster> \
        --py-files pipeline.zip \
        scripts/run_extract_job.py \
        --input  /data/documents          (parquet/Iceberg, input_hint shape
                                           OR flat docs with --spanize)
        --output /data/parser_output
        --manifest /data/manifest
        [--spanize]      derive spans from a flat documents table
        [--partitions N] override the skew repartition width
        [--run-id ID]    resume/lineage id (default: random)

Restart-safe: rerunning with the same --manifest skips completed docs
via the left-anti resume join (see plans/manifest.py).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--spanize", action="store_true")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--run-id", default=None)
    args = p.parse_args()

    spark = (
        SparkSession.builder.appName("azure-pdf-parser-spark-extract")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from azure_pdf_parser_spark.plans.extract import run_extract

    docs = spark.read.parquet(args.input)

    run_id = run_extract(
        spark,
        docs,
        output_path=args.output,
        manifest_path=args.manifest,
        run_id=args.run_id,
        num_partitions=args.partitions,
        spanize=args.spanize,
    )
    print(f"run_id={run_id}")
    spark.stop()


if __name__ == "__main__":
    main()
