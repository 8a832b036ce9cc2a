"""Table loaders (S1/S3 analogs).

The reference scans a directory of PDFs sequentially
(reference: src/azure_pdf_parser/run.py:148-150); the engine reads
columnar tables. Primary input is the ``documents`` table; at production
scale this is an Iceberg table — in this sandbox, parquet under
``/root/testdata/sf*/``. Only the columns a query needs are selected so
Catalyst pushes projection/filters into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)


def load_binary_documents(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Raw-file source for the byte-parse path (S1 analog for raw files).

    Reference globs ``*.pdf`` and uses the filename stem as doc id
    (run.py:148-150, :165); here ``binaryFile`` + ``regexp_extract`` on
    the path does the same, distributed.
    """
    from pyspark.sql import functions as F

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return df.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.[A-Za-z0-9]+$", 1).alias("doc_id"),
        F.when(F.col("path").rlike(r"(?i)\.pdf$"), F.lit("application/pdf"))
        .otherwise(F.lit("text/html"))
        .alias("content_type"),
        F.col("content"),
    )
