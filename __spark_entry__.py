"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship main-content extraction over the
sf0.001 documents table; ``queries()``/``oracle_sql()`` expose the
paired Spark/DuckDB implementations from
``azure_pdf_parser_spark.plans.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from azure_pdf_parser_spark.operators.extract_spans import extract
    from azure_pdf_parser_spark.sources.spanize import derive_spans
    from azure_pdf_parser_spark.sources.tables import load_table

    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    return extract(derive_spans(docs))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from azure_pdf_parser_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from azure_pdf_parser_spark.plans.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
