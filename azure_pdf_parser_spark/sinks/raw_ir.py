"""K2: raw intermediate-representation sink (replay/debug).

The reference optionally persists the raw Azure AnalyzeResult next to
its parsed output (``save_raw_azure_response``, reference run.py:97,
:157-158 — ``{stem}_raw.json`` per doc) so a layout change can be
re-derived without re-paying the API call. The engine's analog persists
the LAYOUT_BATCH IR — the pre-merge, pre-assembly per-batch layout rows
— as parquet; ``replay`` feeds them back through the identical
merge→assemble chain, so any downstream semantic change re-runs from
the IR without re-running the parse stage (the expensive part at
100 TB: the mapInPandas decode).

Parquet, not JSON: the IR carries nested arrays of structs (paragraphs,
tables, pages) where columnar encoding + column pruning matter — a
debug replay that only inspects page metadata reads only that column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_pdf_parser_spark.schemas import LAYOUT_BATCH


def write_raw_ir(batches: DataFrame, path: str, mode: str = "error") -> None:
    """Persist LAYOUT_BATCH rows. The write is run-scoped by the caller
    (plans/manifest.py commit protocol) when used inside a job."""
    batches.write.mode(mode).parquet(path)


def read_raw_ir(spark: SparkSession, path: str) -> DataFrame:
    """Explicit-schema read — no inference pass over a 100 TB IR."""
    return spark.read.schema(LAYOUT_BATCH).parquet(path)


def replay(spark: SparkSession, path: str, **assemble_kwargs) -> DataFrame:
    """IR → merged → assembled ParserOutput, identical to the live chain."""
    from azure_pdf_parser_spark.operators.batching import merge_batches
    from azure_pdf_parser_spark.operators.layout import assemble

    return assemble(merge_batches(read_raw_ir(spark, path)), **assemble_kwargs)
