"""S3 analog: read real AnalyzeResult JSON into the layout IR.

The reference pins its semantics to golden fixtures —
tests/data/sample-one-page.json (50 paragraphs, 2 tables, 1 page) and
sample-sixteen-page.json (230 paragraphs with the role histogram
212 null / 5 pageFooter / 5 pageNumber / 5 title / 2 pageHeader /
1 sectionHeading, 1 table, 16 pages) — loaded by its
tests/conftest.py:70-80. This source reads those exact files with
``spark.read.json`` under the engine's layout-IR schema, so the O3–O14
chain runs against REAL Azure Document Intelligence output rather than
only the synthetic derivation.

Each file holds a top-level JSON array of AnalyzeResults; multiLine
mode turns each element into a row, and the explicit schema prunes the
keys the merge deliberately drops (content, languages, styles,
key_value_pairs, documents — reference utils.py:81-114) plus the page
fields outside the IR (angle, unit, lines, words, …).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from azure_pdf_parser_spark.schemas import LAYOUT_BATCH

# the AnalyzeResult element schema = LAYOUT_BATCH minus the batch bookkeeping
_ANALYZE_RESULT = StructType(
    [f for f in LAYOUT_BATCH.fields if f.name in
     ("api_version", "model_id", "paragraphs", "tables", "pages")]
)


def read_analyze_results(spark: SparkSession, path: str) -> DataFrame:
    """AnalyzeResult JSON file(s) → LAYOUT_BATCH rows.

    One batch per result (batch_number 0, page_range (1, n_pages)):
    a stored golden result is a complete single analysis, exactly what
    the reference's one-shot (non-split) path produces. doc_id is the
    source file's basename. Scale shape: the JSON scan is splittable
    per file and the projection is narrow; at volume these rows land in
    the same merge/assemble chain as the parse stage's output.
    """
    raw = spark.read.option("multiLine", "true").schema(_ANALYZE_RESULT).json(path)
    file_name = F.element_at(F.split(F.input_file_name(), "/"), -1)
    doc_id = F.regexp_replace(file_name, r"\.json$", "")
    return raw.select(
        doc_id.alias("doc_id"),
        F.lit(0).cast("int").alias("batch_number"),
        F.struct(
            F.lit(1).cast("int").alias("first"),
            F.size("pages").cast("int").alias("last"),
        ).alias("page_range"),
        "api_version",
        "model_id",
        "paragraphs",
        "tables",
        "pages",
    )
