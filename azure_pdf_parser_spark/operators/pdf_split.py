"""O1 on raw bytes: PDF page-batch split + split→parse→merge chain.

The reference re-serializes oversized PDFs into ≤50-page standalone
PDFs, analyzes each independently, and merges in batch order (reference
src/azure_pdf_parser/utils.py:117-163, pinned by tests/test_utils.py:
185-230). Round 1 had the batch *math* (operators/batching.py) but
parsed whole PDFs as one Python unit inside mapInPandas — a 5,000-page
PDF was exactly the invisible-to-AQE compute skew SURVEY §7.4.4 warns
about. This module splits the BYTES, so the unit of parallelism is the
batch row:

  split (mapInPandas, narrow)
    → repartition on (doc_id, batch_number)   [the skew-breaker shuffle]
    → parse per batch (mapInPandas, narrow)
    → ordered merge (one groupBy/window on doc_id)

Invariant (north rule): the merged span sequence equals parsing the
whole PDF in one unit on (kind, text, media_ref, order). Byte offsets
are per-batch streams and deliberately NOT part of the invariant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT_SCHEMA = (
    "doc_id string, batch_number int, first_page int, last_page int, "
    "content_type string, content binary, status string, error string"
)

DEFAULT_BATCH_SIZE = 50  # reference utils.py:15


def split_pdf_pages(raw: DataFrame, batch_size: int = DEFAULT_BATCH_SIZE) -> DataFrame:
    """(doc_id, content_type, content) → one row per ≤batch_size-page
    standalone sub-PDF. Narrow (no shuffle); failures quarantine as
    status='failed' rows, the task survives."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from azure_pdf_parser_spark.functions.pdf import split_pdf

        cols = [
            "doc_id", "batch_number", "first_page", "last_page",
            "content_type", "content", "status", "error",
        ]
        for b in batches:
            out = []
            for doc_id, ctype, content in zip(
                b["doc_id"], b["content_type"], b["content"]
            ):
                try:
                    if ctype != "application/pdf":
                        raise ValueError(f"cannot page-split content type: {ctype}")
                    for part in split_pdf(bytes(content), batch_size):
                        out.append(
                            (
                                doc_id,
                                part["batch_number"],
                                part["first_page"],
                                part["last_page"],
                                ctype,
                                part["content"],
                                "ok",
                                None,
                            )
                        )
                except Exception as e:  # per-doc quarantine
                    out.append(
                        (doc_id, None, None, None, ctype, None, "failed",
                         f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(out, columns=cols)

    return raw.mapInPandas(run, schema=SPLIT_SCHEMA)


def parse_split_pdfs(
    raw: DataFrame,
    batch_size: int = DEFAULT_BATCH_SIZE,
    spread: bool = True,
) -> DataFrame:
    """Full raw-byte chain: split → (repartition) → parse → ordered merge.

    Returns exploded (doc_id, ord, kind, text, media_ref, batch_number)
    rows; ``ord`` re-enumerates the merged sequence (batch order, then
    stream order within the batch) so it equals whole-PDF parse order.

    ``spread=True`` repartitions the batch rows before parsing — at
    scale this is the point of the operator: one 5,000-page doc becomes
    100 rows on 100 cores. The merge's window on doc_id is then the one
    unavoidable shuffle, same as merge_batches (O4).
    """
    from pyspark.sql.window import Window

    from azure_pdf_parser_spark.operators.parse import parse_documents

    parts = split_pdf_pages(raw, batch_size).where(F.col("status") == "ok")
    if spread:
        parts = parts.repartition("doc_id", "batch_number")
    parsed = parse_documents(
        parts.select("doc_id", "batch_number", "content_type", "content"),
        passthrough=("batch_number",),
    )
    ex = parsed.where(F.col("status") == "ok").select(
        "doc_id", "batch_number", F.posexplode("spans").alias("pos", "s")
    )
    w = Window.partitionBy("doc_id").orderBy("batch_number", "pos")
    return ex.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("int").alias("ord"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        "batch_number",
    )
