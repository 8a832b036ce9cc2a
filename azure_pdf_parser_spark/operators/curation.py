"""End-to-end corpus curation decision: quality rules + exact dedup.

The apply step of a training-data pipeline — one row per document with
the final ``keep`` verdict and the FIRST stage that rejected it, so a
curation run is auditable ("how much did quality drop vs dedup?") from
the output table alone. Composition order follows standard practice
(FineWeb / RefinedWeb): quality-filter first, then deduplicate among
the survivors' canonical representatives.

Near-dup keep-lists compose the same way from
:func:`~azure_pdf_parser_spark.operators.dedup.neardup_clusters`
(keep ``doc_id == cluster_id``) — kept out of this gate so the oracle
stays non-recursive SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_pdf_parser_spark.functions.text import (
    GOPHER_FILTER_SQL,
    gopher_filter,
)


def curate_corpus(documents: DataFrame) -> DataFrame:
    """(doc_id, quality_ok, is_canonical, keep, reason).

    * ``quality_ok`` — the combined Gopher-rule verdict
      (:func:`~azure_pdf_parser_spark.functions.text.gopher_filter`).
    * ``is_canonical`` — lowest doc_id among exact (md5) text
      duplicates; NULL-text docs are vacuously canonical (they already
      fail quality, and md5(NULL) must not merge them into one group).
    * ``keep`` = quality_ok AND is_canonical, never NULL.
    * ``reason`` — 'quality' | 'duplicate' | NULL (kept), first
      rejecting stage wins.

    Plan: gopher signals (map-only) + its repetition aggregate, an
    md5-keyed canonical groupBy + join-back, and the final doc_id join —
    every shuffle keys on a uniform hash (doc_id or md5), no broadcast
    of any corpus-derived table, no driver-side work.
    """
    quality = gopher_filter(documents).select(
        "doc_id", F.col("keep").alias("quality_ok")
    )
    hashed = documents.select("doc_id", F.md5("text").alias("h"))
    canon = (
        hashed.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    canonical = hashed.join(canon, "h", "left").select(
        "doc_id",
        F.coalesce(
            F.col("doc_id") == F.col("canonical_id"), F.lit(True)
        ).alias("is_canonical"),
    )
    keep = F.col("quality_ok") & F.col("is_canonical")
    reason = (
        F.when(~F.col("quality_ok"), F.lit("quality"))
        .when(~F.col("is_canonical"), F.lit("duplicate"))
        .otherwise(F.lit(None).cast("string"))
    )
    return quality.join(canonical, "doc_id").select(
        "doc_id",
        "quality_ok",
        "is_canonical",
        keep.alias("keep"),
        reason.alias("reason"),
    )


CURATE_CORPUS_SQL = f"""
WITH gopher AS ({GOPHER_FILTER_SQL}),
hashed AS (SELECT doc_id, md5(text) AS h FROM documents),
canon AS (
    SELECT h, min(doc_id) AS canonical_id FROM hashed
    WHERE h IS NOT NULL GROUP BY h
),
canonical AS (
    SELECT hashed.doc_id,
           coalesce(hashed.doc_id = canon.canonical_id, TRUE) AS is_canonical
    FROM hashed LEFT JOIN canon ON hashed.h = canon.h
)
SELECT g.doc_id,
       g.keep AS quality_ok,
       c.is_canonical,
       (g.keep AND c.is_canonical) AS keep,
       CASE WHEN NOT g.keep THEN 'quality'
            WHEN NOT c.is_canonical THEN 'duplicate'
       END AS reason
FROM gopher g JOIN canonical c ON g.doc_id = c.doc_id
"""
