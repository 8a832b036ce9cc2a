"""Query registry: paired Spark implementations + DuckDB oracle SQL.

Each entry is one operator/capability from SURVEY.md §2 or the
training-data-pipeline suite. The Spark side is the engine; the SQL side
is an independent ANSI-SQL restatement of the same spec that DuckDB runs
over the same parquet for the driver's correctness gate
(CORRECTNESS_r{N}.json). Column names/types are aligned on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_pdf_parser_spark.functions.text import (
    language_expr,
    language_sql,
    quality_exprs,
    quality_sql,
)
from azure_pdf_parser_spark.operators import ann, dedup, extract_spans
from azure_pdf_parser_spark.sources.spanize import (
    BOILERPLATE_SQL_PREDICATE,
    SPANIZE_SQL_CTE,
    derive_spans,
)
from azure_pdf_parser_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_spans(_docs(spark, sf_dir))


_KEPT_SQL = f"""
WITH {SPANIZE_SQL_CTE},
kept AS (
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS INT) AS ord,
           kind, text, media_ref
    FROM spanize
    WHERE {BOILERPLATE_SQL_PREDICATE}
)
"""


# ---------------------------------------------------------------------------
# Extraction core (SURVEY §2: O2 analog, O7/O8, O12, O13, O14, O15)
# ---------------------------------------------------------------------------


@query(
    "spanize",
    f'WITH {SPANIZE_SQL_CTE} SELECT doc_id, ord, kind, text, media_ref, "offset" FROM spanize',
)
def q_spanize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse-stage output contract: interleaved spans, exploded (O2 analog)."""
    ex = _spans(spark, sf_dir).select(
        "doc_id", F.posexplode("spans").alias("ord", "s")
    )
    return ex.select(
        "doc_id",
        F.col("ord").cast("int").alias("ord"),
        "s.kind",
        "s.text",
        "s.media_ref",
        "s.offset",
    )


@query(
    "extract_spans",
    _KEPT_SQL + "SELECT doc_id, ord, kind, text, media_ref FROM kept",
)
def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: ordered main-content span sequence (boilerplate stripped)."""
    return extract_spans.extract_exploded(_spans(spark, sf_dir))


@query(
    "parser_output",
    _KEPT_SQL
    + f""",
agg AS (
    SELECT doc_id,
           coalesce(string_agg(text, ' ' ORDER BY ord) FILTER (WHERE text IS NOT NULL), '') AS doc_text,
           CAST(count(*) AS BIGINT) AS span_count
    FROM kept GROUP BY doc_id
)
SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
       md5(coalesce(a.doc_text, '')) AS document_md5_sum,
       {language_sql("coalesce(a.doc_text, '')")} AS language,
       CAST(coalesce(a.span_count, 0) AS BIGINT) AS span_count,
       CAST(0 AS BOOLEAN) AS translated,
       'ok' AS status
FROM documents d
LEFT JOIN agg a ON CAST(d.doc_id AS VARCHAR) = a.doc_id
""",
)
def q_parser_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document assembly: md5 + language + span_count per doc (O12/O13/O15)."""
    return extract_spans.extract(_spans(spark, sf_dir)).drop("spans")


@query(
    "doc_languages",
    _KEPT_SQL
    + f""",
votes AS (
    SELECT doc_id, {language_sql('text')} AS language
    FROM kept WHERE text IS NOT NULL
),
counts AS (
    SELECT doc_id, language, count(*) AS c
    FROM votes WHERE language IS NOT NULL GROUP BY doc_id, language
),
tot AS (
    -- denominator: ALL text blocks, detected or not (reference
    -- experimental_base.py:183-191)
    SELECT doc_id, count(*) AS n
    FROM votes GROUP BY doc_id
)
SELECT counts.doc_id, counts.language
FROM counts JOIN tot ON counts.doc_id = tot.doc_id
WHERE counts.c > tot.n * 0.4
""",
)
def q_doc_languages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14: per-span language votes → doc languages with proportion > 0.4."""
    return extract_spans.doc_languages(_spans(spark, sf_dir))


# ---------------------------------------------------------------------------
# Table-cell span semi-join (SURVEY §2 O5/O6) — relational form
# ---------------------------------------------------------------------------


@query(
    "table_cell_tagging",
    _KEPT_SQL
    + """,
cell_keys AS (
    SELECT DISTINCT doc_id, length(text) AS length
    FROM kept WHERE kind = 'TableCell' AND text IS NOT NULL
)
SELECT k.doc_id,
       k.ord,
       CASE WHEN c.doc_id IS NOT NULL THEN 'TableCell' ELSE k.kind END AS kind
FROM kept k
LEFT JOIN cell_keys c
  ON k.doc_id = c.doc_id AND length(k.text) = c.length
WHERE k.text IS NOT NULL
""",
)
def q_table_cell_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5+O6 as a relational semi-join: harvest TableCell span keys and tag
    matching paragraphs — the distributed form of reference
    convert.py:203-236 (harvest at :203-217, tag at :220-236; the reference
    key is the paragraph's span identity — here the deterministic analog is
    (doc_id, span text length)). The dim side is broadcast: the harvested
    cell-key set is tiny relative to the fact side at any scale.
    """
    p = (
        extract_spans.extract_exploded(_spans(spark, sf_dir))
        .filter(F.col("text").isNotNull())
        .alias("p")
    )
    cell_keys = (
        p.filter(F.col("kind") == "TableCell")
        .select("doc_id", F.length("text").alias("length"))
        .distinct()
        .alias("c")
    )
    joined = p.join(
        F.broadcast(cell_keys),
        on=(F.col("p.doc_id") == F.col("c.doc_id"))
        & (F.length(F.col("p.text")) == F.col("c.length")),
        how="left",
    )
    return joined.select(
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.ord").alias("ord"),
        F.when(F.col("c.doc_id").isNotNull(), F.lit("TableCell"))
        .otherwise(F.col("p.kind"))
        .alias("kind"),
    )


# ---------------------------------------------------------------------------
# Text analysis suite (training-data pipeline ops)
# ---------------------------------------------------------------------------

_QUALITY_SQL_COLS = ",\n       ".join(
    f"{expr} AS {name}" for name, expr in quality_sql().items()
)


@query(
    "quality_scores",
    f"SELECT doc_id,\n       {_QUALITY_SQL_COLS}\nFROM documents",
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/token/stopword/distinct signals per doc."""
    cols = quality_exprs("text")
    return _docs(spark, sf_dir).select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]
    )


@query(
    "langid",
    f"SELECT doc_id, {language_sql('text')} AS language FROM documents",
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID over raw document text (stopword-profile heuristic)."""
    return _docs(spark, sf_dir).select("doc_id", language_expr("text").alias("language"))


@query(
    "dedup_exact",
    """
SELECT md5(text) AS content_hash,
       min(doc_id) AS canonical_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY md5(text)
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy with canonical min(doc_id).

    Map-side partial aggregation makes this a single cheap shuffle on the
    32-hex hash — uniformly distributed, no skew, at any scale.
    """
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup suite: n-gram Jaccard, MinHash+LSH, SimHash, winnowing fingerprints
# ---------------------------------------------------------------------------


@query("dedup_ngram_jaccard", dedup.NGRAM_JACCARD_SQL.format(threshold=0.3))
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.3)


@query("dedup_minhash_lsh", dedup.MINHASH_LSH_SQL)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_candidates(_docs(spark, sf_dir))


@query("dedup_simhash", dedup.SIMHASH_SQL)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir))


@query("fingerprint_winnow", dedup.WINNOW_SQL)
def q_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.winnow_fingerprints(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@query("ann_cosine_topk", ann.COSINE_TOPK_SQL.format(k=5))
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.cosine_topk(load_table(spark, sf_dir, "embeddings"), k=5)


@query("ann_lsh_cosine_topk", ann.LSH_COSINE_TOPK_SQL.format(k=5, bits=ann.LSH_BITS))
def q_ann_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.lsh_cosine_topk(load_table(spark, sf_dir, "embeddings"), k=5)
