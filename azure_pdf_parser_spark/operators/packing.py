"""Sequence packing: concat-and-chunk documents into fixed token-budget
training windows (engine addition — no reference analog; the reference
stops at ParserOutput, this is the next stage of a pretraining data
pipeline).

Semantics (the standard LLM pretraining pack): within a shard, document
token streams are concatenated in deterministic ``doc_id`` order and cut
every ``budget`` tokens; documents MAY span pack boundaries (GPT-style
"pack and chunk", not greedy bin-packing — greedy first-fit needs a
sequential reset-scan that neither SQL windows nor a 1000-executor
cluster can express without serializing each shard through Python).
Output is one row per (document × pack it touches):

    shard        md5-bucket the doc was routed to (packing domain)
    pack_id      0-based window index within the shard
    doc_id
    seg_begin    first token of this segment, 0-based within the doc
    seg_len      tokens of the doc inside this pack
    pos_in_pack  where the segment starts inside the pack [0, budget)
    seg_text     the actual whitespace-token slice

Scale posture: ONE hash shuffle on ``shard``; the prefix-sum window and
the segment explode are shard-local, so parallelism == ``shards``
(O(100k) at corpus scale — the window never sees more than one shard's
rows and there is no global sort or single-partition window anywhere;
contrast the lm_vocab rank-window bug fixed in round 3). The shard
assignment reuses the engine's md5-prefix bucketing (operators/
sampling.py) so the Spark and DuckDB mirrors agree bit-for-bit.

Determinism: output depends only on (doc_id, text, budget, shards) —
no RNG, no partition-layout sensitivity; ``shards`` is a semantic
parameter (like LSH band count), not a tuning knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azure_pdf_parser_spark.functions.text import TOKEN_COUNT_SQL, token_count_expr

PACK_BUDGET = 512
PACK_SHARDS = 8


def _shard_expr(doc_id, shards: int):
    """First 4 md5 hex chars → int bucket, mod shards (mirrors
    sampling's bucket; DuckDB: CAST('0x'||substr(md5(..),1,4) AS INT))."""
    nib = F.substring(F.md5(doc_id.cast("string")), 1, 4)
    return (F.conv(nib, 16, 10).cast("long") % shards).cast("int")


def pack_sequences(
    documents: DataFrame, budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> DataFrame:
    """documents(doc_id, text) → packed segment rows (schema above).

    Zero-token docs pack nothing (empty text has no training payload).
    All arithmetic stays in the integer domain (``div``, not
    floor-of-double) so the two mirrors can never diverge on a rounding
    edge.
    """
    b = F.lit(int(budget)).cast("long")
    toks = token_count_expr(F.col("text")).cast("long")
    staged = (
        documents.select(
            "doc_id",
            "text",
            toks.alias("toks"),
            _shard_expr(F.col("doc_id"), shards).alias("shard"),
        )
        .where(F.col("toks") > 0)
        .withColumn(
            "cum",
            F.sum("toks").over(
                Window.partitionBy("shard")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("off", F.col("cum") - F.col("toks"))
        # packs this doc touches: [off // B, (cum-1) // B] — never empty
        # for toks > 0, and the array is staged as an attribute before
        # the explode so InferFiltersFromGenerate cannot substitute the
        # derivation tree into a pushed-down filter
        .withColumn(
            "packs",
            F.sequence(
                F.expr(f"off div {int(budget)}"), F.expr(f"(cum - 1) div {int(budget)}")
            ),
        )
    )
    seg = staged.select(
        "shard",
        "doc_id",
        "text",
        "toks",
        "off",
        F.explode("packs").alias("pack_id"),
    )
    seg_begin = F.greatest(F.lit(0).cast("long"), F.col("pack_id") * b - F.col("off"))
    seg_end = F.least(F.col("toks"), (F.col("pack_id") + 1) * b - F.col("off"))
    return seg.select(
        "shard",
        F.col("pack_id").cast("bigint").alias("pack_id"),
        "doc_id",
        seg_begin.alias("seg_begin"),
        (seg_end - seg_begin).alias("seg_len"),
        (F.col("off") + seg_begin - F.col("pack_id") * b).alias("pos_in_pack"),
        F.array_join(
            F.slice(
                F.split(F.col("text"), " "),
                (seg_begin + 1).cast("int"),
                (seg_end - seg_begin).cast("int"),
            ),
            " ",
        ).alias("seg_text"),
    )


def pack_sequences_sql(
    budget: int = PACK_BUDGET, shards: int = PACK_SHARDS, table: str = "documents"
) -> str:
    """DuckDB mirror. List slicing is 1-based inclusive-end
    (``l[a:b]``), Spark ``slice`` is (start, length) — both sides slice
    ``[seg_begin+1, seg_begin+seg_len]``."""
    toks = TOKEN_COUNT_SQL.format(t="text")
    return f"""
WITH toks AS (
  SELECT doc_id, text,
         CAST({toks} AS BIGINT) AS toks,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % {shards} AS INTEGER) AS shard
  FROM {table}
), cum AS (
  SELECT *, CAST(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM toks WHERE toks > 0
), seg AS (
  SELECT shard, u.pack_id, doc_id, text, toks, cum - toks AS off
  FROM cum, UNNEST(generate_series((cum - toks) // {budget}, (cum - 1) // {budget})) AS u(pack_id)
), bounds AS (
  SELECT shard, pack_id, doc_id, text, toks, off,
         GREATEST(0, pack_id * {budget} - off) AS seg_begin,
         LEAST(toks, (pack_id + 1) * {budget} - off) AS seg_end
  FROM seg
)
SELECT shard, CAST(pack_id AS BIGINT) AS pack_id, doc_id,
       seg_begin, seg_end - seg_begin AS seg_len,
       off + seg_begin - pack_id * {budget} AS pos_in_pack,
       array_to_string((string_split(text, ' '))[CAST(seg_begin + 1 AS INTEGER):CAST(seg_end AS INTEGER)], ' ') AS seg_text
FROM bounds
"""


def training_shards(
    documents: DataFrame, budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> DataFrame:
    """The end-to-end "make training shards" composition: curation
    verdict → keep set → sequence packing, in one plan.

    The keep filter is a LEFT SEMI join on doc_id (the keep set is
    corpus-derived, so it is never broadcast — AQE may still choose to
    once it sees the post-curation size); everything downstream is
    :func:`pack_sequences`' shard-local shape. Survivor token streams
    re-concatenate without holes, exactly as a real pretraining run
    packs its post-curation corpus.
    """
    from azure_pdf_parser_spark.operators.curation import curate_corpus

    kept = curate_corpus(documents).where(F.col("keep")).select("doc_id")
    return pack_sequences(
        documents.join(kept, "doc_id", "left_semi"), budget, shards
    )


def training_shards_sql(
    budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> str:
    from azure_pdf_parser_spark.operators.curation import CURATE_CORPUS_SQL

    pack = pack_sequences_sql(budget, shards, table="kept_docs")
    spliced = pack.replace("\nWITH toks", ",\ntoks", 1)
    return (
        "WITH curated AS ("
        + CURATE_CORPUS_SQL
        + "),\nkept_docs AS (\n"
        "    SELECT d.doc_id, d.text FROM documents d\n"
        "    JOIN curated c ON d.doc_id = c.doc_id WHERE c.keep\n)"
        + spliced
    )
