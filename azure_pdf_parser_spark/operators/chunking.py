"""Overlapping-window document chunking (RAG / context-window prep).

Engine addition — no reference analog (azure-pdf-parser stops at
ParserOutput). The complement of sequence packing (operators/
packing.py): packing concatenates documents ACROSS boundaries into
fixed training windows; chunking cuts WITHIN one document into
overlapping windows so every token appears in at least one chunk with
``window - stride`` tokens of context carried across the cut — the
standard retrieval-indexing and long-document-SFT preprocessing step.

Semantics (whitespace tokens; chunk boundaries are deterministic
functions of the token count alone):

    n_chunks = 1                          if n <= window
             = ceil((n - window)/stride) + 1   otherwise
    start_i  = max(0, min(i * stride, n - window))   (last chunk is
               right-aligned so it ends exactly at the document's end
               instead of emitting a sliver that a previous chunk
               already covers)
    chunk_i  = tokens[start_i : start_i + window]

Scale posture: map-only — split, a ``sequence`` fan-out explode, a
``slice`` per chunk; ZERO exchanges (plan-pinned in
tests/test_physical_plans.py), so it rides whatever partitioning the
corpus already has and the output inherits ~window/stride× the input
size, which the caller budgets for exactly like the pdf_split
fan-out. No UDF: split/sequence/slice/array_join are all codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_WINDOW = 64  # tokens per chunk
CHUNK_STRIDE = 48  # tokens between chunk starts (overlap = 16)


def chunk_documents(
    documents: DataFrame,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """One row per (doc × chunk): (doc_id, chunk_idx, start_tok,
    chunk_len, doc_tokens, chunk_text). NULL-text docs are excluded
    (nothing to chunk); empty text yields one single-token chunk
    (split('', ' ') = [''] in both engines — consistent, and dropped
    downstream by the quality filters, not here)."""
    assert 0 < stride <= window, (stride, window)
    tokens = F.split(F.col("text"), " ")
    n = F.size(tokens)
    # integer ceil((n-window)/stride) + 1, no float division
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.expr(f"cast((size(split(text, ' ')) - {window} + {stride - 1}) "
               f"div {stride} as int) + 1")
    )
    base = documents.where(F.col("text").isNotNull()).select(
        "doc_id",
        tokens.alias("_toks"),
        n.alias("doc_tokens"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.greatest(
        F.lit(0),
        F.least(F.col("chunk_idx") * stride, F.col("doc_tokens") - window),
    )
    chunk = F.slice(F.col("_toks"), start + 1, window)
    return base.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_tok"),
        F.size(chunk).cast("int").alias("chunk_len"),
        F.col("doc_tokens").cast("int").alias("doc_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
) -> str:
    """DuckDB mirror. list_slice is INCLUSIVE-end (vs Spark slice's
    length argument — the documented desync hazard), so the end index
    is start + window and both clamp at the list end."""
    return f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS tokens,
           len(string_split(text, ' ')) AS n
    FROM documents WHERE text IS NOT NULL
),
plan AS (
    SELECT doc_id, tokens, n,
           CASE WHEN n <= {window} THEN 1
                ELSE (n - {window} + {stride - 1}) // {stride} + 1
           END AS n_chunks
    FROM toks
),
fan AS (
    SELECT doc_id, tokens, n, UNNEST(range(n_chunks)) AS chunk_idx
    FROM plan
),
placed AS (
    SELECT doc_id, tokens, n, chunk_idx,
           greatest(0, least(chunk_idx * {stride}, n - {window})) AS start_tok
    FROM fan
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(start_tok AS INT) AS start_tok,
       CAST(len(list_slice(tokens, start_tok + 1, start_tok + {window}))
            AS INT) AS chunk_len,
       CAST(n AS INT) AS doc_tokens,
       array_to_string(list_slice(tokens, start_tok + 1,
                                  start_tok + {window}), ' ') AS chunk_text
FROM placed
"""
