"""Corpus-level curation over the span IR: frequent-span removal and
deterministic data-mixture rebalancing.

Two operators the big web-corpus pipelines (CCNet, C4, RefinedWeb,
Gopher/MassiveText) run between extraction and training:

* :func:`span_frequency_filter` — the span-model analog of CCNet /
  RefinedWeb *line-level* deduplication: drop every text span whose
  exact text recurs in >= ``min_df`` distinct documents (headers,
  footers, nav bars, cookie banners — content-independent boilerplate
  that kind-based filtering can't see), then reassemble each document's
  span sequence. The engine's authoritative input is
  ``(doc_id, spans array<struct<kind,text,media_ref,offset>>)``
  (BASELINE.json input_hint); the reference's unit of text is the
  paragraph span (reference: src/azure_pdf_parser/convert.py:70-90
  paragraph -> text-block mapping), so "line" here is "span".

* :func:`mix_corpus` — deterministic weighted rebalancing of the corpus
  across a group column (language, source domain): the data-mixture
  step that turns raw crawl proportions into a target training mix.
  All arithmetic is BIGINT-exact so Spark and the DuckDB oracle agree
  bit-for-bit, and per-document selection reuses the growth-stable
  md5-bucket machinery from :mod:`..operators.sampling` — adding
  documents never flips the keep/drop decision of existing ones.

Scale shape (100 TB posture):

* ``span_frequency_filter``: the document-frequency count shuffles on
  the COMPOSITE (h, doc_id) key first — a span text occurring in 10^6
  docs spreads over the whole cluster before the ``groupBy(h)``
  partials collapse it (same discipline as
  :func:`..operators.dedup.duplicate_passages`). The frequent-span set
  is the boilerplate tail — small but corpus-derived, so membership is
  a LEFT ANTI equi-join (never a forced broadcast; AQE may pick one at
  runtime when the set really is tiny). Reassembly is one window on the
  uniform doc_id key.
* ``mix_corpus``: group counts are one map-side-partial groupBy on a
  low-cardinality key; everything derived from them is an
  n_groups-row table, broadcast-joined back. Per-document selection is
  a codegen'd string comparison — no per-doc shuffle at all. The corpus
  is scanned twice (counts, then filter); with corpus-derived
  fractions that is irreducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from azure_pdf_parser_spark.caching import tracked_persist
from azure_pdf_parser_spark.operators.sampling import bucket_col

# A span's text must recur in this many DISTINCT documents to be
# treated as corpus boilerplate. 2 = the CCNet default ("discard any
# line seen more than once across shards").
MIN_SPAN_DF = 2

# Join key: 16-hex-char md5 prefix, mirrored verbatim in the oracle so
# an (astronomically unlikely) collision yields identical output in
# both engines. 8 bytes post-codegen — same footprint as xxhash64 but
# portable to DuckDB.
_H = lambda c: F.substring(F.md5(c), 1, 16)  # noqa: E731


def span_frequency_filter(
    spans_exploded: DataFrame, min_df: int = MIN_SPAN_DF
) -> DataFrame:
    """Remove cross-document frequent spans; renumber the survivors.

    ``spans_exploded`` must carry ``(doc_id, ord, kind, text,
    media_ref)`` — one row per span, ``text`` NULL for media spans.
    Returns the same shape with ``ord`` renumbered densely per doc
    (0-based, original order preserved) plus ``src_ord``, the span's
    position before removal, for lineage.

    Media spans (text IS NULL) never match the frequent set and are
    always kept — images interleaved between boilerplate survive, as
    they do in the reference's figure handling.
    """
    h = F.when(F.col("text").isNotNull(), _H(F.col("text")))
    # Referenced twice (df count + anti-join); persist so the span
    # derivation upstream runs once, not twice.
    sp = tracked_persist(spans_exploded.withColumn("h", h))
    freq = (
        sp.where(F.col("h").isNotNull())
        .select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .select("h")
    )
    kept = sp.join(freq, "h", "left_anti")
    w = Window.partitionBy("doc_id").orderBy("ord")
    return kept.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("int").alias("new_ord"),
        F.col("ord").cast("int").alias("src_ord"),
        "kind",
        "text",
        "media_ref",
    ).withColumnRenamed("new_ord", "ord")


def span_frequency_filter_sql(spanize_cte: str, min_df: int = MIN_SPAN_DF) -> str:
    """DuckDB oracle for :func:`span_frequency_filter` over the spanize
    CTE (same frequent-set rule, same NOT-EXISTS null semantics as the
    anti-join, same renumbering window)."""
    return f"""
WITH {spanize_cte},
sp AS (
    SELECT doc_id, ord, kind, text, media_ref,
           CASE WHEN text IS NOT NULL THEN substr(md5(text), 1, 16) END AS h
    FROM spanize
),
freq AS (
    SELECT h FROM (
        SELECT h, count(DISTINCT doc_id) AS df
        FROM sp WHERE h IS NOT NULL GROUP BY h
    ) WHERE df >= {min_df}
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS INT) AS ord,
       CAST(ord AS INT) AS src_ord,
       kind, text, media_ref
FROM sp s
WHERE NOT EXISTS (SELECT 1 FROM freq f WHERE f.h = s.h)
"""


# ---------------------------------------------------------------------------
# Data-mixture rebalancing
# ---------------------------------------------------------------------------

# Default mixture: integer weights per language. Integers, not floats —
# every downstream quantity (per-group target, hash threshold) is then
# exact BIGINT arithmetic, identical in Spark and DuckDB (a float
# fraction could round differently across engines at the int cast).
DEFAULT_MIX_WEIGHTS: dict[str, int] = {
    "en": 3,
    "de": 2,
    "fr": 2,
    "es": 2,
    "zh": 1,
}

_BUCKETS = 16**4  # 4-hex-char md5 prefix, as in operators.sampling


def mix_corpus(
    documents: DataFrame,
    weights: dict[str, int] | None = None,
    group_col: str = "lang",
) -> DataFrame:
    """Downsample each group so the kept corpus approaches the target
    integer-weight mixture, without upsampling any group.

    With weights ``w_g`` (W = sum over groups present in the data) and
    group sizes ``n_g``, the largest total T every group can supply its
    share of is ``T = min_g floor(n_g * W / w_g)``; group g then keeps
    an expected ``floor(w_g * T * 65536 / (W * n_g)) / 65536`` fraction
    of its documents via the growth-stable md5-bucket threshold. The
    binding group's threshold is exactly 65536 -> sentinel 'g' (sorts
    above every hex digit) -> keeps everything, mirroring
    ``sampling._hex_threshold``'s full-fraction rule.

    Groups absent from ``weights`` are dropped (weight 0); weighted
    groups absent from the data contribute nothing to W, so the mix is
    renormalized over what exists — both engines compute W from the
    same inner join.

    Returns kept documents as ``(doc_id, <group_col>)``.
    """
    weights = DEFAULT_MIX_WEIGHTS if weights is None else weights
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive integers: {weights}")
    spark = documents.sparkSession
    wdf = spark.createDataFrame(
        [(g, int(w)) for g, w in sorted(weights.items())],
        f"{group_col} string, weight bigint",
    )
    counts = (
        documents.groupBy(group_col)
        .agg(F.count("*").cast("bigint").alias("n"))
        .join(wdf, group_col)
    )
    # W, T and the per-group thresholds are all n_groups-row tables;
    # the cross joins below are 1-row broadcasts, never a real product.
    with_w = counts.crossJoin(
        counts.agg(F.sum("weight").cast("bigint").alias("w_total"))
    )
    caps = with_w.withColumn("cap", F.expr("(n * w_total) DIV weight"))
    with_t = caps.crossJoin(caps.agg(F.min("cap").alias("t_total")))
    t_int = F.expr("(weight * t_total * 65536) DIV (w_total * n)")
    thr = with_t.select(
        group_col,
        F.when(t_int >= _BUCKETS, F.lit("g"))
        .otherwise(F.format_string("%04x", t_int.cast("int")))
        .alias("thr"),
    )
    return (
        documents.join(F.broadcast(thr), group_col)
        .where(bucket_col(F.col("doc_id")) < F.col("thr"))
        .select("doc_id", group_col)
    )


def mix_corpus_sql(
    weights: dict[str, int] | None = None, group_col: str = "lang"
) -> str:
    """DuckDB oracle for :func:`mix_corpus` — same integer math, same
    threshold strings. HUGEINT sums are cast back to BIGINT so the
    division widths match Spark's."""
    weights = DEFAULT_MIX_WEIGHTS if weights is None else weights
    values = ", ".join(
        f"('{g}', CAST({int(w)} AS BIGINT))" for g, w in sorted(weights.items())
    )
    return f"""
WITH w(grp, weight) AS (VALUES {values}),
counts AS (
    SELECT CAST({group_col} AS VARCHAR) AS grp, CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY {group_col}
),
j AS (SELECT c.grp, c.n, w.weight FROM counts c JOIN w ON c.grp = w.grp),
tot AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM j),
caps AS (SELECT j.*, (n * w_total) // weight AS cap FROM j, tot),
t AS (SELECT min(cap) AS t_total FROM caps),
thr AS (
    SELECT grp,
           CASE WHEN (weight * t_total * 65536) // (w_total * n) >= {_BUCKETS}
                THEN 'g'
                ELSE printf('%04x', CAST((weight * t_total * 65536) // (w_total * n) AS INT))
           END AS thr
    FROM caps, tot, t
)
SELECT d.doc_id, d.{group_col}
FROM documents d JOIN thr ON CAST(d.{group_col} AS VARCHAR) = thr.grp
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < thr.thr
"""


# --- Curriculum ordering ------------------------------------------------------


def curriculum_order(documents: DataFrame) -> DataFrame:
    """(doc_id, difficulty, curriculum_rank): a contiguous 1-based GLOBAL
    training order, easiest (shortest) documents first — the curriculum-
    learning data order (Bengio et al. 2009), difficulty here = token
    count with a deterministic md5 tie-break.

    The scale problem is the TOTAL order: ``row_number()`` over an
    unpartitioned window ranks the whole corpus through ONE reducer (the
    same trap the lm_vocab fix removed). This computes the identical
    rank with bounded stages instead:

    1. bucket = the difficulty value itself; per-bucket counts are one
       map-side-combined groupBy (output rows = distinct difficulties,
       tiny under any real length distribution);
    2. exclusive prefix offsets via a window over THAT aggregated
       table — single-partition but bounded by the difficulty domain,
       never by corpus size (the doc_languages denominator pattern);
    3. global_rank = broadcast offset + row_number within the bucket —
       the per-bucket window shuffles on the difficulty key with
       map-side-truncatable partitions.

    At 10^12 docs every stage is bounded: the corpus shuffles once on
    the bucket key, the offset table is O(distinct lengths). A skewed
    bucket (billions of same-length docs) is the one residual hazard —
    the md5 tie-break key is available to sub-bucket it (split rank =
    offset + sub-offset + local rank) without changing the output.
    """
    from pyspark.sql.window import Window

    from azure_pdf_parser_spark.functions.text import token_count_expr

    scored = documents.select(
        "doc_id",
        F.coalesce(token_count_expr("text"), F.lit(0))
        .cast("int")
        .alias("difficulty"),
    )
    counts = scored.groupBy("difficulty").agg(F.count("*").alias("_n"))
    # exclusive prefix sum over the TINY aggregated bucket table
    w_off = (
        Window.partitionBy()
        .orderBy("difficulty")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "difficulty",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("difficulty").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        scored.join(F.broadcast(offsets), "difficulty")
        .select(
            "doc_id",
            "difficulty",
            (F.col("_off") + F.row_number().over(w_in))
            .cast("bigint")
            .alias("curriculum_rank"),
        )
    )


def curriculum_order_sql() -> str:
    from azure_pdf_parser_spark.functions.text import TOKEN_COUNT_SQL

    n = "coalesce(" + TOKEN_COUNT_SQL.format(t="text") + ", 0)"
    return f"""
SELECT doc_id,
       CAST({n} AS INT) AS difficulty,
       CAST(row_number() OVER (
           ORDER BY {n}, md5(CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS curriculum_rank
FROM documents
"""
