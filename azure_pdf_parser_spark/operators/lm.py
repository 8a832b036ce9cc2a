"""Unigram language-model surprisal — the corpus-statistics quality
signal (the cheap cousin of KenLM perplexity filtering used by CCNet /
Gopher / FineWeb pipelines: documents whose tokens are improbable under
the corpus distribution are junk candidates).

Two passes, both scale-shaped:

1. **Vocabulary build**: tokenize → groupBy(token) count (map-side
   partials collapse the Zipf head before the shuffle) → keep the TOP
   ``vocab_size`` tokens by (count DESC, token ASC). The cap is what
   makes the model table BROADCASTABLE: corpus vocabulary grows with
   corpus size (Heaps' law — an unbounded vocab is a corpus-derived
   dim, the classic driver-OOM hazard), but the capped model is a fixed
   2^20-row table. Out-of-vocab tokens get the floor probability
   1/total — equivalently, the cap is the smoothing.
2. **Scoring**: doc tokens left-join the broadcast model; per-doc
   surprisal = avg(-log2 p(token)). The corpus side never shuffles for
   the probe; the per-doc avg is one aggregation on the uniform doc_id
   key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VOCAB_SIZE = 1 << 20

# ASCII letter runs over lowercased text: `lower` is Unicode-aware in
# both Spark and DuckDB, and the ASCII class sidesteps the Java-vs-RE2
# word-boundary divergence entirely.
TOKEN_PATTERN = "[a-z]+"


def _doc_tokens(documents: DataFrame) -> DataFrame:
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
    return documents.select(
        "doc_id", F.explode_outer(toks).alias("token")
    ).where(F.col("token").isNotNull())


def lm_vocab(
    documents: DataFrame, vocab_size: int = VOCAB_SIZE, min_count: int = 1
) -> DataFrame:
    """(token, n, total): top-``vocab_size`` tokens with the corpus-wide
    token total (total counts ALL tokens, in and out of vocab, so the
    in-vocab probabilities and the OOV floor share one denominator).

    Scale shape: the top-V selection is ``orderBy().limit()`` —
    TakeOrderedAndProject, a per-partition top-V merge — NEVER a rank
    window with an empty partitionBy (a single reducer sorting the full
    distinct-token table; on a 100 TB crawl distinct tokens are O(10⁹)
    by Heaps' law, so that one partition is the job). The merge fan-in
    is n_partitions × V rows of (token, count); at production scale
    callers additionally pass ``min_count ≥ 2``, which drops the
    hapax-legomena tail (typically >40% of DISTINCT tokens) before the
    selection — a pure map-side filter over the aggregated counts that
    cannot evict a real top-V member while V ≪ corpus/2. The corpus
    total is a separate 1-row aggregate over the same persisted counts,
    not a global window.
    """
    from azure_pdf_parser_spark.caching import tracked_persist

    counts = tracked_persist(
        _doc_tokens(documents).groupBy("token").agg(F.count("*").alias("n"))
    )
    totals = counts.agg(F.sum("n").alias("total"))
    return (
        counts.where(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(vocab_size)
        .crossJoin(F.broadcast(totals))
        .select("token", "n", "total")
    )


def lm_surprisal(
    documents: DataFrame, vocab_size: int = VOCAB_SIZE
) -> DataFrame:
    """(doc_id, n_tokens, avg_surprisal): mean -log2 p(token) per doc.

    The model (vocab) is persisted — it feeds both the 1-row total and
    the probe join, and without the persist each reference would re-scan
    the corpus (caller releases via caching.release_all, same contract
    as the other operators).
    """
    from azure_pdf_parser_spark.caching import tracked_persist

    vocab = tracked_persist(lm_vocab(documents, vocab_size))
    totals = vocab.agg(F.max("total").alias("total"))
    scored = (
        _doc_tokens(documents)
        .join(F.broadcast(vocab.select("token", "n")), "token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            (
                -F.log2(
                    F.coalesce(F.col("n"), F.lit(1)).cast("double")
                    / F.col("total")
                )
            ).alias("surprisal"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.round(F.avg("surprisal"), 6).alias("avg_surprisal"),
    )


LM_SURPRISAL_SQL = f"""
WITH toks AS (
    SELECT d.doc_id, t.token
    FROM documents d
    CROSS JOIN LATERAL (
        SELECT UNNEST(regexp_extract_all(lower(d.text), '{TOKEN_PATTERN}')) AS token
    ) t
),
counts AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
tot AS (SELECT sum(n) AS total FROM counts),
vocab AS (
    SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT {VOCAB_SIZE}
)
SELECT toks.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-log2(CAST(coalesce(vocab.n, 1) AS DOUBLE) / tot.total)), 6)
           AS avg_surprisal
FROM toks LEFT JOIN vocab ON toks.token = vocab.token
CROSS JOIN tot
GROUP BY toks.doc_id
"""


TFIDF_TOP_K = 5


def tfidf_top_terms(documents: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """(doc_id, term, rank, tfidf): each doc's k most characteristic
    terms — tf · ln((N+1)/(df+1)), ranked (tfidf DESC, term ASC).

    The keyword-extraction / retrieval-feature primitive. Scale shape:
    tf = one groupBy on (doc_id, token); df = one groupBy on token over
    the tf table (already one row per doc-token — never re-reads the
    corpus); the tf⋈df equi-join keys on token. df is corpus-derived
    and unbounded (Heaps' law), so NO broadcast hint — unlike the
    capped LM vocab, tf-idf needs every token's df (rare tokens carry
    the signal), and AQE picks the strategy. Top-k is a rank window on
    doc_id: WindowGroupLimit pushes the k-filter below the sort.
    """
    from pyspark.sql.window import Window

    n_docs = documents.select(
        F.count("*").cast("double").alias("_n_docs")
    )
    tf = (
        _doc_tokens(documents)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("_tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("_df"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("token").alias("term"),
            F.round(
                F.col("_tf")
                * F.log((F.col("_n_docs") + 1) / (F.col("_df") + 1)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "rank", "tfidf")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH toks AS (
    SELECT d.doc_id, t.token
    FROM documents d
    CROSS JOIN LATERAL (
        SELECT UNNEST(regexp_extract_all(lower(d.text), '{TOKEN_PATTERN}')) AS token
    ) t
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
SELECT doc_id,
       token AS term,
       CAST(rank AS INT) AS rank,
       tfidf
FROM (
    SELECT tf.doc_id, tf.token,
           round(tf.tf * ln((n.n_docs + 1) / (df.df + 1)), 6) AS tfidf,
           row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY round(tf.tf * ln((n.n_docs + 1) / (df.df + 1)), 6) DESC,
                        tf.token ASC
           ) AS rank
    FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
)
WHERE rank <= {TFIDF_TOP_K}
"""


# --- Bigram LM surprisal ------------------------------------------------------


def _doc_bigrams(documents: DataFrame) -> DataFrame:
    """(doc_id, w1, w2): consecutive token pairs, array-local — the
    bigram stream is derived inside one projection (posexplode + a
    0-based array index), never a self-join on position."""
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
    with_arr = documents.select("doc_id", toks.alias("_toks"))
    return (
        with_arr.select(
            "doc_id", "_toks", F.posexplode("_toks").alias("_pos", "w1")
        )
        .where(F.col("_pos") < F.size("_toks") - 1)
        .select("doc_id", "w1", F.expr("_toks[_pos + 1]").alias("w2"))
    )


def lm_bigram_surprisal(documents: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_bigram_surprisal): mean -log2 P(w2|w1)
    per document under the corpus bigram model with add-one smoothing —
    the KenLM-perplexity-filter analog one order up from
    :func:`lm_surprisal` (CCNet filters on exactly this signal; a doc
    whose CONSECUTIVE-pair statistics are improbable is gibberish even
    when its unigrams are common — keyboard mash and word-salad spam
    pass unigram filters and fail here).

        P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V),  V = distinct unigrams

    Scale shape: the bigram and unigram count tables are corpus-derived
    and unbounded (Heaps' law squared for bigrams), so — unlike the
    CAPPED unigram vocab — neither is broadcast: the probe joins key on
    (w1, w2) and w1 with map-side-partial counts feeding them, and AQE
    picks the join strategy (at production scale both model tables are
    bucketed by their key, making every scoring run exchange-free on
    the model side). V and the per-doc average are one scalar aggregate
    and one uniform-key groupBy. Docs with < 2 tokens carry no bigram
    signal and are absent from the output (their quality verdict comes
    from the length rules upstream).
    """
    from azure_pdf_parser_spark.caching import tracked_persist

    # persisted: bg feeds both the bigram-count build and the probe
    # side, uni_counts feeds both the V scalar and the smoothing join —
    # without the persists the corpus tokenize/posexplode chain runs
    # four times (same contract as lm_vocab's persisted counts; caller
    # releases via release_all)
    bg = tracked_persist(_doc_bigrams(documents))
    big_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni_counts = tracked_persist(
        _doc_tokens(documents).groupBy("token").agg(F.count("*").alias("c1"))
    )
    v = uni_counts.agg(F.count("*").alias("v"))
    scored = (
        bg.join(big_counts, ["w1", "w2"])
        .join(uni_counts.withColumnRenamed("token", "w1"), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            (
                -F.log2(
                    (F.col("c12") + 1).cast("double")
                    / (F.col("c1") + F.col("v"))
                )
            ).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(F.avg("s"), 6).alias("avg_bigram_surprisal"),
    )


LM_BIGRAM_SURPRISAL_SQL = f"""
WITH toks AS (
    SELECT d.doc_id, t.token
    FROM documents d
    CROSS JOIN LATERAL (
        SELECT UNNEST(regexp_extract_all(lower(d.text), '{TOKEN_PATTERN}')) AS token
    ) t
),
bg AS (
    SELECT d.doc_id, b.w1, b.w2
    FROM (SELECT doc_id,
                 regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS tk
          FROM documents) d
    CROSS JOIN LATERAL (
        SELECT UNNEST(list_transform(
                   d.tk[1:len(d.tk) - 1], (x, i) -> struct_pack(w1 := x, w2 := d.tk[i + 1])
               ), recursive := true)
    ) b
),
bigc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
unic AS (SELECT token AS w1, count(*) AS c1 FROM toks GROUP BY token),
v AS (SELECT count(*) AS v FROM unic)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-log2(CAST(bigc.c12 + 1 AS DOUBLE) / (unic.c1 + v.v))), 6)
           AS avg_bigram_surprisal
FROM bg
JOIN bigc ON bg.w1 = bigc.w1 AND bg.w2 = bigc.w2
JOIN unic ON bg.w1 = unic.w1
CROSS JOIN v
GROUP BY bg.doc_id
"""


# --- BM25 query-focused retrieval ---------------------------------------------

# Okapi BM25 (Robertson et al., TREC-3) against a FIXED query-term
# set: the query-focused corpus-filtering primitive (rank a 100 TB
# crawl against a topic probe, keep the head). k1/b are the standard
# defaults; (k1+1) is pinned as its own literal so the Spark and
# DuckDB expressions share the exact double rather than each folding
# 1.2 + 1.0.
BM25_K1 = 1.2
BM25_K1_PLUS_1 = 2.2
BM25_B = 0.75
BM25_TOP_K = 20
BM25_QUERY_TERMS = ("join", "window", "vector", "dup")


def bm25_topk(
    documents: DataFrame,
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOP_K,
) -> DataFrame:
    """(doc_id, dl, n_matched, bm25): the corpus' top-``k`` documents
    for the fixed query, Lucene-style non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Scale shape — ONE corpus shuffle, no token join: because the query
    is a fixed small term set, per-term tf becomes |terms| conditional
    sums inside the per-doc length aggregation (one groupBy on the
    uniform doc_id key), so the corpus-sized token table is never
    joined. df/avgdl/N are a single 1-row aggregate over that per-doc
    table, broadcast back. Top-k is ``orderBy().limit()`` —
    TakeOrderedAndProject (per-partition top-k merge), never a global
    rank window. The cut orders by the ROUNDED score with doc_id
    tie-break so the selected set is deterministic across engines.
    Docs with zero letter-tokens carry no row in ``toks`` and are
    absent throughout (the avgdl denominator is docs-with-tokens,
    mirrored in the oracle).
    """
    from azure_pdf_parser_spark.caching import tracked_persist

    per_aggs = [F.count("*").cast("bigint").alias("dl")]
    for i, t in enumerate(terms):
        per_aggs.append(
            F.sum(F.when(F.col("token") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_tf{i}")
        )
    # persisted: per_doc feeds BOTH the 1-row stats aggregate and the
    # scoring projection — without it the corpus tokenize+groupBy runs
    # twice (same contract as lm_vocab's persisted counts; caller
    # releases via release_all). One narrow row per doc.
    per_doc = tracked_persist(
        _doc_tokens(documents).groupBy("doc_id").agg(*per_aggs)
    )

    stat_aggs = [
        F.avg("dl").alias("_avgdl"),
        F.count("*").cast("bigint").alias("_n"),
    ]
    for i in range(len(terms)):
        stat_aggs.append(
            F.sum((F.col(f"_tf{i}") > 0).cast("bigint")).alias(f"_df{i}")
        )
    stats = per_doc.agg(*stat_aggs)

    score = F.lit(0.0)
    matched = F.lit(0)
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfc = F.col(f"_df{i}").cast("double")
        idf = F.log(
            1.0 + (F.col("_n").cast("double") - dfc + 0.5) / (dfc + 0.5)
        )
        denom = tf + BM25_K1 * (
            1.0 - BM25_B
            + BM25_B * F.col("dl").cast("double") / F.col("_avgdl")
        )
        score = score + F.when(
            F.col(f"_tf{i}") > 0, idf * tf * BM25_K1_PLUS_1 / denom
        ).otherwise(0.0)
        matched = matched + (F.col(f"_tf{i}") > 0).cast("int")

    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "dl",
            matched.alias("n_matched"),
            F.round(score, 6).alias("bm25"),
        )
        .where(F.col("n_matched") > 0)
    )
    return scored.orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    ).limit(k)


def _bm25_sql(terms: tuple[str, ...] = BM25_QUERY_TERMS) -> str:
    tf_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(terms))
    )
    matched = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    # expression tree mirrors the Spark build exactly: left-assoc sum of
    # per-term CASEs, each ((idf * tf) * 2.2) / denom with the same
    # literal constants
    score = "\n             + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * CAST(tf{i} AS DOUBLE) * {BM25_K1_PLUS_1}"
        f" / (CAST(tf{i} AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B}"
        f" + {BM25_B} * CAST(p.dl AS DOUBLE) / s.avgdl))"
        f" ELSE 0.0 END)"
        for i in range(len(terms))
    )
    return f"""
WITH toks AS (
    SELECT d.doc_id, t.token
    FROM documents d
    CROSS JOIN LATERAL (
        SELECT UNNEST(regexp_extract_all(lower(d.text), '{TOKEN_PATTERN}')) AS token
    ) t
),
per_doc AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS dl,
           {tf_cols}
    FROM toks GROUP BY doc_id
),
stats AS (
    SELECT avg(dl) AS avgdl,
           CAST(count(*) AS BIGINT) AS n_docs,
           {df_cols}
    FROM per_doc
)
SELECT doc_id, dl, n_matched, bm25 FROM (
    SELECT p.doc_id, p.dl,
           CAST({matched} AS INT) AS n_matched,
           round(0.0 + {score}, 6) AS bm25
    FROM per_doc p CROSS JOIN stats s
)
WHERE n_matched > 0
ORDER BY bm25 DESC, doc_id ASC
LIMIT {BM25_TOP_K}
"""


BM25_TOPK_SQL = _bm25_sql()
