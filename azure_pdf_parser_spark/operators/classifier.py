"""Model-based quality classification: hash-bucketed linear classifier.

The missing filter class next to the rule-based ones (C4 in
``curation.c4_filter``, Gopher in ``curation.gopher_filter``): a
CCNet / fastText-style LINEAR MODEL over hashed token features, the
standard "model-based quality" stage of large-scale pipelines (CCNet's
fastText LM filter; GPT-3 appendix A's logistic classifier over
hashed features; FineWeb-Edu's scorer). Reference analog: none — the
reference (azure-pdf-parser) delegates all content judgment to the
remote service; this is an engine addition for the training-data
suite, like the rest of this module's neighbors.

Model shape
-----------
score(doc) = Σ_t w[h(t)] over the doc's whitespace tokens, where
``h(t)`` hashes a token into ``HASH_BUCKETS`` feature buckets and
``w`` is a weight vector — exactly a bag-of-hashed-words linear
classifier ("hashing trick", Weinberger et al. 2009). Two weight
sources:

* :func:`classifier_scores` — a DETERMINISTIC stand-in weight vector
  derived from the bucket id itself (``bucket % 2001 - 1000`` milli
  units, uniform on [-1000, 1000]). No external model file exists in
  this sandbox, so the weights are synthetic by construction — but the
  whole scoring plan (tokenize → hash → weight → per-doc reduce →
  threshold) is the production plan, bit-exactly mirrored by the
  DuckDB oracle and gated by the driver.
* :func:`classifier_scores_with_weights` — the production seam: a
  real trained weight table ``(bucket, weight_milli)``. Bounded by
  construction (≤ HASH_BUCKETS = 65,536 rows) ⇒ ALWAYS broadcast,
  never a shuffle of the corpus side; OOV buckets weigh 0.

Integer-exact by design: weights are BIGINT milli-units and the doc
score is a BIGINT sum, so the Spark/DuckDB mirrors can never diverge
on float summation order — the keep decision compares
``weight_sum >= threshold_milli * n_tokens`` in exact integer
arithmetic (mean-weight-vs-threshold without division).

Scale shape (100 TB): tokenize/hash/weight are map-only codegen; the
single exchange is the per-doc aggregation on the UNIFORM unique
doc_id key with map-side partial aggregation — each partition emits
one partial row per doc it holds, so the shuffle moves O(n_docs)
tiny rows, not tokens. No skew (doc_id unique), no broadcast of
anything corpus-derived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 4 md5 hex chars → 16^4 feature buckets; same bucket family as
# operators/sampling.py (growth-stable, engine-identical md5 prefix).
HASH_BUCKETS = 16**4

# Stand-in weight lattice: bucket % WEIGHT_MOD - (WEIGHT_MOD-1)/2 gives
# integer milli-weights uniform on [-1000, 1000].
WEIGHT_MOD = 2001
WEIGHT_BIAS = 1000


def bucket_expr(token):
    """Token → feature bucket in [0, HASH_BUCKETS)."""
    return F.conv(F.substring(F.md5(token), 1, 4), 16, 10).cast("long")


def hash_weight_expr(token):
    """Stand-in milli-weight in [-1000, 1000], a pure function of the
    bucket id (documented synthetic-weights seam — see module header)."""
    return bucket_expr(token) % WEIGHT_MOD - WEIGHT_BIAS


def _token_rows(documents: DataFrame) -> DataFrame:
    """(doc_id, tok) rows, one per whitespace token; empty/NULL texts
    keep their doc via a single NULL/'' token row (explode_outer) so
    every input doc appears in the scored output."""
    return documents.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("tok")
    )


def _aggregate(scored: DataFrame, threshold_milli: int) -> DataFrame:
    real = F.col("tok").isNotNull() & (F.col("tok") != "")
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.when(real, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum(F.when(real, F.col("_w")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("weight_sum"),
    )
    keep = (F.col("n_tokens") > 0) & (
        F.col("weight_sum") >= F.lit(threshold_milli) * F.col("n_tokens")
    )
    return agg.select("doc_id", "n_tokens", "weight_sum", keep.alias("keep"))


def classifier_scores(
    documents: DataFrame, threshold_milli: int = 0
) -> DataFrame:
    """(doc_id, n_tokens, weight_sum, keep) for every input doc.

    ``keep`` ⇔ the doc has tokens AND its MEAN milli-weight is
    ≥ ``threshold_milli`` (compared in exact integer arithmetic:
    ``weight_sum >= threshold_milli * n_tokens``)."""
    toks = _token_rows(documents).withColumn("_w", hash_weight_expr("tok"))
    return _aggregate(toks, threshold_milli)


def classifier_scores_with_weights(
    documents: DataFrame, weights: DataFrame, threshold_milli: int = 0
) -> DataFrame:
    """Production path: score against a TRAINED weight table
    ``weights(bucket: long, weight_milli: long)``.

    The weight table is bounded by construction (≤ HASH_BUCKETS rows),
    so it is explicitly broadcast — the corpus side stays map-only up
    to the per-doc aggregation. Buckets absent from the table (pruned /
    never seen in training) weigh 0, the standard hashing-trick OOV
    behavior."""
    toks = _token_rows(documents).withColumn("_b", bucket_expr("tok"))
    joined = toks.join(
        F.broadcast(weights.select("bucket", "weight_milli")),
        toks["_b"] == F.col("bucket"),
        "left",
    ).withColumn("_w", F.coalesce("weight_milli", F.lit(0)))
    return _aggregate(joined, threshold_milli)


def per_doc_score_cte_sql(table: str = "documents") -> str:
    """The per-doc scoring block (CTEs ``toks`` + ``per_doc``) shared by
    :func:`classifier_sql` and urls.domain_quality_sql — one SQL source
    for the token/weight rule so the doc gate and the domain rollup can
    never desynchronize. LEFT JOIN LATERAL unnest matches Spark's
    explode_outer row-for-row: NULL text → one NULL-token row, '' text
    → one ''-token row (verified behavior), both contributing 0 tokens
    / 0 weight."""
    w = f"CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) % {WEIGHT_MOD} - {WEIGHT_BIAS}"
    return f"""toks AS (
  SELECT d.doc_id, u.t
  FROM {table} d
  LEFT JOIN LATERAL (SELECT unnest(string_split(d.text, ' ')) AS t) u ON TRUE
), per_doc AS (
  SELECT doc_id,
         CAST(coalesce(SUM(CASE WHEN u_real THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_tokens,
         CAST(coalesce(SUM(CASE WHEN u_real THEN w ELSE 0 END), 0) AS BIGINT) AS weight_sum
  FROM (SELECT doc_id, (t IS NOT NULL AND t <> '') AS u_real, {w} AS w FROM toks)
  GROUP BY doc_id
)"""


def classifier_sql(threshold_milli: int = 0, table: str = "documents") -> str:
    """DuckDB mirror of :func:`classifier_scores` over the shared
    per-doc scoring block."""
    return f"""
WITH {per_doc_score_cte_sql(table)}
SELECT doc_id, n_tokens, weight_sum,
       (n_tokens > 0 AND weight_sum >= {threshold_milli} * n_tokens) AS keep
FROM per_doc
"""


def train_weights(
    documents: DataFrame, positive, min_df: int = 1
) -> DataFrame:
    """Fit a weight table from labeled documents — the training half of
    the model-based quality stage (CCNet trains fastText on a trusted
    corpus vs crawl; this is the same shape in-engine).

    ``positive`` is a boolean Column over the documents (e.g.
    ``F.col("lang") == "en"``). Per hashed bucket, the weight is the
    normalized count contrast in integer milli-units::

        weight_milli = floor(1000 * (pos - neg) / (pos + neg))

    — a difference-of-class-centroids linear model (the closed-form
    perceptron analog), bounded in [-1000, 1000]. ``floor`` over one
    IEEE double division is bit-identical in both engines (the
    numerator stays < 2^53; integer ``div``/``//`` would NOT match:
    Spark truncates toward zero, DuckDB floors — they differ on every
    negative weight; a log-odds variant would hinge on libm ulp
    parity).

    Plan: token explode → ONE groupBy on the bounded bucket key
    (≤ HASH_BUCKETS groups ⇒ the output is broadcastable by
    construction, and the aggregation is map-side partial); buckets
    with document frequency < ``min_df`` tokens drop out (hashing-trick
    pruning). At 100 TB the exchange moves ≤ HASH_BUCKETS rows per map
    partition — training cost is ONE pass over the corpus."""
    toks = documents.select(
        positive.alias("_pos"),
        F.explode_outer(F.split("text", " ")).alias("tok"),
    )
    real = F.col("tok").isNotNull() & (F.col("tok") != "")
    per_bucket = (
        toks.where(real)
        .select(bucket_expr("tok").alias("bucket"), F.col("_pos"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("bigint").alias("pos"),
            F.sum(F.when(F.col("_pos"), 0).otherwise(1)).cast("bigint").alias("neg"),
        )
    )
    return per_bucket.where(F.col("pos") + F.col("neg") >= min_df).select(
        "bucket",
        F.floor(
            (F.lit(1000) * (F.col("pos") - F.col("neg")))
            / (F.col("pos") + F.col("neg"))
        )
        .cast("bigint")
        .alias("weight_milli"),
    )


def trained_classifier_sql(
    positive_sql: str, threshold_milli: int = 0, table: str = "documents"
) -> str:
    """DuckDB mirror of train_weights(...) + classifier_scores_with_weights:
    the full train→score lifecycle as one SQL statement."""
    return f"""
WITH toks AS (
  SELECT d.doc_id, ({positive_sql}) AS pos, u.t
  FROM {table} d
  LEFT JOIN LATERAL (SELECT unnest(string_split(d.text, ' ')) AS t) u ON TRUE
),
real_toks AS (
  SELECT doc_id, pos,
         CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) AS bucket
  FROM toks WHERE t IS NOT NULL AND t <> ''
),
weights AS (
  SELECT bucket,
         CAST(floor((1000.0 * (SUM(CASE WHEN pos THEN 1 ELSE 0 END)
                               - SUM(CASE WHEN pos THEN 0 ELSE 1 END)))
                    / COUNT(*)) AS BIGINT) AS weight_milli
  FROM real_toks GROUP BY bucket
),
scored AS (
  SELECT t.doc_id,
         CAST(coalesce(SUM(CASE WHEN t.t IS NOT NULL AND t.t <> '' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_tokens,
         CAST(coalesce(SUM(CASE WHEN t.t IS NOT NULL AND t.t <> ''
              THEN coalesce(w.weight_milli, 0) ELSE 0 END), 0) AS BIGINT) AS weight_sum
  FROM toks t
  LEFT JOIN weights w
    ON t.t IS NOT NULL AND t.t <> ''
   AND w.bucket = CAST(('0x' || substr(md5(t.t), 1, 4)) AS BIGINT)
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, weight_sum,
       (n_tokens > 0 AND weight_sum >= {threshold_milli} * n_tokens) AS keep
FROM scored
"""
