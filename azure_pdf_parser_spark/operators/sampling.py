"""Deterministic sampling and dataset splitting.

Training-data pipelines need samples and train/val/test assignments
that are (a) reproducible across runs and engines — no RNG, because
Spark/DuckDB/NumPy generators never agree and a re-run must not churn
the split — and (b) STABLE UNDER CORPUS GROWTH: adding documents must
not move existing ones between splits (the classic eval-contamination
accident). Both properties come from hashing the document id:

  bucket(doc) = first 4 hex chars of md5(doc_id)   — uniform on [0, 16⁴)

Thresholding that hex prefix AS A STRING equals numeric thresholding
(lowercase hex compares lexicographically = numerically), so the same
literal comparison runs identically on Spark and DuckDB.

Two tiers:
* ``hash_sample`` / ``assign_splits`` — pure map-side projections, fuse
  into the scan, correct in expectation per stratum (the hash is
  independent of any column). The 100 TB default.
* ``stratified_exact_sample`` — exact per-stratum counts via one window
  (rank by hash within stratum); costs a shuffle on the stratum key.
  For when "10% of EVERY language" must be exact, not expected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 16**4  # 4 hex chars


def _hex_threshold(fraction: float) -> str:
    """Lowercase literal h such that P(bucket < h) ≈ fraction.

    fraction ≥ 1.0 returns 'g' — it sorts above every hex string, so
    the strict '<' selects ALL buckets including 'ffff' (clamping to
    'ffff' would silently drop ~1/65536 of docs from a full-fraction
    sample, and route them to 'train' when val+test fractions sum to 1).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(min(int(fraction * _BUCKETS), _BUCKETS - 1), "04x")


def bucket_col(doc_id: Column) -> Column:
    return F.substring(F.md5(doc_id.cast("string")), 1, 4)


def hash_sample(documents: DataFrame, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` sample — map-only, growth-stable."""
    return documents.where(bucket_col(F.col("doc_id")) < _hex_threshold(fraction))


def assign_splits(
    documents: DataFrame, val_fraction: float = 0.05, test_fraction: float = 0.05
) -> DataFrame:
    """(doc_id, split): 'test' | 'val' | 'train', disjoint and exhaustive.

    Thresholds nest (test below val below train) so growing either
    fraction only MOVES the boundary — docs never swap between val and
    test when fractions change monotonically.
    """
    t_test = _hex_threshold(test_fraction)
    t_val = _hex_threshold(test_fraction + val_fraction)
    b = bucket_col(F.col("doc_id"))
    return documents.select(
        "doc_id",
        F.when(b < t_test, "test").when(b < t_val, "val").otherwise("train").alias("split"),
    )


def stratified_exact_sample(
    documents: DataFrame, stratum_col: str, fraction: float
) -> DataFrame:
    """Exactly ceil(fraction·|stratum|) docs per stratum, chosen by hash
    rank (deterministic, growth-minimal churn). One shuffle on the
    stratum key; rank-filter benefits from WindowGroupLimit pushdown."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(stratum_col).orderBy(
        bucket_col(F.col("doc_id")), F.col("doc_id")
    )
    n = F.count("*").over(Window.partitionBy(stratum_col))
    return (
        documents.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", n)
        .where(F.col("_rk") <= F.ceil(F.col("_n") * fraction))
        .drop("_rk", "_n")
    )


def assign_splits_sql(val_fraction: float = 0.05, test_fraction: float = 0.05) -> str:
    t_test = _hex_threshold(test_fraction)
    t_val = _hex_threshold(test_fraction + val_fraction)
    b = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)"
    return f"""
SELECT doc_id,
       CASE WHEN {b} < '{t_test}' THEN 'test'
            WHEN {b} < '{t_val}' THEN 'val'
            ELSE 'train' END AS split
FROM documents
"""


def stratified_sample_sql(stratum_col: str, fraction: float) -> str:
    b = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)"
    return f"""
SELECT * FROM documents
QUALIFY row_number() OVER (PARTITION BY {stratum_col} ORDER BY {b}, doc_id)
        <= ceil(count(*) OVER (PARTITION BY {stratum_col}) * {fraction})
"""


# --- quality-weighted (importance) sampling ------------------------------------

def quality_weighted_sample(documents: DataFrame) -> DataFrame:
    """(doc_id, p_permille, sampled): per-doc keep probability
    proportional to model-based quality, decided deterministically —
    the DCLM/FineWeb-style importance-sampling step that keeps MOST
    high-quality docs and a thin slice of low-quality ones instead of a
    hard threshold.

    p_permille maps the classifier's mean milli-weight linearly into
    [0, 1000]: mean −1000 → 0‰, 0 → 500‰, +1000 → 1000‰, token-less
    docs → 0‰. Integer-exact everywhere the engines could disagree:
    one IEEE double division under floor() (the train_weights
    precedent — the 500·weight_sum numerator stays far below 2^53),
    and the sampling decision is a pure-integer cross-multiply

        bucket16 · 1000 < p_permille · 65536

    over the md5 prefix bucket (growth-stable, RNG-free — the
    hash_sample contract), so p_permille = 1000 keeps EVERY bucket
    including 0xffff (the fraction ≥ 1.0 lesson). Map-only on top of
    the classifier's per-doc aggregate: no new shuffle, no RNG, and a
    re-run or corpus growth never flips an existing doc's decision.
    """
    from azure_pdf_parser_spark.operators.classifier import classifier_scores

    scored = classifier_scores(documents)
    p = (
        F.when(
            F.col("n_tokens") > 0,
            F.least(
                F.lit(1000),
                F.greatest(
                    F.lit(0),
                    F.lit(500)
                    + F.floor(
                        F.lit(500) * F.col("weight_sum")
                        / (F.lit(1000.0) * F.col("n_tokens"))
                    ),
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    bucket16 = F.conv(bucket_col(F.col("doc_id")), 16, 10).cast("bigint")
    return scored.select(
        "doc_id",
        p.alias("p_permille"),
        (bucket16 * F.lit(1000) < p.cast("bigint") * F.lit(65536)).alias(
            "sampled"
        ),
    )


def quality_weighted_sample_sql() -> str:
    from azure_pdf_parser_spark.operators.classifier import classifier_sql

    return f"""
WITH base AS ({classifier_sql()}),
p AS (
  SELECT doc_id,
         CAST(CASE WHEN n_tokens > 0 THEN
           least(1000, greatest(0,
             500 + CAST(floor(500 * weight_sum / (1000.0 * n_tokens)) AS BIGINT)))
         ELSE 0 END AS INT) AS p_permille
  FROM base
)
SELECT doc_id, p_permille,
       (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) * 1000
        < CAST(p_permille AS BIGINT) * 65536) AS sampled
FROM p
"""
