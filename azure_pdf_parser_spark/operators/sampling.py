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
