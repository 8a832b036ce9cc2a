"""Model-based quality classifier (operators/classifier.py).

Oracle parity for the stand-in-weights gate is covered by
tests/test_queries_vs_oracle.py (classifier_quality is in ORACLE_SQL);
these tests pin the trained-weights production seam and the physical
plan: the weight table must broadcast, the corpus side must reach the
per-doc aggregation without any extra exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.classifier import (
    HASH_BUCKETS,
    WEIGHT_BIAS,
    WEIGHT_MOD,
    bucket_expr,
    classifier_scores,
    classifier_scores_with_weights,
)
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _lattice_weights(spark):
    """The stand-in weight lattice materialized as an actual weight
    table: weight(bucket) = bucket % WEIGHT_MOD - WEIGHT_BIAS for all
    HASH_BUCKETS buckets."""
    return spark.range(HASH_BUCKETS).select(
        F.col("id").alias("bucket"),
        (F.col("id") % WEIGHT_MOD - WEIGHT_BIAS).cast("bigint").alias("weight_milli"),
    )


def test_trained_weights_match_standin_lattice(spark):
    """classifier_scores_with_weights over the materialized lattice must
    bit-match classifier_scores (same weights, different plumbing)."""
    docs = _docs(spark)
    a = {r["doc_id"]: (r["n_tokens"], r["weight_sum"], r["keep"])
         for r in classifier_scores(docs).collect()}
    b = {r["doc_id"]: (r["n_tokens"], r["weight_sum"], r["keep"])
         for r in classifier_scores_with_weights(docs, _lattice_weights(spark)).collect()}
    assert a == b
    assert len(a) == docs.count()  # every input doc scored


def test_oov_buckets_weigh_zero(spark):
    """Buckets absent from the trained table contribute 0 (hashing-trick
    OOV): with an EMPTY weight table every doc scores weight_sum=0 and
    keep is True iff it has tokens (mean 0 >= threshold 0)."""
    docs = _docs(spark).limit(50)
    empty = spark.createDataFrame([], "bucket bigint, weight_milli bigint")
    rows = classifier_scores_with_weights(docs, empty).collect()
    assert rows
    for r in rows:
        assert r["weight_sum"] == 0
        assert r["keep"] == (r["n_tokens"] > 0)


def test_threshold_is_integer_exact(spark):
    """keep compares weight_sum*1000 >= threshold_milli*n_tokens in
    BIGINT — a doc whose mean milli-weight is exactly the threshold is
    kept; one milli below is dropped."""
    docs = spark.createDataFrame(
        [("d_eq", "x y"), ("d_null", None), ("d_empty", "")],
        "doc_id string, text string",
    )
    # Weight both tokens of d_eq at exactly 7 milli → mean = 7.
    w = docs.where("text = 'x y'").select(
        F.explode(F.split("text", " ")).alias("tok")
    ).select(bucket_expr("tok").alias("bucket"), F.lit(7).cast("bigint").alias("weight_milli"))
    at = {r["doc_id"]: r["keep"] for r in
          classifier_scores_with_weights(docs, w, threshold_milli=7).collect()}
    above = {r["doc_id"]: r["keep"] for r in
             classifier_scores_with_weights(docs, w, threshold_milli=8).collect()}
    assert at == {"d_eq": True, "d_null": False, "d_empty": False}
    assert above == {"d_eq": False, "d_null": False, "d_empty": False}


def test_weight_table_is_broadcast(spark):
    """Plan pin: the (bounded-by-construction) weight table joins via
    BroadcastHashJoin; the corpus side must never be the broadcast
    side, and the only exchange below the aggregate is the doc_id
    partial-agg shuffle."""
    docs = _docs(spark)
    df = classifier_scores_with_weights(docs, _lattice_weights(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_standin_path_is_pure_codegen(spark):
    """The stand-in scorer is map-only expressions + ONE hash aggregate
    on doc_id: no join, no Python, exactly one exchange."""
    plan = classifier_scores(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange") == 1


def test_train_weights_learns_token_contrast(spark):
    """Fit on crafted labels: tokens exclusive to the positive class get
    weight +1000, exclusive-negative -1000, shared 0 — and the trained
    classifier separates unseen docs composed of those tokens."""
    from azure_pdf_parser_spark.operators.classifier import train_weights

    train = spark.createDataFrame(
        [("p1", "good fine shared", True), ("p2", "good shared", True),
         ("n1", "bad awful shared", False), ("n2", "bad shared", False)],
        "doc_id string, text string, label boolean",
    )
    w = {r["bucket"]: r["weight_milli"]
         for r in train_weights(train, F.col("label")).collect()}
    b = lambda tok: spark.range(1).select(
        bucket_expr(F.lit(tok)).alias("b")).collect()[0]["b"]
    assert w[b("good")] == 1000
    assert w[b("bad")] == -1000
    assert w[b("shared")] == 0

    test_docs = spark.createDataFrame(
        [("t_good", "good good shared"), ("t_bad", "bad shared"),
         ("t_null", None)],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in classifier_scores_with_weights(
        test_docs, train_weights(train, F.col("label")), threshold_milli=1
    ).collect()}
    assert got == {"t_good": True, "t_bad": False, "t_null": False}


def test_train_weights_bounded_and_floor_division(spark):
    """Weights stay in [-1000, 1000] and use FLOOR division (matching
    DuckDB's semantics on negative values): 1 pos vs 2 neg occurrences
    of a token → floor(1000*(1-2)/3) = -334, not -333."""
    from azure_pdf_parser_spark.operators.classifier import train_weights

    train = spark.createDataFrame(
        [("p", "tok", True), ("n1", "tok", False), ("n2", "tok", False)],
        "doc_id string, text string, label boolean",
    )
    rows = train_weights(train, F.col("label")).collect()
    assert len(rows) == 1
    assert rows[0]["weight_milli"] == -334
