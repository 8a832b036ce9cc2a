"""Deterministic sampling/splits: the growth-stability contracts."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_split_assignment_stable_under_corpus_growth(spark):
    """Adding documents must not move existing ones between splits —
    the eval-contamination accident a row_number-based split commits."""
    from azure_pdf_parser_spark.operators.sampling import assign_splits

    small = spark.range(500).select(F.col("id").alias("doc_id"))
    big = spark.range(5000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in assign_splits(small).collect()}
    b = {r["doc_id"]: r["split"] for r in assign_splits(big).collect()}
    assert all(b[k] == v for k, v in a.items())
    # all three splits are populated at the default fractions
    assert {"train", "val", "test"} == set(b.values())


def test_split_fractions_approximate_and_nested(spark):
    from azure_pdf_parser_spark.operators.sampling import assign_splits

    docs = spark.range(20000).select(F.col("id").alias("doc_id"))
    counts = {
        r["split"]: r["count"]
        for r in assign_splits(docs, 0.1, 0.1).groupBy("split").count().collect()
    }
    assert abs(counts["test"] / 20000 - 0.1) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.02
    # growing test_fraction only promotes val/train docs into test: the
    # test set at 5% is a subset of the test set at 10%
    t5 = {r["doc_id"] for r in assign_splits(docs, 0.1, 0.05)
          .where("split = 'test'").collect()}
    t10 = {r["doc_id"] for r in assign_splits(docs, 0.1, 0.10)
           .where("split = 'test'").collect()}
    assert t5 <= t10


def test_stratified_exact_sample_counts(spark):
    from azure_pdf_parser_spark.operators.sampling import (
        stratified_exact_sample,
    )

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("L"), (F.col("id") % 7).cast("string")).alias("lang"),
    )
    got = stratified_exact_sample(docs, "lang", 0.1)
    per = {r["lang"]: r["count"] for r in got.groupBy("lang").count().collect()}
    want = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    import math

    assert per == {k: math.ceil(v * 0.1) for k, v in want.items()}


def test_hash_sample_is_map_only(spark):
    from azure_pdf_parser_spark.operators.sampling import hash_sample

    df = hash_sample(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 0.25
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan


def test_full_fraction_sampling_exact(spark):
    """fraction=1.0 must select EVERY doc (including bucket 'ffff'), and
    val+test fractions summing to 1.0 must leave 'train' empty — the
    clamped-'ffff' threshold silently violated both."""
    from azure_pdf_parser_spark.operators.sampling import (
        assign_splits,
        hash_sample,
    )

    # 70k ids make bucket 'ffff' occupied with overwhelming probability;
    # assert it explicitly so the test can't pass vacuously
    docs = spark.range(70000).select(F.col("id").alias("doc_id"))
    top_bucket = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) == "ffff"
    ).count()
    assert top_bucket > 0
    assert hash_sample(docs, 1.0).count() == 70000
    splits = {
        r["split"]: r["count"]
        for r in assign_splits(docs, val_fraction=0.5, test_fraction=0.5)
        .groupBy("split").count().collect()
    }
    assert "train" not in splits
    assert splits["test"] + splits["val"] == 70000


def test_quality_weighted_sample_bounds_and_full_keep(spark):
    """p_permille stays in [0,1000]; a doc driven to p=1000 is sampled
    regardless of its bucket (including 0xffff — the full-fraction
    lesson), and a token-less doc gets p=0 and is never sampled."""
    from azure_pdf_parser_spark.operators.sampling import (
        quality_weighted_sample,
    )

    docs = spark.createDataFrame(
        [(1, "some words here"), (2, None), (3, "")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in quality_weighted_sample(docs).collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert 0 <= r.p_permille <= 1000
    assert rows[2].p_permille == 0 and not rows[2].sampled
    # p = 1000 must include EVERY bucket: max bucket 0xffff = 65535,
    # 65535 * 1000 < 1000 * 65536 holds strictly
    assert 65535 * 1000 < 1000 * 65536


def test_quality_weighted_sample_is_deterministic_and_growth_stable(spark):
    """Adding documents must not flip an existing doc's decision —
    the hash_sample contract carried over to importance sampling."""
    from azure_pdf_parser_spark.operators.sampling import (
        quality_weighted_sample,
    )

    small = spark.createDataFrame(
        [(i, f"stable words {i}") for i in range(50)],
        "doc_id bigint, text string",
    )
    grown = spark.createDataFrame(
        [(i, f"stable words {i}") for i in range(100)],
        "doc_id bigint, text string",
    )
    before = {
        r.doc_id: (r.p_permille, r.sampled)
        for r in quality_weighted_sample(small).collect()
    }
    after = {
        r.doc_id: (r.p_permille, r.sampled)
        for r in quality_weighted_sample(grown).collect()
    }
    for doc_id, v in before.items():
        assert after[doc_id] == v
