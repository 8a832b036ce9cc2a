"""Property tests for corpus-level curation operators
(operators/corpus.py): span frequency filtering and data-mixture
rebalancing. The bit-exact oracle comparison runs in
test_queries_vs_oracle.py; these pin the semantic contracts the hash
comparison can't name."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators import corpus
from azure_pdf_parser_spark.sources.spanize import derive_spans
from azure_pdf_parser_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _exploded(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return (
        derive_spans(docs)
        .select("doc_id", F.posexplode_outer("spans").alias("ord", "s"))
        .where(F.col("s").isNotNull())
        .select(
            "doc_id",
            F.col("ord").cast("int").alias("ord"),
            "s.kind",
            "s.text",
            "s.media_ref",
        )
    )


def test_span_filter_keeps_all_media_spans(spark):
    ex = _exploded(spark)
    out = corpus.span_frequency_filter(ex)
    n_media_in = ex.where(F.col("text").isNull()).count()
    n_media_out = out.where(F.col("text").isNull()).count()
    assert n_media_in > 0
    assert n_media_out == n_media_in


def test_span_filter_removes_frequent_and_renumbers_densely(spark):
    ex = _exploded(spark)
    out = corpus.span_frequency_filter(ex).persist()
    try:
        # actually removed something (corpus has cross-doc chunks)
        assert out.count() < ex.count()
        # no surviving text recurs in >= 2 distinct docs
        leftover = (
            out.where(F.col("text").isNotNull())
            .select("text", "doc_id")
            .distinct()
            .groupBy("text")
            .count()
            .where(F.col("count") >= corpus.MIN_SPAN_DF)
            .count()
        )
        assert leftover == 0
        # ord is dense 0..n-1 per doc and preserves source order
        bad = (
            out.groupBy("doc_id")
            .agg(
                F.min("ord").alias("lo"),
                F.max("ord").alias("hi"),
                F.count("*").alias("n"),
                # src_ord sorted by ord must be strictly increasing
                (
                    F.array_sort(
                        F.collect_list(F.struct("ord", "src_ord"))
                    ).alias("pairs")
                ),
            )
            .where(
                (F.col("lo") != 0)
                | (F.col("hi") != F.col("n") - 1)
                | F.exists(
                    F.zip_with(
                        F.col("pairs"),
                        F.slice(
                            F.col("pairs"), 2, F.size(F.col("pairs"))
                        ),
                        lambda a, b: b.src_ord <= a.src_ord,
                    ),
                    lambda x: x,
                )
            )
            .count()
        )
        assert bad == 0
    finally:
        out.unpersist()


def test_mix_corpus_respects_binding_group_and_subset(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = corpus.mix_corpus(docs).persist()
    try:
        n_in = {
            r["lang"]: r["n"]
            for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        n_out = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        w = corpus.DEFAULT_MIX_WEIGHTS
        w_total = sum(w[g] for g in n_in)
        # binding group (min n_g*W/w_g) is kept in full
        binding = min(n_in, key=lambda g: n_in[g] * w_total // w[g])
        assert n_out[binding] == n_in[binding]
        # never upsample any group
        assert all(n_out.get(g, 0) <= n_in[g] for g in n_in)
        # kept ids are a subset of the input ids
        assert out.join(docs, "doc_id", "left_anti").count() == 0
    finally:
        out.unpersist()


def test_mix_corpus_single_group_keeps_everything(spark):
    docs = load_table(spark, SF_DIR, "documents")
    en = docs.where(F.col("lang") == "en")
    out = corpus.mix_corpus(en, weights={"en": 1})
    assert out.count() == en.count()


def test_mix_corpus_rejects_bad_weights(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError):
        corpus.mix_corpus(docs, weights={})
    with pytest.raises(ValueError):
        corpus.mix_corpus(docs, weights={"en": 0})


def test_mix_corpus_doc_side_is_broadcast_join_no_doc_shuffle(spark):
    """The per-document path must be scan -> broadcast-join -> filter:
    no Exchange keyed on the big side (the only shuffles allowed are
    the tiny group-counts aggregation)."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        corpus.mix_corpus(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the doc-side join on group_col is the broadcast hash join; the
    # 1-row scalar attaches (W, T) are BroadcastNestedLoop by nature
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_curriculum_order_is_contiguous_and_bucket_sharded(spark):
    """The global rank must be an exact 1..N permutation, monotone in
    difficulty; and the plan must compute it WITHOUT ranking the corpus
    through one reducer — the only single-partition exchange feeds the
    tiny per-difficulty offset aggregate, while the corpus-sized rank
    window shuffles on the difficulty key."""
    docs = load_table(spark, SF_DIR, "documents")
    df = corpus.curriculum_order(docs)
    rows = df.collect()
    n = docs.count()
    ranks = sorted(r["curriculum_rank"] for r in rows)
    assert ranks == list(range(1, n + 1))
    by_rank = sorted(rows, key=lambda r: r["curriculum_rank"])
    diffs = [r["difficulty"] for r in by_rank]
    assert diffs == sorted(diffs)

    plan = df._jdf.queryExecution().executedPlan().toString()
    # corpus-sized rank window is sharded on the difficulty key
    assert "hashpartitioning(difficulty" in plan, plan
    # the offsets side is broadcast back, never sort-merged
    assert "SortMergeJoin" not in plan, plan
