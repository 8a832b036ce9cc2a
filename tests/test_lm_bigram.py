"""Bigram LM surprisal semantics (oracle parity is covered by
tests/test_queries_vs_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_pdf_parser_spark.operators.lm import lm_bigram_surprisal


def test_word_salad_scores_above_fluent_repetition(spark):
    """The signal the bigram tier adds over unigrams: a doc whose
    CONSECUTIVE pairs are unattested scores high even when every
    individual token is corpus-frequent."""
    fluent = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(20)]
        # same vocabulary, scrambled order → unseen bigrams
        + [(99, "mat the on cat the sat")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.avg_bigram_surprisal
        for r in lm_bigram_surprisal(docs).collect()
    }
    assert rows[99] > rows[0], rows


def test_short_docs_absent_and_counts_exact(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "a b c d")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.n_bigrams for r in lm_bigram_surprisal(docs).collect()}
    assert rows == {4: 3}, rows
