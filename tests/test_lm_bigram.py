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


def test_bm25_rare_term_outranks_common_and_length_normalizes(spark):
    """BM25 semantics on a hand-built corpus (oracle parity is covered
    by tests/test_queries_vs_oracle.py): (a) a doc matching the RARE
    query term outranks one matching only a ubiquitous term (idf);
    (b) between two docs with identical tf of the same term, the
    SHORTER doc scores higher (the b·dl/avgdl length normalization);
    (c) every returned doc matched ≥1 term and the result is capped
    at k with a deterministic (score, doc_id) cut."""
    from azure_pdf_parser_spark.operators.lm import bm25_topk

    filler = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        # 'join' appears in nearly every doc (low idf); 'dup' in one
        [(i, f"join {filler}") for i in range(10)]
        + [(50, f"dup {filler}")]
        + [(60, f"join join {filler}")]                  # tf=2, short
        + [(61, f"join join {filler} {filler} {filler}")]  # tf=2, long
        ,
        "doc_id long, text string",
    )
    docs = docs.select(F.col("doc_id").cast("string"), "text")
    # uncapped: every doc matches ≥1 term, so all 13 come back
    rows = bm25_topk(docs, terms=("join", "dup"), k=100).collect()
    assert len(rows) == 13
    assert all(r.n_matched >= 1 for r in rows)
    score = {r.doc_id: r.bm25 for r in rows}
    # (a) the rare-term doc wins the ranking outright
    assert rows[0].doc_id == "50", rows
    # (b) same tf, shorter doc scores strictly higher (and the long
    # tf=2 doc even falls below the short tf=1 docs — dl penalty
    # exceeding the saturating second occurrence is correct Okapi
    # behavior at k1=1.2)
    assert score["60"] > score["61"], score
    assert score["0"] > score["61"], score
    # (c) the cap returns exactly k rows from the same ordering
    capped = bm25_topk(docs, terms=("join", "dup"), k=5).collect()
    assert len(capped) == 5
    assert [r.doc_id for r in capped] == [r.doc_id for r in rows[:5]]


def test_bm25_matches_python_reference_on_random_docs(spark):
    """Randomized model test: pure-Python Okapi BM25 (Lucene
    non-negative idf, k1=1.2 b=0.75, same [a-z]+ tokenizer, same
    round-6 + doc_id tie-break cut) over a seeded corpus where every
    doc mixes query and filler terms."""
    import math
    import random
    import re

    from azure_pdf_parser_spark.operators.lm import (
        BM25_B,
        BM25_K1,
        BM25_QUERY_TERMS,
        bm25_topk,
    )
    from azure_pdf_parser_spark.caching import release_all

    rng = random.Random(67)
    vocab = list(BM25_QUERY_TERMS) + ["alpha", "beta", "gamma", "Zed9"]
    docs = [
        (f"d{i:03d}", " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(80)
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    toks = {
        d: re.findall("[a-z]+", t.lower()) for d, t in docs
    }
    toks = {d: ts for d, ts in toks.items() if ts}  # zero-token docs absent
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    ref = []
    for d, ts in toks.items():
        dl = len(ts)
        score, matched = 0.0, 0
        for term in BM25_QUERY_TERMS:
            tf = ts.count(term)
            if tf == 0:
                continue
            df_t = sum(1 for other in toks.values() if term in other)
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            score += idf * tf * (BM25_K1 + 1) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
            )
            matched += 1
        if matched:
            ref.append((d, dl, matched, round(score, 6)))
    ref.sort(key=lambda r: (-r[3], r[0]))
    expected = ref[:20]

    try:
        got = [
            (r["doc_id"], r["dl"], r["n_matched"], r["bm25"])
            for r in bm25_topk(df).collect()
        ]
    finally:
        release_all()
    assert got == expected
