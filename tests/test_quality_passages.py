"""Behavioral + plan tests for gopher_filter and duplicate_passages.

The oracle gates prove corpus-level parity; these pin the hand-checkable
semantics (which rule failed, which ranges merge) and the scale-bearing
plan shapes (semi-join membership, no pair join, no cartesian).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_filter_rules(spark):
    from azure_pdf_parser_spark.functions.text import gopher_filter

    good = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "back home with some friends to share a warm meal of bread "
        "and cheese before the evening rain begins to fall softly "
        "on the quiet village roofs while children play games near "
        "the old stone bridge by the river"
    )
    rows = [
        (1, good),  # passes everything
        (2, "short text"),  # fails word count
        (3, None),  # NULL text: keep must be False, never NULL
        (4, "spam " * 60),  # repeated bigram -> fails repetition
        (5, ("1 2 3 4 5 6 7 8 9 10 " * 6).strip()),  # fails alpha + stopwords
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_filter(_mkdocs(spark, rows)).collect()
    }
    assert len(got) == 5
    assert got[1]["keep"] is True, got[1]
    assert got[2]["keep"] is False and got[2]["ok_word_count"] is False
    assert got[3]["keep"] is False  # and not None
    assert got[4]["ok_repetition"] is False and got[4]["keep"] is False
    assert got[5]["ok_alpha"] is False and got[5]["ok_stopwords"] is False
    # every rule column is a real boolean on every row (no NULLs leak)
    for r in got.values():
        for k, v in r.items():
            if k.startswith("ok_") or k == "keep":
                assert isinstance(v, bool), (r, k, v)


def test_gopher_filter_plan_no_extra_shuffles(spark):
    """Signals are map-only; only the repetition aggregate and the
    doc_id join may shuffle — and no cartesian/broadcast of a
    corpus-derived table anywhere."""
    from azure_pdf_parser_spark.functions.text import gopher_filter

    df = gopher_filter(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # bigram explode groupBys (2) + join realignment: allow <= 4
    # exchanges, all hash-keyed (no single-partition exchange)
    assert plan.count("Arguments: hashpartitioning") <= 4, plan
    assert "SinglePartition" not in plan, plan


def test_duplicate_passages_merges_islands(spark):
    from azure_pdf_parser_spark.operators.dedup import duplicate_passages

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        # doc 1 and 2 share a 9-word passage at different offsets
        (1, f"one two three {shared} tail words here"),
        (2, f"{shared} completely different ending of second doc"),
        # doc 3 shares nothing (no 5-word shingle in common)
        (3, "nothing in common with the others at all whatsoever today"),
        # doc 4 too short to carry a passage
        (4, "tiny doc"),
    ]
    out = duplicate_passages(_mkdocs(spark, rows)).collect()
    got = {(r["doc_id"]): r for r in out}
    assert set(got) == {1, 2}
    r1, r2 = got[1], got[2]
    # doc 1: passage starts after the 3 prefix words
    assert (r1["start_word"], r1["end_word"], r1["n_words"]) == (3, 11, 9)
    assert r1["passage"] == shared
    # doc 2: same passage anchored at 0
    assert (r2["start_word"], r2["end_word"], r2["n_words"]) == (0, 8, 9)
    assert r2["passage"] == shared


def test_duplicate_passages_adjacent_runs_merge(spark):
    """Two contributing shingle runs separated by exactly k words of
    unique text stay separate passages; adjacent runs merge into one."""
    from azure_pdf_parser_spark.operators.dedup import duplicate_passages

    a = "p q r s t"
    b = "v w x y z"
    rows = [
        (1, f"{a} u1 u2 u3 u4 u5 u6 {b}"),
        (2, f"{a} m1 m2 m3 m4 m5 m6 {b}"),
    ]
    out = duplicate_passages(_mkdocs(spark, rows)).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["start_word"], r["end_word"], r["passage"])
        )
    for doc_id, spans in per_doc.items():
        spans.sort()
        assert spans == [(0, 4, a), (11, 15, b)], (doc_id, spans)


def test_duplicate_passages_plan_semi_join_no_pairs(spark):
    """Membership must be a LEFT SEMI equi-join on the shingle hash —
    never a pair-generating inner join or a cartesian product."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators.dedup import duplicate_passages

    df = duplicate_passages(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    plan = _plan(df)
    release_all()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"Join LeftSemi", plan), plan
    # exactly one inner join: the final per-doc text attach on doc_id
    inner_ids = set(
        re.findall(r"\((\d+)\) \w*(?:HashJoin|SortMergeJoin) Inner", plan)
    )
    assert len(inner_ids) <= 1, plan


def test_corpus_curation_reason_precedence(spark):
    """quality rejection wins over duplicate; exact dups keep only the
    lowest doc_id; keep/reason are never NULL-inconsistent."""
    from azure_pdf_parser_spark.operators.curation import curate_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "back home with some friends to share a warm meal of bread "
        "and cheese before the evening rain begins to fall softly "
        "on the quiet village roofs while children play games near "
        "the old stone bridge by the river"
    )
    rows = [
        (1, good),           # canonical + quality: kept
        (2, good),           # exact dup of 1: dropped as duplicate
        (3, "too short"),    # fails quality
        (4, "too short"),    # fails quality AND is a dup: reason=quality
        (5, None),           # NULL text: quality, vacuously canonical
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in curate_corpus(_mkdocs(spark, rows)).collect()
    }
    assert got[1]["keep"] is True and got[1]["reason"] is None
    assert got[2]["keep"] is False and got[2]["reason"] == "duplicate"
    assert got[3]["reason"] == "quality"
    # doc 4 is both low-quality and a duplicate of 3 -> quality wins
    assert got[4]["reason"] == "quality" and got[4]["is_canonical"] is False
    assert got[5]["reason"] == "quality" and got[5]["is_canonical"] is True
    for r in got.values():
        assert isinstance(r["keep"], bool)


def test_ivf_recall_bounds(spark):
    """Recall is 1.0 when every vector's true neighbors share its
    cluster, and the report shape is one row with sane bounds."""
    from azure_pdf_parser_spark.caching import release_all
    from azure_pdf_parser_spark.operators.ann import ivf_recall_at_k
    from azure_pdf_parser_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = ivf_recall_at_k(emb, k=5).collect()
    release_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_vectors"] > 0
    assert 0.0 <= r["min_recall"] <= r["mean_recall"] <= 1.0


def test_passage_scrub_removes_exact_ranges(spark):
    """The act stage: duplicated ranges drop, everything else survives
    verbatim; clean docs pass through untouched; a fully-duplicated doc
    scrubs to the empty string (md5('') both engines)."""
    import hashlib

    from azure_pdf_parser_spark.operators.dedup import passage_scrub

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        (1, f"one two three {shared} tail words here"),
        (2, f"{shared} completely different ending of second doc"),
        (3, "nothing in common with the others at all whatsoever today"),
        (4, "tiny doc"),
        (5, shared),  # fully duplicated -> scrubs to ''
        (6, shared),
    ]
    out = {r["doc_id"]: r for r in passage_scrub(_mkdocs(spark, rows)).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    # doc 1: 9 shared words removed, prefix+suffix survive re-joined
    r = out[1]
    assert r["n_words_removed"] == 9
    assert r["scrubbed_md5"] == md5("one two three tail words here")
    # doc 2: suffix survives
    assert out[2]["scrubbed_md5"] == md5(
        "completely different ending of second doc"
    )
    # clean docs: zero removed, text unchanged
    assert out[3]["n_words_removed"] == 0
    assert out[3]["scrubbed_md5"] == md5(
        "nothing in common with the others at all whatsoever today"
    )
    assert out[4]["n_words_removed"] == 0
    # fully duplicated: empty scrub
    for d in (5, 6):
        assert out[d]["n_words_removed"] == 9
        assert out[d]["scrubbed_len"] == 0
        assert out[d]["scrubbed_md5"] == md5("")


def test_passage_scrub_single_doc_id_shuffle(spark):
    """The scrub adds only doc_id-keyed exchanges on top of the find
    stage — no corpus-wide word shuffle, no cartesian, no Python."""
    from azure_pdf_parser_spark.operators.dedup import passage_scrub

    plan = _plan(
        passage_scrub(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SinglePartition" not in plan, plan
